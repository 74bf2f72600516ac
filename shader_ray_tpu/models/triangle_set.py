"""Deduplicating triangle mesh store.

Host-side equivalent of the reference triangle_set (triangle-set.h:46-102):
a vertex pool deduplicated on exact (position, normal, color) equality,
an indexed triangle list with per-triangle AABB + barycenter, and a
whole-set AABB.  Per-point AABB insertion bumps by 1e-5 in every axis
(reference vectormath.h:189-195).

Implemented SoA on growable numpy arrays instead of the reference's
AoS std::vectors — the arrays are consumed directly by the BVH builder
and device flattening without conversion.
"""

from __future__ import annotations

import numpy as np

BUMPOUT = 1e-5  # reference vectormath.h:191


class TriangleSet:
    def __init__(self) -> None:
        self._positions: list[np.ndarray] = []
        self._normals: list[np.ndarray] = []
        self._colors: list[np.ndarray] = []
        self._vertex_map: dict[bytes, int] = {}
        self._tri_indices: list[tuple[int, int, int]] = []
        # finalized arrays
        self.positions: np.ndarray | None = None   # (V, 3) f32
        self.normals: np.ndarray | None = None     # (V, 3) f32
        self.colors: np.ndarray | None = None      # (V, 3) f32
        self.indices: np.ndarray | None = None     # (T, 3) i32
        self.tri_boxmin: np.ndarray | None = None  # (T, 3) f32
        self.tri_boxmax: np.ndarray | None = None  # (T, 3) f32
        self.barycenters: np.ndarray | None = None  # (T, 3) f32
        self.boxmin: np.ndarray | None = None       # (3,) f32 scene AABB
        self.boxmax: np.ndarray | None = None

    # --- building -------------------------------------------------------

    def _find_vertex(self, v: np.ndarray, n: np.ndarray, c: np.ndarray) -> int:
        """Exact-equality dedup (reference triangle-set.h:76-90 used a
        std::map with lexicographic float comparison; a hash on the raw
        float32 bytes gives identical grouping in O(1))."""
        key = v.tobytes() + n.tobytes() + c.tobytes()
        idx = self._vertex_map.get(key)
        if idx is None:
            idx = len(self._positions)
            self._vertex_map[key] = idx
            self._positions.append(v)
            self._normals.append(n)
            self._colors.append(c)
        return idx

    def add(self, verts: np.ndarray, normals: np.ndarray, colors: np.ndarray) -> int:
        """Add one triangle; verts/normals/colors are (3, 3) float32."""
        verts = np.asarray(verts, dtype=np.float32)
        normals = np.asarray(normals, dtype=np.float32)
        colors = np.asarray(colors, dtype=np.float32)
        i0 = self._find_vertex(verts[0], normals[0], colors[0])
        i1 = self._find_vertex(verts[1], normals[1], colors[1])
        i2 = self._find_vertex(verts[2], normals[2], colors[2])
        self._tri_indices.append((i0, i1, i2))
        return len(self._tri_indices) - 1

    def add_batch(self, verts: np.ndarray, normals: np.ndarray, colors: np.ndarray) -> None:
        """Vectorized bulk add: arrays of shape (T, 3, 3)."""
        verts = np.ascontiguousarray(verts, dtype=np.float32)
        normals = np.ascontiguousarray(normals, dtype=np.float32)
        colors = np.ascontiguousarray(colors, dtype=np.float32)
        for t in range(verts.shape[0]):
            self.add(verts[t], normals[t], colors[t])

    def finish(self) -> "TriangleSet":
        """Freeze into SoA arrays and compute AABBs/barycenters
        (reference triangle_set::finish drops the dedup map;
        here it also materializes the numpy views)."""
        self._vertex_map.clear()
        V = len(self._positions)
        T = len(self._tri_indices)
        self.positions = np.asarray(self._positions, dtype=np.float32).reshape(V, 3)
        self.normals = np.asarray(self._normals, dtype=np.float32).reshape(V, 3)
        self.colors = np.asarray(self._colors, dtype=np.float32).reshape(V, 3)
        self.indices = np.asarray(self._tri_indices, dtype=np.int32).reshape(T, 3)
        tri_pos = self.positions[self.indices]          # (T, 3, 3)
        self.tri_boxmin = (tri_pos - BUMPOUT).min(axis=1).astype(np.float32)
        self.tri_boxmax = (tri_pos + BUMPOUT).max(axis=1).astype(np.float32)
        self.barycenters = tri_pos.mean(axis=1).astype(np.float32)
        if T > 0:
            self.boxmin = self.tri_boxmin.min(axis=0)
            self.boxmax = self.tri_boxmax.max(axis=0)
        else:
            self.boxmin = np.full(3, np.finfo(np.float32).max, np.float32)
            self.boxmax = np.full(3, -np.finfo(np.float32).max, np.float32)
        return self

    # --- queries --------------------------------------------------------

    @property
    def triangle_count(self) -> int:
        return len(self._tri_indices) if self.indices is None else int(self.indices.shape[0])

    @property
    def vertex_count(self) -> int:
        return len(self._positions) if self.positions is None else int(self.positions.shape[0])

    def box_center(self) -> np.ndarray:
        """(boxmin + boxmax) / 2 (reference vectormath.h:181-184)."""
        assert self.boxmin is not None
        return ((self.boxmin + self.boxmax) * 0.5).astype(np.float32)

    def get(self, i: int) -> np.ndarray:
        """Expanded triangle positions (3, 3) for triangle i."""
        assert self.positions is not None and self.indices is not None
        return self.positions[self.indices[i]]

    @staticmethod
    def from_arrays(
        tri_pos: np.ndarray,
        tri_norm: np.ndarray | None = None,
        tri_color: np.ndarray | None = None,
        dedup: bool = True,
    ) -> "TriangleSet":
        """Build from (T, 3, 3) arrays. Vectorized dedup via np.unique
        over packed vertex records — same grouping as the reference's
        map but O(n log n) sort instead of per-vertex tree inserts."""
        tri_pos = np.ascontiguousarray(tri_pos, dtype=np.float32)
        T = tri_pos.shape[0]
        if tri_norm is None:
            e1 = tri_pos[:, 1] - tri_pos[:, 0]
            e2 = tri_pos[:, 2] - tri_pos[:, 0]
            fn = np.cross(e1, e2)
            nrm = np.linalg.norm(fn, axis=-1, keepdims=True)
            fn = fn / np.maximum(nrm, 1e-30)
            tri_norm = np.repeat(fn[:, None, :], 3, axis=1)
        tri_norm = np.ascontiguousarray(tri_norm, dtype=np.float32)
        if tri_color is None:
            tri_color = np.ones_like(tri_pos)
        tri_color = np.ascontiguousarray(tri_color, dtype=np.float32)

        ts = TriangleSet()
        if T == 0:
            return ts.finish()
        records = np.concatenate(
            [tri_pos.reshape(-1, 3), tri_norm.reshape(-1, 3), tri_color.reshape(-1, 3)],
            axis=1,
        )  # (3T, 9)
        if dedup:
            void_view = np.ascontiguousarray(records).view(
                np.dtype((np.void, records.dtype.itemsize * records.shape[1]))
            ).ravel()
            # first-occurrence order to match incremental insertion order
            _, first_idx, inverse = np.unique(void_view, return_index=True, return_inverse=True)
            order = np.argsort(first_idx, kind="stable")
            rank = np.empty_like(order)
            rank[order] = np.arange(order.size)
            uniq = records[np.sort(first_idx)]
            ts._positions = list(uniq[:, 0:3])
            ts._normals = list(uniq[:, 3:6])
            ts._colors = list(uniq[:, 6:9])
            ts._tri_indices = [tuple(x) for x in rank[inverse].reshape(T, 3)]
        else:
            ts._positions = list(records[:, 0:3])
            ts._normals = list(records[:, 3:6])
            ts._colors = list(records[:, 6:9])
            ts._tri_indices = [tuple(x) for x in np.arange(3 * T).reshape(T, 3)]
        return ts.finish()
