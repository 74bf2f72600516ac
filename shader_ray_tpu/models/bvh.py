"""Binned-SAH BVH builder (host side, numpy).

Re-implementation of the reference's recursive top-down builder
(bvh.cpp:288-358) with the same algorithm and defaults:

* leaf when depth >= bvh_max_depth (30) or count <= bvh_leaf_max (10)
  (bvh.cpp:28,32,300-302);
* split axis = widest extent of the barycenter box — only that one
  axis is scanned (bvh.cpp:312-327);
* binned SAH with <= 40 bins (= min(40, 2*count), bvh.cpp:200-201):
  triangles binned by barycenter over the vertex box extent, suffix
  scan of right boxes then prefix scan picking min cost
  (bvh.cpp:205-246);
* SAH cost ctrav + cisec * sum(area_i/area * n_i) per Wald's thesis
  (bvh.cpp:106-120; ctrav=1, cisec=4);
* no split beats the leaf cost -> "large leaf" (bvh.cpp:329-332);
* partition by barycenter vs. the chosen split plane (bvh.cpp:249-286;
  here a stable vectorized partition — the resulting left/right sets
  are identical, only intra-side order differs);
* degenerate all-one-side split -> leaf (bvh.cpp:351-355).

The recursion is an explicit worklist and each node's binning is
vectorized over its triangle range, so the build is O(levels) numpy
passes instead of per-triangle Python.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass, field

import numpy as np

from shader_ray_tpu.config import Config, get_config

MAX_BIN_COUNT = 40  # bvh.cpp:200
LEAF_MAX_SIZE_FOR_STATS = 64  # bvh.cpp:44


@dataclass
class BVHNode:
    """One BVH node (reference group.h:22-40). Children are indices
    into BVH.nodes; -1 for leaves. ``axis`` is the split dimension of
    the plane normal D (always axis-aligned in the reference)."""

    boxmin: np.ndarray
    boxmax: np.ndarray
    axis: int = -1
    negative: int = -1
    positive: int = -1
    start: int = 0
    count: int = 0
    my_index: int = -1  # DFS in-order index, assigned by flatten

    @property
    def is_leaf(self) -> bool:
        return self.negative < 0


@dataclass
class BVHStats:
    node_count: int = 0
    leaf_count: int = 0
    nodes_by_level: dict = field(default_factory=dict)
    leaves_by_size: dict = field(default_factory=dict)
    leaf_count_ge_max_size: int = 0
    large_leaf_no_split: int = 0
    large_leaf_one_side: int = 0

    def print(self, file=sys.stderr) -> None:
        """Reference print_bvh_stats (bvh.cpp:83-99)."""
        print(f"{self.node_count} bvh nodes", file=file)
        print(f"{self.leaf_count} of those are leaves", file=file)
        for level in sorted(self.nodes_by_level):
            print(f"bvh level {level:2d}: {self.nodes_by_level[level]:6d} nodes", file=file)
        for size in sorted(self.leaves_by_size):
            print(f"{size:2d} shapes in {self.leaves_by_size[size]:6d} leaves", file=file)
        if self.leaf_count_ge_max_size > 0:
            print(
                f"{LEAF_MAX_SIZE_FOR_STATS} or more objects in "
                f"{self.leaf_count_ge_max_size:6d} leaves",
                file=file,
            )


class BVH:
    """Built BVH: node list + the triangle permutation it indexes.

    ``order[k]`` is the original triangle index of the k-th triangle in
    BVH order; leaf (start, count) ranges index into this permutation
    (the reference reorders the triangle vector in place instead —
    world.cpp leaves consume the reordered array the same way).
    """

    def __init__(self, nodes: list[BVHNode], root: int, order: np.ndarray, stats: BVHStats):
        self.nodes = nodes
        self.root = root
        self.order = order
        self.stats = stats

    @property
    def node_count(self) -> int:
        return len(self.nodes)


def _surface_area(dim: np.ndarray) -> np.ndarray:
    """2*(xy+xz+yz) (bvh.cpp:101-104); works on (..., 3)."""
    x, y, z = dim[..., 0], dim[..., 1], dim[..., 2]
    return 2.0 * (x * y + x * z + y * z)


def _leaf_cost(count: int, cfg: Config) -> float:
    return cfg.sah_ctrav + cfg.sah_cisec * count  # bvh.cpp:107-110


def make_bvh(
    tri_boxmin: np.ndarray,
    tri_boxmax: np.ndarray,
    barycenters: np.ndarray,
    config: Config | None = None,
    verbose: bool = False,
) -> BVH:
    cfg = config or get_config()
    T = int(barycenters.shape[0])
    order = np.arange(T, dtype=np.int32)
    bmin = np.asarray(tri_boxmin, dtype=np.float32).copy()
    bmax = np.asarray(tri_boxmax, dtype=np.float32).copy()
    bary = np.asarray(barycenters, dtype=np.float32).copy()

    nodes: list[BVHNode] = []
    stats = BVHStats()
    t_start = time.monotonic()
    last_progress = t_start
    shapes_processed = 0

    def make_leaf(start: int, count: int, level: int) -> int:
        nonlocal shapes_processed
        shapes_processed += count
        lo = bmin[start : start + count].min(axis=0) if count else np.full(3, np.finfo(np.float32).max)
        hi = bmax[start : start + count].max(axis=0) if count else np.full(3, -np.finfo(np.float32).max)
        nodes.append(BVHNode(boxmin=lo, boxmax=hi, start=start, count=count))
        stats.leaf_count += 1
        stats.node_count += 1
        stats.nodes_by_level[level] = stats.nodes_by_level.get(level, 0) + 1
        if count >= LEAF_MAX_SIZE_FOR_STATS:
            stats.leaf_count_ge_max_size += 1
        else:
            stats.leaves_by_size[count] = stats.leaves_by_size.get(count, 0) + 1
        return len(nodes) - 1

    def build(start: int, count: int, level: int) -> int:
        nonlocal last_progress
        if verbose:
            now = time.monotonic()
            if now - last_progress > 1.0:  # 1 Hz heartbeat, bvh.cpp:290-298
                print(f"total shapes processed = {shapes_processed}", file=sys.stderr)
                last_progress = now

        if level >= cfg.bvh_max_depth or count <= cfg.bvh_leaf_max:
            return make_leaf(start, count, level)

        sl = slice(start, start + count)
        vertexbox_min = bmin[sl].min(axis=0)
        vertexbox_max = bmax[sl].max(axis=0)
        barybox_min = bary[sl].min(axis=0)
        barybox_max = bary[sl].max(axis=0)
        barydim = np.maximum(0.0, barybox_max - barybox_min)

        # widest barycenter extent picks the single scanned axis (bvh.cpp:318-327)
        if barydim[0] > barydim[1] and barydim[0] > barydim[2]:
            axis = 0
        elif barydim[1] > barydim[2]:
            axis = 1
        else:
            axis = 2

        leaf_cost = _leaf_cost(count, cfg)
        bin_count = min(MAX_BIN_COUNT, count * 2)
        lo = float(vertexbox_min[axis])
        hi = float(vertexbox_max[axis])
        x = bary[sl, axis]

        split_x = None
        if hi > lo:
            bins = np.floor((x - lo) * bin_count / (hi - lo)).astype(np.int64)
            bins = np.clip(bins, 0, bin_count - 1)

            # per-bin triangle AABB union + counts (vectorized bvh.cpp:205-209)
            bin_counts = np.bincount(bins, minlength=bin_count)
            INF = np.float32(np.finfo(np.float32).max)
            bin_min = np.full((bin_count, 3), INF, np.float32)
            bin_max = np.full((bin_count, 3), -INF, np.float32)
            for d in range(3):
                np.minimum.at(bin_min[:, d], bins, bmin[sl, d])
                np.maximum.at(bin_max[:, d], bins, bmax[sl, d])

            # suffix scan: right boxes and right counts (bvh.cpp:213-222)
            right_min = np.minimum.accumulate(bin_min[::-1], axis=0)[::-1]
            right_max = np.maximum.accumulate(bin_max[::-1], axis=0)[::-1]
            right_cnt = np.cumsum(bin_counts[::-1])[::-1]
            # prefix scan: left boxes (bvh.cpp:226-246). leftbox at split i
            # includes bins [0, i)
            left_min = np.minimum.accumulate(bin_min, axis=0)
            left_max = np.maximum.accumulate(bin_max, axis=0)

            area = _surface_area(np.maximum(0.0, vertexbox_max - vertexbox_min))
            best = leaf_cost
            for i in range(1, bin_count):
                rtri = int(right_cnt[i])
                ltri = count - rtri
                if rtri == 0 or ltri == 0:
                    continue
                ldim = np.maximum(0.0, left_max[i - 1] - left_min[i - 1])
                rdim = np.maximum(0.0, right_max[i] - right_min[i])
                cost = cfg.sah_ctrav + cfg.sah_cisec * (
                    _surface_area(ldim) / area * ltri + _surface_area(rdim) / area * rtri
                )
                if cost < best:
                    best = cost
                    split_x = lo + i * (hi - lo) / bin_count  # bvh.cpp:187

        if split_x is None:
            stats.large_leaf_no_split += 1
            if verbose:
                print(
                    f"Large leaf node (no good split) at {level}, {count} triangles",
                    file=sys.stderr,
                )
            return make_leaf(start, count, level)

        # stable partition by barycenter vs. split plane (bvh.cpp:249-286)
        neg_mask = x < split_x
        countA = int(neg_mask.sum())
        countB = count - countA
        if countA == 0 or countB == 0:
            stats.large_leaf_one_side += 1
            if verbose:
                print(
                    f"Large leaf node (all one side) at {level}, {count} triangles",
                    file=sys.stderr,
                )
            return make_leaf(start, count, level)

        perm = np.concatenate([np.nonzero(neg_mask)[0], np.nonzero(~neg_mask)[0]]) + start
        order[sl] = order[perm]
        bmin[sl] = bmin[perm]
        bmax[sl] = bmax[perm]
        bary[sl] = bary[perm]

        neg = build(start, countA, level + 1)
        pos = build(start + countA, countB, level + 1)
        nodes.append(
            BVHNode(
                boxmin=vertexbox_min,
                boxmax=vertexbox_max,
                axis=axis,
                negative=neg,
                positive=pos,
            )
        )
        stats.node_count += 1
        stats.nodes_by_level[level] = stats.nodes_by_level.get(level, 0) + 1
        return len(nodes) - 1

    sys.setrecursionlimit(max(sys.getrecursionlimit(), 10000))
    if T == 0:
        root = make_leaf(0, 0, 0)
    else:
        root = build(0, T, 0)
    return BVH(nodes=nodes, root=root, order=order, stats=stats)
