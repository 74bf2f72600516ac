"""Flatten a built BVH + triangle set into device-ready SoA arrays.

Equivalent of the reference's GPU flattening pipeline
(world.cpp:145-347) with a TPU-first data layout:

* DFS **in-order** node indices: negative subtree, self, positive
  subtree (generate_group_indices, world.cpp:145-177);
* per-node AABBs and leaf (start, count) ranges (store_group_data,
  world.cpp:179-210);
* 8 banks of stackless hit/miss links, one per ray-direction octant,
  precomputed by an explicit-stack DFS where the near child is chosen
  by the sign of dot(octant_dir, split_normal) (create_hitmiss,
  world.cpp:215-278);
* triangle vertices expanded **unindexed** (3 per triangle) in BVH
  order so leaf ranges index them directly (world.cpp:303-317).

Differences from the GL layout (deliberate, TPU-first):
* node indices are int32, not float-encoded texels — the reference's
  24-bit-mantissa terminator hack (raytracer.es.fs:384) is gone; the
  stop sentinel is -1 (clamped to 0 at gather time, masked by the
  done-flag);
* arrays are flat HBM/VMEM-resident tensors, not 2048-wide textures,
  so there is no data_texture_width row padding;
* triangle vertices/normals are packed (T, 9) so one gather fetches a
  whole triangle.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from shader_ray_tpu.models.bvh import BVH

SENTINEL = -1  # traversal stop (reference uses 0x7fffffff, world.cpp:229)
HITMISS_DIRECTIONS = 8


@dataclass
class FlatBVH:
    """Flattened node arrays, indexed by DFS in-order node index."""

    boxmin: np.ndarray       # (N, 3) f32
    boxmax: np.ndarray       # (N, 3) f32
    start: np.ndarray        # (N,) i32 — leaf triangle range start (0 for branch)
    count: np.ndarray        # (N,) i32 — leaf triangle count (0 for branch)
    children: np.ndarray     # (N, 2) i32 — (negative, positive), SENTINEL for leaf
    axis: np.ndarray         # (N,) i32 — split axis, -1 for leaf
    hitmiss: np.ndarray      # (8, N, 2) i32 — per-octant (hit_next, miss_next)
    root: int

    @property
    def node_count(self) -> int:
        return int(self.boxmin.shape[0])


def generate_group_indices(bvh: BVH) -> np.ndarray:
    """Assign DFS in-order indices; returns old->new index map.

    Mirrors world.cpp:145-177: negative subtree numbered first, then
    self, then positive subtree.
    """
    n = bvh.node_count
    new_index = np.full(n, -1, dtype=np.int32)
    counter = 0
    # iterative in-order traversal
    stack: list[tuple[int, bool]] = [(bvh.root, False)]
    while stack:
        node_id, expanded = stack.pop()
        node = bvh.nodes[node_id]
        if node.is_leaf or expanded:
            new_index[node_id] = counter
            node.my_index = counter
            counter += 1
            continue
        # visit negative subtree, then self, then positive subtree
        stack.append((node.positive, False))
        stack.append((node_id, True))
        stack.append((node.negative, False))
    assert counter == n, "index assignment must cover every node (world.cpp:331)"
    return new_index


def create_hitmiss(bvh: BVH, perm: np.ndarray, dircode: int) -> np.ndarray:
    """Build one octant's (hit_next, miss_next) bank.

    ``dircode`` bits: 1 = +x, 2 = +y, 4 = +z (world.cpp:215-217).
    Near child: dot(octant_dir, split_normal) < 0 selects the positive
    child first (world.cpp:263-269) — a ray moving toward -axis enters
    the positive (greater-coordinate) half first.

    Returns (N, 2) int32 in *new* (DFS) node numbering.
    """
    n = bvh.node_count
    out = np.full((n, 2), SENTINEL, dtype=np.int32)
    sign = [
        1.0 if (dircode & 1) else -1.0,
        1.0 if (dircode & 2) else -1.0,
        1.0 if (dircode & 4) else -1.0,
    ]
    stack: list[int] = []
    g: int = bvh.root
    while g != -1:
        miss = stack[-1] if stack else -1
        node = bvh.nodes[g]
        gi = int(perm[g])
        if node.is_leaf:
            out[gi, 0] = perm[miss] if miss != -1 else SENTINEL
            out[gi, 1] = out[gi, 0]
            g = stack.pop() if stack else -1
        else:
            if sign[node.axis] < 0:
                near, far = node.positive, node.negative
            else:
                near, far = node.negative, node.positive
            out[gi, 0] = perm[near]
            out[gi, 1] = perm[miss] if miss != -1 else SENTINEL
            assert len(stack) < 64, "hitmiss stack overflow (world.cpp:273)"
            stack.append(far)
            g = near
    return out


def flatten_bvh(bvh: BVH) -> FlatBVH:
    n = bvh.node_count
    perm = generate_group_indices(bvh)

    boxmin = np.zeros((n, 3), np.float32)
    boxmax = np.zeros((n, 3), np.float32)
    start = np.zeros(n, np.int32)
    count = np.zeros(n, np.int32)
    children = np.full((n, 2), SENTINEL, np.int32)
    axis = np.full(n, -1, np.int32)

    for old_id, node in enumerate(bvh.nodes):
        i = int(perm[old_id])
        boxmin[i] = node.boxmin
        boxmax[i] = node.boxmax
        if node.is_leaf:
            start[i] = node.start
            count[i] = node.count
        else:
            children[i, 0] = perm[node.negative]
            children[i, 1] = perm[node.positive]
            axis[i] = node.axis

    hitmiss = np.stack(
        [create_hitmiss(bvh, perm, d) for d in range(HITMISS_DIRECTIONS)], axis=0
    )

    return FlatBVH(
        boxmin=boxmin,
        boxmax=boxmax,
        start=start,
        count=count,
        children=children,
        axis=axis,
        hitmiss=hitmiss,
        root=int(perm[bvh.root]),
    )
