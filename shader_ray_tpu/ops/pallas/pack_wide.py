"""Host-side 8-wide BVH packing for the wide packet kernel.

The round-1 binary walk was serial-step-bound: each step fetched ONE
node and retired at most one box test per dependency chain.  The wide
engine collapses the binary SAH tree (reference bvh.cpp:288-358) into
8-wide nodes at pack time, so one short-stack step slab-tests all 8
children of a node against the whole ray packet and produces the
8-bit hit mask with a single scalar sync (kernel_wide.py).  Steps per
walk drop ~5x vs the binary hitmiss walk.

Table layout (v2 — everything node-sized in SMEM, measured faster
than VMEM blocks + cross-lane broadcasts on this hardware):

  boxes_smem ((Nw*8)*3,) i32  per (node, child, axis): qmin<<16|qmax,
                              16-bit fixed point over the root box
                              (conservative: min down, max up — never
                              misses, only admits spurious tests)
  cmeta_smem (Nw*8,) i32      per child: count<<26 | leaf_row for leaf
                              children (count>0), wide node index for
                              internal children, -1 for empty slots
  order_smem (Nw*8,) i32      per (node, octant): 8x3-bit permutation
                              of children, near-to-far along the
                              octant direction (replaces the binary
                              engine's per-octant hit/miss link banks,
                              reference world.cpp:215-278)
  masks_smem (Nw,) i32        bits 0-7: child k is populated; bits
                              8-15: child k is a leaf; bits 16-23:
                              child k is a LARGE leaf (count >
                              SMALL_LEAF_MAX — the kernel runs a
                              longer static slot unroll for these)
                              (child space — the kernel permutes
                              through the octant order at run time)
  leaves / tribase_smem       shared with the binary engine (pack.py)

Node-count limits: wide node indices must fit 26 bits (vs the binary
engine's 32768-node SMEM link cap) — collapse divides node count by
~5-7, and SMEM cost is 56 B/node, so multi-million-triangle scenes
index fine; the practical bound is VMEM capacity for the leaf table.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from shader_ray_tpu.models.world import SceneData
from shader_ray_tpu.ops.pallas.pack import (
    LEAF_SLOTS,
    QBITS,
    pack_env_atlas,
    pack_leaf_groups,
    _resize_env,
)

WIDE = 8          # children per wide node
TINY_LEAF_MAX = 4   # leaf size classes: the per-step leaf bit-scan
SMALL_LEAF_MAX = 7  # splits into tiny (<= TINY), small (<= SMALL) and
                    # large statically-unrolled loops (kernel_wide;
                    # mask bit groups 24-31 / 16-23 mark > tiny/small)


@jax.tree_util.register_pytree_node_class
class PackedSceneWide:
    """Device tables for the wide packet kernel (jit-arg pytree with
    static int metadata, like PackedScene — axon requires Pallas
    operands threaded as traced arguments)."""

    def __init__(self, leaves, boxes_smem, cmeta_smem, order_smem,
                 masks_smem, tribase_smem, nodes_vmem, env, env_atlas,
                 env_planes,
                 n_wide: int, leaf_count: int, tri_count: int,
                 node_count: int, stack_depth: int, box_quant: tuple,
                 env_atlas_base: tuple = (512, 1024), max_count: int = 10,
                 node_src: str = "smem", isect: str = "mt",
                 leaf_src: str = "vmem"):
        self.leaves = leaves              # (groups*16, 126) f32 VMEM
        self.boxes_smem = boxes_smem      # ((Nw*8)*3,) i32
        self.cmeta_smem = cmeta_smem      # (Nw*8,) i32
        self.order_smem = order_smem      # (Nw*8,) i32
        self.masks_smem = masks_smem      # (Nw,) i32
        self.tribase_smem = tribase_smem  # (L,) i32
        # large-scene tier: one 128-lane i32 row per node in VMEM
        # (lanes 0-23 boxes, 24-31 cmeta, 32-39 order, 40 masks),
        # DMA'd to SMEM scratch per step; dummy (8, 128) when unused
        self.nodes_vmem = nodes_vmem
        self.env = env                    # (He, We, 3) f32
        self.env_atlas = env_atlas        # (2*H0-1, W0*3) f32 mip atlas
        self.env_atlas_base = tuple(int(x) for x in env_atlas_base)
        self.n_wide = int(n_wide)
        self.leaf_count = int(leaf_count)
        self.tri_count = int(tri_count)
        self.node_count = int(node_count)  # binary node count (stats)
        self.stack_depth = int(stack_depth)
        # static dequant affine: (ox, oy, oz, sx, sy, sz)
        self.box_quant = tuple(float(v) for v in box_quant)
        # largest actual leaf count: the kernel's static slot-unroll
        # bound (smaller BVH_LEAF_MAX -> shorter leaf tests)
        self.max_count = int(max_count)
        self.node_src = str(node_src)  # "smem" | "vmem"
        self.isect = str(isect)        # leaf record format (pack.leaf_layout)
        # MILLION-triangle tier: "hbm" leaves the leaf table in device
        # memory (pl.ANY) and the kernel's double-buffered group DMA
        # (leaf_mode=dma2, the only compatible mode — scalar/dmastatic
        # read leaves as vectors) pulls 16-row groups on demand — the
        # scene size bound becomes HBM, not the 128 MB VMEM
        self.leaf_src = str(leaf_src)  # "vmem" | "hbm"
        # full-res windowed env plane pyramid (envwin.EnvPlanes) or
        # None for the dense-only path
        self.env_planes = env_planes

    def tree_flatten(self):
        leaves = (self.leaves, self.boxes_smem, self.cmeta_smem,
                  self.order_smem, self.masks_smem, self.tribase_smem,
                  self.nodes_vmem, self.env, self.env_atlas,
                  self.env_planes)
        aux = (self.n_wide, self.leaf_count, self.tri_count,
               self.node_count, self.stack_depth, self.box_quant,
               self.env_atlas_base, self.max_count, self.node_src,
               self.isect, self.leaf_src)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @property
    def vmem_bytes(self) -> int:
        return 4 * self.leaves.shape[0] * 128


def _collapse_sah(data: SceneData, c_node: float = 1.0,
                  c_leaf_fixed: float = 0.8, c_slot: float = 0.45):
    """SAH-aware 8-wide collapse (dynamic program over the binary tree,
    after Ylitie et al. 2017's wide-BVH construction): for every binary
    node n and root budget i, C(n, i) = min cost of representing
    subtree(n) as a forest of <= i wide-node child slots, where cutting
    an internal node costs area(n) * c_node (a future stack pop + 8
    slab tests) and a leaf child costs
    area(n) * (c_leaf_fixed + c_slot * unroll(count)) — unroll() is the
    kernel's leaf-class static unroll length (4/7/max), the cost the
    walker actually pays per visit, not the raw triangle count.

    Replaces the round-2 greedy largest-area frontier cut (kept as
    ``_collapse_greedy`` for A/B): the DP trades shallow cuts against
    leaf-visit cost globally instead of myopically, cutting expected
    visited leaves per walk (VERDICT r1 next-round item #2).

    Returns the same (wide_children, wid_of_binary, depth_of, is_leaf)
    contract as the greedy collapse."""
    children = data.node_children
    assert children is not None, (
        "wide packing needs SceneData.node_children (rebuild the scene "
        "or refresh a v1 scene cache)"
    )
    count = data.node_objects[:, 1]
    bmin = data.node_boxes[:, 0:3].astype(np.float64)
    bmax = data.node_boxes[:, 3:6].astype(np.float64)
    ext = np.maximum(bmax - bmin, 0.0)
    area = ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2] + ext[:, 2] * ext[:, 0]
    root = int(data.tree_root)
    if area[root] > 0:
        area = area / area[root]  # normalize (cost scale only)
    is_leaf = count > 0

    def unroll(c: int) -> int:
        if c <= TINY_LEAF_MAX:
            return TINY_LEAF_MAX
        if c <= SMALL_LEAF_MAX:
            return SMALL_LEAF_MAX
        return max(int(count.max()), SMALL_LEAF_MAX + 1)

    n = data.group_count
    INF = float("inf")
    # C[b, i-1] = best cost of subtree(b) as a forest of <= i roots;
    # K[b, i-1] = argmin: 0 => keep b as ONE root (leaf child or wide
    # node cut), k>0 => split budget (k to left, i-k to right)
    C = np.full((n, WIDE), INF)
    K = np.zeros((n, WIDE), np.int16)

    # iterative post-order (children before parents)
    order: list[int] = []
    stack = [root]
    seen = np.zeros(n, bool)
    while stack:
        b = stack.pop()
        if seen[b]:
            continue
        seen[b] = True
        order.append(b)
        if not is_leaf[b] and children[b, 0] >= 0:
            stack.append(int(children[b, 0]))
            stack.append(int(children[b, 1]))
    for b in reversed(order):
        if is_leaf[b] or children[b, 0] < 0:
            C[b, :] = area[b] * (c_leaf_fixed + c_slot * unroll(int(count[b])))
            continue
        l, r = int(children[b, 0]), int(children[b, 1])
        # D(b, i): distribute i slots over the two subtrees
        dist = np.full(WIDE + 1, INF)
        dargk = np.zeros(WIDE + 1, np.int16)
        for i in range(2, WIDE + 1):
            for k in range(1, i):
                c = C[l, k - 1] + C[r, i - k - 1]
                if c < dist[i]:
                    dist[i] = c
                    dargk[i] = k
        # one root: cut here — a wide node whose 8 slots hold the
        # optimally distributed forest of the two subtrees
        c_cut = area[b] * c_node + dist[WIDE]
        C[b, 0] = c_cut
        K[b, 0] = 0
        for i in range(2, WIDE + 1):
            if dist[i] < c_cut:
                C[b, i - 1] = dist[i]
                K[b, i - 1] = dargk[i]
            else:
                C[b, i - 1] = c_cut
                K[b, i - 1] = 0

    def forest(b: int, i: int) -> list[int]:
        """The binary roots of C(b, i)'s optimal forest."""
        if is_leaf[b] or children[b, 0] < 0:
            return [int(b)]
        k = int(K[b, i - 1])
        if k == 0:
            return [int(b)]
        return forest(int(children[b, 0]), k) + forest(
            int(children[b, 1]), i - k
        )

    def node_children_of(b: int) -> list[int]:
        """Child slots of the wide node cut at internal binary node b."""
        if is_leaf[b]:
            return [int(b)]
        if children[b, 0] < 0:
            return []
        l, r = int(children[b, 0]), int(children[b, 1])
        # re-derive the distribution argmin used by C(b, 1)
        best, bestk = INF, 1
        for k in range(1, WIDE):
            c = C[l, k - 1] + C[r, WIDE - k - 1]
            if c < best:
                best, bestk = c, k
        return forest(l, bestk) + forest(r, WIDE - bestk)

    from collections import deque

    queue = deque([(root, 0)])
    wid_of_binary = {root: 0}
    next_id = 1
    wide_children: list[list[int]] = []
    depth_of: list[int] = []
    while queue:
        b, d = queue.popleft()
        fr = node_children_of(b)
        wide_children.append(fr)
        depth_of.append(d)
        for f in fr:
            if not is_leaf[f]:
                wid_of_binary[f] = next_id
                next_id += 1
                queue.append((f, d + 1))
    return wide_children, wid_of_binary, depth_of, is_leaf


def _collapse_greedy(data: SceneData):
    """Collapse the binary tree into wide nodes: repeatedly expand the
    largest-area internal frontier member until 8 children (the
    BVH8-style greedy cut).  Returns (wide_children, wid_of_binary,
    depth_of, is_leaf): wide_children[w] = list of binary node ids."""
    children = data.node_children
    assert children is not None, (
        "wide packing needs SceneData.node_children (rebuild the scene "
        "or refresh a v1 scene cache)"
    )
    count = data.node_objects[:, 1]
    bmin = data.node_boxes[:, 0:3].astype(np.float64)
    bmax = data.node_boxes[:, 3:6].astype(np.float64)
    ext = np.maximum(bmax - bmin, 0.0)
    area = ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2] + ext[:, 2] * ext[:, 0]
    is_leaf = count > 0

    def frontier(b: int) -> list[int]:
        if is_leaf[b]:
            return [int(b)]
        if children[b, 0] < 0:  # empty scene: branch root with no kids
            return []
        fr = [int(children[b, 0]), int(children[b, 1])]
        while len(fr) < WIDE:
            best, best_a = -1, -1.0
            for i, f in enumerate(fr):
                if not is_leaf[f] and area[f] > best_a:
                    best, best_a = i, float(area[f])
            if best < 0:
                break
            f = fr.pop(best)
            fr.extend([int(children[f, 0]), int(children[f, 1])])
        return fr

    # BFS with FIFO id assignment: a node's wide id is its enqueue
    # rank, which equals its dequeue rank, so wide_children[i] is the
    # frontier of wide node i and parents precede children (root = 0)
    from collections import deque

    root = int(data.tree_root)
    queue = deque([(root, 0)])
    wid_of_binary = {root: 0}
    next_id = 1
    wide_children: list[list[int]] = []
    depth_of: list[int] = []
    while queue:
        b, d = queue.popleft()
        fr = frontier(b)
        wide_children.append(fr)
        depth_of.append(d)
        for f in fr:
            if not is_leaf[f]:
                wid_of_binary[f] = next_id
                next_id += 1
                queue.append((f, d + 1))
    return wide_children, wid_of_binary, depth_of, is_leaf


def pack_scene_wide(
    data: SceneData,
    env: np.ndarray,
    max_leaf_tests: int = LEAF_SLOTS,
    env_size: tuple[int, int] = (256, 512),
    env_atlas_base: tuple[int, int] = (512, 1024),
    node_src: str | None = None,
    collapse: str | None = None,
    isect: str | None = None,
    env_mode: str | None = None,
    env_base: int | None = None,
    leaf_src: str | None = None,
) -> PackedSceneWide:
    """Build wide packet tables from flattened SceneData (host).

    ``node_src``: "smem" keeps the per-node tables in scalar memory
    (fastest; fits ~5-6k wide nodes ~= 300k triangles in the 1 MB SMEM
    budget), "vmem" packs them one 128-lane row per node in VMEM and
    the kernel DMAs 8-node groups to SMEM scratch per step (slightly
    slower steps, scene size bounded by VMEM instead).  None picks
    automatically by the SMEM estimate.

    ``collapse``: "sah" (default) = SAH-aware DP collapse; "greedy" =
    the round-2 largest-area frontier cut (A/B baseline)."""
    # fallbacks route through the VALIDATED Config (which itself parses
    # SRT_COLLAPSE/SRT_ISECT/SRT_ENV_MODE/SRT_ENV_BASE from env), not
    # raw os.environ — so custom-config Renderers and use_config scopes
    # see one source of truth (ADVICE r2)
    if None in (collapse, isect, env_mode, env_base):
        from shader_ray_tpu.config import get_config

        cfg = get_config()
        collapse = collapse if collapse is not None else cfg.collapse
        isect = isect if isect is not None else cfg.leaf_isect
        env_mode = env_mode if env_mode is not None else cfg.env_mode
        env_base = env_base if env_base is not None else cfg.env_base
    assert collapse in ("sah", "greedy"), collapse
    assert isect in ("mt", "woop"), isect
    assert env_mode in ("window", "dense"), env_mode
    leaves, tribase, leaf_row_of, counts, L = pack_leaf_groups(
        data, max_leaf_tests, isect=isect
    )
    _collapse = _collapse_sah if collapse == "sah" else _collapse_greedy
    wide_children, wid_of_binary, depth_of, is_leaf = _collapse(data)
    Nw = len(wide_children)
    assert Nw < (1 << 26), "wide node index must fit 26 bits"

    bmin = data.node_boxes[:, 0:3].astype(np.float64)
    bmax = data.node_boxes[:, 3:6].astype(np.float64)

    # conservative 16-bit fixed-point quantization over the root box
    # (same scheme as the binary engine, pack.py)
    if data.group_count > 0 and data.triangle_count > 0:
        off = bmin[data.tree_root].copy()
        ext = bmax[data.tree_root] - off
    else:
        off = np.zeros(3)
        ext = np.ones(3)
    scale = np.maximum(ext, 1e-30) / ((1 << QBITS) - 1)

    boxes = np.zeros((Nw * WIDE, 3), np.int64)
    cmeta = np.full(Nw * WIDE, -1, np.int64)
    masks = np.zeros(Nw, np.int64)
    centers = np.full((Nw, WIDE, 3), np.inf)
    for w, fr in enumerate(wide_children):
        for k, b in enumerate(fr):
            qmin = np.clip(np.floor((bmin[b] - off) / scale), 0, 65535)
            qmax = np.clip(np.ceil((bmax[b] - off) / scale), 0, 65535)
            boxes[w * WIDE + k] = (
                qmin.astype(np.int64) << 16
            ) | qmax.astype(np.int64)
            centers[w, k] = 0.5 * (bmin[b] + bmax[b])
            masks[w] |= 1 << k
            if is_leaf[b]:
                cmeta[w * WIDE + k] = (
                    (int(counts[b]) << 26) | int(leaf_row_of[b])
                )
                masks[w] |= 1 << (8 + k)
                if int(counts[b]) > SMALL_LEAF_MAX:
                    masks[w] |= 1 << (16 + k)
                if int(counts[b]) > TINY_LEAF_MAX:
                    masks[w] |= 1 << (24 + k)
            else:
                cmeta[w * WIDE + k] = wid_of_binary[b]

    # per-octant near-to-far child order: sort by box center projected
    # on the octant direction (octant bit set = D positive on that
    # axis, so near = smaller coordinate)
    odirs = np.array(
        [[1.0 if (o >> a) & 1 else -1.0 for a in range(3)] for o in range(8)]
    )  # (8, 3)
    filled = np.isfinite(centers[:, :, 0])  # (Nw, 8)
    keys = np.einsum("oa,wka->owk", odirs, np.where(filled[..., None], centers, 0.0))
    keys = np.where(filled[None, :, :], keys, np.inf)  # empties sort last
    order = np.argsort(keys, axis=2, kind="stable")  # (o, Nw, 8) near first
    packed_order = np.zeros((Nw, 8), np.int64)
    for p in range(WIDE):
        packed_order |= order[:, :, p].T << (3 * p)

    # stack bound: each pop pushes <= 7 net new entries per level
    stack_depth = (WIDE - 1) * (max(depth_of) + 1) + 8

    He, We = env_size
    env_small = _resize_env(np.asarray(env, np.float32), He, We)

    if node_src is None:
        # SMEM budget is 1.00 MB; leave headroom for tribase + stacks
        smem_bytes = 4 * (Nw * (24 + 8 + 8 + 1) + L)
        node_src = "smem" if smem_bytes < 800_000 else "vmem"
    assert node_src in ("smem", "vmem"), node_src
    if leaf_src is None:
        leaf_src = os.environ.get("SRT_LEAF_SRC", "")
    if not leaf_src:
        # VMEM-resident leaves (lanes padded to 128) must share the
        # 128 MB VMEM with node rows, ray tiles, and env windows;
        # past ~64 MB the table moves to HBM and the dma2 group
        # double-buffer hides the longer copy latency
        leaf_src = "vmem" if 4 * 128 * leaves.shape[0] < (64 << 20) \
            else "hbm"
    assert leaf_src in ("vmem", "hbm"), leaf_src
    if leaf_src == "hbm":
        # hit-id tracking on the hbm tier reads the tribase back from
        # the leaf group's spare f32 lane (pack.TB_LANE) — exact only
        # below the f32 integer range
        assert data.triangle_count < (1 << 24), (
            "hbm leaf tier tracks hit ids via an f32 lane; "
            f"{data.triangle_count} triangles exceeds the exact 2^24 "
            "range (use leaf_src='vmem' or shrink the scene)"
        )

    to_u32 = lambda a: a.astype(np.uint32).view(np.int32)
    as_i32 = lambda a: jnp.asarray(
        np.ascontiguousarray(to_u32(a).reshape(-1))
    )
    if node_src == "vmem":
        rows = -(-Nw // 8) * 8
        nodes = np.zeros((rows, 128), np.int32)
        nodes[:Nw, 0:24] = to_u32(boxes).reshape(Nw, 24)
        nodes[:Nw, 24:32] = to_u32(cmeta).reshape(Nw, 8)
        nodes[:Nw, 32:40] = to_u32(packed_order).reshape(Nw, 8)
        nodes[:Nw, 40] = to_u32(masks)
        nodes_vmem = jnp.asarray(nodes)
        dummy = jnp.zeros((1,), jnp.int32)
        boxes_j, cmeta_j, order_j, masks_j = dummy, dummy, dummy, dummy
    else:
        nodes_vmem = jnp.zeros((8, 128), jnp.int32)
        boxes_j = as_i32(boxes)
        cmeta_j = as_i32(cmeta)
        order_j = as_i32(packed_order)
        masks_j = as_i32(masks)

    env_planes = None
    if env_mode == "window":
        from shader_ray_tpu.ops.pallas.envwin import MIN_H, pack_env_planes

        # full parity never needs more rows than the source has: cap
        # the plane base at the source height (rounded up to pow2) so
        # tiny test envs stay tiny
        src_h = max(int(np.asarray(env).shape[0]), MIN_H)
        base_h = min(env_base, 1 << (src_h - 1).bit_length())
        env_planes = pack_env_planes(env, base=(base_h, 2 * base_h))

    return PackedSceneWide(
        leaves=jnp.asarray(leaves),
        boxes_smem=boxes_j,
        cmeta_smem=cmeta_j,
        order_smem=order_j,
        masks_smem=masks_j,
        tribase_smem=jnp.asarray(tribase),
        nodes_vmem=nodes_vmem,
        env=jnp.asarray(env_small),
        env_atlas=jnp.asarray(pack_env_atlas(env, env_atlas_base)),
        n_wide=Nw,
        leaf_count=L,
        tri_count=int(data.triangle_count),
        node_count=int(data.group_count),
        stack_depth=int(stack_depth),
        box_quant=(off[0], off[1], off[2], scale[0], scale[1], scale[2]),
        env_atlas_base=env_atlas_base,
        max_count=int(max(1, counts.max())) if counts.size else 1,
        node_src=node_src,
        isect=isect,
        env_planes=env_planes,
        leaf_src=leaf_src,
    )
