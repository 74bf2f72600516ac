"""Host-side scene packing for the packet kernel.

Layout principle: every fetch in the kernel is a *scalar-indexed
sublane slice* (the one fast dynamic access Mosaic gives us), so each
BVH node and each leaf is one table ROW.

VMEM lays arrays out in (8, 128) tiles, so a row narrower than 128
lanes is silently padded 128-wide — a naive 1-node-per-32-lane table
would inflate 4x and blow VMEM at bunny scale.  Layout v2 therefore
packs FOUR nodes per 128-lane row; the kernel selects the 32-lane
group by ``node & 3`` with a static-slice switch.

Node group lanes (within the node's 32-lane slot; integers are i32
bit patterns stored in the f32 table — the kernel bitcasts the row):
  0-2   boxmin xyz
  3-5   boxmax xyz
  6-21  hit/miss links for the 8 ray octants: lane 6+2*o = hit link,
        7+2*o = miss link (node row index; -1 = terminate)
  22    leaf row index into the leaf tables (-1 = branch)
  23    leaf triangle count, capped at max_leaf_tests (the reference
        also tests at most the first 10 triangles of a leaf,
        raytracer.es.fs:382,410-424)
  24    first-triangle index in BVH order (for hit ids)

Leaf layout (v3, slot-parallel): the kernel tests a leaf's <= 10
triangles as ONE (10, rays) vector op, so triangle slots live on
SUBLANES.  A leaf group is 16 consecutive rows (10 used; 16 keeps the
dynamic row-slice start provably 8-aligned) x a 18-lane record, with
LEAVES_PER_GROUP = 7 leaves packed across the 126 used lanes (the
kernel switches on ``leaf % 7`` with static lane slices).  Record
lanes for slot row k:
  0-8    v0.xyz v1.xyz v2.xyz of triangle k (f32)
  9-17   n0.xyz n1.xyz n2.xyz of triangle k (f32)

Unused slots hold degenerate (all-zero) triangles which the
Moller-Trumbore determinant test rejects, and are additionally masked
by the count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from shader_ray_tpu.models.world import SceneData

LANES = 128
LEAF_SLOTS = 10
NODE_LANES = 32       # lanes per node group
NODES_PER_ROW = 4     # groups per 128-lane row
LEAF_RECORD = 18      # lanes per leaf record (9 pos + 9 nrm)
LEAVES_PER_GROUP = 7  # leaf records across 126 of 128 lanes
GROUP_ROWS = 16       # rows per leaf group (10 slots used, 8-aligned)

# node-row lane indices
L_BOXMIN = 0
L_BOXMAX = 3
L_LINKS = 6
L_LEAF_ROW = 22
L_LEAF_COUNT = 23
L_TRI_BASE = 24


@jax.tree_util.register_pytree_node_class
class PackedScene:
    """Device tables for the packet kernel + env data for the MXU
    sampler.  ``nodes_f32``/``nodes_i32`` are two dtype views of the
    same logical table (separate arrays — VMEM is cheap to duplicate
    for N rows x 32 lanes).

    Registered as a pytree with the int metadata STATIC so a
    PackedScene can be a jit argument: the axon runtime hangs for
    minutes compiling programs whose Pallas operands are captured as
    closure constants, but compiles the same program in ~1 s when
    they are traced arguments.
    """

    def __init__(self, nodes, leaves, links_smem, meta_smem, env,
                 root: int, node_count: int, leaf_count: int, tri_count: int,
                 smem_ok: bool):
        self.nodes = nodes           # (ceil(N/4), 128) f32, int lanes bit-packed
        self.leaves = leaves         # (groups*GROUP_ROWS, 126) f32
        # scalar-memory fast path (smem_ok): per-node links and leaf
        # metadata as SMEM tables so the walk's serial chain uses true
        # scalar loads instead of vector-reduce extractions.
        # 1-D layouts: 2-D SMEM windows get lane-padded to 128 (16x blowup)
        self.links_smem = links_smem  # (N*8,) i32: hit<<16 | miss&0xffff, idx g*8+octant
        self.meta_smem = meta_smem    # (N*2,) i32: [leaf_row, count<<24 | tri_base]
        self.env = env               # (He, We, 3) f32 — MXU sampling res
        self.root = int(root)
        self.node_count = int(node_count)
        self.leaf_count = int(leaf_count)
        self.tri_count = int(tri_count)
        self.smem_ok = bool(smem_ok)

    def tree_flatten(self):
        leaves = (self.nodes, self.leaves, self.links_smem, self.meta_smem, self.env)
        aux = (self.root, self.node_count, self.leaf_count, self.tri_count,
               self.smem_ok)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @property
    def vmem_bytes(self) -> int:
        node_rows = -(-self.node_count // NODES_PER_ROW)
        return (node_rows + self.leaves.shape[0]) * LANES * 4


def pack_scene(
    data: SceneData,
    env: np.ndarray,
    max_leaf_tests: int = LEAF_SLOTS,
    env_size: tuple[int, int] = (256, 512),
) -> PackedScene:
    """Build packet tables from flattened SceneData (host, numpy)."""
    n = data.group_count
    is_leaf = data.node_objects[:, 1] > 0
    leaf_ids = np.nonzero(is_leaf)[0]
    L = max(1, len(leaf_ids))
    leaf_row_of = np.full(n, -1, np.int32)
    leaf_row_of[leaf_ids] = np.arange(len(leaf_ids), dtype=np.int32)

    nodes_f = np.zeros((n, NODE_LANES), np.float32)
    nodes_i = np.zeros((n, NODE_LANES), np.int32)
    nodes_f[:, L_BOXMIN : L_BOXMIN + 3] = data.node_boxes[:, 0:3]
    nodes_f[:, L_BOXMAX : L_BOXMAX + 3] = data.node_boxes[:, 3:6]
    # hitmiss (8, N, 2) -> interleaved hit/miss per octant
    hm = data.hitmiss  # (8, N, 2)
    for o in range(8):
        nodes_i[:, L_LINKS + 2 * o] = hm[o, :, 0]
        nodes_i[:, L_LINKS + 2 * o + 1] = hm[o, :, 1]
    counts = np.minimum(data.node_objects[:, 1], max_leaf_tests).astype(np.int32)
    nodes_i[:, L_LEAF_ROW] = leaf_row_of
    nodes_i[:, L_LEAF_COUNT] = np.where(is_leaf, counts, 0)
    nodes_i[:, L_TRI_BASE] = data.node_objects[:, 0]

    # merge integer lanes as bit patterns into the f32 container, then
    # pack NODES_PER_ROW node groups per 128-lane row
    merged = nodes_f.copy()
    int_lanes = slice(L_LINKS, L_TRI_BASE + 1)
    merged[:, int_lanes] = nodes_i[:, int_lanes].view(np.float32)
    rows = -(-n // NODES_PER_ROW)
    node_rows = np.zeros((rows, NODES_PER_ROW * NODE_LANES), np.float32)
    node_rows.reshape(-1, NODE_LANES)[:n] = merged

    # leaf groups: slot-major rows, LEAVES_PER_GROUP leaves across lanes
    groups = -(-L // LEAVES_PER_GROUP)
    leaves = np.zeros(
        (groups * GROUP_ROWS, LEAVES_PER_GROUP * LEAF_RECORD), np.float32
    )
    for row, g in enumerate(leaf_ids):
        start = int(data.node_objects[g, 0])
        cnt = int(counts[g])
        grp, sub = divmod(row, LEAVES_PER_GROUP)
        r0 = grp * GROUP_ROWS
        c0 = sub * LEAF_RECORD
        leaves[r0 : r0 + cnt, c0 : c0 + 9] = data.tri_positions[start : start + cnt]
        leaves[r0 : r0 + cnt, c0 + 9 : c0 + 18] = data.tri_normals[start : start + cnt]

    He, We = env_size
    env_small = _resize_env(np.asarray(env, np.float32), He, We)

    # SMEM fast-path tables (16-bit links need node ids < 32768;
    # tri_base must fit 24 bits)
    smem_ok = n < 32768 and int(data.node_objects[:, 0].max(initial=0)) < (1 << 24)
    links = np.where(hm < 0, 0xFFFF, hm).astype(np.int64)  # (8, N, 2)
    links_packed = ((links[:, :, 0] << 16) | links[:, :, 1]).astype(np.uint32)
    links_smem = np.ascontiguousarray(links_packed.T).view(np.int32).reshape(-1)
    meta_smem = np.zeros((n, 2), np.int32)
    meta_smem[:, 0] = leaf_row_of
    meta_smem[:, 1] = (
        (nodes_i[:, L_LEAF_COUNT].astype(np.int64) << 24)
        | nodes_i[:, L_TRI_BASE].astype(np.int64)
    ).astype(np.uint32).view(np.int32)
    meta_smem = meta_smem.reshape(-1)

    return PackedScene(
        nodes=jnp.asarray(node_rows),
        leaves=jnp.asarray(leaves),
        links_smem=jnp.asarray(np.ascontiguousarray(links_smem)),
        meta_smem=jnp.asarray(meta_smem),
        env=jnp.asarray(env_small),
        root=int(data.tree_root),
        node_count=n,
        leaf_count=L,
        tri_count=int(data.triangle_count),
        smem_ok=smem_ok,
    )


def _resize_env(img: np.ndarray, H: int, W: int) -> np.ndarray:
    """Box-ish resample of the lat-long env to the MXU sampling
    resolution (area-average when downsampling, bilinear-ish repeat
    when upsampling)."""
    h0, w0 = img.shape[:2]
    if h0 == H and w0 == W:
        return img
    # integer-factor average when possible, else index-sample
    if h0 % H == 0 and w0 % W == 0:
        fh, fw = h0 // H, w0 // W
        return img.reshape(H, fh, W, fw, 3).mean(axis=(1, 3)).astype(np.float32)
    yi = np.clip((np.arange(H) + 0.5) * h0 / H, 0, h0 - 1).astype(np.int64)
    xi = np.clip((np.arange(W) + 0.5) * w0 / W, 0, w0 - 1).astype(np.int64)
    return np.ascontiguousarray(img[yi][:, xi], dtype=np.float32)
