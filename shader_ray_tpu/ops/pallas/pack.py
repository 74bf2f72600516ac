"""Host-side scene packing for the packet kernel.

Layout principle: every fetch in the kernel is a *scalar-indexed
sublane slice* (the one fast dynamic access Mosaic gives us), so each
BVH node and each leaf is one table ROW.

Node data lives entirely in SCALAR memory (v4): the walk's serial
chain (fetch -> slab -> anyhit -> link) then runs on the scalar unit
with no vector-register roundtrips.  SMEM is ~1 MB, so everything is
bit-packed into flat i32 tables (2-D SMEM windows lane-pad to 128):

  links_smem  (N*8,)  hit<<16 | miss&0xffff per (node, octant);
                      0xffff encodes the -1 terminate sentinel
                      (reference world.cpp:229's 0x7fffffff analog)
  boxes_smem  (N*3,)  per-axis qmin<<16 | qmax, 16-bit fixed point
                      over the scene box (CONSERVATIVE: min rounded
                      down, max up — never misses an intersection,
                      only admits spurious candidate tests)
  meta_smem   (N,)    count<<26 | leaf_row (count 0 = branch node;
                      count capped at max_leaf_tests, matching the
                      reference's 10-triangle leaf budget,
                      raytracer.es.fs:382,410-424)
  tribase_smem(L,)    first BVH-order triangle index per leaf

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
TB_LANE = 126  # spare lane carrying the leaf's tribase as f32 (exact
               # below 2^24 triangles) — the HBM leaf tier's hit-id
               # source (see pack_leaf_groups)
LEAF_SLOTS = 10
LEAF_RECORD = 18      # lanes per "mt" leaf record (9 pos + 9 nrm)
LEAVES_PER_GROUP = 7  # "mt" leaf records across 126 of 128 lanes
GROUP_ROWS = 16       # rows per leaf group (10 slots used, 8-aligned)
QBITS = 16            # fixed-point bits per box coordinate

# "woop" record: precomputed world->unit-triangle affine (Woop-style;
# VERDICT r1 next-round item #1).  21 lanes per slot row k:
#   0-2   N = (v1-v0) x (v2-v0)   (UNSCALED: N.D == -det_MT, so the
#   3     t2n = -N.v0              eps accept test matches M-T exactly)
#   4-6   r0 = (E2 x N) / |N|^2   (u row of the inverse basis)
#   7     t0 = -r0.v0
#   8-10  r1 = (N x E1) / |N|^2   (v row)
#   11    t1 = -r1.v0
#   12-20 n0.xyz (n1-n0).xyz (n2-n0).xyz  (normal deltas prefolded)
# Per slot: t/u/v are each one affine dot (2 dots + 1 FMA each) vs
# M-T's two cross products — ~17 fewer vector ops, at 21 vs 18 lanes.
WOOP_LEAF_RECORD = 21
WOOP_LEAVES_PER_GROUP = 6  # 6 * 21 = 126 of 128 lanes


def leaf_layout(isect: str) -> tuple[int, int]:
    """(record lanes, leaves per group) for a leaf-intersector format."""
    if isect == "woop":
        return WOOP_LEAF_RECORD, WOOP_LEAVES_PER_GROUP
    assert isect == "mt", isect
    return LEAF_RECORD, LEAVES_PER_GROUP


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

    def __init__(self, leaves, links_smem, boxes_smem, meta_smem,
                 tribase_smem, env, env_atlas,
                 root: int, node_count: int, leaf_count: int, tri_count: int,
                 box_quant: tuple, smem_ok: bool, env_atlas_base: tuple):
        self.leaves = leaves          # (groups*GROUP_ROWS, 126) f32 VMEM
        self.links_smem = links_smem  # (N*8,) i32, idx g*8+octant
        self.boxes_smem = boxes_smem  # (N*3,) i32 qmin<<16 | qmax per axis
        self.meta_smem = meta_smem    # (N,) i32 count<<26 | leaf_row
        self.tribase_smem = tribase_smem  # (L,) i32
        self.env = env                # (He, We, 3) f32 — MXU sampling res
        self.env_atlas = env_atlas    # (2*H0-1, W0*3) f32 mip atlas (mode 1)
        self.env_atlas_base = tuple(int(x) for x in env_atlas_base)
        self.root = int(root)
        self.node_count = int(node_count)
        self.leaf_count = int(leaf_count)
        self.tri_count = int(tri_count)
        # static dequant affine: (ox, oy, oz, sx, sy, sz)
        self.box_quant = tuple(float(v) for v in box_quant)
        self.smem_ok = bool(smem_ok)

    def tree_flatten(self):
        leaves = (self.leaves, self.links_smem, self.boxes_smem,
                  self.meta_smem, self.tribase_smem, self.env,
                  self.env_atlas)
        aux = (self.root, self.node_count, self.leaf_count, self.tri_count,
               self.box_quant, self.smem_ok, self.env_atlas_base)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @property
    def vmem_bytes(self) -> int:
        return self.leaves.shape[0] * LANES * 4


def _woop_records(pos: np.ndarray, nrm: np.ndarray) -> np.ndarray:
    """(cnt, 9) v0v1v2 positions + (cnt, 9) n0n1n2 normals ->
    (cnt, WOOP_LEAF_RECORD) precomputed-affine records (f64 host math;
    see the layout comment at WOOP_LEAF_RECORD)."""
    p = pos.astype(np.float64)
    v0, v1, v2 = p[:, 0:3], p[:, 3:6], p[:, 6:9]
    e1 = v1 - v0
    e2 = v2 - v0
    N = np.cross(e1, e2)
    det = np.einsum("ij,ij->i", N, N)  # |N|^2
    inv = np.where(det > 0.0, 1.0 / np.maximum(det, 1e-300), 0.0)[:, None]
    r0 = np.cross(e2, N) * inv
    r1 = np.cross(N, e1) * inv
    rec = np.zeros((len(p), WOOP_LEAF_RECORD), np.float32)
    rec[:, 0:3] = N
    rec[:, 3] = -np.einsum("ij,ij->i", N, v0)
    rec[:, 4:7] = r0
    rec[:, 7] = -np.einsum("ij,ij->i", r0, v0)
    rec[:, 8:11] = r1
    rec[:, 11] = -np.einsum("ij,ij->i", r1, v0)
    nn = nrm.astype(np.float32)
    rec[:, 12:15] = nn[:, 0:3]
    rec[:, 15:18] = nn[:, 3:6] - nn[:, 0:3]
    rec[:, 18:21] = nn[:, 6:9] - nn[:, 0:3]
    return rec


def pack_leaf_groups(
    data: SceneData, max_leaf_tests: int = LEAF_SLOTS, isect: str = "mt"
):
    """Build the slot-major leaf-group table (shared by the binary and
    wide packet kernels).  Returns (leaves, tribase, leaf_row_of,
    counts, L) — see the module docstring for the layout.  ``isect``
    picks the record format: "mt" raw vertices, "woop" precomputed
    unit-triangle affines (leaf_layout)."""
    record, per_group = leaf_layout(isect)
    assert max_leaf_tests <= GROUP_ROWS, (
        f"max_leaf_tests={max_leaf_tests} exceeds the {GROUP_ROWS}-row "
        "leaf group (slot rows)"
    )
    n = data.group_count
    is_leaf = data.node_objects[:, 1] > 0
    leaf_ids = np.nonzero(is_leaf)[0]
    L = max(1, len(leaf_ids))
    leaf_row_of = np.full(n, -1, np.int32)
    leaf_row_of[leaf_ids] = np.arange(len(leaf_ids), dtype=np.int32)

    counts = np.minimum(data.node_objects[:, 1], max_leaf_tests).astype(np.int32)
    counts = np.where(is_leaf, counts, 0)

    # leaf groups: slot-major rows, ``per_group`` leaves across the
    # first record*per_group lanes; padded to the full 128 so DMA
    # slices of the table are lane-aligned (Mosaic requires
    # 128-multiple slices)
    groups = -(-L // per_group)
    leaves = np.zeros((groups * GROUP_ROWS, LANES), np.float32)
    for row, g in enumerate(leaf_ids):
        start = int(data.node_objects[g, 0])
        cnt = int(counts[g])
        grp, sub = divmod(row, per_group)
        r0 = grp * GROUP_ROWS
        c0 = sub * record
        pos = data.tri_positions[start : start + cnt]
        nrm = data.tri_normals[start : start + cnt]
        if isect == "woop":
            leaves[r0 : r0 + cnt, c0 : c0 + record] = _woop_records(pos, nrm)
        else:
            leaves[r0 : r0 + cnt, c0 : c0 + 9] = pos
            leaves[r0 : r0 + cnt, c0 + 9 : c0 + 18] = nrm

    tribase = np.zeros(L, np.int32)
    tribase[: len(leaf_ids)] = data.node_objects[leaf_ids, 0]
    # stamp each leaf's tribase into the spare lane TB_LANE of its
    # slot row ``sub`` (both record formats use 126 of 128 lanes, so
    # lanes 126-127 ride along for free): the HBM leaf tier reads it
    # back from the DMA'd group buffer instead of the SMEM tribase
    # table that overflows at ~2M triangles (VERDICT r4 #4).  An f32
    # lane holds triangle indices exactly below 2^24 (~16.7M tris);
    # pack_scene_wide asserts that bound for the hbm tier.
    for row in range(L if len(leaf_ids) else 0):
        grp, sub = divmod(row, per_group)
        leaves[grp * GROUP_ROWS + sub, TB_LANE] = float(tribase[row])
    return leaves, tribase, leaf_row_of, counts, L


def pack_scene(
    data: SceneData,
    env: np.ndarray,
    max_leaf_tests: int = LEAF_SLOTS,
    env_size: tuple[int, int] = (256, 512),
    env_atlas_base: tuple[int, int] = (512, 1024),
) -> PackedScene:
    """Build packet tables from flattened SceneData (host, numpy)."""
    n = data.group_count
    is_leaf = data.node_objects[:, 1] > 0
    leaves, tribase_smem, leaf_row_of, counts, L = pack_leaf_groups(
        data, max_leaf_tests
    )
    hm = data.hitmiss  # (8, N, 2)

    He, We = env_size
    env_small = _resize_env(np.asarray(env, np.float32), He, We)

    # SMEM tables (16-bit links need node ids < 32768; leaf_row must
    # fit 26 bits — always true when n < 32768)
    smem_ok = n < 32768
    links = np.where(hm < 0, 0xFFFF, hm).astype(np.int64)  # (8, N, 2)
    links_packed = ((links[:, :, 0] << 16) | links[:, :, 1]).astype(np.uint32)
    links_smem = np.ascontiguousarray(links_packed.T).view(np.int32).reshape(-1)

    meta_smem = (
        (counts.astype(np.int64) << 26) | np.maximum(leaf_row_of, 0)
    ).astype(np.uint32).view(np.int32).reshape(-1)

    # conservative 16-bit fixed-point boxes over the scene box
    bmin = data.node_boxes[:, 0:3].astype(np.float64)
    bmax = data.node_boxes[:, 3:6].astype(np.float64)
    if n > 0 and data.triangle_count > 0:
        off = bmin[data.tree_root].copy()
        ext = bmax[data.tree_root] - off
    else:
        off = np.zeros(3)
        ext = np.ones(3)
    scale = np.maximum(ext, 1e-30) / ((1 << QBITS) - 1)
    qmin = np.clip(np.floor((bmin - off) / scale), 0, (1 << QBITS) - 1)
    qmax = np.clip(np.ceil((bmax - off) / scale), 0, (1 << QBITS) - 1)
    boxes_smem = (
        (qmin.astype(np.int64) << 16) | qmax.astype(np.int64)
    ).astype(np.uint32).view(np.int32).reshape(-1)

    return PackedScene(
        leaves=jnp.asarray(leaves),
        links_smem=jnp.asarray(np.ascontiguousarray(links_smem)),
        boxes_smem=jnp.asarray(np.ascontiguousarray(boxes_smem)),
        meta_smem=jnp.asarray(np.ascontiguousarray(meta_smem)),
        tribase_smem=jnp.asarray(tribase_smem),
        env=jnp.asarray(env_small),
        env_atlas=jnp.asarray(pack_env_atlas(env, env_atlas_base)),
        root=int(data.tree_root),
        node_count=n,
        leaf_count=L,
        tri_count=int(data.triangle_count),
        box_quant=(off[0], off[1], off[2], scale[0], scale[1], scale[2]),
        smem_ok=smem_ok,
        env_atlas_base=env_atlas_base,
    )


def _upsample_x(level: np.ndarray, W: int) -> np.ndarray:
    """(h, w, 3) -> (h, W, 3): linear x-upsample at half-texel centers
    with REPEAT wrap — the piecewise-linear reconstruction the level's
    own bilinear sampler would produce, tabulated on the base grid."""
    h, w = level.shape[:2]
    if w == W:
        return level.astype(np.float32)
    xl = (np.arange(W) + 0.5) * w / W - 0.5
    x0 = np.floor(xl).astype(np.int64)
    f = (xl - x0)[None, :, None].astype(np.float32)
    a = level[:, np.mod(x0, w)]
    b = level[:, np.mod(x0 + 1, w)]
    return (a * (1.0 - f) + b * f).astype(np.float32)


def pack_env_atlas(
    env: np.ndarray, base: tuple[int, int] = (512, 1024)
) -> np.ndarray:
    """Power-of-two mip atlas for the MXU trilinear sampler
    (envmxu.sample_env_mxu_mip): resample the env to ``base`` (H0, W0),
    box-downsample levels until height 1, stack vertically into a
    (2*H0 - 1, W0*3) flat array.  Level l occupies rows
    [2*H0 - 2*(H0>>l), +H0>>l) — offsets are pure arithmetic in l, so
    per-ray level selection needs no table gather.

    Every level is stored X-UPSAMPLED to the base width (linear,
    half-texel centers, REPEAT wrap), so the sampler's column weights
    are level-independent and one 4-hot row matmul evaluates the whole
    trilinear blend (envmxu docstring; vs two full-atlas matmuls for
    the exact per-level-x formulation).  The x reconstruction is the
    level's own piecewise-linear function resampled on the base grid —
    measured p99.9 relative error 5e-4 on an HDR sky.
    """
    H0, W0 = base
    assert H0 & (H0 - 1) == 0 and W0 & (W0 - 1) == 0, "base must be pow2"
    assert W0 >= H0, "lat-long env must be at least as wide as tall"
    cur = _resize_env(np.asarray(env, np.float32), H0, W0)
    atlas = np.zeros((2 * H0 - 1, W0 * 3), np.float32)
    h, w, off = H0, W0, 0
    while True:
        atlas[off : off + h, :] = _upsample_x(cur, W0).reshape(h, W0 * 3)
        if h == 1:
            break
        off += h
        h //= 2
        w //= 2
        cur = cur.reshape(h, 2, w, 2, 3).mean(axis=(1, 3))
    return atlas


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
