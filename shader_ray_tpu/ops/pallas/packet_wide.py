"""Wide-BVH packet traversal entry point (Pallas TPU).

Same contract as ops.pallas.packet.packet_trace, running the 8-wide
short-stack kernel (kernel_wide.py) over tables packed by
pack_wide.pack_scene_wide.  Replaces the binary engine's 32768-node
SMEM-link cap with 26-bit wide-node indices (the practical bound is
VMEM capacity for the boxes/leaf tables).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shader_ray_tpu.ops.pallas.kernel_wide import wide_kernel
from shader_ray_tpu.ops.pallas.pack_wide import WIDE, PackedSceneWide
from shader_ray_tpu.ops.pallas.packet import (
    FOLD,
    MT_EPSILON,
    PacketHit,
    _fold,
    _unfold,
)


def _default_pops() -> int:
    from shader_ray_tpu.config import get_config

    return get_config().walk_pops


def _default_leaf_scan(node_src: str = "smem") -> str:
    """Resolve the configured leaf_scan; "" = auto: "queue" on the
    vmem node tier (visit-heavy large scenes, where draining SMEM meta
    queues measured ~2.5% faster than the per-visit ctz bit-scan),
    "ctz" otherwise (wins ~1.5% on coherent SMEM-tier scenes)."""
    from shader_ray_tpu.config import get_config

    scan = get_config().leaf_scan
    if not scan:
        return "queue" if node_src == "vmem" else "ctz"
    return scan


def packet_trace_wide(
    scene: PackedSceneWide,
    P: jnp.ndarray,
    D: jnp.ndarray,
    active: jnp.ndarray | None = None,
    tile: int = 1024,
    max_steps: int | None = None,
    mt_eps: float = MT_EPSILON,
    any_hit: bool = False,
    interleave: int = 2,
    with_stats: bool = False,
    interpret: bool = False,
    leaf_mode: str = "scalar",
    prefolded: bool = False,
    pops: int | None = None,
    leaf_scan: str | None = None,
) -> PacketHit:
    """Trace a batch of object-space rays.  P, D: (R, 3) float32.
    ``tile`` must be a multiple of 1024 (8 sublanes x 128 lanes).
    ``prefolded``: rays arrive in kernel-lane order (see
    packet.packet_trace) — folds become reshapes, results stay laned.
    """
    assert tile % (FOLD * 128) == 0, "wide kernel tile must be a multiple of 1024"
    fold = FOLD
    R = P.shape[0]
    pad = 0 if prefolded else (-R) % tile
    if prefolded:
        assert R % tile == 0, "prefolded rays must divide the tile size"
    Rp = R + pad
    n_tiles = Rp // tile
    C = tile // fold

    fold_in = (
        (lambda c: c.reshape(fold, n_tiles * C))
        if prefolded
        else (lambda c: _fold(c, n_tiles, tile, fold))
    )

    def prep(x):
        x = jnp.asarray(x, jnp.float32)
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad, 3), x.dtype)], axis=0)
        comps = [fold_in(x[:, c]) for c in range(3)]
        return jnp.concatenate(comps, axis=0)  # (3*FOLD, n_tiles*C)

    Pt = prep(P)
    Dt = prep(D)
    if active is None:
        # padded lanes must be inactive (their zero-direction rays
        # produce inf/NaN slab math if treated as live)
        actv = jnp.concatenate(
            [jnp.ones((R,), jnp.float32), jnp.zeros((pad,), jnp.float32)]
        ) if pad else jnp.ones((Rp,), jnp.float32)
    else:
        actv = jnp.asarray(active).astype(jnp.float32).reshape(R)
        if pad:
            actv = jnp.concatenate([actv, jnp.zeros((pad,), jnp.float32)])
    actt = fold_in(actv)

    if max_steps is None:
        # a tree walk pops each wide node at most once
        max_steps = scene.n_wide + 2

    leaf_hbm = getattr(scene, "leaf_src", "vmem") == "hbm"
    if leaf_hbm and leaf_mode != "dma2":
        # HBM-resident leaves are reachable only via the group DMA
        leaf_mode = "dma2"
    pops = pops if pops is not None else _default_pops()
    # multi-pop advances up to ``pops`` disjoint branches at once, so
    # the short-stack worst case scales by pops
    stack_depth = scene.stack_depth * pops
    walks = max(1, min(interleave, C // 128))
    while C % walks:
        walks -= 1
    CW = C // walks
    # the kernel's OR-tree reduction halves lanes; non-pow2 widths
    # would silently drop rays' hit bits
    assert CW & (CW - 1) == 0, (
        f"tile/walks must give a power-of-two lane width (got {CW}); "
        "use a power-of-two multiple of 1024 for tile"
    )
    kernel = functools.partial(
        wide_kernel,
        n_wide=scene.n_wide,
        max_steps=max_steps,
        mt_eps=mt_eps,
        tile=tile,
        fold=fold,
        walks=walks,
        stack_depth=stack_depth,
        box_quant=scene.box_quant,
        any_hit=any_hit,
        with_stats=with_stats,
        leaf_mode=leaf_mode,
        leaf_slots=scene.max_count,
        node_src=scene.node_src,
        pops=pops,
        isect=scene.isect,
        leaf_src="hbm" if leaf_hbm else "vmem",
        leaf_scan=(
            leaf_scan
            if leaf_scan is not None
            else _default_leaf_scan(scene.node_src)
        ),
    )

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    smem = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.SMEM
    )
    rays = lambda rows: pl.BlockSpec(
        (rows, C), lambda i: (0, i), memory_space=pltpu.VMEM
    )

    out_specs = [rays(fold), rays(fold), rays(3 * fold), rays(fold)]
    out_shape = [
        jax.ShapeDtypeStruct((fold, Rp // fold), jnp.float32),
        jax.ShapeDtypeStruct((fold, Rp // fold), jnp.int32),
        jax.ShapeDtypeStruct((3 * fold, Rp // fold), jnp.float32),
        jax.ShapeDtypeStruct((fold, Rp // fold), jnp.int32),
    ]
    if with_stats:
        out_specs.append(
            pl.BlockSpec((8, 128), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((8, n_tiles * 128), jnp.int32))

    # HBM leaf tier: leaves stay in device memory (the dma2 group
    # copies pull from HBM; leaf_hbm resolved above).  The SMEM tribase
    # table goes DUMMY there — it overflows SMEM at ~2M tris — and hit
    # ids come from the group buffer's spare lane instead
    # (kernel tb_from_buf; VERDICT r4 #4).
    tribase_op = (jnp.zeros((8,), jnp.int32) if leaf_hbm
                  else scene.tribase_smem)
    # the leaf/node tables can overflow the default 16 MB scoped-vmem
    # budget on large scenes; raise the cap to what they + rays need
    table_bytes = 4 * 128 * (
        (0 if leaf_hbm else scene.leaves.shape[0])
        + scene.nodes_vmem.shape[0]
    )
    vmem_limit = min(table_bytes + (8 << 20), 120 << 20)
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY) if leaf_hbm
            else full(scene.leaves.shape),
            smem(scene.boxes_smem.shape),
            smem(scene.cmeta_smem.shape),
            smem(scene.order_smem.shape),
            smem(scene.masks_smem.shape),
            smem(tribase_op.shape),
            full(scene.nodes_vmem.shape),
            rays(3 * fold),
            rays(3 * fold),
            rays(fold),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((walks * stack_depth,), jnp.int32),
            # two 16-row leaf-group halves per walk (dma2 double-buffer)
            pltpu.SMEM((walks * 2 * 16, scene.leaves.shape[1]), jnp.float32),
            pltpu.SemaphoreType.DMA((walks * 2,)),
            pltpu.SMEM((walks * pops * 8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((walks * pops,)),
            # per-class hit-leaf meta queues (leaf_scan="queue"; tiny
            # either way — 3 classes x 8*pops entries per walk)
            pltpu.SMEM((walks * 3 * 8 * pops,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(scene.leaves, scene.boxes_smem, scene.cmeta_smem, scene.order_smem,
      scene.masks_smem, tribase_op, scene.nodes_vmem, Pt, Dt, actt)
    t, which, n, bad = outs[:4]
    stats = outs[4] if with_stats else None

    un = (
        (lambda x: x.reshape(Rp))
        if prefolded
        else (lambda x: _unfold(x, n_tiles, tile, fold)[:R])
    )
    normal = jnp.stack(
        [un(n[0:fold]), un(n[fold : 2 * fold]), un(n[2 * fold :])], axis=-1
    )
    per_tile = (
        stats[0].reshape(n_tiles, 128)[:, 0:2] if with_stats else None
    )
    return PacketHit(
        t=un(t),
        which=un(which),
        normal=normal,
        bad=un(bad) > 0,
        stats=per_tile,
    )
