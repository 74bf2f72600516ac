"""Entry point for the fused shading megakernel (kernel_mega.py).

``packet_shade`` runs the complete bounce/shadow pipeline for a ray
batch in ONE pallas_call and returns the pre-environment shading
state; the caller (ops/engine_pallas.trace_rays_packet with
``fused=True``) finishes ``color = acc + mod * env(D)`` on the MXU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shader_ray_tpu.ops.pallas.kernel_mega import UNI_SIZE, mega_kernel


def _resolve_kernel_body():
    """``SHADER``-analog escape hatch (ray.cpp:360-364: the reference
    lets a ``SHADER`` env var point at an alternate fragment-shader
    source file, swapping the device program without a rebuild).  The
    jitted analog: ``SRT_KERNEL_MODULE`` names an importable Python
    module whose ``mega_kernel`` attribute replaces the built-in fused
    kernel body (same signature — see kernel_mega.mega_kernel).  Read
    at TRACE time: frame fns cached by a Renderer before the variable
    changed keep their original body (same as the reference, which
    reads SHADER once at startup)."""
    import importlib
    import os

    name = os.environ.get("SRT_KERNEL_MODULE")
    if not name:
        return mega_kernel
    return getattr(importlib.import_module(name), "mega_kernel")
from shader_ray_tpu.ops.pallas.pack_wide import PackedSceneWide
from shader_ray_tpu.ops.pallas.packet import FOLD, MT_EPSILON, _fold, _unfold
from shader_ray_tpu.ops.pallas.packet_wide import (
    _default_leaf_scan,
    _default_pops,
)


class ShadeResult(NamedTuple):
    acc: jnp.ndarray          # (R, 3) accumulated diffuse color
    mod: jnp.ndarray          # (R, 3) final modulation
    D: jnp.ndarray            # (R, 3) final ray direction (env lookup)
    gx: jnp.ndarray | None    # (R, 3) final dDdx (which 1/2 modes)
    gy: jnp.ndarray | None    # (R, 3) final dDdy
    bad: jnp.ndarray          # (R,) bool walk-budget overflow
    cast: jnp.ndarray         # () i32 rays actually cast
    stats: jnp.ndarray        # (n_tiles, 1 + 2*n_phases) i32 per-tile
    colorsum: jnp.ndarray | None = None  # env-fused mode only:
                              # (3*FOLD, n_tiles*out_lanes) per-tile
                              # FINAL color (env term + bad paint
                              # applied in-kernel), summed over jitter
                              # copies down to out_lanes lanes; the
                              # per-ray fields above are None
                              # counters: col 0 cast; cols 1+2p / 2+2p
                              # = phase p's walk steps / leaf visits,
                              # in kernel phase order (bounce, then its
                              # shadow walk — shadow phases exist iff
                              # cast_shadows AND enable_diffuse, the
                              # same condition the kernel gates them on)


def stats_phases(bounce_count: int, cast_shadows: bool,
                 enable_diffuse: bool) -> list[str]:
    """Phase labels in the megakernel's emission order — the single
    source of truth for decoding ShadeResult.stats (kernel_mega.py
    emits a shadow phase iff ``cast_shadows and enable_diffuse``;
    see the walker calls at kernel_mega.py:157,211)."""
    phases = []
    for b in range(bounce_count):
        phases.append(f"bounce{b}")
        if cast_shadows and enable_diffuse:
            phases.append(f"shadow{b}")
    return phases


def packet_shade(
    scene: PackedSceneWide,
    P: jnp.ndarray,
    D: jnp.ndarray,
    gx: jnp.ndarray | None,
    gy: jnp.ndarray | None,
    uni: jnp.ndarray,
    active: jnp.ndarray | None = None,
    tile: int = 2048,
    max_steps: int | None = None,
    mt_eps: float = MT_EPSILON,
    bounce_count: int = 3,
    cast_shadows: bool = True,
    enable_diffuse: bool = True,
    surface_fudge: float = 1e-4,
    with_grads: bool = False,
    leaf_mode: str = "scalar",
    interpret: bool = False,
    prefolded: bool = False,
    pops: int | None = None,
    shared_origin: bool = False,
    min_contrib: float | None = None,
    raygen: tuple | None = None,
    jitter: tuple | None = None,
    num_rays: int | None = None,
    env_fuse: dict | None = None,
) -> ShadeResult:
    """Fused bounce pipeline over a world-space ray batch.

    P, D (and gx, gy when ``with_grads``): (R, 3) float32; ``uni`` is
    the (UNI_SIZE,) f32 frame-uniform table (kernel_mega layout).
    ``tile`` must be a power-of-two multiple of 1024.

    ``raygen`` = (W, H, bh, bw, C0): IN-KERNEL ray generation for a
    jitter-packed progressive superframe — P/D/gx/gy are not read
    (pass None) and ``jitter`` = (jx, jy) per-tile (FOLD, tile/FOLD)
    f32 blocks supplies the per-copy sub-pixel jitter.  The caller
    guarantees power-of-two block geometry and passes the superframe
    lane count as ``num_rays``.

    ``env_fuse`` = {"planes": EnvPlanes, "which": 0|1|2, "aniso": N}
    (raygen mode only): the env term, combine, bad paint, and
    jitter-copy reduction run in-kernel (kernel_mega envfuse) — the
    result's per-ray fields are None and ``colorsum`` holds the
    per-tile per-pixel color sums.  This removes the last
    superframe-sized buffers: at S=256 a single (S*W*H, 3) output
    exceeds 2^31 bytes and crashes the TPU compile helper, so deep
    packing REQUIRES this mode."""
    assert tile % (FOLD * 128) == 0, "mega kernel tile must be a multiple of 1024"
    fold = FOLD
    if raygen is not None:
        assert prefolded and shared_origin and active is None
        R = int(num_rays)
        assert R % tile == 0
    else:
        R = P.shape[0]
    pad = 0 if prefolded else (-R) % tile
    if prefolded:
        assert R % tile == 0, "prefolded rays must divide the tile size"
    Rp = R + pad
    n_tiles = Rp // tile
    C = tile // fold
    assert C & (C - 1) == 0, (
        f"tile/fold must give a power-of-two lane width (got {C})"
    )

    fold_in = (
        (lambda c: c.reshape(fold, n_tiles * C))
        if prefolded
        else (lambda c: _fold(c, n_tiles, tile, fold))
    )

    def prep(x, fill=0.0):
        x = jnp.asarray(x, jnp.float32)
        if pad:
            tail = jnp.full((pad, 3), fill, x.dtype)
            if fill != 0.0:
                # padded directions get unit z (zero D => inf/NaN slab
                # and env math in the padded lanes)
                tail = jnp.broadcast_to(
                    jnp.array([0.0, 0.0, 1.0], x.dtype), (pad, 3)
                )
            x = jnp.concatenate([x, tail], axis=0)
        comps = [fold_in(x[:, c]) for c in range(3)]
        return jnp.concatenate(comps, axis=0)  # (3*FOLD, n_tiles*C)

    # operand diet (the packed-superframe arrays are S * W * H lanes —
    # 2.4 GB each at S=256 on the bench frame): with shared_origin the
    # kernel reads the camera origin from the uniform table and never
    # touches P_ref, and with every lane live (a full frame, no pad,
    # no mask) the act mask is a compile-time constant — both operands
    # become tiny dummies with a constant block index.
    act_all = active is None and pad == 0
    if raygen is not None:
        # P_ref/D_ref carry the tile-invariant jitter blocks
        Pt, Dt = (jnp.asarray(j, jnp.float32) for j in jitter)
        assert Pt.shape == (fold, C) and Dt.shape == (fold, C)
    else:
        Pt = (jnp.zeros((3 * fold, 128), jnp.float32) if shared_origin
              else prep(P))
        Dt = prep(D, fill=1.0)
        if with_grads:
            gxt = prep(gx)
            gyt = prep(gy)
    if act_all:
        actt = jnp.ones((fold, 128), jnp.float32)
    else:
        if active is None:
            actv = jnp.concatenate(
                [jnp.ones((R,), jnp.float32), jnp.zeros((pad,), jnp.float32)]
            ) if pad else jnp.ones((Rp,), jnp.float32)
        else:
            actv = jnp.asarray(active).astype(jnp.float32).reshape(R)
            if pad:
                actv = jnp.concatenate([actv, jnp.zeros((pad,), jnp.float32)])
        actt = fold_in(actv)

    if max_steps is None:
        max_steps = scene.n_wide + 2
    leaf_hbm = getattr(scene, "leaf_src", "vmem") == "hbm"
    if leaf_hbm and leaf_mode != "dma2":
        # HBM-resident leaves are reachable only via the group DMA
        # (scalar/dmastatic read the table as vectors = VMEM-only)
        leaf_mode = "dma2"
    pops = pops if pops is not None else _default_pops()
    if min_contrib is None:
        from shader_ray_tpu.config import get_config

        min_contrib = get_config().min_contrib
    # multi-pop advances up to ``pops`` disjoint branches at once, so
    # the short-stack worst case scales by pops
    stack_depth = scene.stack_depth * pops

    kernel = functools.partial(
        _resolve_kernel_body(),
        n_wide=scene.n_wide,
        max_steps=max_steps,
        mt_eps=mt_eps,
        tile=tile,
        fold=fold,
        stack_depth=stack_depth,
        box_quant=scene.box_quant,
        bounce_count=bounce_count,
        cast_shadows=cast_shadows,
        enable_diffuse=enable_diffuse,
        surface_fudge=surface_fudge,
        with_grads=with_grads,
        leaf_mode=leaf_mode,
        leaf_slots=scene.max_count,
        node_src=scene.node_src,
        pops=pops,
        isect=scene.isect,
        shared_origin=shared_origin,
        leaf_scan=_default_leaf_scan(scene.node_src),
        min_contrib=min_contrib,
        act_all=act_all,
        raygen=raygen,
    )
    envfuse_static = None
    if env_fuse is not None:
        assert raygen is not None, "env fusion rides the raygen path"
        planes = env_fuse["planes"]
        C0 = raygen[4]
        out_lanes = max(C0, 128)
        envfuse_static = dict(
            n_levels=planes.n_levels,
            which=int(env_fuse.get("which", 0)),
            aniso=int(env_fuse.get("aniso", 1)),
            base=tuple(planes.base),
            out_lanes=out_lanes,
        )
        kernel = functools.partial(kernel, envfuse=envfuse_static)

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    smem = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.SMEM
    )
    rays = lambda rows: pl.BlockSpec(
        (rows, C), lambda i: (0, i), memory_space=pltpu.VMEM
    )

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY) if leaf_hbm
        else full(scene.leaves.shape),
        smem(scene.boxes_smem.shape),
        smem(scene.cmeta_smem.shape),
        smem(scene.order_smem.shape),
        smem(scene.masks_smem.shape),
        smem((8,)),
        full(scene.nodes_vmem.shape),
        smem((UNI_SIZE,)),
        full((fold, C)) if raygen is not None
        else full((3 * fold, 128)) if shared_origin
        else rays(3 * fold),
        full((fold, C)) if raygen is not None else rays(3 * fold),
    ]
    # the fused kernel never tracks hit ids (track_which=False), so the
    # per-leaf tribase table is dead weight — a dummy keeps the SMEM
    # budget free (at 2M tris the real table is 1.13 MB, alone past the
    # ~1 MB SMEM: the HBM-leaf tier depends on this)
    operands = [
        scene.leaves, scene.boxes_smem, scene.cmeta_smem,
        scene.order_smem, scene.masks_smem,
        jnp.zeros((8,), jnp.int32),
        scene.nodes_vmem, uni, Pt, Dt,
    ]
    if with_grads and raygen is None:
        in_specs += [rays(3 * fold), rays(3 * fold)]
        operands += [gxt, gyt]
    if env_fuse is not None:
        in_specs += [
            smem(planes.off_smem.shape),
            smem(planes.h_smem.shape),
            smem(planes.w_smem.shape),
            smem(planes.blk_smem.shape),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        operands += [
            planes.off_smem, planes.h_smem, planes.w_smem,
            planes.blk_smem, planes.planes,
        ]
    in_specs.append(full((fold, 128)) if act_all else rays(fold))
    operands.append(actt)

    cnt_spec = pl.BlockSpec(
        (8, 128), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    cnt_shape = jax.ShapeDtypeStruct((8, n_tiles * 128), jnp.int32)
    if env_fuse is not None:
        OC = envfuse_static["out_lanes"]
        out_specs = [
            pl.BlockSpec(
                (3 * fold, OC), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            cnt_spec,
        ]
        out_shape = [
            jax.ShapeDtypeStruct((3 * fold, n_tiles * OC), jnp.float32),
            cnt_shape,
        ]
    else:
        vec3 = jax.ShapeDtypeStruct((3 * fold, Rp // fold), jnp.float32)
        out_specs = [rays(3 * fold), rays(3 * fold), rays(3 * fold)]
        out_shape = [vec3, vec3, vec3]
        if with_grads:
            out_specs += [rays(3 * fold), rays(3 * fold)]
            out_shape += [vec3, vec3]
        out_specs += [rays(fold), cnt_spec]
        out_shape += [
            jax.ShapeDtypeStruct((fold, Rp // fold), jnp.int32),
            cnt_shape,
        ]

    scratch_shapes = [
        pltpu.SMEM((stack_depth,), jnp.int32),
        # two 16-row leaf-group halves (dma2 double-buffer)
        pltpu.SMEM((2 * 16, scene.leaves.shape[1]), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SMEM((pops * 8, 128), jnp.int32),
        pltpu.SemaphoreType.DMA((pops,)),
        # per-class hit-leaf meta queues (leaf_scan="queue")
        pltpu.SMEM((3 * 8 * pops,), jnp.int32),
    ]
    table_bytes = 4 * 128 * (
        (0 if leaf_hbm else scene.leaves.shape[0])
        + scene.nodes_vmem.shape[0]
    )
    env_allow = 0
    if env_fuse is not None:
        from shader_ray_tpu.ops.pallas.envwin import WIN_LANES, WIN_ROWS

        grad_env = envfuse_static["which"] == 1
        n_windows = 4 if grad_env else 2
        scratch_shapes += [
            pltpu.VMEM((WIN_ROWS, 3 * n_windows * WIN_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((3 * n_windows,)),
        ]
        # per-fold-row tent weights are (WIN_LANES, C) f32; the grad
        # (4-window aniso) path scales ~4x (envwin's measured scoped
        # accounting) — oversubscribed combos fail at compile time and
        # the autotuner skips them
        env_allow = (65536 if grad_env else 16384) * C
    vmem_limit = min(table_bytes + (8 << 20) + env_allow, 126 << 20)
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(*operands)

    n_phases_ = len(stats_phases(bounce_count, cast_shadows, enable_diffuse))
    if env_fuse is not None:
        cs, cnt = outs
        # one extra column: the tile's env window levels (kernel_mega
        # stats lane 1 + 2*n_phases; lvl_a + 16*lvl_b)
        per_tile = cnt[0].reshape(n_tiles, 128)[:, : 2 + 2 * n_phases_]
        return ShadeResult(
            acc=None, mod=None, D=None, gx=None, gy=None, bad=None,
            cast=jnp.sum(per_tile[:, 0]), stats=per_tile, colorsum=cs,
        )
    if with_grads:
        acc3, mod3, dout3, gxo3, gyo3, bad, cnt = outs
    else:
        acc3, mod3, dout3, bad, cnt = outs
        gxo3 = gyo3 = None

    un = (
        (lambda x: x.reshape(Rp))
        if prefolded
        else (lambda x: _unfold(x, n_tiles, tile, fold)[:R])
    )
    unstack = lambda v3: jnp.stack(
        [un(v3[0:fold]), un(v3[fold : 2 * fold]), un(v3[2 * fold :])], axis=-1
    )
    n_phases = len(stats_phases(bounce_count, cast_shadows, enable_diffuse))
    per_tile = cnt[0].reshape(n_tiles, 128)[:, : 1 + 2 * n_phases]
    return ShadeResult(
        acc=unstack(acc3),
        mod=unstack(mod3),
        D=unstack(dout3),
        gx=unstack(gxo3) if with_grads else None,
        gy=unstack(gyo3) if with_grads else None,
        bad=un(bad) > 0,
        cast=jnp.sum(per_tile[:, 0]),
        stats=per_tile,
    )
