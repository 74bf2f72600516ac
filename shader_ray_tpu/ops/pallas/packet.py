"""Packet BVH traversal megakernel (Pallas TPU).

Design for a 128-lane x 8-sublane vector machine with no per-lane
gather (the one fast dynamic access Mosaic offers is a scalar-indexed
sublane slice):

* rays fill FULL (8, 128) vector registers — a grid step processes a
  ``tile``-ray packet folded to (8, tile/8).  (A flat (1, tile)
  layout runs the VPU at 1/8 occupancy: every vreg would carry one
  sublane of payload.)
* the BVH walk is SCALAR: one node pointer for the whole packet,
  advanced through the same 8-octant stackless hit/miss links the
  per-lane engines use (reference raytracer.es.fs:386-443,
  world.cpp:215-278), selecting the link bank by the packet's
  majority octant.  Following the majority bank is an efficiency
  choice, not a correctness one: BVH child boxes are contained in
  their parent, so every node any ray's own walk would enter is
  entered by the packet walk, and the per-ray ``t0 < t`` cull only
  skips nodes that cannot beat that ray's current hit;
* node slab tests and Moller-Trumbore triangle tests are full-width
  vector ops over the packet, with per-ray active masks — the GLSL
  early-outs (fs:297-345) become lane masks exactly like the CPU
  wavefront engine (ops/traversal.py);
* a leaf's (<= 10) triangles are unrolled statically — each slot's
  vertices come from static (1, 1) element slices of the leaf record
  block, so there is no dynamic lane indexing anywhere;
* hit normals are interpolated AT ACCEPT TIME from the leaf's vertex
  normals, so shading needs no post-traversal gather.

Tie-breaking caveat: when two triangles hit at exactly equal t, the
winner depends on visit order, which for minority-octant rays can
differ from the per-lane engine.  Real scenes are unaffected.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shader_ray_tpu.ops.pallas.kernel_body import packet_kernel
from shader_ray_tpu.ops.pallas.pack import PackedScene

INFINITELY_FAR = 1.0e7   # fs:115
RANGE_T1 = 1.0e8         # fs:463,491
MT_EPSILON = 1.0e-7      # fs:312
FOLD = 8                 # sublanes per ray block


class PacketHit(NamedTuple):
    t: jnp.ndarray       # (R,) f32; INFINITELY_FAR = miss, -1 = bad
    which: jnp.ndarray   # (R,) i32 BVH-order triangle id, -1 = none
    normal: jnp.ndarray  # (R, 3) f32 interpolated object-space normal
    bad: jnp.ndarray     # (R,) bool
    stats: jnp.ndarray | None  # (n_packets, 2) i32: (steps, leaf visits); None unless with_stats


def _fold(comp: jnp.ndarray, n_tiles: int, tile: int, fold: int) -> jnp.ndarray:
    """(Rp,) -> (fold, n_tiles * tile/fold): per packet, the tile's rays
    fill a (fold, tile/fold) block; blocks abut along lanes."""
    C = tile // fold
    return comp.reshape(n_tiles, fold, C).transpose(1, 0, 2).reshape(fold, n_tiles * C)


def _unfold(x: jnp.ndarray, n_tiles: int, tile: int, fold: int) -> jnp.ndarray:
    C = tile // fold
    return x.reshape(fold, n_tiles, C).transpose(1, 0, 2).reshape(n_tiles * tile)


def packet_trace(
    scene: PackedScene,
    P: jnp.ndarray,
    D: jnp.ndarray,
    active: jnp.ndarray | None = None,
    tile: int = 2048,
    max_steps: int | None = None,
    mt_eps: float = MT_EPSILON,
    any_hit: bool = False,
    interleave: int = 2,
    with_stats: bool = False,
    interpret: bool = False,
    prefolded: bool = False,
) -> PacketHit:
    """Trace a batch of object-space rays.  P, D: (R, 3) float32.

    Rays are processed in ``tile``-lane packets (one Pallas grid step
    each); ``tile`` must be a multiple of 1024 (8 sublanes x 128
    lanes).  R is padded internally to a tile multiple.

    ``prefolded``: rays arrive already permuted into kernel-lane order
    (engine_pallas._lane_fold_perm) and R divides ``tile`` — the fold/
    unfold transposes become pure reshapes, and results stay in lane
    order (the frame loop inverts the permutation once per frame).
    """
    assert tile % 128 == 0, "tile must be a multiple of 128"
    assert scene.smem_ok, (
        "packet engine requires node count < 32768 and tri base < 2^24 "
        "(SMEM link tables); larger scenes need the wavefront engine"
    )
    fold = FOLD if tile % (FOLD * 128) == 0 else max(1, tile // 128)
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
        max_steps = 2 * scene.node_count + 2

    # interleave independent sub-packet walks (>=128 lanes each) to
    # overlap the serial per-step latency chains
    walks = max(1, min(interleave, C // 128))
    while C % walks:
        walks -= 1
    kernel = functools.partial(
        packet_kernel,
        root=scene.root,
        max_steps=max_steps,
        mt_eps=mt_eps,
        tile=tile,
        fold=fold,
        walks=walks,
        box_quant=scene.box_quant,
        any_hit=any_hit,
        with_stats=with_stats,
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

    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            full(scene.leaves.shape),
            smem(scene.links_smem.shape),
            smem(scene.boxes_smem.shape),
            smem(scene.meta_smem.shape),
            smem(scene.tribase_smem.shape),
            rays(3 * fold),
            rays(3 * fold),
            rays(fold),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(scene.leaves, scene.links_smem, scene.boxes_smem, scene.meta_smem,
      scene.tribase_smem, Pt, Dt, actt)
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
    # stats blocks: per tile i, lane i*128 carries (steps, leafs)
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
