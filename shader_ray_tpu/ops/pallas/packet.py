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

from shader_ray_tpu.ops.pallas.pack import (
    GROUP_ROWS,
    L_BOXMAX,
    L_BOXMIN,
    L_LEAF_COUNT,
    L_LEAF_ROW,
    L_LINKS,
    L_TRI_BASE,
    LEAF_RECORD,
    LEAF_SLOTS,
    LEAVES_PER_GROUP,
    NODE_LANES,
    NODES_PER_ROW,
    PackedScene,
)

INFINITELY_FAR = 1.0e7   # fs:115
RANGE_T1 = 1.0e8         # fs:463,491
MT_EPSILON = 1.0e-7      # fs:312
FOLD = 8                 # sublanes per ray block


class PacketHit(NamedTuple):
    t: jnp.ndarray       # (R,) f32; INFINITELY_FAR = miss, -1 = bad
    which: jnp.ndarray   # (R,) i32 BVH-order triangle id, -1 = none
    normal: jnp.ndarray  # (R, 3) f32 interpolated object-space normal
    bad: jnp.ndarray     # (R,) bool
    stats: jnp.ndarray   # (n_packets, 2) i32: (node steps, leaf visits)


def _kernel(
    nodes_ref,
    leaves_ref,
    links_ref,
    meta_ref,
    P_ref,
    D_ref,
    act_ref,
    t_ref,
    which_ref,
    n_ref,
    bad_ref,
    stats_ref,
    *,
    root: int,
    max_steps: int,
    mt_eps: float,
    tile: int,
    fold: int,
    any_hit: bool = False,
):
    f32 = jnp.float32
    i32 = jnp.int32
    F = fold
    C = tile // F  # ray block is (F, C)

    Px, Py, Pz = P_ref[0:F, :], P_ref[F : 2 * F, :], P_ref[2 * F :, :]
    Dx, Dy, Dz = D_ref[0:F, :], D_ref[F : 2 * F, :], D_ref[2 * F :, :]
    act = act_ref[:, :] > 0

    invx = 1.0 / Dx
    invy = 1.0 / Dy
    invz = 1.0 / Dz

    # packet octant from the mean direction of active lanes
    actf = act.astype(f32)
    octant = (
        (jnp.sum(Dx * actf) > 0.0).astype(i32)
        + 2 * (jnp.sum(Dy * actf) > 0.0).astype(i32)
        + 4 * (jnp.sum(Dz * actf) > 0.0).astype(i32)
    )


    def leaf_tests(lrow, tbase, lcount, boxhit, t0, t1, t, which, nx, ny, nz):
        grp = lrow // LEAVES_PER_GROUP
        sub = lrow % LEAVES_PER_GROUP
        base = pl.multiple_of(grp * GROUP_ROWS, GROUP_ROWS)
        block = leaves_ref[pl.ds(base, GROUP_ROWS), :]
        rec = jax.lax.switch(
            sub,
            [
                (lambda s=s: block[0:LEAF_SLOTS, s * LEAF_RECORD : (s + 1) * LEAF_RECORD])
                for s in range(LEAVES_PER_GROUP)
            ],
        )  # (10, 18): slot-major triangle records

        for k in range(LEAF_SLOTS):
            # true scalar extraction (a reduction) — Mosaic folds
            # broadcast+slice chains back into an unsupported
            # (1,1)->(F,C) two-axis broadcast, but scalar->vector
            # splat is native
            e = lambda c: jnp.sum(rec[k : k + 1, c : c + 1])
            v0x, v0y, v0z = e(0), e(1), e(2)
            v1x, v1y, v1z = e(3), e(4), e(5)
            v2x, v2y, v2z = e(6), e(7), e(8)

            e0x, e0y, e0z = v1x - v0x, v1y - v0y, v1z - v0z
            e1x, e1y, e1z = v0x - v2x, v0y - v2y, v0z - v2z
            # M = cross(e1, D)  (fs:305); all (FOLD, C) via broadcasting
            Mx = e1y * Dz - e1z * Dy
            My = e1z * Dx - e1x * Dz
            Mz = e1x * Dy - e1y * Dx
            det = e0x * Mx + e0y * My + e0z * Mz
            ok = jnp.abs(det) >= mt_eps
            inv_det = 1.0 / jnp.where(ok, det, 1.0)
            Tx, Ty, Tz = Px - v0x, Py - v0y, Pz - v0z
            # Q = cross(T, e0)
            Qx = Ty * e0z - Tz * e0y
            Qy = Tz * e0x - Tx * e0z
            Qz = Tx * e0y - Ty * e0x
            d = -(e1x * Qx + e1y * Qy + e1z * Qz) * inv_det
            ok = ok & (d <= t) & (d >= t0) & (d <= t1)
            u = (Tx * Mx + Ty * My + Tz * Mz) * inv_det
            ok = ok & (u >= 0.0) & (u <= 1.0)
            v = (Dx * Qx + Dy * Qy + Dz * Qz) * inv_det
            ok = ok & (v >= 0.0) & (u + v <= 1.0)
            take = ok & boxhit & (k < lcount)

            t = jnp.where(take, d, t)
            which = jnp.where(take, tbase + k, which)
            w0 = 1.0 - u - v
            n0x, n0y, n0z = e(9), e(10), e(11)
            n1x, n1y, n1z = e(12), e(13), e(14)
            n2x, n2y, n2z = e(15), e(16), e(17)
            nx = jnp.where(take, n0x * w0 + n1x * u + n2x * v, nx)
            ny = jnp.where(take, n0y * w0 + n1y * u + n2y * v, ny)
            nz = jnp.where(take, n0z * w0 + n1z * u + n2z * v, nz)
        return t, which, nx, ny, nz

    def cond(c):
        g, steps = c[0], c[1]
        keep = (g >= 0) & (steps < max_steps)
        if any_hit:
            # occlusion query: stop as soon as every active lane is hit
            keep = keep & jnp.any(act & (c[2] >= INFINITELY_FAR))
        return keep

    def body(c):
        g, steps, leafs, t, which, nx, ny, nz = c
        row = nodes_ref[pl.ds(g // NODES_PER_ROW, 1), :]  # (1, 128)
        rowf = jax.lax.switch(
            g % NODES_PER_ROW,
            [
                (lambda s=s: row[0:1, s * NODE_LANES : (s + 1) * NODE_LANES])
                for s in range(NODES_PER_ROW)
            ],
        )

        # scalar metadata: SMEM loads keep the walk's serial chain off
        # the vector unit (links packed hit<<16 | miss&0xffff; leaf
        # meta packed count<<24 | tri_base)
        hm = links_ref[g * 8 + octant]
        hit_link = hm >> 16        # sign-extends the -1 sentinel
        mlow = hm & 0xFFFF
        miss_link = jnp.where(mlow == 0xFFFF, -1, mlow)
        lrow_s = meta_ref[2 * g]
        meta1 = meta_ref[2 * g + 1]
        lcount = meta1 >> 24
        tbase = meta1 & 0xFFFFFF

        ef = lambda c: jnp.sum(rowf[0:1, c : c + 1])  # scalar extract
        bminx, bminy, bminz = ef(L_BOXMIN), ef(L_BOXMIN + 1), ef(L_BOXMIN + 2)
        bmaxx, bmaxy, bmaxz = ef(L_BOXMAX), ef(L_BOXMAX + 1), ef(L_BOXMAX + 2)

        tax = (bminx - Px) * invx
        tbx = (bmaxx - Px) * invx
        tay = (bminy - Py) * invy
        tby = (bmaxy - Py) * invy
        taz = (bminz - Pz) * invz
        tbz = (bmaxz - Pz) * invz
        lox = jnp.minimum(tax, tbx)
        hix = jnp.maximum(tax, tbx)
        loy = jnp.minimum(tay, tby)
        hiy = jnp.maximum(tay, tby)
        loz = jnp.minimum(taz, tbz)
        hiz = jnp.maximum(taz, tbz)
        t0 = jnp.maximum(jnp.maximum(lox, loy), jnp.maximum(loz, 0.0))
        t1 = jnp.minimum(jnp.minimum(hix, hiy), jnp.minimum(hiz, RANGE_T1))

        boxhit = (t0 < t1) & (t0 < t) & act
        anyhit = jnp.any(boxhit)

        is_leaf_visit = anyhit & (lcount > 0)
        t, which, nx, ny, nz = jax.lax.cond(
            is_leaf_visit,
            lambda: leaf_tests(
                jnp.maximum(lrow_s, 0), tbase, lcount,
                boxhit, t0, t1, t, which, nx, ny, nz,
            ),
            lambda: (t, which, nx, ny, nz),
        )

        g_next = jnp.where(anyhit, hit_link, miss_link)
        return (
            g_next,
            steps + 1,
            leafs + is_leaf_visit.astype(i32),
            t, which, nx, ny, nz,
        )

    # a packet with no active lanes skips the walk entirely (matters
    # for late bounces and gated shadow packets)
    g0 = jnp.where(jnp.any(act), jnp.int32(root), jnp.int32(-1))
    init = (
        g0,
        jnp.int32(0),
        jnp.int32(0),
        jnp.full((F, C), INFINITELY_FAR, f32),
        jnp.full((F, C), -1, i32),
        jnp.zeros((F, C), f32),
        jnp.zeros((F, C), f32),
        jnp.zeros((F, C), f32),
    )
    g, steps, leafs, t, which, nx, ny, nz = jax.lax.while_loop(cond, body, init)

    # budget exhausted mid-walk (fs:436-438 analog); an any-hit early
    # exit leaves g >= 0 legitimately, so gate on the step count
    overflow = (g >= 0) & (steps >= max_steps)
    badv = jnp.where(act & overflow, 1, 0).astype(i32)
    t_ref[:, :] = jnp.where(badv > 0, -1.0, t)
    which_ref[:, :] = jnp.where(badv > 0, -1, which)
    n_ref[0:F, :] = nx
    n_ref[F : 2 * F, :] = ny
    n_ref[2 * F :, :] = nz
    bad_ref[:, :] = badv
    # vector-composed stats block (scalar stores to VMEM unsupported)
    ri = jax.lax.broadcasted_iota(i32, (8, 128), 0)
    ci = jax.lax.broadcasted_iota(i32, (8, 128), 1)
    stats_ref[:, :] = jnp.where(
        (ri == 0) & (ci == 0), steps,
        jnp.where((ri == 0) & (ci == 1), leafs, 0),
    )


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
    interpret: bool = False,
) -> PacketHit:
    """Trace a batch of object-space rays.  P, D: (R, 3) float32.

    Rays are processed in ``tile``-lane packets (one Pallas grid step
    each); ``tile`` must be a multiple of 1024 (8 sublanes x 128
    lanes).  R is padded internally to a tile multiple.
    """
    assert tile % 128 == 0, "tile must be a multiple of 128"
    assert scene.smem_ok, (
        "packet engine requires node count < 32768 and tri base < 2^24 "
        "(SMEM link tables); larger scenes need the wavefront engine"
    )
    fold = FOLD if tile % (FOLD * 128) == 0 else max(1, tile // 128)
    R = P.shape[0]
    pad = (-R) % tile
    Rp = R + pad
    n_tiles = Rp // tile
    C = tile // fold

    def prep(x):
        x = jnp.asarray(x, jnp.float32)
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad, 3), x.dtype)], axis=0)
        comps = [_fold(x[:, c], n_tiles, tile, fold) for c in range(3)]
        return jnp.concatenate(comps, axis=0)  # (3*FOLD, n_tiles*C)

    Pt = prep(P)
    Dt = prep(D)
    if active is None:
        actv = jnp.ones((Rp,), jnp.float32)
    else:
        actv = jnp.asarray(active).astype(jnp.float32).reshape(R)
        if pad:
            actv = jnp.concatenate([actv, jnp.zeros((pad,), jnp.float32)])
    actt = _fold(actv, n_tiles, tile, fold)

    if max_steps is None:
        max_steps = 2 * scene.node_count + 2

    kernel = functools.partial(
        _kernel,
        root=scene.root,
        max_steps=max_steps,
        mt_eps=mt_eps,
        tile=tile,
        fold=fold,
        any_hit=any_hit,
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

    t, which, n, bad, stats = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            full(scene.nodes.shape),
            full(scene.leaves.shape),
            smem(scene.links_smem.shape),
            smem(scene.meta_smem.shape),
            rays(3 * fold),
            rays(3 * fold),
            rays(fold),
        ],
        out_specs=[
            rays(fold), rays(fold), rays(3 * fold), rays(fold),
            pl.BlockSpec((8, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((fold, Rp // fold), jnp.float32),
            jax.ShapeDtypeStruct((fold, Rp // fold), jnp.int32),
            jax.ShapeDtypeStruct((3 * fold, Rp // fold), jnp.float32),
            jax.ShapeDtypeStruct((fold, Rp // fold), jnp.int32),
            jax.ShapeDtypeStruct((8, n_tiles * 128), jnp.int32),
        ],
        interpret=interpret,
    )(scene.nodes, scene.leaves, scene.links_smem, scene.meta_smem, Pt, Dt, actt)

    un = lambda x: _unfold(x, n_tiles, tile, fold)[:R]
    normal = jnp.stack(
        [un(n[0:fold]), un(n[fold : 2 * fold]), un(n[2 * fold :])], axis=-1
    )
    # stats blocks: per tile i, lane i*128 carries (steps, leafs)
    per_tile = stats[0].reshape(n_tiles, 128)[:, 0:2]
    return PacketHit(
        t=un(t),
        which=un(which),
        normal=normal,
        bad=un(bad) > 0,
        stats=per_tile,
    )
