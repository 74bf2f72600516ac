"""Packet BVH traversal megakernel (Pallas TPU).

Design for a 128-lane vector machine with no per-lane gather (the one
fast dynamic access Mosaic offers is a scalar-indexed sublane slice):

* rays ride the vector LANES — a grid step processes a tile of
  ``tile`` rays laid out (3, tile);
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
  vertices come from static lane offsets of the leaf row, so there is
  no dynamic lane indexing anywhere;
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
    LANES,
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


class PacketHit(NamedTuple):
    t: jnp.ndarray       # (R,) f32; INFINITELY_FAR = miss, -1 = bad
    which: jnp.ndarray   # (R,) i32 BVH-order triangle id, -1 = none
    normal: jnp.ndarray  # (R, 3) f32 interpolated object-space normal
    bad: jnp.ndarray     # (R,) bool


def _kernel(
    nodes_ref,
    leaves_ref,
    P_ref,
    D_ref,
    act_ref,
    t_ref,
    which_ref,
    n_ref,
    bad_ref,
    *,
    root: int,
    max_steps: int,
    mt_eps: float,
    tile: int,
    any_hit: bool = False,
):
    f32 = jnp.float32
    i32 = jnp.int32
    R = tile

    Px, Py, Pz = P_ref[0:1, :], P_ref[1:2, :], P_ref[2:3, :]
    Dx, Dy, Dz = D_ref[0:1, :], D_ref[1:2, :], D_ref[2:3, :]
    act = act_ref[0:1, :] > 0

    invx = 1.0 / Dx
    invy = 1.0 / Dy
    invz = 1.0 / Dz

    # packet octant from the mean direction of active lanes
    actf = act.astype(f32)
    sx = jnp.sum(Dx * actf)
    sy = jnp.sum(Dy * actf)
    sz = jnp.sum(Dz * actf)
    octant = (
        (sx > 0.0).astype(i32)
        + 2 * (sy > 0.0).astype(i32)
        + 4 * (sz > 0.0).astype(i32)
    )
    hit_lane = L_LINKS + 2 * octant  # scalar
    lane_iota = jax.lax.broadcasted_iota(i32, (1, NODE_LANES), 1)

    def extract_i(rowi, lane):
        return jnp.sum(jnp.where(lane_iota == lane, rowi, 0))

    NO_HIT = 3.0e7  # > INFINITELY_FAR: "slot rejected" sentinel
    slot_iota = jax.lax.broadcasted_iota(i32, (LEAF_SLOTS, 1), 0)

    def leaf_tests(rowi, boxhit, t0, t1, t, which, nx, ny, nz):
        # clamp: cond branches may be traced/executed speculatively and
        # a branch node carries lrow = -1 (results are masked by count)
        lrow = jnp.maximum(extract_i(rowi, L_LEAF_ROW), 0)
        tbase = extract_i(rowi, L_TRI_BASE)
        lcount = extract_i(rowi, L_LEAF_COUNT)

        grp = lrow // LEAVES_PER_GROUP
        sub = lrow % LEAVES_PER_GROUP
        base = pl.multiple_of(grp * GROUP_ROWS, GROUP_ROWS)
        block = leaves_ref[pl.ds(base, GROUP_ROWS), :]  # (16, 126)
        rec = jax.lax.switch(
            sub,
            [
                (lambda s=s: block[0:LEAF_SLOTS, s * LEAF_RECORD : (s + 1) * LEAF_RECORD])
                for s in range(LEAVES_PER_GROUP)
            ],
        )  # (10, 18): slot-major triangle records

        # per-slot vertex/normal columns, broadcast against rays on lanes
        v0x, v0y, v0z = rec[:, 0:1], rec[:, 1:2], rec[:, 2:3]
        v1x, v1y, v1z = rec[:, 3:4], rec[:, 4:5], rec[:, 5:6]
        v2x, v2y, v2z = rec[:, 6:7], rec[:, 7:8], rec[:, 8:9]

        e0x, e0y, e0z = v1x - v0x, v1y - v0y, v1z - v0z
        e1x, e1y, e1z = v0x - v2x, v0y - v2y, v0z - v2z
        # all (10, R) via (10,1) x (1,R) broadcasting
        Mx = e1y * Dz - e1z * Dy
        My = e1z * Dx - e1x * Dz
        Mz = e1x * Dy - e1y * Dx
        det = e0x * Mx + e0y * My + e0z * Mz
        ok = jnp.abs(det) >= mt_eps
        inv_det = 1.0 / jnp.where(ok, det, 1.0)
        Tx, Ty, Tz = Px - v0x, Py - v0y, Pz - v0z
        Qx = Ty * e0z - Tz * e0y
        Qy = Tz * e0x - Tx * e0z
        Qz = Tx * e0y - Ty * e0x
        d = -(e1x * Qx + e1y * Qy + e1z * Qz) * inv_det
        ok = ok & (d <= t) & (d >= t0) & (d <= t1)
        u = (Tx * Mx + Ty * My + Tz * Mz) * inv_det
        ok = ok & (u >= 0.0) & (u <= 1.0)
        v = (Dx * Qx + Dy * Qy + Dz * Qz) * inv_det
        ok = ok & (v >= 0.0) & (u + v <= 1.0)
        ok = ok & boxhit & (slot_iota < lcount)

        d_ok = jnp.where(ok, d, NO_HIT)
        dmin = jnp.min(d_ok, axis=0, keepdims=True)        # (1, R)
        accept = dmin <= t
        winner = ok & (d_ok == dmin)
        # ties at equal d: the sequential engine's last accepted slot
        # wins, so pick the highest winning slot
        slot_win = jnp.max(
            jnp.where(winner, slot_iota, -1), axis=0, keepdims=True
        )
        last = winner & (slot_iota == slot_win)

        w0 = 1.0 - u - v
        n0x, n0y, n0z = rec[:, 9:10], rec[:, 10:11], rec[:, 11:12]
        n1x, n1y, n1z = rec[:, 12:13], rec[:, 13:14], rec[:, 14:15]
        n2x, n2y, n2z = rec[:, 15:16], rec[:, 16:17], rec[:, 17:18]
        pick = lambda q: jnp.sum(jnp.where(last, q, 0.0), axis=0, keepdims=True)
        nx_new = pick(n0x * w0 + n1x * u + n2x * v)
        ny_new = pick(n0y * w0 + n1y * u + n2y * v)
        nz_new = pick(n0z * w0 + n1z * u + n2z * v)

        t = jnp.where(accept, dmin, t)
        which = jnp.where(accept, tbase + slot_win, which)
        nx = jnp.where(accept, nx_new, nx)
        ny = jnp.where(accept, ny_new, ny)
        nz = jnp.where(accept, nz_new, nz)
        return t, which, nx, ny, nz

    def cond(c):
        g, steps = c[0], c[1]
        keep = (g >= 0) & (steps < max_steps)
        if any_hit:
            # occlusion query: stop as soon as every active lane is hit
            keep = keep & jnp.any(act & (c[2] >= INFINITELY_FAR))
        return keep

    def body(c):
        g, steps, t, which, nx, ny, nz = c
        row = nodes_ref[pl.ds(g // NODES_PER_ROW, 1), :]  # (1, 128)
        rowf = jax.lax.switch(
            g % NODES_PER_ROW,
            [
                (lambda s=s: row[0:1, s * NODE_LANES : (s + 1) * NODE_LANES])
                for s in range(NODES_PER_ROW)
            ],
        )
        rowi = pltpu.bitcast(rowf, jnp.int32)

        bminx = rowf[0:1, L_BOXMIN + 0 : L_BOXMIN + 1]
        bminy = rowf[0:1, L_BOXMIN + 1 : L_BOXMIN + 2]
        bminz = rowf[0:1, L_BOXMIN + 2 : L_BOXMIN + 3]
        bmaxx = rowf[0:1, L_BOXMAX + 0 : L_BOXMAX + 1]
        bmaxy = rowf[0:1, L_BOXMAX + 1 : L_BOXMAX + 2]
        bmaxz = rowf[0:1, L_BOXMAX + 2 : L_BOXMAX + 3]

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

        lcount = extract_i(rowi, L_LEAF_COUNT)

        t, which, nx, ny, nz = jax.lax.cond(
            anyhit & (lcount > 0),
            lambda: leaf_tests(rowi, boxhit, t0, t1, t, which, nx, ny, nz),
            lambda: (t, which, nx, ny, nz),
        )

        link_lane = jnp.where(anyhit, hit_lane, hit_lane + 1)
        g_next = extract_i(rowi, link_lane)
        return g_next, steps + 1, t, which, nx, ny, nz

    # a packet with no active lanes skips the walk entirely (matters
    # for late bounces and gated shadow packets)
    g0 = jnp.where(jnp.any(act), jnp.int32(root), jnp.int32(-1))
    init = (
        g0,
        jnp.int32(0),
        jnp.full((1, R), INFINITELY_FAR, f32),
        jnp.full((1, R), -1, i32),
        jnp.zeros((1, R), f32),
        jnp.zeros((1, R), f32),
        jnp.zeros((1, R), f32),
    )
    g, steps, t, which, nx, ny, nz = jax.lax.while_loop(cond, body, init)

    # budget exhausted mid-walk (fs:436-438 analog); an any-hit early
    # exit leaves g >= 0 legitimately, so gate on the step count
    overflow = (g >= 0) & (steps >= max_steps)
    badv = jnp.where(act & overflow, 1, 0).astype(i32)
    t_ref[0:1, :] = jnp.where(badv > 0, -1.0, t)
    which_ref[0:1, :] = jnp.where(badv > 0, -1, which)
    n_ref[0:1, :] = nx
    n_ref[1:2, :] = ny
    n_ref[2:3, :] = nz
    bad_ref[0:1, :] = badv


def packet_trace(
    scene: PackedScene,
    P: jnp.ndarray,
    D: jnp.ndarray,
    active: jnp.ndarray | None = None,
    tile: int = 512,
    max_steps: int | None = None,
    mt_eps: float = MT_EPSILON,
    any_hit: bool = False,
    interpret: bool = False,
) -> PacketHit:
    """Trace a batch of object-space rays.  P, D: (R, 3) float32.

    Rays are processed in ``tile``-lane packets (one Pallas grid step
    each); pad R to a multiple of ``tile`` for best behavior — the
    function pads internally otherwise.
    """
    R = P.shape[0]
    pad = (-R) % tile
    Rp = R + pad

    def prep(x):
        x = jnp.asarray(x, jnp.float32)
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad, 3), x.dtype)], axis=0)
        return x.T.reshape(3, Rp)

    Pt = prep(P)
    Dt = prep(D)
    if active is None:
        actv = jnp.ones((1, R), jnp.float32)
    else:
        actv = jnp.asarray(active).astype(jnp.float32).reshape(1, R)
    if pad:
        actv = jnp.concatenate([actv, jnp.zeros((1, pad), jnp.float32)], axis=1)

    n_tiles = Rp // tile
    if max_steps is None:
        max_steps = 2 * scene.node_count + 2

    kernel = functools.partial(
        _kernel,
        root=scene.root,
        max_steps=max_steps,
        mt_eps=mt_eps,
        tile=tile,
        any_hit=any_hit,
    )

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    rays = lambda rows: pl.BlockSpec(
        (rows, tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )

    t, which, n, bad = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            full(scene.nodes.shape),
            full(scene.leaves.shape),
            rays(3),
            rays(3),
            rays(1),
        ],
        out_specs=[rays(1), rays(1), rays(3), rays(1)],
        out_shape=[
            jax.ShapeDtypeStruct((1, Rp), jnp.float32),
            jax.ShapeDtypeStruct((1, Rp), jnp.int32),
            jax.ShapeDtypeStruct((3, Rp), jnp.float32),
            jax.ShapeDtypeStruct((1, Rp), jnp.int32),
        ],
        interpret=interpret,
    )(scene.nodes, scene.leaves, Pt, Dt, actv)

    return PacketHit(
        t=t[0, :R],
        which=which[0, :R],
        normal=n[:, :R].T,
        bad=bad[0, :R] > 0,
    )
