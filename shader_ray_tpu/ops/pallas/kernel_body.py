"""Packet megakernel body with interleaved walks.

Separated from packet.py for readability: this module holds only the
Pallas kernel function.  See packet.py's module docstring for the
design rationale.

Interleaving: the serial chain of a single packet walk (node fetch ->
slab test -> anyhit reduce -> link select -> next fetch) leaves the
vector unit idle between dependent steps.  The kernel therefore runs
``W`` INDEPENDENT sub-packet walks over disjoint lane ranges of the
ray block, round-robining one step of each per loop iteration — W
dependency chains overlap, hiding each other's latency.  A finished
walk idles at g = -1 (its per-iteration work is skipped by lax.cond).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from shader_ray_tpu.ops.pallas.pack import GROUP_ROWS, LEAF_SLOTS, leaf_layout

INFINITELY_FAR = 1.0e7   # fs:115
RANGE_T1 = 1.0e8         # fs:463,491


def _fast_recip(x):
    """-1/x for slot tests: full-precision f32 divide is the single
    costliest vector op in a leaf slot; the VPU's approximate
    reciprocal + ONE Newton step is ~full f32 precision (1-2 ulp) at
    a fraction of the issue cost.  Mosaic's pl.reciprocal lowering
    only accepts VECTOR f32 (the scalar path hits the known F32Type
    .element_type bug, CLAUDE.md), and scalar divides run on the
    scalar unit anyway — so scalars keep the exact divide.  x == 0
    yields inf/NaN either way; callers' eps-reject masks them."""
    if getattr(x, "ndim", 0) >= 2:
        r0 = pl.reciprocal(x, approx=True)
        r1 = r0 * (2.0 - x * r0)
        # second Newton step: error squares again — bit-near-exact
        # even under the interpreter's coarse (~8-bit) approx
        # emulation, so CPU parity tests stay tight; still ~half the
        # issue cost of the full-precision divide
        return -(r1 * (2.0 - x * r1))
    return -1.0 / x


def safe_inv(d):
    """Finite 1/d for slab math: a zero direction component maps to
    1e30 (as if the ray crawled at 1e-30), keeping the wide walker's
    folded dequant affine (A = s*inv, B = (o-P)*inv) NaN-free.  With
    IEEE inf, ``qn*(s*inf) + (o-P)*inf`` is NaN whenever the two terms
    disagree in sign — every slab test then compares false and the
    walk dies after the root pop.  This silently killed shadow walks
    for axis-aligned lights (the app default light is (0,0,1)): rays
    reported unoccluded because the occlusion walk never descended.
    The finite-huge form classifies inside/behind/ahead identically
    (terms stay < 1e32, far below f32 overflow)."""
    return 1.0 / jnp.where(d == 0.0, 1e-30, d)


def slot_hit(e, r, t, d_lo, d_hi, mt_eps, isect: str):
    """One triangle-slot intersection over the ray packet: ``e(c)``
    loads scalar lane ``c`` of the slot's record (VMEM extract or SMEM
    load depending on the caller).  Returns (ok, d, u, v) — the
    pre-gate accept mask and hit parameters.

    ``isect == "mt"``: Moller-Trumbore on raw vertices
    (raytracer.es.fs:297-345 early-outs as lane masks; eps 1e-7 on the
    determinant, fs:312-315).  ``isect == "woop"``: precomputed
    world->unit-triangle affine (pack.WOOP_LEAF_RECORD layout) — t/u/v
    are each an affine dot, and the eps test runs on N.D which equals
    -det_MT exactly, preserving the reference accept set.  The
    reference's ``u <= 1`` reject (fs:331-335) is implied by
    ``v >= 0 && u + v <= 1`` and therefore not re-tested."""
    Px, Py, Pz = r["Px"], r["Py"], r["Pz"]
    Dx, Dy, Dz = r["Dx"], r["Dy"], r["Dz"]
    if isect == "woop":
        nx_, ny_, nz_ = e(0), e(1), e(2)
        dz = nx_ * Dx + ny_ * Dy + nz_ * Dz      # == -det_MT
        oz = nx_ * Px + ny_ * Py + nz_ * Pz + e(3)
        ok = jnp.abs(dz) >= mt_eps
        # no zero-guard on the reciprocal: dz == 0 gives inf/NaN d and
        # u/v, every comparison with them is False, and ``ok`` is
        # already False from the eps test — the accept mask keeps
        # poisoned lanes out of all outputs
        rcp = _fast_recip(dz)
        d = oz * rcp
        ok = ok & (d <= t) & (d >= d_lo)
        if not (isinstance(d_hi, float) and d_hi >= INFINITELY_FAR):
            ok = ok & (d <= d_hi)
        ax, ay, az = e(4), e(5), e(6)
        u = (ax * Px + ay * Py + az * Pz + e(7)) + d * (
            ax * Dx + ay * Dy + az * Dz
        )
        ok = ok & (u >= 0.0)
        bx, by, bz = e(8), e(9), e(10)
        v = (bx * Px + by * Py + bz * Pz + e(11)) + d * (
            bx * Dx + by * Dy + bz * Dz
        )
        ok = ok & (v >= 0.0) & (u + v <= 1.0)
        return ok, d, u, v

    v0x, v0y, v0z = e(0), e(1), e(2)
    e0x, e0y, e0z = e(3) - v0x, e(4) - v0y, e(5) - v0z   # v1 - v0
    e1x, e1y, e1z = v0x - e(6), v0y - e(7), v0z - e(8)   # v0 - v2
    # M = cross(e1, D)  (fs:305)
    Mx = e1y * Dz - e1z * Dy
    My = e1z * Dx - e1x * Dz
    Mz = e1x * Dy - e1y * Dx
    det = e0x * Mx + e0y * My + e0z * Mz
    ok = jnp.abs(det) >= mt_eps
    # fold the d-negation into the reciprocal; no zero-guard (see the
    # woop branch comment — rejects mask any inf/NaN through)
    minv_det = _fast_recip(det)
    inv_det = -minv_det
    Tx, Ty, Tz = Px - v0x, Py - v0y, Pz - v0z
    Qx = Ty * e0z - Tz * e0y
    Qy = Tz * e0x - Tx * e0z
    Qz = Tx * e0y - Ty * e0x
    d = (e1x * Qx + e1y * Qy + e1z * Qz) * minv_det
    ok = ok & (d <= t) & (d >= d_lo)
    if not (isinstance(d_hi, float) and d_hi >= INFINITELY_FAR):
        # redundant when the static bound exceeds the initial t
        ok = ok & (d <= d_hi)
    u = (Tx * Mx + Ty * My + Tz * Mz) * inv_det
    ok = ok & (u >= 0.0)
    v = (Dx * Qx + Dy * Qy + Dz * Qz) * inv_det
    ok = ok & (v >= 0.0) & (u + v <= 1.0)
    return ok, d, u, v


def slot_normal(e, u, v, isect: str):
    """Interpolated-normal components for an accepting slot:
    n0 + u*(n1-n0) + v*(n2-n0) (delta form — 2 FMAs/component).  The
    woop record stores the deltas prefolded; mt derives them with
    free scalar subs."""
    if isect == "woop":
        n0x, n0y, n0z = e(12), e(13), e(14)
        d1x, d1y, d1z = e(15), e(16), e(17)
        d2x, d2y, d2z = e(18), e(19), e(20)
    else:
        n0x, n0y, n0z = e(9), e(10), e(11)
        d1x, d1y, d1z = e(12) - n0x, e(13) - n0y, e(14) - n0z
        d2x, d2y, d2z = e(15) - n0x, e(16) - n0y, e(17) - n0z
    return (
        n0x + u * d1x + v * d2x,
        n0y + u * d1y + v * d2y,
        n0z + u * d1z + v * d2z,
    )


def leaf_tests(
    leaves_ref, r, lrow, tbase, lcount,
    mask, d_lo, d_hi, t, which, nx, ny, nz, mt_eps,
    leaf_slots: int = LEAF_SLOTS,
    occlusion: bool = False,
    isect: str = "mt",
    track_which: bool = True,
):
    """Slot-parallel triangle tests over one leaf's <= 10 triangles
    with at-accept normal interpolation (intersector per ``isect``,
    see slot_hit).  ``mask`` is the per-ray accept gate (the binary
    walk passes its slab boxhit; the wide walk passes the active
    mask — the leaf box contains its triangles, so the per-leaf slab
    clip is geometrically redundant); ``d_lo``/``d_hi`` bound the
    accepted hit distance (scalars or per-ray vectors).

    ``occlusion``: any-hit mode — an accepted hit just zeroes the
    lane's t (retiring it from all further box/leaf tests); the
    which/normal bookkeeping (~15% of slot ops) is skipped."""
    record, per_group = leaf_layout(isect)
    grp = lrow // per_group
    sub = lrow % per_group
    base = pl.multiple_of(grp * GROUP_ROWS, GROUP_ROWS)
    block = leaves_ref[pl.ds(base, GROUP_ROWS), :]
    rec = jax.lax.switch(
        sub,
        [
            # slice the full GROUP_ROWS (not LEAF_SLOTS): leaf budgets
            # above 10 (SRT_MAX_LEAF_TESTS) index slot rows up to 16
            (lambda s=s: block[0:GROUP_ROWS, s * record : (s + 1) * record])
            for s in range(per_group)
        ],
    )  # (10, record): slot-major triangle records

    for k in range(leaf_slots):
        # true scalar extraction (a reduction) — Mosaic folds
        # broadcast+slice chains back into an unsupported
        # (1,1)->(F,C) two-axis broadcast; scalar splat is native
        e = lambda c: jnp.sum(rec[k : k + 1, c : c + 1])
        ok, d, u, v = slot_hit(e, r, t, d_lo, d_hi, mt_eps, isect)
        # no (k < lcount) mask: slots past the leaf's count hold
        # all-zero records whose zero determinant/normal fails the
        # eps accept already
        take = ok & mask

        if occlusion:
            t = jnp.where(take, 0.0, t)
            continue
        t = jnp.where(take, d, t)
        if track_which:
            # the fused megakernel never reads `which` (shading needs
            # only t + normal) — skipping saves a select per slot
            which = jnp.where(take, tbase + k, which)
        inx, iny, inz = slot_normal(e, u, v, isect)
        nx = jnp.where(take, inx, nx)
        ny = jnp.where(take, iny, ny)
        nz = jnp.where(take, inz, nz)
    return t, which, nx, ny, nz


def make_walk_rays(P_ref, D_ref, act_ref, fold, walks, lane_chunk):
    """Per-walk ray register blocks + majority octant (shared by the
    binary and wide packet kernels)."""
    f32 = jnp.float32
    i32 = jnp.int32
    F = fold

    def lanes(x, w):
        return x[:, w * lane_chunk : (w + 1) * lane_chunk]

    rays = []
    for w in range(walks):
        Px, Py, Pz = (lanes(P_ref[0:F, :], w), lanes(P_ref[F : 2 * F, :], w),
                      lanes(P_ref[2 * F :, :], w))
        Dx, Dy, Dz = (lanes(D_ref[0:F, :], w), lanes(D_ref[F : 2 * F, :], w),
                      lanes(D_ref[2 * F :, :], w))
        act = lanes(act_ref[:, :], w) > 0
        actf = act.astype(f32)
        octant = (
            (jnp.sum(Dx * actf) > 0.0).astype(i32)
            + 2 * (jnp.sum(Dy * actf) > 0.0).astype(i32)
            + 4 * (jnp.sum(Dz * actf) > 0.0).astype(i32)
        )
        rays.append(dict(
            Px=Px, Py=Py, Pz=Pz, Dx=Dx, Dy=Dy, Dz=Dz,
            invx=safe_inv(Dx), invy=safe_inv(Dy), invz=safe_inv(Dz),
            act=act, octant=octant,
        ))
    return rays


def packet_kernel(
    leaves_ref,
    links_ref,
    boxes_ref,
    meta_ref,
    tribase_ref,
    P_ref,
    D_ref,
    act_ref,
    t_ref,
    which_ref,
    n_ref,
    bad_ref,
    *maybe_stats_ref,
    root: int,
    max_steps: int,
    mt_eps: float,
    tile: int,
    fold: int,
    walks: int,
    box_quant: tuple,
    any_hit: bool = False,
    with_stats: bool = False,
):
    f32 = jnp.float32
    i32 = jnp.int32
    F = fold
    C = tile // F          # full ray block is (F, C)
    W = walks
    CW = C // W            # lanes per sub-packet walk

    rays = make_walk_rays(P_ref, D_ref, act_ref, F, W, CW)

    ox, oy, oz, sx, sy, sz = box_quant

    def walk_step(w, st):
        """One node step of sub-packet walk w.  Must be safe to run
        with g < 0 (branch-free interleave merges the result away).
        All node data comes from SMEM scalars — the serial chain never
        touches the vector unit until the slab test itself."""
        g, steps, leafs, t, which, nx, ny, nz = st
        r = rays[w]
        g = jnp.maximum(g, 0)

        # links packed hit<<16 | miss&0xffff; meta packed
        # count<<26 | leaf_row; boxes 16-bit fixed point qmin<<16|qmax
        hm = links_ref[g * 8 + r["octant"]]
        hit_link = hm >> 16        # sign-extends the -1 sentinel
        mlow = hm & 0xFFFF
        miss_link = jnp.where(mlow == 0xFFFF, -1, mlow)
        meta = meta_ref[g]
        lcount = (meta >> 26) & 0x3F
        lrow_s = meta & 0x3FFFFFF

        f32 = jnp.float32
        wx = boxes_ref[3 * g]
        wy = boxes_ref[3 * g + 1]
        wz = boxes_ref[3 * g + 2]
        bminx = ((wx >> 16) & 0xFFFF).astype(f32) * sx + ox
        bmaxx = (wx & 0xFFFF).astype(f32) * sx + ox
        bminy = ((wy >> 16) & 0xFFFF).astype(f32) * sy + oy
        bmaxy = (wy & 0xFFFF).astype(f32) * sy + oy
        bminz = ((wz >> 16) & 0xFFFF).astype(f32) * sz + oz
        bmaxz = (wz & 0xFFFF).astype(f32) * sz + oz

        Px, Py, Pz = r["Px"], r["Py"], r["Pz"]
        tax = (bminx - Px) * r["invx"]
        tbx = (bmaxx - Px) * r["invx"]
        tay = (bminy - Py) * r["invy"]
        tby = (bmaxy - Py) * r["invy"]
        taz = (bminz - Pz) * r["invz"]
        tbz = (bmaxz - Pz) * r["invz"]
        lox = jnp.minimum(tax, tbx)
        hix = jnp.maximum(tax, tbx)
        loy = jnp.minimum(tay, tby)
        hiy = jnp.maximum(tay, tby)
        loz = jnp.minimum(taz, tbz)
        hiz = jnp.maximum(taz, tbz)
        t0 = jnp.maximum(jnp.maximum(lox, loy), jnp.maximum(loz, 0.0))
        t1 = jnp.minimum(jnp.minimum(hix, hiy), jnp.minimum(hiz, RANGE_T1))

        boxhit = (t0 < t1) & (t0 < t) & r["act"]
        anyhit = jnp.any(boxhit)

        is_leaf_visit = anyhit & (lcount > 0)
        t, which, nx, ny, nz = jax.lax.cond(
            is_leaf_visit,
            lambda: leaf_tests(
                leaves_ref, r, lrow_s, tribase_ref[lrow_s], lcount,
                boxhit, t0, t1, t, which, nx, ny, nz, mt_eps,
                occlusion=any_hit,
            ),
            lambda: (t, which, nx, ny, nz),
        )

        g_next = jnp.where(anyhit, hit_link, miss_link)
        if any_hit:
            # occlusion query: a lane that found ANY hit is done — zero
            # its t so the t0 < t cull rejects every further box for it;
            # finish as soon as every active lane hit
            t = jnp.where(t < INFINITELY_FAR, 0.0, t)
            done = ~jnp.any(r["act"] & (t >= INFINITELY_FAR))
            g_next = jnp.where(done, -1, g_next)
        # budget exhaustion only counts if the walk wasn't finishing
        # anyway (-2 marks bad; a natural -1 exit at the last step is fine)
        g_next = jnp.where((steps + 1 >= max_steps) & (g_next >= 0), -2, g_next)
        return (
            g_next,
            steps + 1,
            leafs + is_leaf_visit.astype(i32),
            t, which, nx, ny, nz,
        )

    def cond(states):
        alive = None
        for w in range(W):
            a = states[w][0] >= 0
            alive = a if alive is None else (alive | a)
        return alive

    def body(states):
        out = []
        for w in range(W):
            st = states[w]
            if W == 1:
                # single walk: a real branch costs nothing to predict
                st = jax.lax.cond(
                    st[0] >= 0,
                    lambda st=st, w=w: walk_step(w, st),
                    lambda st=st: st,
                )
            else:
                # branch-free: always step, discard results of finished
                # walks — W independent chains interleave without the
                # serialization a lax.cond imposes
                alive = st[0] >= 0
                st2 = walk_step(w, st)
                st = tuple(
                    jnp.where(alive, a, b) for a, b in zip(st2, st)
                )
            out.append(st)
        return tuple(out)

    def init_state(w):
        g0 = jnp.where(
            jnp.any(rays[w]["act"]), jnp.int32(root), jnp.int32(-1)
        )
        return (
            g0,
            jnp.int32(0),
            jnp.int32(0),
            jnp.full((F, CW), INFINITELY_FAR, f32),
            jnp.full((F, CW), -1, i32),
            jnp.zeros((F, CW), f32),
            jnp.zeros((F, CW), f32),
            jnp.zeros((F, CW), f32),
        )

    states = jax.lax.while_loop(
        cond, body, tuple(init_state(w) for w in range(W))
    )

    steps_total = jnp.int32(0)
    leafs_total = jnp.int32(0)
    for w in range(W):
        g, steps, leafs, t, which, nx, ny, nz = states[w]
        sl = slice(w * CW, (w + 1) * CW)
        overflow = g == -2  # budget exhausted mid-walk (fs:436-438)
        badv = jnp.where(rays[w]["act"] & overflow, 1, 0).astype(i32)
        t_ref[:, sl] = jnp.where(badv > 0, -1.0, t)
        which_ref[:, sl] = jnp.where(badv > 0, -1, which)
        n_ref[0:F, sl] = nx
        n_ref[F : 2 * F, sl] = ny
        n_ref[2 * F :, sl] = nz
        bad_ref[:, sl] = badv
        steps_total = steps_total + steps
        leafs_total = leafs_total + leafs

    if with_stats:
        # vector-composed stats block (scalar VMEM stores unsupported)
        stats_ref = maybe_stats_ref[0]
        ri = jax.lax.broadcasted_iota(i32, (8, 128), 0)
        ci = jax.lax.broadcasted_iota(i32, (8, 128), 1)
        stats_ref[:, :] = jnp.where(
            (ri == 0) & (ci == 0), steps_total,
            jnp.where((ri == 0) & (ci == 1), leafs_total, 0),
        )
