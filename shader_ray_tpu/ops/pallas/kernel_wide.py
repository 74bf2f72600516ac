"""Wide-BVH packet megakernel body (Pallas TPU), v3.

One walk step pops up to SRT_POPS (default 4) wide nodes off a short
SMEM stack and slab-tests ALL their children against the whole ray
packet before a single scalar sync.  Layout choices are driven by measured axon v5e costs
(vector op ~2-12 ns, any-reduce ~150 ns, vector->scalar extract
~46 ns, SMEM scalar ops ~free, VMEM->SMEM DMA ~260 ns):

  * child boxes come from SMEM as 16-bit fixed point; the dequant
    affine folds into per-walk (A, B) ray vectors so each child's slab
    test is pure ray-layout vector math with free scalar splats — no
    cross-lane broadcasts anywhere;
  * per-child any-hit bits accumulate per lane (bit p = octant
    position p), then ONE sublane/lane OR-tree + ONE scalar extract
    yields the 8-bit hit mask — vs 8 independent reduces;
  * hit leaf children are processed near-to-far by a bit-scan
    while_loop (zero cost when a step hits no leaves); the default
    leaf_mode="scalar" runs slot-parallel Moller-Trumbore with scalar
    extractions (measured fastest); "dma" copies the 16x128 leaf group
    VMEM->SMEM and reads triangle scalars from SMEM instead;
  * hit internal children push far-to-near (nearest pops first) via
    predicated SMEM stores.

``walks`` independent sub-packet walks interleave branch-free to hide
the serial step latency; a dead walk (empty stack) takes fake steps on
a clamped node with its hit mask forced to 0, so both passes no-op and
its pushes never advance sp.

The walk machinery is exposed as ``make_wide_walker`` so the fused
shading megakernel (kernel_mega.py) can run multiple walks (bounce +
shadow per bounce) inside ONE pallas_call, sharing the same SMEM
tables and scratch.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shader_ray_tpu.ops.pallas.kernel_body import (
    INFINITELY_FAR,
    RANGE_T1,
    leaf_tests,
    make_walk_rays,
    slot_hit,
    slot_normal,
)
from shader_ray_tpu.ops.pallas.pack import LEAF_SLOTS, leaf_layout
from shader_ray_tpu.ops.pallas.pack_wide import SMALL_LEAF_MAX, TINY_LEAF_MAX, WIDE

GROUP_ROWS = 16

# perf-attribution probe: SRT_STEP_COUNT=iters makes the stats "steps"
# column count WALK-LOOP ITERATIONS instead of real node pops — the
# difference (iters * pops vs pops summed) is the fake multi-pop slab
# work done when a stack holds fewer than ``pops`` entries
_COUNT_ITERS = os.environ.get("SRT_STEP_COUNT") == "iters"


def leaf_tests_smem(
    buf, w, r, sub, tbase, lcount, gate, t, which, nx, ny, nz, mt_eps,
    occlusion: bool = False,
    isect: str = "mt",
    track_which: bool = True,
    tb_from_buf: bool = False,
):
    """Triangle tests over one leaf with record data read as SMEM
    scalars from the DMA'd leaf-group buffer ``buf`` (rows
    [w*16, w*16+16)) — scalar loads splat natively, so there is no
    vector->scalar extraction in the chain, AND the slot loop is a
    dynamic fori_loop to the leaf's actual count (the static variant
    always pays all 10 slots; the average leaf holds ~7)."""
    record, _ = leaf_layout(isect)
    cbase = sub * record
    if tb_from_buf and track_which:
        # HBM leaf tier: the tribase rides in the group's spare lane
        # (pack.TB_LANE), read back from the DMA'd SMEM buffer — the
        # SMEM tribase table would overflow at ~2M triangles
        tbase = _tb_from_buf(buf, w, sub)

    def slot(k, st):
        t, which, nx, ny, nz = st
        e = lambda c: buf[w * GROUP_ROWS + k, cbase + c]
        ok, d, u, v = slot_hit(e, r, t, 0.0, INFINITELY_FAR, mt_eps, isect)
        take = ok & gate

        if occlusion:
            return (jnp.where(take, 0.0, t), which, nx, ny, nz)
        t = jnp.where(take, d, t)
        if track_which:
            which = jnp.where(take, tbase + k, which)
        inx, iny, inz = slot_normal(e, u, v, isect)
        nx = jnp.where(take, inx, nx)
        ny = jnp.where(take, iny, ny)
        nz = jnp.where(take, inz, nz)
        return (t, which, nx, ny, nz)

    t, which, nx, ny, nz = jax.lax.fori_loop(
        0, lcount, slot, (t, which, nx, ny, nz)
    )
    return t, which, nx, ny, nz


def _tb_from_buf(buf, w, sub):
    """Leaf tribase from the DMA'd group buffer's spare lane (exact:
    f32 holds indices below 2^24; pack_scene_wide asserts the bound)."""
    from shader_ray_tpu.ops.pallas.pack import TB_LANE

    return buf[w * GROUP_ROWS + sub, TB_LANE].astype(jnp.int32)


def leaf_tests_smem_static(
    buf, w, r, sub, tbase, lcount, gate, t, which, nx, ny, nz, mt_eps,
    leaf_slots: int = 10,
    occlusion: bool = False,
    isect: str = "mt",
    track_which: bool = True,
    tb_from_buf: bool = False,
):
    """Static-unroll triangle tests over the DMA'd leaf-group buffer:
    SMEM scalar loads splat for free (a VMEM record extract costs ~3
    vector ops, measured round 3) AND the slots pipeline as in the
    "scalar" path — vs leaf_tests_smem's dynamic fori, whose per-slot
    loop overhead cost more than the skipped slots (round-2 "dma"
    verdict).  Oversized slots hold all-zero records the eps accept
    rejects (no count mask needed)."""
    record, _ = leaf_layout(isect)
    cbase = sub * record
    if tb_from_buf and track_which:
        tbase = _tb_from_buf(buf, w, sub)
    for k in range(leaf_slots):
        e = lambda c: buf[w * GROUP_ROWS + k, cbase + c]
        ok, d, u, v = slot_hit(e, r, t, 0.0, INFINITELY_FAR, mt_eps, isect)
        # no (k < lcount) mask — padding slots are all-zero records
        # the eps accept rejects
        take = ok & gate

        if occlusion:
            t = jnp.where(take, 0.0, t)
            continue
        t = jnp.where(take, d, t)
        if track_which:
            which = jnp.where(take, tbase + k, which)
        inx, iny, inz = slot_normal(e, u, v, isect)
        nx = jnp.where(take, inx, nx)
        ny = jnp.where(take, iny, ny)
        nz = jnp.where(take, inz, nz)
    return t, which, nx, ny, nz


def make_wide_walker(
    leaves_ref,
    boxes_ref,
    cmeta_ref,
    order_ref,
    masks_ref,
    tribase_ref,
    nodes_ref,
    stack_ref,
    leafbuf_ref,
    sems_ref,
    nodebuf_ref,
    nsems_ref,
    lqueue_ref,
    *,
    n_wide: int,
    max_steps: int,
    mt_eps: float,
    fold: int,
    walks: int,
    lane_width: int,
    stack_depth: int,
    box_quant: tuple,
    leaf_mode: str = "dma",  # "dma" | "scalar" | "skip" (walk-cost probe)
    leaf_slots: int = 10,    # static slot-unroll bound (scene max count)
    leaf_slots_small: int = SMALL_LEAF_MAX,  # short unrolls for the
    leaf_slots_tiny: int = TINY_LEAF_MAX,    # small/tiny leaf classes
                             # (pack_wide mask bit groups 16-23/24-31)
    node_src: str = "smem",  # "smem" tables | "vmem" rows DMA'd per step
    pops: int = 1,           # stack entries popped per step (1/2/4):
                             # one scalar sync serves all their children
    isect: str = "mt",       # leaf intersector/record format (pack.leaf_layout)
    track_which: bool = True,  # False: caller ignores hit ids (fused
                             # shading) — saves a select per leaf slot
    leaf_src: str = "vmem",  # "hbm": the leaf table lives in device
                             # memory AND the SMEM tribase table is a
                             # dummy — hit ids come from the group
                             # buffer's spare lane (pack.TB_LANE)
    leaf_scan: str = "ctz",  # hit-leaf iteration: "ctz" bit-scans the
                             # leaf mask per visit; "queue" enqueues
                             # hit-leaf metas to SMEM during the push
                             # pass and drains by index — no per-visit
                             # ctz or multi-pop meta selects
):
    """Build a reusable short-stack walker closed over the scene refs
    and scratch.  The returned ``run(rays, any_hit)`` traces the given
    per-walk ray blocks and returns the per-walk final states
    ``(sp, steps, leafs, badw, t, which, nx, ny, nz)`` — callable more
    than once per kernel (the fused megakernel runs 6 walks/step)."""
    f32 = jnp.float32
    i32 = jnp.int32
    F = fold
    W = walks
    CW = lane_width
    SD = stack_depth
    ox, oy, oz, sx, sy, sz = box_quant
    assert pops in (1, 2, 4)
    # HBM leaf tier + hit-id tracking: tribase comes from the DMA'd
    # group buffer (leaf_mode is forced to dma2 there), never from the
    # (dummy) SMEM table
    tb_buf = track_which and leaf_src == "hbm"

    def node_group_dma(w, j, sp):
        """DMA descriptor for the 8-node VMEM group of the j-th-from-
        top stack entry (clamped like the pop loop, so it is valid for
        dead walks too).  Deterministic in (stack contents, sp): the
        walker issues it at the END of a step (prefetch for the next
        pops) and reconstructs the identical descriptor to wait at the
        START of the next step — the entries it reads are exactly the
        ones that step pops, untouched in between."""
        idx = jnp.maximum(sp - 1 - j, 0)
        g = jnp.clip(stack_ref[w * SD + idx], 0, n_wide - 1)
        base = pl.multiple_of((g // 8) * 8, 8)
        return g, pltpu.make_async_copy(
            nodes_ref.at[pl.ds(base, 8), :],
            nodebuf_ref.at[pl.ds((w * pops + j) * 8, 8), :],
            nsems_ref.at[w * pops + j],
        )

    def node_prefetch(w, sp):
        for j in range(pops):
            _, dma = node_group_dma(w, j, sp)
            dma.start()

    def prepare(r):
        # fold the box dequant affine into per-walk ray vectors:
        # slab distance = (q*s + o - P) * inv = q*(s*inv) + (o - P)*inv
        r = dict(r)
        r["Ax"] = sx * r["invx"]
        r["Bx"] = (ox - r["Px"]) * r["invx"]
        r["Ay"] = sy * r["invy"]
        r["By"] = (oy - r["Py"]) * r["invy"]
        r["Az"] = sz * r["invz"]
        r["Bz"] = (oz - r["Pz"]) * r["invz"]
        return r

    def or_reduce_bits(v):
        """(F, CW) i32 lane bitmask -> scalar OR via static halving."""
        rows = F
        while rows > 1:
            rows //= 2
            v = v[0:rows, :] | v[rows : 2 * rows, :]
        width = CW
        while width > 1:
            width //= 2
            v = v[:, 0:width] | v[:, width : 2 * width]
        return jnp.sum(v)  # (1,1) -> scalar

    def walk_step(w, st, r, any_hit):
        sp, steps, leafs, badw, t, which, nx, ny, nz = st
        alive = sp > 0
        # pop up to ``pops`` stack entries per step: one vector slab
        # pass tests all their children and ONE or-tree/scalar sync
        # serves them all — the per-step serial chain (reduce ->
        # extract -> pushes -> next pop) amortizes over pops nodes.
        # When the stack holds fewer, the missing slots re-read a live
        # entry with their valid mask zeroed (pure fake work, no bits).
        npop = jnp.minimum(sp, pops)
        spc = jnp.maximum(sp - npop, 0)

        nodes = []
        for j in range(pops):
            idx = jnp.maximum(sp - 1 - j, 0)
            g = jnp.clip(stack_ref[w * SD + idx], 0, n_wide - 1)
            if node_src == "vmem":
                # large-scene tier: the node's 128-lane row lives in
                # VMEM; its 8-node group was PREFETCHED to SMEM
                # scratch at the end of the previous step (overlapping
                # that step's slab/leaf math) — reconstruct the
                # descriptor and wait here
                _, ndma = node_group_dma(w, j, sp)
                ndma.wait()
                nrow = (w * pops + j) * 8 + (g % 8)
                box_rd = lambda ck, ax, nrow=nrow: nodebuf_ref[nrow, ck * 3 + ax]
                cmeta_rd = lambda ck, nrow=nrow: nodebuf_ref[nrow, 24 + ck]
                orderw = nodebuf_ref[nrow, 32 + r["octant"]]
                masks = nodebuf_ref[nrow, 40]
            else:
                box_rd = lambda ck, ax, g=g: boxes_ref[(g * WIDE + ck) * 3 + ax]
                cmeta_rd = lambda ck, g=g: cmeta_ref[g * WIDE + ck]
                orderw = order_ref[g * WIDE + r["octant"]]
                masks = masks_ref[g]
            valid = jnp.int32(1) if pops == 1 else (j < npop).astype(i32)
            nodes.append(dict(
                g=g, box_rd=box_rd, cmeta_rd=cmeta_rd, orderw=orderw,
                masks=masks, valid=valid,
            ))

        # slab-test each node's 8 children in octant order; bit
        # j*8 + p of the lane mask = this ray hits node j's child at
        # octant position p
        bitsvec = jnp.zeros((F, CW), i32)
        cks = []  # flat (node j, child ck) scalar ids, index j*8 + p
        leaf_perm = jnp.int32(0)
        large_perm = jnp.int32(0)
        overtiny_perm = jnp.int32(0)
        for j, nd in enumerate(nodes):
            validm = (nd["masks"] & 0xFF) * nd["valid"]
            leafm = (nd["masks"] >> 8) & 0xFF
            largem = (nd["masks"] >> 16) & 0xFF
            overtinym = jnp.right_shift(nd["masks"], 24) & 0xFF
            orderw = nd["orderw"]
            for p in range(WIDE):
                bit = j * WIDE + p
                ck = (orderw >> (3 * p)) & 7
                cks.append(ck)
                leaf_perm = leaf_perm | (((leafm >> ck) & 1) << bit)
                large_perm = large_perm | (((largem >> ck) & 1) << bit)
                overtiny_perm = overtiny_perm | (
                    ((overtinym >> ck) & 1) << bit
                )
                b0 = nd["box_rd"](ck, 0)
                b1 = nd["box_rd"](ck, 1)
                b2 = nd["box_rd"](ck, 2)
                qnx = ((b0 >> 16) & 0xFFFF).astype(f32)
                qxx = (b0 & 0xFFFF).astype(f32)
                qny = ((b1 >> 16) & 0xFFFF).astype(f32)
                qxy = (b1 & 0xFFFF).astype(f32)
                qnz = ((b2 >> 16) & 0xFFFF).astype(f32)
                qxz = (b2 & 0xFFFF).astype(f32)
                tax = qnx * r["Ax"] + r["Bx"]
                tbx = qxx * r["Ax"] + r["Bx"]
                tay = qny * r["Ay"] + r["By"]
                tby = qxy * r["Ay"] + r["By"]
                taz = qnz * r["Az"] + r["Bz"]
                tbz = qxz * r["Az"] + r["Bz"]
                t0 = jnp.maximum(
                    jnp.maximum(jnp.minimum(tax, tbx), jnp.minimum(tay, tby)),
                    jnp.maximum(jnp.minimum(taz, tbz), 0.0),
                )
                t1 = jnp.minimum(
                    jnp.minimum(jnp.maximum(tax, tbx), jnp.maximum(tay, tby)),
                    jnp.minimum(jnp.maximum(taz, tbz), RANGE_T1),
                )
                boxhit = (t0 < t1) & (t0 < t) & r["act"]
                vbit = ((validm >> ck) & 1) << bit  # scalar 0 or 1<<bit
                bitsvec = bitsvec | jnp.where(boxhit, vbit, 0)

        bits = or_reduce_bits(bitsvec)
        bits = jnp.where(alive, bits, 0)
        leafbits = bits & leaf_perm
        pushbits = bits & ~leaf_perm

        # pass 1, near-to-far: bit-scan loops over hit leaf children
        # (zero iterations when a step hits none), split by leaf size
        # class so small leaves pay a short STATIC slot unroll — the
        # partition is pack-time data (mask bits 16-23), so there is no
        # per-visit lax.cond (measured +1.3 ms, CLAUDE.md)
        if leaf_mode != "skip":
            gate = r["act"] & alive
            _, per_group = leaf_layout(isect)

            def head_meta(lb):
                """(p, cnt, lrow, tb) of the lowest set bit of ``lb``
                (the nearest unprocessed hit leaf).  On lb == 0 the
                ctz saturates at the top bit and the clamped meta
                reads stay in-bounds (callers gate on lb != 0)."""
                p = jnp.int32(0)
                half = (WIDE * pops) // 2
                while half >= 1:
                    m = (1 << half) - 1
                    p = p + jnp.where(((lb >> p) & m) != 0, 0, half)
                    half //= 2
                # select the owning popped node's order/meta
                orderw_sel = nodes[0]["orderw"]
                g_sel = nodes[0]["g"]
                for j in range(1, pops):
                    is_j = (p // WIDE) == j
                    orderw_sel = jnp.where(
                        is_j, nodes[j]["orderw"], orderw_sel
                    )
                    g_sel = jnp.where(is_j, nodes[j]["g"], g_sel)
                ck = (orderw_sel >> (3 * (p % WIDE))) & 7
                if node_src == "vmem":
                    meta = nodes[0]["cmeta_rd"](ck)
                    for j in range(1, pops):
                        meta = jnp.where(
                            (p // WIDE) == j,
                            nodes[j]["cmeta_rd"](ck),
                            meta,
                        )
                else:
                    meta = cmeta_ref[g_sel * WIDE + ck]
                cnt = (meta >> 26) & 0x1F
                lrow = meta & 0x3FFFFFF
                if track_which and not tb_buf:
                    # on lb == 0 (dma2 peeks head_meta UNGATED) the
                    # saturated ctz can land on an INTERNAL child whose
                    # decoded low bits are a wide-node id larger than
                    # the tribase table — clamp the read; consumers of
                    # tb are gated on lb != 0 (this OOB SMEM read was
                    # the unfused-dma2 on-chip INTERNAL crash, r4)
                    tb = tribase_ref[
                        jnp.minimum(lrow, tribase_ref.shape[0] - 1)
                    ]
                else:
                    # tb_buf: the id comes from the group buffer inside
                    # leaf_tests_smem_static (tb_from_buf)
                    tb = jnp.int32(0)
                return p, cnt, lrow, tb

            def leaf_dma(lrow, parity):
                """Copy ``lrow``'s 16-row leaf group into this walk's
                buffer half ``parity`` (0/1, may be traced).  The group
                index is clamped so even a descriptor built from a
                saturated head_meta peek (dma2, lb == 0 — its start()
                is gated off) stays in bounds."""
                grp = jnp.minimum(
                    lrow // per_group,
                    leaves_ref.shape[0] // GROUP_ROWS - 1,
                )
                dst = pl.multiple_of(
                    (w * 2 + parity) * GROUP_ROWS, GROUP_ROWS
                )
                return pltpu.make_async_copy(
                    leaves_ref.at[
                        pl.ds(pl.multiple_of(grp * GROUP_ROWS,
                                             GROUP_ROWS),
                              GROUP_ROWS), :
                    ],
                    leafbuf_ref.at[pl.ds(dst, GROUP_ROWS), :],
                    sems_ref.at[w * 2 + parity],
                )

            def tb_of(lrow):
                if not track_which or tb_buf:
                    return jnp.int32(0)
                return tribase_ref[
                    jnp.minimum(lrow, tribase_ref.shape[0] - 1)
                ]

            def drain_class(ci, ncls, n, slots, leafs, t, which, nx, ny, nz):
                """leaf_scan="queue": visit the ci-th class queue in
                REVERSE index order (entries were pushed far-to-near,
                so this is the same near-to-far visit order as the ctz
                scan — results are identical).  Each visit costs one
                SMEM load + two decodes instead of a ctz chain and the
                multi-pop orderw/meta selects.  dma2 keeps its
                double-buffered leaf pipeline."""
                qbase = (w * ncls + ci) * (WIDE * pops)
                meta_at = lambda i: lqueue_ref[qbase + jnp.maximum(i, 0)]
                if leaf_mode == "dma2":
                    m0 = meta_at(n - 1)
                    l0 = m0 & 0x3FFFFFF
                    c0 = (m0 >> 26) & 0x1F
                    has0 = n > 0

                    @pl.when(has0)
                    def _():
                        leaf_dma(l0, 0).start()

                    def lbody(s):
                        (qi, clrow, ccnt, ctb, par, _has, leafs_,
                         t_, which_, nx_, ny_, nz_) = s
                        hasn = qi >= 0
                        mn = meta_at(qi)
                        nlrow = mn & 0x3FFFFFF
                        ncnt = (mn >> 26) & 0x1F
                        ntb = tb_of(nlrow)

                        @pl.when(hasn)
                        def _():
                            leaf_dma(nlrow, 1 - par).start()

                        leaf_dma(clrow, par).wait()
                        sub = clrow % per_group
                        t_, which_, nx_, ny_, nz_ = leaf_tests_smem_static(
                            leafbuf_ref, w * 2 + par, r, sub, ctb, ccnt,
                            gate, t_, which_, nx_, ny_, nz_, mt_eps,
                            leaf_slots=slots,
                            occlusion=any_hit,
                            isect=isect,
                            track_which=track_which,
                            tb_from_buf=tb_buf,
                        )
                        return (qi - 1, nlrow, ncnt, ntb, 1 - par, hasn,
                                leafs_ + 1, t_, which_, nx_, ny_, nz_)

                    out = jax.lax.while_loop(
                        lambda s: s[5], lbody,
                        (n - 2, l0, c0, tb_of(l0), jnp.int32(0), has0,
                         leafs, t, which, nx, ny, nz),
                    )
                    return out[6], out[7], out[8], out[9], out[10], out[11]

                def lbody(s):
                    qi, leafs_, t_, which_, nx_, ny_, nz_ = s
                    m = meta_at(qi)
                    lrow = m & 0x3FFFFFF
                    cnt = (m >> 26) & 0x1F
                    tb = tb_of(lrow)
                    if leaf_mode in ("dma", "dmastatic"):
                        sub = lrow % per_group
                        dma = leaf_dma(lrow, 0)
                        dma.start()
                        dma.wait()
                        if leaf_mode == "dmastatic":
                            t_, which_, nx_, ny_, nz_ = leaf_tests_smem_static(
                                leafbuf_ref, w * 2, r, sub, tb, cnt, gate,
                                t_, which_, nx_, ny_, nz_, mt_eps,
                                leaf_slots=slots,
                                occlusion=any_hit,
                                isect=isect,
                                track_which=track_which,
                                tb_from_buf=tb_buf,
                            )
                        else:
                            t_, which_, nx_, ny_, nz_ = leaf_tests_smem(
                                leafbuf_ref, w * 2, r, sub, tb, cnt, gate,
                                t_, which_, nx_, ny_, nz_, mt_eps,
                                occlusion=any_hit,
                                isect=isect,
                                track_which=track_which,
                                tb_from_buf=tb_buf,
                            )
                    else:
                        t_, which_, nx_, ny_, nz_ = leaf_tests(
                            leaves_ref, r, lrow, tb, cnt,
                            gate, 0.0, RANGE_T1,
                            t_, which_, nx_, ny_, nz_, mt_eps,
                            leaf_slots=slots,
                            occlusion=any_hit,
                            isect=isect,
                            track_which=track_which,
                        )
                    return (qi - 1, leafs_ + 1, t_, which_, nx_, ny_, nz_)

                out = jax.lax.while_loop(
                    lambda s: s[0] >= 0, lbody,
                    (n - 1, leafs, t, which, nx, ny, nz),
                )
                return out[1], out[2], out[3], out[4], out[5], out[6]

            def lcond(s):
                return s[0] != 0

            def make_lbody(slots):
                def lbody(s):
                    lb, leafs_, t_, which_, nx_, ny_, nz_ = s
                    p, cnt, lrow, tb = head_meta(lb)
                    if leaf_mode in ("dma", "dmastatic"):
                        sub = lrow % per_group
                        dma = leaf_dma(lrow, 0)
                        dma.start()
                        dma.wait()
                        if leaf_mode == "dmastatic":
                            t_, which_, nx_, ny_, nz_ = leaf_tests_smem_static(
                                leafbuf_ref, w * 2, r, sub, tb, cnt, gate,
                                t_, which_, nx_, ny_, nz_, mt_eps,
                                leaf_slots=slots,
                                occlusion=any_hit,
                                isect=isect,
                                track_which=track_which,
                                tb_from_buf=tb_buf,
                            )
                        else:
                            t_, which_, nx_, ny_, nz_ = leaf_tests_smem(
                                leafbuf_ref, w * 2, r, sub, tb, cnt, gate,
                                t_, which_, nx_, ny_, nz_, mt_eps,
                                occlusion=any_hit,
                                isect=isect,
                                track_which=track_which,
                                tb_from_buf=tb_buf,
                            )
                    else:
                        t_, which_, nx_, ny_, nz_ = leaf_tests(
                            leaves_ref, r, lrow, tb, cnt,
                            gate, 0.0, RANGE_T1,
                            t_, which_, nx_, ny_, nz_, mt_eps,
                            leaf_slots=slots,
                            occlusion=any_hit,
                            isect=isect,
                            track_which=track_which,
                        )
                    return (lb & ~(1 << p), leafs_ + 1,
                            t_, which_, nx_, ny_, nz_)
                return lbody

            def make_lbody2(slots):
                """Double-buffered leaf pipeline ("dma2"): issue the
                NEXT leaf's group DMA into the other buffer half
                before testing the current one from SMEM — hides the
                copy latency that made the round-2/3 "dma" modes lose
                to VMEM scalar extraction, while keeping the
                extraction-free SMEM loads."""
                def lbody(s):
                    (lb, clrow, ccnt, ctb, par, _has, leafs_,
                     t_, which_, nx_, ny_, nz_) = s
                    pn, ncnt, nlrow, ntb = head_meta(lb)
                    hasn = lb != 0

                    @pl.when(hasn)
                    def _():
                        leaf_dma(nlrow, 1 - par).start()

                    leaf_dma(clrow, par).wait()
                    sub = clrow % per_group
                    t_, which_, nx_, ny_, nz_ = leaf_tests_smem_static(
                        leafbuf_ref, w * 2 + par, r, sub, ctb, ccnt,
                        gate, t_, which_, nx_, ny_, nz_, mt_eps,
                        leaf_slots=slots,
                        occlusion=any_hit,
                        isect=isect,
                        track_which=track_which,
                        tb_from_buf=tb_buf,
                    )
                    return (
                        jnp.where(hasn, lb & ~(1 << pn), lb),
                        nlrow, ncnt, ntb, 1 - par, hasn, leafs_ + 1,
                        t_, which_, nx_, ny_, nz_,
                    )
                return lbody

            def run_class(bits, slots, leafs, t, which, nx, ny, nz):
                if leaf_mode != "dma2":
                    _, leafs, t, which, nx, ny, nz = jax.lax.while_loop(
                        lcond, make_lbody(slots),
                        (bits, leafs, t, which, nx, ny, nz),
                    )
                    return leafs, t, which, nx, ny, nz
                p0, c0, l0, tb0 = head_meta(bits)
                has0 = bits != 0

                @pl.when(has0)
                def _():
                    leaf_dma(l0, 0).start()

                out = jax.lax.while_loop(
                    lambda s: s[5],
                    make_lbody2(slots),
                    (
                        jnp.where(has0, bits & ~(1 << p0), bits),
                        l0, c0, tb0, jnp.int32(0), has0, leafs,
                        t, which, nx, ny, nz,
                    ),
                )
                return out[6], out[7], out[8], out[9], out[10], out[11]

            tiny = min(leaf_slots_tiny, leaf_slots)
            small = min(leaf_slots_small, leaf_slots)
            class_masks = []  # [(bitmask, static slot-unroll count)]
            remm = leafbits
            if tiny < small:
                class_masks.append((remm & ~overtiny_perm, tiny))
                remm = remm & overtiny_perm
            if small < leaf_slots:
                class_masks.append((remm & ~large_perm, small))
                remm = remm & large_perm
            class_masks.append((remm, leaf_slots))

            if leaf_scan != "queue":
                for cbits, slots in class_masks:
                    leafs, t, which, nx, ny, nz = run_class(
                        cbits, slots, leafs, t, which, nx, ny, nz
                    )

        # pass 2, far-to-near: push hit internal children (nearest on
        # top — node 0 was the stack top, so its children push LAST).
        # A push past the stack bound flags the walk bad instead of
        # corrupting scratch (the bound scales with pops; see
        # packet_wide/packet_mega allocation).  leaf_scan="queue" rides
        # the same loop: each hit-leaf child's meta is enqueued to its
        # size class's SMEM queue (far-to-near), drained below.
        use_queue = leaf_mode != "skip" and leaf_scan == "queue"
        nq = [jnp.int32(0) for _ in class_masks] if use_queue else []
        sp2 = spc
        for j in range(pops - 1, -1, -1):
            for p in range(WIDE - 1, -1, -1):
                bit = j * WIDE + p
                do_push = (((pushbits >> bit) & 1) > 0) & (sp2 < SD)
                badw = badw | ((((pushbits >> bit) & 1) > 0) & (sp2 >= SD))
                meta_p = nodes[j]["cmeta_rd"](cks[bit])

                @pl.when(do_push)
                def _(sp2=sp2, meta_p=meta_p):
                    stack_ref[w * SD + sp2] = meta_p

                sp2 = jnp.where(do_push, sp2 + 1, sp2)
                if use_queue:
                    for ci in range(len(class_masks)):
                        inc = ((class_masks[ci][0] >> bit) & 1) > 0

                        @pl.when(inc)
                        def _(n=nq[ci], meta_p=meta_p, ci=ci):
                            lqueue_ref[
                                (w * len(class_masks) + ci)
                                * (WIDE * pops) + n
                            ] = meta_p

                        nq[ci] = jnp.where(inc, nq[ci] + 1, nq[ci])

        if use_queue:
            for ci, (_cbits, slots) in enumerate(class_masks):
                leafs, t, which, nx, ny, nz = drain_class(
                    ci, len(class_masks), nq[ci], slots,
                    leafs, t, which, nx, ny, nz,
                )

        if any_hit:
            # occlusion query: a lane that found ANY hit is done — zero
            # its t so the t0 < t cull rejects every further box for it
            # (t0 is clamped >= 0), shrinking the packet's box/leaf
            # union; finish when every active lane hit
            t = jnp.where(t < INFINITELY_FAR, 0.0, t)
            done = ~jnp.any(r["act"] & (t >= INFINITELY_FAR))
            sp2 = jnp.where(done, 0, sp2)

        steps2 = steps + (1 if _COUNT_ITERS else npop)
        overflow = alive & (steps2 >= max_steps) & (sp2 > 0)
        badw = badw | overflow
        sp2 = jnp.where(overflow, 0, sp2)
        if node_src == "vmem":
            # prefetch the next step's node groups now — the DMA flies
            # while this step's results retire; issued unconditionally
            # (clamped indices) so the semaphore protocol stays aligned
            # even for finished walks, and drained after the loop
            node_prefetch(w, sp2)
        return (sp2, steps2, leafs, badw, t, which, nx, ny, nz)

    def run(rays, any_hit=False):
        rays = [prepare(r) for r in rays]

        def cond(states):
            open_ = None
            for w in range(W):
                a = states[w][0] > 0
                open_ = a if open_ is None else (open_ | a)
            return open_

        def body(states):
            return tuple(
                walk_step(w, states[w], rays[w], any_hit) for w in range(W)
            )

        def init_state(w):
            has_work = jnp.any(rays[w]["act"])
            stack_ref[w * SD] = jnp.int32(0)  # root wide node
            sp0 = jnp.where(has_work, 1, 0).astype(i32)
            if node_src == "vmem":
                node_prefetch(w, sp0)  # prime the first step's groups
            return (
                sp0,
                jnp.int32(0),
                jnp.int32(0),
                jnp.zeros((), bool),
                jnp.full((F, CW), INFINITELY_FAR, f32),
                jnp.full((F, CW), -1, i32),
                jnp.zeros((F, CW), f32),
                jnp.zeros((F, CW), f32),
                jnp.zeros((F, CW), f32),
            )

        states = jax.lax.while_loop(
            cond, body, tuple(init_state(w) for w in range(W))
        )
        if node_src == "vmem":
            # drain the prefetches issued by the last executed step (or
            # the init prime if the loop never ran) — TPU semaphores
            # must balance before the kernel (or the next walker run)
            # issues new DMAs on them
            for w in range(W):
                for j in range(pops):
                    _, dma = node_group_dma(w, j, states[w][0])
                    dma.wait()
        return states

    return run


def wide_kernel(
    leaves_ref,
    boxes_ref,
    cmeta_ref,
    order_ref,
    masks_ref,
    tribase_ref,
    nodes_ref,
    P_ref,
    D_ref,
    act_ref,
    t_ref,
    which_ref,
    n_ref,
    bad_ref,
    *stats_and_scratch,
    n_wide: int,
    max_steps: int,
    mt_eps: float,
    tile: int,
    fold: int,
    walks: int,
    stack_depth: int,
    box_quant: tuple,
    any_hit: bool = False,
    with_stats: bool = False,
    leaf_mode: str = "dma",
    leaf_slots: int = 10,
    node_src: str = "smem",
    pops: int = 1,
    isect: str = "mt",
    leaf_src: str = "vmem",
    leaf_scan: str = "ctz",
):
    i32 = jnp.int32
    F = fold
    C = tile // F
    W = walks
    CW = C // W
    if with_stats:
        (stats_ref, stack_ref, leafbuf_ref, sems_ref,
         nodebuf_ref, nsems_ref, lqueue_ref) = stats_and_scratch
    else:
        (stack_ref, leafbuf_ref, sems_ref,
         nodebuf_ref, nsems_ref, lqueue_ref) = stats_and_scratch

    rays = make_walk_rays(P_ref, D_ref, act_ref, F, W, CW)
    walker = make_wide_walker(
        leaves_ref, boxes_ref, cmeta_ref, order_ref, masks_ref,
        tribase_ref, nodes_ref, stack_ref, leafbuf_ref, sems_ref,
        nodebuf_ref, nsems_ref, lqueue_ref,
        n_wide=n_wide, max_steps=max_steps, mt_eps=mt_eps, fold=F,
        walks=W, lane_width=CW, stack_depth=stack_depth,
        box_quant=box_quant, leaf_mode=leaf_mode, leaf_slots=leaf_slots,
        node_src=node_src, pops=pops, isect=isect, leaf_src=leaf_src,
        leaf_scan=leaf_scan,
    )
    states = walker(rays, any_hit=any_hit)

    steps_total = jnp.int32(0)
    leafs_total = jnp.int32(0)
    for w in range(W):
        sp, steps, leafs, badw, t, which, nx, ny, nz = states[w]
        sl = slice(w * CW, (w + 1) * CW)
        badv = jnp.where(rays[w]["act"] & badw, 1, 0).astype(i32)
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
        ri = jax.lax.broadcasted_iota(i32, (8, 128), 0)
        ci = jax.lax.broadcasted_iota(i32, (8, 128), 1)
        stats_ref[:, :] = jnp.where(
            (ri == 0) & (ci == 0), steps_total,
            jnp.where((ri == 0) & (ci == 1), leafs_total, 0),
        )
