"""Windowed full-resolution environment sampling (Pallas TPU).

The dense MXU one-hot samplers (envmxu.py) pay R x table flops — exact
but forced to a downsampled table (256x512 default) because full-res
(1024x2048) would cost ~10 TFLOP/frame.  The GL reference samples the
env at NATIVE resolution, always (ray.cpp:499-510, fs:153) — VERDICT
r1 missing #2 / next-round #3.

This sampler exploits packet coherence instead: rays in a kernel tile
come from a compact pixel block, so their lat-long footprint is a
small window of the env map.  Per tile:

  1. reduce the packet's (u, v) spans (checking both seam phases);
  2. pick the finest mip level whose footprint fits a fixed
     (WIN_ROWS=64 row, WIN_LANES=256 lane) window — for bench-style
     tiles (~2.3 degrees) that is LEVEL 0: exact full-res bilinear;
  3. DMA the 3 channel-plane windows HBM -> VMEM scratch;
  4. contract x on the MXU: T1_c = Win_c (32, 256) @ wx (256, C),
     where wx is the per-ray bilinear column TENT weights
     max(0, 1 - |i - x|) — exactly the 2-hot (1-fx, fx) pair;
  5. contract y on the VPU: out_c = sum_y wy[y, r] * T1_c[y, r].

Cost per frame (1024x768, tile 4096): ~0.2 ms DMA + ~0.5 ms weight
build + ~0.4 ms MXU + ~0.2 ms reduce — full-res sharpness at less
than the dense 256x512 cost.  Incoherent packets (scattered bounce
directions, pole-crossing footprints) fall back to coarser mip levels
per tile — a packet-adaptive prefilter; the coarsest level always
fits, so selection never fails.  f32 end to end (EXACT bilinear, vs
the dense path's bf16 contraction).

Plane layout (pack_env_planes): one (ROWS, PLANE_W) f32 HBM array.
Level l (l = 0..NL-1, halving each time until height 16) stores SIX
planes of H_l + 2 rows each — 3 channels x 2 seam phases, the second
phase x-rotated by W_l/2 so one of the two is always seam-continuous
for any footprint narrower than half the map.  Each plane has one
wrap guard row on top/bottom (REPEAT v semantics at the poles, row
r = texel row (r - 1) mod H_l) and 128 wrap guard lanes on the right
(REPEAT u), so per-lane indices never wrap inside a window.  Row
offsets/extents live in small SMEM tables indexed by the dynamic
level scalar.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN_ROWS = 64      # window height (texel rows); 8-aligned DMA start
WIN_LANES = 256    # window width (texels); 128-aligned DMA start
X_CAP = 120.0      # max packet x-span (texels) at the chosen level:
                   # 256 lanes - 127 alignment waste - bilinear margin
Y_CAP = 53.0       # max packet y-span: 64 rows - 7 alignment - margins
MIN_H = 16         # coarsest level height; H+2 guard rows always fit


def _resize_pow2(img: np.ndarray, H: int, W: int) -> np.ndarray:
    from shader_ray_tpu.ops.pallas.pack import _resize_env

    return _resize_env(np.asarray(img, np.float32), H, W)


class EnvPlanes:
    """Host-packed plane pyramid + SMEM tables (see module docstring).

    Registered consumers thread the jnp arrays as jit args (axon rule).
    """

    def __init__(self, planes, off_smem, h_smem, w_smem, blk_smem,
                 base: tuple, n_levels: int, plane_w: int):
        self.planes = planes        # (ROWS, plane_w) f32
        self.off_smem = off_smem    # (NL,) i32 row offset of level l
        self.h_smem = h_smem        # (NL,) i32 H_l
        self.w_smem = w_smem        # (NL,) i32 W_l
        self.blk_smem = blk_smem    # (NL,) i32 8-aligned plane block rows
        self.base = tuple(int(x) for x in base)
        self.n_levels = int(n_levels)
        self.plane_w = int(plane_w)

    def tree_flatten(self):
        return (
            self.planes, self.off_smem, self.h_smem, self.w_smem,
            self.blk_smem,
        ), (self.base, self.n_levels, self.plane_w)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)


jax.tree_util.register_pytree_node_class(EnvPlanes)


def pack_env_planes(env: np.ndarray, base: tuple[int, int] = (1024, 2048)):
    """Resample ``env`` (H, W, 3) to the pow2 ``base`` and build the
    guarded channel/phase plane pyramid."""
    H0, W0 = base
    assert H0 & (H0 - 1) == 0 and W0 & (W0 - 1) == 0, "base must be pow2"
    assert W0 >= H0 and H0 >= MIN_H
    cur = _resize_pow2(env, H0, W0)

    levels = []
    h, w = H0, W0
    while True:
        levels.append(cur)
        if h <= MIN_H:
            break
        h //= 2
        w //= 2
        cur = cur.reshape(h, 2, w, 2, 3).mean(axis=(1, 3)).astype(np.float32)

    # plane width: guard = 128 wrap lanes, rounded up to a 128 multiple
    plane_w = max(((W0 + 128 + 127) // 128) * 128, WIN_LANES)
    # per-plane block height: H + 2 wrap-guard rows, padded to a
    # multiple of 8 so every window DMA row start is 8-aligned
    blk = lambda h: ((h + 2 + 7) // 8) * 8
    offs, rows = [], 0
    for lv in levels:
        offs.append(rows)
        rows += 6 * blk(lv.shape[0])  # 3 channels x 2 phases

    # tail padding: a window DMA near the last (coarsest) plane may
    # read up to WIN_ROWS=64 rows past its final 8-aligned
    # (MIN_H+2 -> 24-row) block — keep it in bounds (the tent weights
    # zero those rows out)
    planes = np.zeros((rows + WIN_ROWS, plane_w), np.float32)
    for lv, off in zip(levels, offs):
        h, w = lv.shape[:2]
        for phase in range(2):
            # phase B stores texel x at column (x + w/2) mod w, so a
            # phase-B x index (u + 1/2 folded) lands on the same texel
            img = lv if phase == 0 else np.roll(lv, w // 2, axis=1)
            # x wrap guard: repeat the first 128 columns (mod w)
            xg = np.take(img, np.arange(plane_w) % w, axis=1)
            for c in range(3):
                p = off + (phase * 3 + c) * blk(h)
                planes[p + 1 : p + 1 + h, :] = xg[:, :, c]
                planes[p, :] = xg[(h - 1) % h, :, c]      # top guard (REPEAT)
                planes[p + 1 + h, :] = xg[0, :, c]        # bottom guard

    return EnvPlanes(
        planes=jnp.asarray(planes),
        off_smem=jnp.asarray(np.asarray(offs, np.int32)),
        h_smem=jnp.asarray(
            np.asarray([lv.shape[0] for lv in levels], np.int32)
        ),
        w_smem=jnp.asarray(
            np.asarray([lv.shape[1] for lv in levels], np.int32)
        ),
        blk_smem=jnp.asarray(
            np.asarray([blk(lv.shape[0]) for lv in levels], np.int32)
        ),
        base=(H0, W0),
        n_levels=len(levels),
        plane_w=plane_w,
    )


def env_window_body(
    planes_ref, off_ref, h_ref, w_ref, blk_ref, win_ref, sems_ref,
    u, v, *, n_levels: int, fold: int, lanes: int, lod=None, probes=None,
):
    """In-kernel windowed sample: u, v are (fold, lanes) f32 lat-long
    coords (u in [0.5, 1.5] REPEAT, v in [0, 1]).  Returns
    (r, g, b, lvl_debug) with color (fold, lanes) f32.

    TWO windows are sampled and selected per lane:
      * window A ("cluster"): level sized to the packet's TRIMMED
        (~1.5 sigma inlier) footprint — outlier lanes (e.g. scattered
        reflections mixed into a background packet) cannot drag the
        whole packet to a coarse level;
      * window B ("cover"): level sized to the min/max span — always
        contains every lane, the fallback for lanes outside A.
    Lanes inside window A take its (finer or equal) sample.  Shared by
    the standalone sampler kernel and the fused frame path.

    ``lod`` (fold, lanes) f32 switches to textureGrad-equivalent
    TRILINEAR sampling (fs:146): both A and B become level PAIRS
    (l, l+1) — A anchored at the trimmed-cluster lod floor, B at the
    packet lod ceiling — and each lane lerps within its pair by
    clamp(lod - l, 0, 1).  Exact GL trilinear whenever the lane's lod
    lands inside its pair (the common case: primary-escape packets
    have sub-level lod spread); outlier lanes clamp to the nearest
    pair end.  FOUR windows total (12 channel DMAs).

    ``probes`` (grad mode only): list of per-lane (u_p, v_p) coord
    pairs — the GL-aniso taps (ray.cpp:505-508).  All probes share the
    SAME four windows, footprint stats, and level pairs (their offsets
    inflate the fitting spans); each adds only its tent weights and
    MXU contractions.  This replaces N separate sampler passes (N x
    DMAs + stats + launches) with one."""
    f32 = jnp.float32
    i32 = jnp.int32
    F, C = fold, lanes
    inv_n = 1.0 / (F * C)
    sfold = lambda x: x - jnp.where(x + 0.5 >= 1.5, 1.0, 0.0) + 0.5

    # --- footprint statistics in both seam phases ---
    us = sfold(u)                        # phase B: seam rotated by 1/2
    if probes is None or len(probes) <= 1:
        ulo = uhi = u
        uslo = ushi = us
        vlo = vhi = v
    else:
        # window fitting must cover every probe tap, not just the
        # center coords: bound the per-lane coord range across probes
        ulo = functools.reduce(jnp.minimum, [p[0] for p in probes])
        uhi = functools.reduce(jnp.maximum, [p[0] for p in probes])
        uslo = functools.reduce(jnp.minimum, [sfold(p[0]) for p in probes])
        ushi = functools.reduce(jnp.maximum, [sfold(p[0]) for p in probes])
        vlo = functools.reduce(jnp.minimum, [p[1] for p in probes])
        vhi = functools.reduce(jnp.maximum, [p[1] for p in probes])
    umin, umax = jnp.min(ulo), jnp.max(uhi)
    usmin, usmax = jnp.min(uslo), jnp.max(ushi)
    span_a = umax - umin
    span_b = usmax - usmin
    mean_a = jnp.sum(u) * inv_n
    mean_b = jnp.sum(us) * inv_n
    var_a = jnp.maximum(jnp.sum(u * u) * inv_n - mean_a * mean_a, 0.0)
    var_b = jnp.maximum(jnp.sum(us * us) * inv_n - mean_b * mean_b, 0.0)
    vmin, vmax = jnp.min(vlo), jnp.max(vhi)
    vspan = vmax - vmin
    vmean = jnp.sum(v) * inv_n
    vvar = jnp.maximum(jnp.sum(v * v) * inv_n - vmean * vmean, 0.0)

    H0 = h_ref[0].astype(f32)
    W0 = w_ref[0].astype(f32)

    def pick_level(uspan_, vspan_):
        """Finest level whose footprint fits the window (+margins);
        the coarsest level always fits entirely."""
        lx = jnp.ceil(
            jnp.log2(jnp.maximum((uspan_ * W0 + 2.0) / X_CAP, 1e-6))
        )
        ly = jnp.ceil(
            jnp.log2(jnp.maximum((vspan_ * H0 + 2.0) / Y_CAP, 1e-6))
        )
        return jnp.clip(jnp.maximum(lx, ly).astype(i32), 0, n_levels - 1)

    # window B (cover): phase + level by min/max span
    phase_b = (span_b < span_a).astype(i32)
    lvl_b = pick_level(jnp.minimum(span_a, span_b), vspan)
    # window A (cluster): phase by variance; footprint from a TRIMMED
    # second pass — lanes within ~1.5 sigma of the mean — so a few
    # scattered outliers (reflection lanes mixed into a background
    # packet) cannot drag the cluster window to a coarse level
    phase_a = (var_b < var_a).astype(i32)
    ua = jnp.where(phase_a > 0, us, u)
    umean1 = jnp.where(phase_a > 0, mean_b, mean_a)
    usig1 = jnp.sqrt(jnp.minimum(var_a, var_b))
    vsig1 = jnp.sqrt(vvar)
    keep = (
        (jnp.abs(ua - umean1) <= 1.5 * usig1 + 1e-6)
        & (jnp.abs(v - vmean) <= 1.5 * vsig1 + 1e-6)
    )
    big = 1e9
    # cluster bounds from the probe-inflated coord ranges (== ua/v
    # when there are no probes)
    ua_lo = jnp.where(phase_a > 0, uslo, ulo)
    ua_hi = jnp.where(phase_a > 0, ushi, uhi)
    ukmin = jnp.min(jnp.where(keep, ua_lo, big))
    ukmax = jnp.max(jnp.where(keep, ua_hi, -big))
    vkmin = jnp.min(jnp.where(keep, vlo, big))
    vkmax = jnp.max(jnp.where(keep, vhi, -big))
    lvl_a = pick_level(ukmax - ukmin, vkmax - vkmin)
    ucenter_a = 0.5 * (ukmin + ukmax)
    vcenter_a = 0.5 * (vkmin + vkmax)

    # Mosaic iota must be integer; cast to f32 for the tent weights
    col = jax.lax.broadcasted_iota(i32, (WIN_LANES, C), 0).astype(f32)
    row = jax.lax.broadcasted_iota(i32, (WIN_ROWS, C), 0).astype(f32)

    def open_window(widx, lvl, phase, center_u, center_v):
        """Start the 3 channel-window DMAs for one (64, 256) window at
        ``lvl``/``phase`` and return its transform scalars.
        ``center_*`` = None bases the window on the packet min (cover
        semantics; probe-inflated lo/hi bounds), else on the given
        scalar center (cluster semantics).  Sampling happens in
        ``sample_from`` — possibly several times (aniso probes)."""
        Hl = h_ref[lvl]
        Wl = w_ref[lvl]
        blk = blk_ref[lvl]
        off0 = off_ref[lvl] + phase * 3 * blk
        Hlf = Hl.astype(f32)
        Wlf = Wl.astype(f32)

        # x is continuous in [Wl/2 - .5, 3Wl/2) (no per-lane wrap).
        # Fold the WHOLE packet by Wl only when the window anchor
        # passed Wl — a window straddling Wl lands in the plane's 128
        # wrap-guard lanes (span <= X_CAP < 128 keeps it inside)
        if center_u is None:
            xl = jnp.where(phase > 0, uslo, ulo) * Wlf - 0.5
            yl = (1.0 - vhi) * Hlf + 0.5  # +1 guard row, -0.5 center
            anchor_x = jnp.min(xl)
            anchor_y = jnp.min(yl)
        else:
            # center the window on the cluster mean (the -cap/2 shift
            # plus the 128/8 alignment floor lands it around center)
            anchor_x = center_u * Wlf - 0.5 - 0.5 * X_CAP
            anchor_y = (1.0 - center_v) * Hlf + 0.5 - 0.5 * Y_CAP
        fold_w = jnp.where(anchor_x >= Wlf, Wlf, 0.0)
        anchor_x = anchor_x - fold_w
        xbase = jnp.maximum(
            (jnp.floor(anchor_x).astype(i32) // 128) * 128, 0
        )
        ybase = jnp.maximum(
            (jnp.floor(anchor_y).astype(i32) // 8) * 8, 0
        )
        ybase = jnp.minimum(ybase, jnp.maximum(blk - WIN_ROWS, 0))

        dmas = []
        for c in range(3):
            # every term is 8-row / 128-lane aligned by construction
            # (blk multiple of 8, offsets sums of blks, bases floored);
            # Mosaic needs the proof hint
            row0 = pl.multiple_of(off0 + blk * c + ybase, 8)
            lane0 = pl.multiple_of(xbase, 128)
            dma = pltpu.make_async_copy(
                planes_ref.at[
                    pl.ds(row0, WIN_ROWS),
                    pl.ds(lane0, WIN_LANES),
                ],
                win_ref.at[
                    :, pl.ds((widx * 3 + c) * WIN_LANES, WIN_LANES)
                ],
                sems_ref.at[widx * 3 + c],
            )
            dma.start()
            dmas.append(dma)
        return dict(
            widx=widx, phase=phase, Hlf=Hlf, Wlf=Wlf, fold_w=fold_w,
            xbase=xbase, ybase=ybase, dmas=dmas, waited=[False],
        )

    def sample_from(wi, up, vp):
        """Bilinearly sample every lane of coords (up, vp) from the
        open window ``wi`` (phase folding applied here).  Returns
        (r, g, b, inside) — ``inside`` marks lanes whose 2x2 texel
        footprint lies fully inside the window.  The first call waits
        the window's DMAs; tent weights build while they fly."""
        widx = wi["widx"]
        upp = jnp.where(wi["phase"] > 0, sfold(up), up)
        x = upp * wi["Wlf"] - 0.5 - wi["fold_w"]
        y = (1.0 - vp) * wi["Hlf"] + 0.5
        xw = x - wi["xbase"].astype(f32)
        yw = y - wi["ybase"].astype(f32)
        inside = (
            (xw >= 0.0) & (xw <= WIN_LANES - 1.0)
            & (yw >= 0.0) & (yw <= WIN_ROWS - 1.0)
        )
        # column tent weights = the exact bilinear (1-fx, fx) pair,
        # shared by channels
        wx_rows = []
        for f in range(F):
            xf = xw[f : f + 1, :]
            wx_rows.append(jnp.maximum(0.0, 1.0 - jnp.abs(col - xf)))
        if not wi["waited"][0]:
            for dma in wi["dmas"]:
                dma.wait()
            wi["waited"][0] = True

        outs = []
        for c in range(3):
            win_c = win_ref[
                :, (widx * 3 + c) * WIN_LANES : (widx * 3 + c + 1) * WIN_LANES
            ]  # (64, 256)
            comp = []
            for f in range(F):
                t1 = jax.lax.dot_general(
                    win_c, wx_rows[f],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )  # (64, C)
                yf = yw[f : f + 1, :]
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(row - yf))
                comp.append(jnp.sum(t1 * wy, axis=0, keepdims=True))
            outs.append(jnp.concatenate(comp, axis=0))  # (F, C)
        return outs[0], outs[1], outs[2], inside

    if lod is None:
        wb = open_window(0, lvl_b, phase_b, None, None)
        wa = open_window(1, lvl_a, phase_a, ucenter_a, vcenter_a)
        rb, gb, bb, _ = sample_from(wb, u, v)
        ra, ga, ba, in_a = sample_from(wa, u, v)
        use_a = in_a & (lvl_a < lvl_b)
        r = jnp.where(use_a, ra, rb)
        g = jnp.where(use_a, ga, gb)
        b = jnp.where(use_a, ba, bb)
        return r, g, b, lvl_a + 16 * lvl_b

    # --- textureGrad trilinear: two (l, l+1) window pairs ---
    top = max(n_levels - 2, 0)
    lmean = jnp.sum(lod) * inv_n
    lvar = jnp.maximum(jnp.sum(lod * lod) * inv_n - lmean * lmean, 0.0)
    lsig = jnp.sqrt(lvar)
    keep_l = keep & (jnp.abs(lod - lmean) <= 1.5 * lsig + 1e-6)
    lkmin = jnp.min(jnp.where(keep_l, lod, big))
    lmax_all = jnp.max(lod)
    # pair A: anchored at the trimmed cluster's lod floor, but never
    # finer than its footprint allows
    lA = jnp.clip(
        jnp.maximum(jnp.floor(lkmin).astype(i32), lvl_a), 0, top
    )
    # pair B (cover): anchored at the packet lod ceiling
    lB = jnp.clip(
        jnp.maximum(jnp.floor(lmax_all).astype(i32), lvl_b), 0, top
    )
    lB = jnp.maximum(lB, lA)
    # all four windows open up front (12 DMAs fly together); every
    # probe then costs only tents + MXU contractions from the shared
    # windows
    wa0 = open_window(0, lA, phase_a, ucenter_a, vcenter_a)
    wa1 = open_window(1, jnp.minimum(lA + 1, n_levels - 1), phase_a,
                      ucenter_a, vcenter_a)
    wb0 = open_window(2, lB, phase_b, None, None)
    wb1 = open_window(3, jnp.minimum(lB + 1, n_levels - 1), phase_b,
                      None, None)
    fA = jnp.clip(lod - lA.astype(f32), 0.0, 1.0)
    fB = jnp.clip(lod - lB.astype(f32), 0.0, 1.0)
    lAf = lA.astype(f32)
    plist = probes if probes else [(u, v)]
    acc = [None, None, None]
    for up, vp in plist:
        a0 = sample_from(wa0, up, vp)
        a1 = sample_from(wa1, up, vp)
        b0 = sample_from(wb0, up, vp)
        b1 = sample_from(wb1, up, vp)
        in_a = a0[3] & a1[3]
        # lanes whose lod lands in (or below) pair A use it; blurrier
        # outliers go to the cover pair
        use_a = in_a & (lod < lAf + 1.5)
        for c in range(3):
            va = a0[c] * (1.0 - fA) + a1[c] * fA
            vb = b0[c] * (1.0 - fB) + b1[c] * fB
            o = jnp.where(use_a, va, vb)
            acc[c] = o if acc[c] is None else acc[c] + o
    sc = 1.0 / float(len(plist))
    return acc[0] * sc, acc[1] * sc, acc[2] * sc, lA + 16 * lB


def env_window_kernel(
    off_ref, h_ref, w_ref, blk_ref,
    u_ref, v_ref,
    planes_ref,
    out_ref, lvl_ref,
    win_ref, sems_ref,
    *, n_levels: int, fold: int,
):
    F = fold
    C = u_ref.shape[1]
    r, g, b, lvl = env_window_body(
        planes_ref, off_ref, h_ref, w_ref, blk_ref, win_ref, sems_ref,
        u_ref[:, :], v_ref[:, :], n_levels=n_levels, fold=F, lanes=C,
    )
    out_ref[0:F, :] = r
    out_ref[F : 2 * F, :] = g
    out_ref[2 * F :, :] = b
    ri = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    lvl_ref[:, :] = jnp.where((ri == 0) & (ci == 0), lvl, 0)


def env_window_grad_kernel(
    off_ref, h_ref, w_ref, blk_ref,
    *rest,
    n_levels: int, fold: int, n_probes: int = 0,
):
    # rest = u, v, lod, [pu_i, pv_i] * n_probes, planes, out, lvl,
    # win scratch, sems scratch
    u_ref, v_ref, lod_ref = rest[0], rest[1], rest[2]
    pr = rest[3 : 3 + 2 * n_probes]
    planes_ref, out_ref, lvl_ref, win_ref, sems_ref = rest[3 + 2 * n_probes :]
    probes = [
        (pr[2 * i][:, :], pr[2 * i + 1][:, :]) for i in range(n_probes)
    ] or None
    F = fold
    C = u_ref.shape[1]
    r, g, b, lvl = env_window_body(
        planes_ref, off_ref, h_ref, w_ref, blk_ref, win_ref, sems_ref,
        u_ref[:, :], v_ref[:, :], n_levels=n_levels, fold=F, lanes=C,
        lod=lod_ref[:, :], probes=probes,
    )
    out_ref[0:F, :] = r
    out_ref[F : 2 * F, :] = g
    out_ref[2 * F :, :] = b
    ri = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    lvl_ref[:, :] = jnp.where((ri == 0) & (ci == 0), lvl, 0)


def _run_window_kernel(
    planes: EnvPlanes,
    lane_fields,           # list of (Rp,) f32 per-lane inputs, already
                           # padded to a tile multiple (u, v[, lod])
    R: int,
    tile: int,
    interpret: bool,
    with_levels: bool,
    prefolded: bool,
    grad: bool,
    n_probes: int = 0,
):
    from shader_ray_tpu.ops.pallas.packet import FOLD, _fold, _unfold

    fold = FOLD
    Rp = lane_fields[0].shape[0]
    assert Rp % tile == 0 and Rp >= R
    n_tiles = Rp // tile
    C = tile // fold

    def fold_in(x):
        if prefolded:
            return x.reshape(fold, n_tiles * C)
        return _fold(x[:, None], n_tiles, tile, fold)

    folded = [fold_in(x) for x in lane_fields]
    n_windows = 4 if grad else 2

    if grad:
        kernel = functools.partial(
            env_window_grad_kernel,
            n_levels=planes.n_levels, fold=fold, n_probes=n_probes,
        )
    else:
        kernel = functools.partial(
            env_window_kernel, n_levels=planes.n_levels, fold=fold,
        )
    smem = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.SMEM
    )
    rays = lambda rows: pl.BlockSpec(
        (rows, C), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    out3, lvl = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            smem(planes.off_smem.shape),
            smem(planes.h_smem.shape),
            smem(planes.w_smem.shape),
            smem(planes.blk_smem.shape),
        ] + [rays(fold)] * len(folded) + [
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            rays(3 * fold),
            pl.BlockSpec((8, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3 * fold, Rp // fold), jnp.float32),
            jax.ShapeDtypeStruct((8, n_tiles * 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((WIN_ROWS, 3 * n_windows * WIN_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((3 * n_windows,)),
        ],
        # the per-fold-row tent weights are (WIN_LANES, C) f32 — at
        # large tiles (jitter-packed superframes) they blow the default
        # 16 MB scoped-vmem budget.  16384*C is measured-sufficient for
        # the 2-window path up to C=2048; the grad (aniso, 4-window)
        # path at C=1024 asks 58.4 MB (Mosaic stack accounting covers
        # the tents for all 4 windows plus double-buffered operand
        # blocks), so it scales 4x — the limit is an allowance, not an
        # allocation, and v5e has 128 MB of VMEM physically.  Oversize
        # jitter-packed grad tiles that exceed the 100 MB cap fail at
        # compile time and the autotune skips them.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                100 << 20,
                max(16 << 20, (65536 if grad else 16384) * C),
            ),
        ),
        interpret=interpret,
    )(
        planes.off_smem, planes.h_smem, planes.w_smem, planes.blk_smem,
        *folded, planes.planes,
    )
    if prefolded:
        un = lambda x: x.reshape(Rp)
    else:
        un = lambda x: _unfold(x, n_tiles, tile, fold)[:R]
    out = jnp.stack(
        [un(out3[0:fold]), un(out3[fold : 2 * fold]), un(out3[2 * fold :])],
        axis=-1,
    ).reshape(Rp if prefolded else R, 3)[:R]
    if with_levels:
        return out, lvl[0].reshape(n_tiles, 128)[:, 0]
    return out


def _pad_dirs(D, tile, prefolded):
    R = D.shape[0]
    pad = 0 if prefolded else (-R) % tile
    if pad:
        unit_z = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0], jnp.float32), (pad, 3)
        )
        D = jnp.concatenate([jnp.asarray(D, jnp.float32), unit_z], axis=0)
    return D, R


def sample_env_window(
    planes: EnvPlanes,
    D: jnp.ndarray,
    tile: int = 4096,
    interpret: bool = False,
    with_levels: bool = False,
    prefolded: bool = False,
):
    """Full-res windowed bilinear lat-long sample: D (R, 3) -> (R, 3).

    Equivalent to the GL reference's zero-grad native-resolution
    texture() (fs:153, ray.cpp:499-510) for packet footprints that fit
    the window at level 0 (the common case for pixel-block tiles);
    falls back per tile to coarser mips for incoherent packets.

    ``prefolded``: D is already in kernel-lane order (the fused frame
    path) — tiles must regroup the same pixel blocks, so the fold
    becomes a plain reshape (re-folding lane-ordered data would mix 8
    pixel blocks per window and destroy the footprint coherence)."""
    from shader_ray_tpu.ops.envmap import env_coords

    D, R = _pad_dirs(D, tile, prefolded)
    u, v = env_coords(D)
    return _run_window_kernel(
        planes, [u, v], R, tile, interpret, with_levels, prefolded,
        grad=False,
    )


def sample_env_window_grad(
    planes: EnvPlanes,
    D: jnp.ndarray,
    dDdx: jnp.ndarray,
    dDdy: jnp.ndarray,
    tile: int = 4096,
    interpret: bool = False,
    with_levels: bool = False,
    prefolded: bool = False,
    aniso: int = 1,
):
    """textureGrad-equivalent windowed TRILINEAR sample (fs:146, GL
    LINEAR_MIPMAP_LINEAR): per-ray LOD from the analytic derivatives
    (matching ops/envmap.py), per-tile window level pairs
    (env_window_body's grad mode).  Replaces the dense 4-hot atlas
    matmul (envmxu.sample_env_mxu_mip) whose cost scaled with the
    whole atlas — windows scale with footprint.

    ``aniso > 1``: the GL-sampler-state anisotropy approximation
    (ray.cpp:505-508) — ANISO_PROBES taps along the major footprint
    axis at the minor-axis LOD, each tap one windowed-trilinear pass
    with its own per-tile footprint stats, averaged.  Uses the same
    aniso_lod_and_probes formula as the wavefront oracle."""
    from shader_ray_tpu.ops.envmap import (
        aniso_lod_and_probes,
        env_coords,
        env_derivatives,
    )

    D, R = _pad_dirs(D, tile, prefolded)
    pad = D.shape[0] - R
    if pad:
        zpad = jnp.zeros((pad, 3), jnp.float32)
        dDdx = jnp.concatenate([jnp.asarray(dDdx, jnp.float32), zpad])
        dDdy = jnp.concatenate([jnp.asarray(dDdy, jnp.float32), zpad])
    u, v = env_coords(D)
    dudx, dvdx, dudy, dvdy = env_derivatives(D, dDdx, dDdy)
    H0, W0 = planes.base
    rho_x = jnp.sqrt((dudx * W0) ** 2 + (dvdx * H0) ** 2)
    rho_y = jnp.sqrt((dudy * W0) ** 2 + (dvdy * H0) ** 2)

    def lod_of(rho):
        return jnp.clip(
            jnp.log2(jnp.maximum(rho, 1e-12)),
            0.0,
            float(planes.n_levels - 1),
        )

    if aniso <= 1:
        return _run_window_kernel(
            planes, [u, v, lod_of(jnp.maximum(rho_x, rho_y))], R, tile,
            interpret, with_levels, prefolded, grad=True,
        )

    rho_eff, offs = aniso_lod_and_probes(
        rho_x, rho_y, dudx, dvdx, dudy, dvdy, aniso
    )
    lod = lod_of(rho_eff)
    # ONE kernel pass samples every probe from shared windows (the
    # probe offsets inflate the window-fitting spans inside the body)
    fields = [u, v, lod]
    for tu, tv in offs:
        fields.extend((u + tu, v + tv))
    return _run_window_kernel(
        planes, fields, R, tile, interpret, with_levels, prefolded,
        grad=True, n_probes=len(offs),
    )
