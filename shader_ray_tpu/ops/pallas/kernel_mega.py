"""Fused shading megakernel: the whole bounce loop in ONE pallas_call.

The unfused packet pipeline (ops/engine_pallas.py) launches up to six
wide-kernel pallas_calls per frame (3 bounce traces + 3 shadow traces)
with XLA elementwise glue between them.  Each Mosaic grid step costs
~3-6 us of launch overhead (measured, CLAUDE.md) — at 384 ray tiles
per 1024x768 frame that is ~10-15 ms/frame of pure overhead, plus the
HBM round-trips for the inter-kernel ray state.

This kernel fuses the complete GLSL trace() loop (reference
raytracer.es.fs:552-582: intersect -> shade -> shadow -> reflect, 3x)
over one ray tile: the walk machinery is shared with the trace-only
kernel (kernel_wide.make_wide_walker), the shading math between walks
is the same formulas as ops/shading.py inlined as vector ops, and the
frame's per-object uniforms (matrices, light, material colors —
reference ray.cpp:648-704) arrive as an SMEM scalar table whose reads
splat for free.  Only the environment lookup stays outside (its u/v
math needs atan2/acos, which Mosaic does not lower; the windowed
sampler envwin.py — or the dense MXU matmul envmxu.py — runs as its
own pallas_call): the kernel returns the accumulated color, the final
modulation, and the final ray direction (plus its differentials for
the textureGrad modes), and the caller finishes
``color = accumulated + modulation * env(D)``.

Shadow rays share one direction (the object-space light), so their
walk's octant and inverse-direction terms are true scalars.

NOTE exact-f32 caveat: the in-kernel transforms evaluate the same
formulas as the XLA path in a fixed scalar-madd order, so individual
pixels at shadow/silhouette boundaries may round differently than the
unfused engine — parity tests compare with tolerances, not bit-equality.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from shader_ray_tpu.ops.pallas.kernel_body import INFINITELY_FAR, safe_inv
from shader_ray_tpu.ops.pallas.kernel_wide import make_wide_walker

# uniform table layout (f32 SMEM, see engine_pallas._pack_uniforms)
UNI_OBJECT_MATRIX = 0    # [:3,:4] row-major, world->object points
UNI_NORMAL_MATRIX = 12   # [:3,:3] row-major, world->object directions
UNI_NORMAL_INVERSE = 21  # [:3,:3] row-major, object->world normals
UNI_LIGHT_DIR = 30       # (3,) world light direction
UNI_SPECULAR = 33        # (3,) specular color
UNI_DIFFUSE = 36         # (3,) diffuse color
UNI_CAM_ORIGIN = 39      # (3,) world camera position (shared_origin)
UNI_CAM_NORMAL = 42      # [:3,:3] row-major camera normal matrix
                         # (eye->world directions; in-kernel raygen)
UNI_IPW = 51             # () image plane width = 2*tan(fov/2)
UNI_SIZE = 52


def mega_kernel(
    leaves_ref,
    boxes_ref,
    cmeta_ref,
    order_ref,
    masks_ref,
    tribase_ref,
    nodes_ref,
    uni_ref,
    P_ref,
    D_ref,
    *rest,
    n_wide: int,
    max_steps: int,
    mt_eps: float,
    tile: int,
    fold: int,
    stack_depth: int,
    box_quant: tuple,
    bounce_count: int = 3,
    cast_shadows: bool = True,
    enable_diffuse: bool = True,
    surface_fudge: float = 1e-4,
    with_grads: bool = True,
    leaf_mode: str = "scalar",
    leaf_slots: int = 10,
    node_src: str = "smem",
    pops: int = 1,
    isect: str = "mt",
    shared_origin: bool = False,
    leaf_scan: str = "ctz",
    min_contrib: float = 0.0,
    act_all: bool = False,
    raygen: tuple | None = None,
    envfuse: dict | None = None,
):
    f32 = jnp.float32
    i32 = jnp.int32
    F = fold
    C = tile // F

    # raygen mode (packed progressive fast path): primary rays are
    # GENERATED here from closed-form per-lane pixel coordinates —
    # the equivalent of ops/render.rays_for_pixels (raytracer.vs:39-58,
    # fs:621-625) evaluated per kernel lane — instead of arriving as
    # HBM operands.  P_ref/D_ref then carry the tiny per-TILE jitter
    # blocks (identical for every grid step), the gx/gy inputs vanish
    # (differentials are seeded in-kernel), and the superframe's 2.4+
    # GB/field ray arrays never exist.  ``raygen`` is the static tuple
    # (W, H, bh, bw, C0) — every div/mod below is a power-of-two
    # shift/mask (the caller guarantees it).
    # envfuse mode (with raygen: the fully-fused frame kernel): the
    # environment term, final combine, and the jitter-copy reduction
    # all happen HERE — the per-ray acc/mod/D(+grad) outputs (2.4 GB
    # each at S=256) are replaced by ONE per-pixel color-sum block per
    # tile, and the separate env-sampler pallas_call disappears.
    # ``envfuse`` is static: {n_levels, which, aniso, base=(H0, W0),
    # out_lanes} — see packet_mega.packet_shade.
    ins = list(rest)
    if with_grads and raygen is None:
        gx_ref, gy_ref = ins[0], ins[1]
        ins = ins[2:]
    if envfuse is not None:
        eoff_ref, eh_ref, ew_ref, eblk_ref, planes_ref = ins[:5]
        ins = ins[5:]
    act_ref = ins[0]
    if envfuse is not None:
        (cs_ref, cnt_ref,
         stack_ref, leafbuf_ref, sems_ref, nodebuf_ref, nsems_ref,
         lqueue_ref, win_ref, esems_ref) = ins[1:]
    elif with_grads:
        (acc_ref, mod_ref, dout_ref, gxo_ref, gyo_ref, bad_ref, cnt_ref,
         stack_ref, leafbuf_ref, sems_ref, nodebuf_ref, nsems_ref,
         lqueue_ref) = ins[1:]
    else:
        (acc_ref, mod_ref, dout_ref, bad_ref, cnt_ref,
         stack_ref, leafbuf_ref, sems_ref, nodebuf_ref, nsems_ref,
         lqueue_ref) = ins[1:]

    walker = make_wide_walker(
        leaves_ref, boxes_ref, cmeta_ref, order_ref, masks_ref,
        tribase_ref, nodes_ref, stack_ref, leafbuf_ref, sems_ref,
        nodebuf_ref, nsems_ref, lqueue_ref,
        n_wide=n_wide, max_steps=max_steps, mt_eps=mt_eps, fold=F,
        walks=1, lane_width=C, stack_depth=stack_depth,
        box_quant=box_quant, leaf_mode=leaf_mode, leaf_slots=leaf_slots,
        node_src=node_src, pops=pops, isect=isect,
        track_which=False,  # shading needs only t + normal
        leaf_scan=leaf_scan,
    )

    # --- frame uniforms: SMEM scalars (free splats) ---
    u = lambda i: uni_ref[i]
    m = [u(UNI_OBJECT_MATRIX + i) for i in range(12)]
    nm = [u(UNI_NORMAL_MATRIX + i) for i in range(9)]
    ni = [u(UNI_NORMAL_INVERSE + i) for i in range(9)]
    Lx, Ly, Lz = u(UNI_LIGHT_DIR), u(UNI_LIGHT_DIR + 1), u(UNI_LIGHT_DIR + 2)
    csp = [u(UNI_SPECULAR + i) for i in range(3)]
    cdf = [u(UNI_DIFFUSE + i) for i in range(3)]
    # object-space light direction (shadow rays share it; scalar math)
    oLx = nm[0] * Lx + nm[1] * Ly + nm[2] * Lz
    oLy = nm[3] * Lx + nm[4] * Ly + nm[5] * Lz
    oLz = nm[6] * Lx + nm[7] * Ly + nm[8] * Lz

    # --- ray state in registers ---
    if shared_origin:
        # pinhole primaries all start at the camera: carry the origin
        # as SCALARS through bounce 0 — the leaf-test P-dots (oz/ou/ov
        # affine rows, slot_hit) then run on the scalar unit instead
        # of ~12 vector ops per triangle slot, exactly like the shadow
        # walks' shared DIRECTION already does.  After the first
        # transfer Px becomes a per-lane vector via broadcasting.
        Px = u(UNI_CAM_ORIGIN)
        Py = u(UNI_CAM_ORIGIN + 1)
        Pz = u(UNI_CAM_ORIGIN + 2)
    else:
        Px, Py, Pz = P_ref[0:F, :], P_ref[F : 2 * F, :], P_ref[2 * F :, :]
    if raygen is not None:
        assert shared_origin and act_all, (
            "in-kernel raygen implies pinhole primaries from the "
            "camera with every lane live"
        )
        Wd, Hd, bh, bw, C0 = raygen
        shr = lambda x, d: jax.lax.shift_right_logical(
            x, jnp.int32(d.bit_length() - 1)
        )
        mask = lambda x, d: jnp.bitwise_and(x, d - 1)
        jxv = P_ref[:, :]  # (F, C) per-lane x jitter (tile-invariant)
        jyv = D_ref[:, :]
        t = pl.program_id(0)
        ci = jax.lax.broadcasted_iota(i32, (F, C), 1)
        fi = jax.lax.broadcasted_iota(i32, (F, C), 0)
        # block-swizzled flat pixel index of this lane's pixel: the
        # in-kernel mirror of engine_pallas._laned_pixel_coords_packed
        s = (t * F + fi) * C0 + mask(ci, C0)
        if bh > 1:
            nbw = Wd // bw
            b = shr(s, bh * bw)
            p = mask(s, bh * bw)
            pj = shr(b, nbw) * bh + shr(p, bw)
            pi = mask(b, nbw) * bw + mask(p, bw)
        else:
            pj = shr(s, Wd)
            pi = mask(s, Wd)
        jf = pj.astype(f32)
        iif = pi.astype(f32)
        ipw = u(UNI_IPW)
        aspect = float(Hd) / float(Wd)
        # pinhole eye ray (raytracer.vs:39-58): normalize twice like
        # the XLA path (d_eye, then the world direction — fs:619)
        uu = (iif + 0.5 + jxv) * (1.0 / Wd)
        vv = 1.0 - (jf + 0.5 + jyv) * (1.0 / Hd)
        ex = ipw * (uu - 0.5)
        ey = (ipw * aspect) * (vv - 0.5)
        inv_e = 1.0 / jnp.sqrt(ex * ex + ey * ey + 1.0)
        dex = ex * inv_e
        dey = ey * inv_e
        dez = -inv_e
        cm = [u(UNI_CAM_NORMAL + i) for i in range(9)]
        Dx = cm[0] * dex + cm[1] * dey + cm[2] * dez
        Dy = cm[3] * dex + cm[4] * dey + cm[5] * dez
        Dz = cm[6] * dex + cm[7] * dey + cm[8] * dez
        inv_d = 1.0 / jnp.sqrt(Dx * Dx + Dy * Dy + Dz * Dz)
        Dx, Dy, Dz = Dx * inv_d, Dy * inv_d, Dz * inv_d
        if with_grads:
            # seeded differentials (ray.cpp:677-683, fs:622-625):
            # right/up are the camera matrix columns scaled by the
            # per-pixel image-plane spacing — true scalars here
            sx = ipw * (1.0 / Wd)
            sy = (ipw * aspect) * (1.0 / Hd)
            rx, ry, rz = cm[0] * sx, cm[3] * sx, cm[6] * sx
            ux_, uy_, uz_ = cm[1] * sy, cm[4] * sy, cm[7] * sy
            dr = Dx * rx + Dy * ry + Dz * rz
            gxx, gxy, gxz = rx - dr * Dx, ry - dr * Dy, rz - dr * Dz
            du_ = Dx * ux_ + Dy * uy_ + Dz * uz_
            gyx, gyy, gyz = ux_ - du_ * Dx, uy_ - du_ * Dy, uz_ - du_ * Dz
    else:
        Dx, Dy, Dz = D_ref[0:F, :], D_ref[F : 2 * F, :], D_ref[2 * F :, :]
        if with_grads:
            gxx, gxy, gxz = (
                gx_ref[0:F, :], gx_ref[F : 2 * F, :], gx_ref[2 * F :, :]
            )
            gyx, gyy, gyz = (
                gy_ref[0:F, :], gy_ref[F : 2 * F, :], gy_ref[2 * F :, :]
            )
    # act_all: every lane is live (a full packed frame) — the mask is a
    # compile-time constant and the act operand is a dummy (its 2.4 GB
    # all-ones superframe array at S=256 was pure upload waste)
    act = (
        jnp.ones((F, C), bool) if act_all else act_ref[:, :] > 0
    )

    zeros = jnp.zeros((F, C), f32)
    ones = jnp.ones((F, C), f32)
    acc = [zeros, zeros, zeros]
    mod = [ones, ones, ones]
    badv = jnp.zeros((F, C), bool)
    cast = jnp.zeros((), i32)
    # per-phase (steps, leaf visits) — bounce walks at even slots,
    # shadow walks at odd; packet_shade.ShadeResult.stats decodes
    phase_stats = []

    def vec_rays(px, py, pz, dx, dy, dz, a):
        af = a.astype(f32)
        octant = (
            (jnp.sum(dx * af) > 0.0).astype(i32)
            + 2 * (jnp.sum(dy * af) > 0.0).astype(i32)
            + 4 * (jnp.sum(dz * af) > 0.0).astype(i32)
        )
        return dict(
            Px=px, Py=py, Pz=pz, Dx=dx, Dy=dy, Dz=dz,
            invx=safe_inv(dx), invy=safe_inv(dy), invz=safe_inv(dz),
            act=a, octant=octant,
        )

    for _bounce in range(bounce_count):
        cast = cast + jnp.sum(act.astype(i32))
        # world -> object (transform_point / transform_dir semantics)
        oPx = m[0] * Px + m[1] * Py + m[2] * Pz + m[3]
        oPy = m[4] * Px + m[5] * Py + m[6] * Pz + m[7]
        oPz = m[8] * Px + m[9] * Py + m[10] * Pz + m[11]
        oDx = nm[0] * Dx + nm[1] * Dy + nm[2] * Dz
        oDy = nm[3] * Dx + nm[4] * Dy + nm[5] * Dz
        oDz = nm[6] * Dx + nm[7] * Dy + nm[8] * Dz

        (sp, steps, leafs, badw, t, which, nx, ny, nz), = walker(
            [vec_rays(oPx, oPy, oPz, oDx, oDy, oDz, act)], any_hit=False
        )
        phase_stats.append((steps, leafs))
        hit_ok = act & ~badw & (t < INFINITELY_FAR)
        badv = badv | (act & badw)

        # object -> world normal, flipped against the incoming ray
        wnx = ni[0] * nx + ni[1] * ny + ni[2] * nz
        wny = ni[3] * nx + ni[4] * ny + ni[5] * nz
        wnz = ni[6] * nx + ni[7] * ny + ni[8] * nz
        flip = jnp.where(wnx * Dx + wny * Dy + wnz * Dz > 0.0, -1.0, 1.0)
        wnx, wny, wnz = wnx * flip, wny * flip, wnz * flip

        # transfer + fudged reflect (ops/shading.py:29-55, fs:65-96)
        rPx = Px + t * Dx + wnx * surface_fudge
        rPy = Py + t * Dy + wny * surface_fudge
        rPz = Pz + t * Dz + wnz * surface_fudge
        ddn = Dx * wnx + Dy * wny + Dz * wnz
        rDx = Dx - 2.0 * ddn * wnx
        rDy = Dy - 2.0 * ddn * wny
        rDz = Dz - 2.0 * ddn * wnz

        # Schlick in (view . reflected) half-angle form (fs:479-482)
        h = (Dx * rDx + Dy * rDy + Dz * rDz) * 0.5 + 0.5
        h2 = h * h
        fres = h2 * h2 * h
        spec = [c + (1.0 - c) * fres for c in csp]

        if enable_diffuse:
            lcos = jnp.maximum(0.0, wnx * Lx + wny * Ly + wnz * Lz)
            if cast_shadows:
                # light-facing hits only: lcos == 0 lanes contribute no
                # diffuse either way, so skipping their shadow rays is
                # output-identical to the reference's unconditional
                # cast (fs:454-464) — and ~halves shadow-walk work
                sact = hit_ok & (lcos > 0.0)
                cast = cast + jnp.sum(sact.astype(i32))
                # object-space shadow ray: transformed fudged origin,
                # shared object-space light direction (scalars)
                sPx = m[0] * rPx + m[1] * rPy + m[2] * rPz + m[3]
                sPy = m[4] * rPx + m[5] * rPy + m[6] * rPz + m[7]
                sPz = m[8] * rPx + m[9] * rPy + m[10] * rPz + m[11]
                soct = (
                    (oLx > 0.0).astype(i32)
                    + 2 * (oLy > 0.0).astype(i32)
                    + 4 * (oLz > 0.0).astype(i32)
                )
                srays = dict(
                    Px=sPx, Py=sPy, Pz=sPz, Dx=oLx, Dy=oLy, Dz=oLz,
                    invx=safe_inv(oLx), invy=safe_inv(oLy),
                    invz=safe_inv(oLz),
                    act=sact, octant=soct,
                )
                (_, s_steps, s_leafs, _, st, _, _, _, _), = walker(
                    [srays], any_hit=True
                )
                phase_stats.append((s_steps, s_leafs))
                lit = st >= INFINITELY_FAR
                irr = lcos * lit.astype(f32)
            else:
                irr = lcos
            acc = [
                jnp.where(hit_ok, a + mo * c * irr, a)
                for a, mo, c in zip(acc, mod, cdf)
            ]

        mod = [jnp.where(hit_ok, mo * s, mo) for mo, s in zip(mod, spec)]
        Px = jnp.where(hit_ok, rPx, Px)
        Py = jnp.where(hit_ok, rPy, Py)
        Pz = jnp.where(hit_ok, rPz, Pz)
        Dx = jnp.where(hit_ok, rDx, Dx)
        Dy = jnp.where(hit_ok, rDy, Dy)
        Dz = jnp.where(hit_ok, rDz, Dz)
        if with_grads:
            # reference fs:92-93 quirk kept verbatim: subtract the
            # SCALAR 2*dot(dD, n) from each component (ops/shading.py:42)
            gdx = gxx * wnx + gxy * wny + gxz * wnz
            gxx = jnp.where(hit_ok, gxx - 2.0 * gdx, gxx)
            gxy = jnp.where(hit_ok, gxy - 2.0 * gdx, gxy)
            gxz = jnp.where(hit_ok, gxz - 2.0 * gdx, gxz)
            gdy = gyx * wnx + gyy * wny + gyz * wnz
            gyx = jnp.where(hit_ok, gyx - 2.0 * gdy, gyx)
            gyy = jnp.where(hit_ok, gyy - 2.0 * gdy, gyy)
            gyz = jnp.where(hit_ok, gyz - 2.0 * gdy, gyz)
        act = hit_ok
        if min_contrib > 0.0 and _bounce + 1 < bounce_count:
            # throughput cutoff: a retired lane's env term uses its
            # CURRENT reflected direction — exactly the result had the
            # next walk missed — so the per-pixel error is bounded by
            # mod * (radiance difference), <= min_contrib * O(1).  The
            # win is structural: per-lane retirement shrinks the
            # packet's slab-test union, cutting later-bounce walk
            # steps and leaf visits (the frame's dominant cost) for
            # everything but grazing-Fresnel lanes.
            act = act & (
                (mod[0] > min_contrib)
                | (mod[1] > min_contrib)
                | (mod[2] > min_contrib)
            )

    if envfuse is not None:
        from shader_ray_tpu.ops.pallas.envwin import env_window_body
        from shader_ray_tpu.ops.pallas.trig import (
            PI_REF,
            env_coords_kernel,
        )

        which = envfuse["which"]
        n_levels = envfuse["n_levels"]
        H0, W0 = (float(x) for x in envfuse["base"])
        if which == 2:
            # dY differential visualization (fs:147-149): pure math
            denom_u = (2.0 * PI_REF) * (Dx * Dx + Dz * Dz)
            denom_v = PI_REF * jnp.sqrt(
                jnp.maximum(1.0 - Dy * Dy, 1e-12)
            )
            dudy = (Dx * gyz - Dz * gyx) / denom_u
            dvdy = gyy / denom_v
            er = jnp.abs(dudy) * 100.0
            eg = jnp.abs(dvdy) * 100.0
            eb = jnp.zeros((F, C), f32)
            env_lvl = jnp.int32(0)
        else:
            uvc, vvc = env_coords_kernel(Dx, Dy, Dz)
            if which == 1:
                # textureGrad trilinear + GL-aniso probes: the same
                # formulas as ops/envmap.env_derivatives /
                # aniso_lod_and_probes, evaluated in-kernel
                denom_u = (2.0 * PI_REF) * (Dx * Dx + Dz * Dz)
                denom_v = PI_REF * jnp.sqrt(
                    jnp.maximum(1.0 - Dy * Dy, 1e-12)
                )
                dudx = (Dx * gxz - Dz * gxx) / denom_u
                dudy = (Dx * gyz - Dz * gyx) / denom_u
                dvdx = gxy / denom_v
                dvdy = gyy / denom_v
                rho_x = jnp.sqrt((dudx * W0) ** 2 + (dvdx * H0) ** 2)
                rho_y = jnp.sqrt((dudy * W0) ** 2 + (dvdy * H0) ** 2)
                aniso = int(envfuse.get("aniso", 1))
                if aniso > 1:
                    use_x = rho_x >= rho_y
                    rho_max = jnp.maximum(rho_x, rho_y)
                    rho_min = jnp.minimum(rho_x, rho_y)
                    n_eff = jnp.clip(
                        rho_max / jnp.maximum(rho_min, 1e-12),
                        1.0, float(aniso),
                    )
                    rho_eff = jnp.maximum(rho_min, rho_max / float(aniso))
                    du_maj = jnp.where(use_x, dudx, dudy)
                    dv_maj = jnp.where(use_x, dvdx, dvdy)
                    spread = 1.0 - 1.0 / n_eff
                    n_probes = envfuse.get("n_probes", 4)
                    probes = []
                    for i in range(n_probes):
                        tt = ((i + 0.5) / n_probes - 0.5) * spread
                        probes.append(
                            (uvc + tt * du_maj, vvc + tt * dv_maj)
                        )
                else:
                    rho_eff = jnp.maximum(rho_x, rho_y)
                    probes = None
                lod = jnp.clip(
                    jnp.log2(jnp.maximum(rho_eff, 1e-12)),
                    0.0, float(n_levels - 1),
                )
                er, eg, eb, env_lvl = env_window_body(
                    planes_ref, eoff_ref, eh_ref, ew_ref, eblk_ref,
                    win_ref, esems_ref, uvc, vvc,
                    n_levels=n_levels, fold=F, lanes=C,
                    lod=lod, probes=probes,
                )
            else:
                er, eg, eb, env_lvl = env_window_body(
                    planes_ref, eoff_ref, eh_ref, ew_ref, eblk_ref,
                    win_ref, esems_ref, uvc, vvc,
                    n_levels=n_levels, fold=F, lanes=C,
                )
        bad_colors = (1.0, 0.0, 0.0)
        col = [
            jnp.where(badv, bc, a + mo * e)
            for a, mo, e, bc in zip(acc, mod, (er, eg, eb), bad_colors)
        ]
        # jitter-copy reduction: lanes [s*C0, (s+1)*C0) are copy s of
        # the same C0 pixels — halve until out_lanes remain (stopping
        # at >= 128 keeps every slice vector-register aligned; the XLA
        # glue folds the last few copies of sub-128-lane blocks)
        OC = int(envfuse["out_lanes"])
        for cch in range(3):
            x = col[cch]
            w = C
            while w > OC:
                w //= 2
                x = x[:, :w] + x[:, w : 2 * w]
            cs_ref[cch * F : (cch + 1) * F, :] = x
    else:
        acc_ref[0:F, :], acc_ref[F : 2 * F, :], acc_ref[2 * F :, :] = acc
        mod_ref[0:F, :], mod_ref[F : 2 * F, :], mod_ref[2 * F :, :] = mod
        dout_ref[0:F, :] = Dx
        dout_ref[F : 2 * F, :] = Dy
        dout_ref[2 * F :, :] = Dz
        if with_grads:
            gxo_ref[0:F, :] = gxx
            gxo_ref[F : 2 * F, :] = gxy
            gxo_ref[2 * F :, :] = gxz
            gyo_ref[0:F, :] = gyx
            gyo_ref[F : 2 * F, :] = gyy
            gyo_ref[2 * F :, :] = gyz
        bad_ref[:, :] = badv.astype(i32)

    # per-tile counters, composed as a vector (scalar VMEM stores
    # unsupported): lane 0 = cast rays; lanes 1+2p / 2+2p = phase p's
    # walk steps / leaf visits (bounce walks at even p, shadows odd)
    ri = jax.lax.broadcasted_iota(i32, (8, 128), 0)
    ci = jax.lax.broadcasted_iota(i32, (8, 128), 1)
    cnt = jnp.where((ri == 0) & (ci == 0), cast, 0)
    for p, (steps, leafs) in enumerate(phase_stats):
        cnt = jnp.where((ri == 0) & (ci == 1 + 2 * p), steps, cnt)
        cnt = jnp.where((ri == 0) & (ci == 2 + 2 * p), leafs, cnt)
    if envfuse is not None:
        # observability: the tile's env window levels (lvl_a + 16*lvl_b,
        # envwin.env_window_body) in the lane after the phase stats —
        # lets sampler-fallback behavior be compared against the
        # standalone sampler's with_levels output without extra outputs
        cnt = jnp.where(
            (ri == 0) & (ci == 1 + 2 * len(phase_stats)), env_lvl, cnt
        )
    cnt_ref[:, :] = cnt
