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
UNI_SIZE = 42


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
):
    f32 = jnp.float32
    i32 = jnp.int32
    F = fold
    C = tile // F

    if with_grads:
        (gx_ref, gy_ref, act_ref,
         acc_ref, mod_ref, dout_ref, gxo_ref, gyo_ref, bad_ref, cnt_ref,
         stack_ref, leafbuf_ref, sems_ref, nodebuf_ref, nsems_ref,
         lqueue_ref) = rest
    else:
        (act_ref,
         acc_ref, mod_ref, dout_ref, bad_ref, cnt_ref,
         stack_ref, leafbuf_ref, sems_ref, nodebuf_ref, nsems_ref,
         lqueue_ref) = rest

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
    Dx, Dy, Dz = D_ref[0:F, :], D_ref[F : 2 * F, :], D_ref[2 * F :, :]
    if with_grads:
        gxx, gxy, gxz = gx_ref[0:F, :], gx_ref[F : 2 * F, :], gx_ref[2 * F :, :]
        gyx, gyy, gyz = gy_ref[0:F, :], gy_ref[F : 2 * F, :], gy_ref[2 * F :, :]
    act = act_ref[:, :] > 0

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
    cnt_ref[:, :] = cnt
