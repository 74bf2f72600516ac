"""Packet render engine — the production TPU frame pipeline.

The production path (``fused=True``, wide scenes) runs the ENTIRE
GLSL trace() loop (raytracer.es.fs:552-582) in ONE pallas_call per
frame — bounce walks, any-hit shadow walks, and the Schlick/Lambert
shading between them (ops/pallas/kernel_mega.py) — with rays
GENERATED directly in kernel-lane order from closed-form per-lane
pixel coordinates (rays_for_pixels + _laned_pixel_coords).  Only the
environment term stays outside, as MXU one-hot matmuls
(ops/pallas/envmxu.py): mode 0 samples the PackedScene base env;
mode 1 is the reference's textureGrad path (fs:146) — a single 4-hot
trilinear matmul over the x-upsampled mip atlas.

``fused=False`` (SRT_FUSED=0) keeps the unfused wavefront-structured
loop: up to six packet_trace_wide/packet_trace calls with XLA
elementwise shading between them — the A/B reference for the fused
kernel and the only path for the binary (non-wide) scene tables.

IMPORTANT (axon runtime): the jitted frame function takes the
PackedScene as an ARGUMENT — device arrays captured as closure
constants send this runtime's compiler into a minutes-long stall.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from shader_ray_tpu.ops.pallas.envmxu import sample_env_mxu, sample_env_mxu_mip
from shader_ray_tpu.ops.pallas.kernel_mega import (
    UNI_CAM_NORMAL,
    UNI_CAM_ORIGIN,
    UNI_DIFFUSE,
    UNI_IPW,
    UNI_LIGHT_DIR,
    UNI_NORMAL_INVERSE,
    UNI_NORMAL_MATRIX,
    UNI_OBJECT_MATRIX,
    UNI_SIZE,
    UNI_SPECULAR,
)
from shader_ray_tpu.ops.pallas.pack import PackedScene
from shader_ray_tpu.ops.pallas.pack_wide import PackedSceneWide
from shader_ray_tpu.ops.pallas.packet import FOLD, INFINITELY_FAR, packet_trace
from shader_ray_tpu.ops.pallas.packet_mega import packet_shade
from shader_ray_tpu.ops.pallas.packet_wide import packet_trace_wide
from shader_ray_tpu.ops.render import (
    FrameParams,
    RenderStatics,
    generate_rays,
    rays_for_pixels,
)
from shader_ray_tpu.ops.shading import (
    Rays,
    f_schlick_vr,
    ray_reflect,
    ray_transfer,
    tonemap_and_gamma,
)
from shader_ray_tpu.ops.vecmath import dot, transform_dir, transform_point


def _pack_uniforms(params: FrameParams) -> jnp.ndarray:
    """FrameParams -> the megakernel's (UNI_SIZE,) f32 SMEM table
    (kernel_mega.py layout)."""
    uni = jnp.zeros((UNI_SIZE,), jnp.float32)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    uni = uni.at[UNI_OBJECT_MATRIX : UNI_OBJECT_MATRIX + 12].set(
        f32(params.object_matrix)[:3, :4].reshape(-1)
    )
    uni = uni.at[UNI_NORMAL_MATRIX : UNI_NORMAL_MATRIX + 9].set(
        f32(params.object_normal_matrix)[:3, :3].reshape(-1)
    )
    uni = uni.at[UNI_NORMAL_INVERSE : UNI_NORMAL_INVERSE + 9].set(
        f32(params.object_normal_inverse)[:3, :3].reshape(-1)
    )
    uni = uni.at[UNI_LIGHT_DIR : UNI_LIGHT_DIR + 3].set(
        f32(params.light_dir).reshape(-1)
    )
    uni = uni.at[UNI_SPECULAR : UNI_SPECULAR + 3].set(
        f32(params.specular_color).reshape(-1)
    )
    uni = uni.at[UNI_DIFFUSE : UNI_DIFFUSE + 3].set(
        f32(params.diffuse_color).reshape(-1)
    )
    # world camera position (shared_origin scalar-origin bounce 0)
    uni = uni.at[UNI_CAM_ORIGIN : UNI_CAM_ORIGIN + 3].set(
        transform_point(
            params.camera_matrix, jnp.zeros(3, jnp.float32)
        ).reshape(-1)
    )
    # camera direction matrix + image plane width (in-kernel raygen)
    uni = uni.at[UNI_CAM_NORMAL : UNI_CAM_NORMAL + 9].set(
        f32(params.camera_normal_matrix)[:3, :3].reshape(-1)
    )
    uni = uni.at[UNI_IPW].set(f32(params.image_plane_width))
    return uni


def _env_lookup(
    packed, statics: RenderStatics, D, gx, gy,
    tile: int = 4096, interpret: bool = False, prefolded: bool = False,
) -> jnp.ndarray:
    """The environment term for the final rays, per debug mode: mode 0
    full-res windowed bilinear (fs:153 samples the NATIVE-resolution
    texture; envwin falls back per tile to mips for incoherent
    packets) — or dense MXU bilinear at the downsampled env when the
    scene was packed with env_mode="dense"; mode 1 textureGrad
    trilinear mips (fs:146); mode 2 the dY differential visualization
    (fs:147-149)."""
    if statics.which == 2:
        from shader_ray_tpu.ops.envmap import env_derivatives

        _, _, dudy, dvdy = env_derivatives(D, gx, gy)
        return jnp.stack(
            [jnp.abs(dudy) * 100.0, jnp.abs(dvdy) * 100.0, jnp.zeros_like(dudy)],
            axis=-1,
        )
    planes = getattr(packed, "env_planes", None)
    if statics.which == 1:
        if planes is not None:
            from shader_ray_tpu.ops.pallas.envwin import sample_env_window_grad

            return sample_env_window_grad(
                planes, D, gx, gy,
                tile=tile, interpret=interpret, prefolded=prefolded,
                aniso=getattr(statics, "env_aniso", 1),
            )
        H0, W0 = packed.env_atlas_base
        return sample_env_mxu_mip(packed.env_atlas, H0, W0, D, gx, gy)
    if planes is not None:
        from shader_ray_tpu.ops.pallas.envwin import sample_env_window

        return sample_env_window(
            planes, D, tile=tile, interpret=interpret, prefolded=prefolded
        )
    return sample_env_mxu(packed.env, D)


def _trace_rays_packet_fused(
    packed: PackedSceneWide,
    rays: Rays | None,
    params: FrameParams,
    statics: RenderStatics,
    tile: int,
    interpret: bool,
    max_steps: int | None,
    with_counts: bool,
    prefolded: bool,
    leaf_mode: str | None,
    shared_origin: bool = False,
    raygen: tuple | None = None,
    jitter: tuple | None = None,
    num_rays: int | None = None,
):
    """Fused fast path: ONE pallas_call runs the whole bounce/shadow
    pipeline (ops/pallas/kernel_mega.py), then the env term and final
    combine happen here.  Numerically equivalent to the unfused loop
    up to f32 op-order (see kernel_mega docstring).

    ``raygen`` (packed progressive): primary rays are generated INSIDE
    the kernel from closed-form pixel coords + the ``jitter`` blocks —
    ``rays`` is None and no superframe ray arrays exist."""
    with_grads = statics.which in (1, 2)
    res = packet_shade(
        packed,
        None if raygen is not None else rays.P,
        None if raygen is not None else rays.D,
        rays.dDdx if with_grads and raygen is None else None,
        rays.dDdy if with_grads and raygen is None else None,
        _pack_uniforms(params),
        tile=tile,
        max_steps=max_steps,
        mt_eps=statics.mt_eps,
        bounce_count=statics.bounce_count,
        cast_shadows=statics.cast_shadows,
        enable_diffuse=statics.enable_diffuse,
        surface_fudge=statics.surface_fudge,
        with_grads=with_grads,
        leaf_mode=leaf_mode or "scalar",
        interpret=interpret,
        prefolded=prefolded,
        shared_origin=shared_origin,
        raygen=raygen,
        jitter=jitter,
        num_rays=num_rays,
    )
    env = _env_lookup(
        packed, statics, res.D, res.gx, res.gy,
        tile=tile, interpret=interpret, prefolded=prefolded,
    )
    color = res.acc + res.mod * env
    bad_color = jnp.array([1.0, 0.0, 0.0], jnp.float32)
    color = jnp.where(res.bad[..., None], bad_color, color)
    if with_counts:
        return color, res.cast
    return color


def trace_rays_packet(
    packed: PackedScene,
    rays: Rays,
    params: FrameParams,
    statics: RenderStatics,
    tile: int = 1024,
    interpret: bool = False,
    interleave: int = 2,
    max_steps: int | None = None,
    with_counts: bool = False,
    prefolded: bool = False,
    leaf_mode: str | None = None,
    fused: bool = False,
    shared_origin: bool = False,
    raygen: tuple | None = None,
    jitter: tuple | None = None,
    num_rays: int | None = None,
) -> jnp.ndarray:
    """The 3-bounce trace loop over a full ray batch -> linear color.

    ``with_counts`` additionally returns the number of rays actually
    cast (alive bounce rays + shadow rays from lit hits) — the honest
    denominator for Mrays/s, vs the W*H*6 potential-ray upper bound
    (BASELINE.md accounting).  ``fused=True`` routes wide scenes
    through the single-pallas_call megakernel (interleave ignored
    there; the fused walk is single-chain)."""
    # which=5 (supersample oracle) traces exactly like which=0 — the
    # 5x5 subsample loop lives in render_frame_packet, outside the
    # trace — so it rides the fused megakernel too (the unfused wide
    # path dies with an INTERNAL error on the axon chip; CPU-only A/B)
    if fused and isinstance(packed, PackedSceneWide) and statics.which in (0, 1, 2, 5):
        return _trace_rays_packet_fused(
            packed, rays, params, statics, tile, interpret, max_steps,
            with_counts, prefolded, leaf_mode,
            shared_origin=shared_origin,
            raygen=raygen, jitter=jitter, num_rays=num_rays,
        )
    assert raygen is None, "in-kernel raygen needs the fused wide engine"
    R = rays.P.shape[0]
    f32 = jnp.float32

    accumulated = jnp.zeros((R, 3), f32)
    modulation = jnp.ones((R, 3), f32)
    alive = jnp.ones((R,), bool)
    bad = jnp.zeros((R,), bool)
    cast = jnp.zeros((), jnp.int32)
    r = rays

    wide = isinstance(packed, PackedSceneWide)
    extra = {"leaf_mode": leaf_mode} if (wide and leaf_mode) else {}
    trace = functools.partial(
        # the wide (8-ary short-stack) kernel and the binary hitmiss
        # kernel share the PacketHit contract; the table type picks
        packet_trace_wide if wide else packet_trace,
        tile=tile,
        max_steps=max_steps,
        mt_eps=statics.mt_eps,
        interleave=interleave,
        interpret=interpret,
        prefolded=prefolded,
        **extra,
    )

    for _bounce in range(statics.bounce_count):
        cast = cast + jnp.sum(alive.astype(jnp.int32))
        objP = transform_point(params.object_matrix, r.P)
        objD = transform_dir(params.object_normal_matrix, r.D)
        hit = trace(packed, objP, objD, active=alive)
        missed = hit.t >= INFINITELY_FAR
        bad = bad | (alive & hit.bad)
        hit_ok = alive & ~hit.bad & ~missed

        world_n = transform_dir(params.object_normal_inverse, hit.normal)
        world_n = jnp.where(
            (dot(world_n, r.D) > 0.0)[..., None], -world_n, world_n
        )

        transferred = ray_transfer(r, hit.t, world_n)
        reflected = ray_reflect(transferred, world_n, statics.surface_fudge)

        spec = f_schlick_vr(params.specular_color, r.D, reflected.D)
        diffuse = params.diffuse_color

        if statics.enable_diffuse:
            lcos = jnp.maximum(0.0, dot(world_n, params.light_dir))
            if statics.cast_shadows:
                # light-facing hits only (lcos == 0 lanes add no diffuse
                # either way; output-identical to the reference's
                # unconditional cast, fs:454-464)
                sact = hit_ok & (lcos > 0.0)
                cast = cast + jnp.sum(sact.astype(jnp.int32))
                sP = transform_point(params.object_matrix, reflected.P)
                sD = transform_dir(
                    params.object_normal_matrix,
                    jnp.broadcast_to(params.light_dir, (R, 3)),
                )
                # occlusion query: any-hit mode exits the walk as soon
                # as every active lane is shadowed
                shadow = trace(packed, sP, sD, active=sact, any_hit=True)
                lit = shadow.t >= INFINITELY_FAR
            else:
                lit = jnp.ones((R,), bool)
            irradiance = (lcos * lit)[..., None]
            accumulated = jnp.where(
                hit_ok[..., None],
                accumulated + modulation * diffuse * irradiance,
                accumulated,
            )

        modulation = jnp.where(hit_ok[..., None], modulation * spec, modulation)
        r = Rays(*[
            jnp.where(hit_ok[..., None], new, old)
            for new, old in zip(reflected, r)
        ])
        alive = hit_ok

    env = _env_lookup(
        packed, statics, r.D, r.dDdx, r.dDdy,
        tile=tile, interpret=interpret, prefolded=prefolded,
    )
    color = accumulated + modulation * env
    bad_color = jnp.array([1.0, 0.0, 0.0], f32)
    color = jnp.where(bad[..., None], bad_color, color)
    if with_counts:
        return color, cast
    return color


def _block_dims(H: int, W: int, tile: int) -> tuple[int, int]:
    """Largest square-ish (bh, bw) with bh*bw == tile that divides the
    frame — packets then cover compact pixel blocks, maximizing the
    ray coherence the packet walk depends on (a scanline-order packet
    spans whole image rows and traverses most of the tree)."""
    candidates = []
    bh = 1
    while bh <= tile:
        bw = tile // bh
        if bh * bw == tile and H % bh == 0 and W % bw == 0:
            candidates.append((bh, bw))
        bh *= 2
    if not candidates:
        return 1, tile  # scanline fallback (padding handles remainder)
    return min(candidates, key=lambda p: abs(p[0] - p[1]))


def _swizzle(x: jnp.ndarray, H, W, bh, bw):
    """(H*W, C) scanline order -> block order."""
    C = x.shape[-1]
    return (
        x.reshape(H // bh, bh, W // bw, bw, C)
        .transpose(0, 2, 1, 3, 4)
        .reshape(H * W, C)
    )


def _unswizzle(x: jnp.ndarray, H, W, bh, bw):
    C = x.shape[-1]
    return (
        x.reshape(H // bh, W // bw, bh, bw, C)
        .transpose(0, 2, 1, 3, 4)
        .reshape(H * W, C)
    )


def _lane_fold_perm(x: jnp.ndarray, tile: int, fold: int) -> jnp.ndarray:
    """(R, c) block-swizzled ray order -> kernel-lane order, so the
    per-trace folds inside packet_trace become pure reshapes.  Applied
    ONCE per frame (vs one transpose pass per component per trace)."""
    R = x.shape[0]
    nt, C = R // tile, tile // fold
    return x.reshape(nt, fold, C, -1).transpose(1, 0, 2, 3).reshape(R, -1)


def _lane_unfold_perm(x: jnp.ndarray, tile: int, fold: int) -> jnp.ndarray:
    R = x.shape[0]
    nt, C = R // tile, tile // fold
    return x.reshape(fold, nt, C, -1).transpose(1, 0, 2, 3).reshape(R, -1)


def _prefold_ok(statics, tile, mesh) -> bool:
    """Whether the frame can run in kernel-lane order end to end."""
    return (
        mesh is None
        and statics.which not in (3,)
        and (statics.height * statics.width) % tile == 0
        and tile % (FOLD * 128) == 0
    )


def _block_decode(s, H, W, bh, bw):
    """Block-swizzled flat pixel index -> (row, col) float32."""
    if bh > 1:
        nbw = W // bw
        b = s // (bh * bw)
        p = s % (bh * bw)
        j = (b // nbw) * bh + p // bw
        i = (b % nbw) * bw + p % bw
    else:
        j = s // W
        i = s % W
    return j.astype(jnp.float32), i.astype(jnp.float32)


def _laned_pixel_coords(H, W, bh, bw, tile, fold):
    """(row, col) float32 pixel indices for each kernel-lane-order ray
    slot: the closed-form composition of _swizzle and _lane_fold_perm.
    Generating rays directly at these coordinates (rays_for_pixels) is
    pure elementwise math — it replaces two transpose passes over all
    six ray fields (~200 MB of HBM permute traffic per frame)."""
    R = H * W
    nt = R // tile
    C = tile // fold
    q = jnp.arange(R, dtype=jnp.int32)
    f = q // (nt * C)
    r1 = q % (nt * C)
    t = r1 // C
    c = r1 % C
    s = (t * fold + f) * C + c  # block-swizzled flat index
    return _block_decode(s, H, W, bh, bw)


def _laned_pixel_coords_packed(H, W, bh, bw, tile0, fold, S):
    """Pixel coords + jitter-copy index for an S-sample PACKED
    superframe: each kernel tile (S * tile0 lanes) holds S jittered
    copies of the SAME tile0-pixel block — lanes [s*C0, (s+1)*C0) of
    every fold row are copy ``s``.  Sub-pixel jitter barely moves a
    packet's BVH footprint, so the packed tile's traversal union is
    ~the single-frame union while every walk step, leaf visit, and
    env window amortizes over S frames (vs S sequential passes).
    Contrast tile growth over DIFFERENT pixels, which grows the union
    and was measured a loss (tile=8192, CLAUDE.md)."""
    R0 = H * W
    nt = R0 // tile0
    C0 = tile0 // fold
    C = S * C0
    q = jnp.arange(S * R0, dtype=jnp.int32)
    f = q // (nt * C)
    r1 = q % (nt * C)
    t = r1 // C
    c = r1 % C
    sidx = c // C0  # jitter-copy index of this lane
    c0 = c % C0
    s = (t * fold + f) * C0 + c0  # original laned slot's pixel
    j, i = _block_decode(s, H, W, bh, bw)
    return j, i, sidx


def _make_trace(packed, params, statics, tile, interpret, interleave,
                max_steps, mesh, prefolded=False, leaf_mode=None,
                fused=True, shared_origin=False, raygen=None,
                num_rays=None):
    """Trace closure over a (R, 3)-column Rays batch; when ``mesh`` is
    given, shard the batch 1-D over its ``("rays",)`` axis with
    shard_map — scene tables and params replicated, zero collectives in
    the hot path (SURVEY.md 5.7-5.8; same layout as parallel/mesh.py's
    wavefront path, applied to the production engine).  With ``raygen``
    the closure takes (None, (jx, jy)) instead of a Rays batch."""

    def local(packed_, params_, rays_, jitter_=None):
        return trace_rays_packet(
            packed_, rays_, params_, statics, tile, interpret, interleave,
            max_steps, prefolded=prefolded, leaf_mode=leaf_mode,
            fused=fused, shared_origin=shared_origin,
            raygen=raygen if jitter_ is not None else None,
            jitter=jitter_, num_rays=num_rays,
        )

    if mesh is None:
        return lambda rays_, jitter_=None: local(
            packed, params, rays_, jitter_
        )

    import jax
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )

    def trace(rays_):
        R = rays_.P.shape[0]
        pad = (-R) % n_dev
        if pad:
            # pad directions with unit z (zero D gives inf/NaN slab and
            # env math in the padded lanes, tripping SRT_DEBUG_NANS)
            unit_z = jnp.broadcast_to(
                jnp.array([0.0, 0.0, 1.0], jnp.float32), (pad, 3)
            )
            fields = []
            for name, x in zip(rays_._fields, rays_):
                fill = unit_z if name == "D" else jnp.zeros((pad, 3), x.dtype)
                fields.append(jnp.concatenate([x, fill], axis=0))
            rays_ = Rays(*fields)
        color = sharded(packed, params, rays_)
        return color[:R]

    return trace


def _kraygen_ok(packed, W, bh, bw, C0, fused, envfuse=False) -> bool:
    """Static eligibility for in-kernel raygen (+ env fusion): fused
    wide engine, config knobs on, power-of-two block geometry (the
    kernel's pixel-decode div/mod lower to shifts/masks), and — for
    env fusion — a packed plane pyramid to sample from."""
    from shader_ray_tpu.config import get_config

    p2 = lambda n: n > 0 and (n & (n - 1)) == 0
    cfg = get_config()
    ok = (
        fused
        and isinstance(packed, PackedSceneWide)
        and cfg.kernel_raygen
        and p2(C0)
        and (p2(bh) and p2(bw) and p2(W // bw) if bh > 1 else p2(W))
    )
    if not envfuse:
        return ok
    return (
        ok
        and cfg.kernel_envfuse
        and getattr(packed, "env_planes", None) is not None
    )


def _fused_frame_color(
    packed, params, statics, tile0, S, jxt, jyt,
    *, bh, bw, interpret, max_steps, leaf_mode,
):
    """One fully-fused (raygen + walk + shade + env in ONE pallas_call)
    superframe of S jitter copies: returns the (H*W, 3) laned per-pixel
    LINEAR color SUMS over the copies (divide by S for the mean; S=1 is
    a plain frame).  ``jxt``/``jyt`` are the (FOLD, S*C0) per-tile
    jitter blocks."""
    W, H = statics.width, statics.height
    C0 = tile0 // FOLD
    nt = (H * W) // tile0
    res = packet_shade(
        packed, None, None, None, None,
        _pack_uniforms(params),
        tile=tile0 * S,
        max_steps=max_steps,
        mt_eps=statics.mt_eps,
        bounce_count=statics.bounce_count,
        cast_shadows=statics.cast_shadows,
        enable_diffuse=statics.enable_diffuse,
        surface_fudge=statics.surface_fudge,
        with_grads=statics.which in (1, 2),
        leaf_mode=leaf_mode or "scalar",
        interpret=interpret,
        prefolded=True,
        shared_origin=True,
        raygen=(W, H, bh, bw, C0),
        jitter=(jxt, jyt),
        num_rays=S * H * W,
        env_fuse=dict(
            planes=packed.env_planes,
            which=statics.which,
            aniso=getattr(statics, "env_aniso", 1),
        ),
    )
    OC = max(C0, 128)
    return (
        res.colorsum.reshape(3, FOLD, nt, OC // C0, C0)
        .sum(axis=3)          # fold residual copies (sub-128 blocks)
        .transpose(1, 2, 3, 0)
        .reshape(H * W, 3)    # laned pixel order
    )


def render_frame_packet(
    packed: PackedScene,
    params: FrameParams,
    statics: RenderStatics,
    tile: int = 1024,
    interpret: bool = False,
    interleave: int = 2,
    max_steps: int | None = None,
    mesh=None,
    leaf_mode: str | None = None,
    fused: bool = True,
    _laned_out: bool = False,
) -> jnp.ndarray:
    """Full frame -> (H, W, 3), tonemapped unless disabled.

    ``_laned_out`` (internal, progressive path): return the raw
    kernel-lane-order (H*W, 3) color — the caller accumulates in lane
    order and unfolds ONCE per batch instead of once per sample."""
    W, H = statics.width, statics.height
    bh, bw = _block_dims(H, W, tile)
    # kernel-lane ordering applied at ray GENERATION (closed-form pixel
    # coords per lane slot — no transpose passes; folds inside each
    # trace reduce to reshapes); the sharded path keeps pixel order so
    # shard slicing stays contiguous.  Only valid when the kernels fold
    # with FOLD sublanes (tile multiple of 1024 — the binary engine
    # folds differently for smaller tiles).
    prefolded = _prefold_ok(statics, tile, mesh)
    # fully-fused single-frame fast path (raygen + env in-kernel, S=1):
    # the interactive/REPL dispatch gets the same kernel as the packed
    # progressive batches — no superframe ray arrays, no separate env
    # pallas_call, one kernel per frame
    if (
        statics.which in (0, 1, 2)
        and prefolded
        and _kraygen_ok(packed, W, bh, bw, tile // FOLD, fused,
                        envfuse=True)
    ):
        C0 = tile // FOLD
        jx = (params.pixel_jitter[0] if params.pixel_jitter is not None
              else jnp.float32(0.0))
        jy = (params.pixel_jitter[1] if params.pixel_jitter is not None
              else jnp.float32(0.0))
        jxt = jnp.broadcast_to(
            jnp.asarray(jx, jnp.float32), (FOLD, C0)
        )
        jyt = jnp.broadcast_to(
            jnp.asarray(jy, jnp.float32), (FOLD, C0)
        )
        color = _fused_frame_color(
            packed, params._replace(pixel_jitter=None), statics, tile, 1,
            jxt, jyt, bh=bh, bw=bw, interpret=interpret,
            max_steps=max_steps, leaf_mode=leaf_mode,
        )
        if _laned_out:
            return color
        color = _lane_unfold_perm(color, tile, FOLD)
        if bh > 1:
            color = _unswizzle(color, H, W, bh, bw)
        if statics.do_tonemap:
            color = tonemap_and_gamma(color, statics.use_filmic)
        return color.reshape(H, W, 3)
    if prefolded:
        jj, ii = _laned_pixel_coords(H, W, bh, bw, tile, FOLD)
        rays, _ = rays_for_pixels(statics, params, jj, ii)
    else:
        rays, _ = generate_rays(statics, params)
        if bh > 1:
            rays = Rays(*[_swizzle(x, H, W, bh, bw) for x in rays])
    trace_batch = _make_trace(
        packed, params, statics, tile, interpret, interleave, max_steps,
        mesh, prefolded, leaf_mode, fused,
        # frame rays are pinhole primaries: every lane starts at the
        # camera, so the fused kernel carries the origin as scalars
        # through bounce 0 (kernel_mega shared_origin)
        shared_origin=True,
    )

    if statics.which == 3:
        # per-pixel differential-spread visualization (fs:642-650):
        # pure math, no traversal — same as the wavefront engine
        from shader_ray_tpu.ops.envmap import env_coords

        d = rays.D
        below = jnp.stack(env_coords(d - rays.dDdy / 2.0), axis=-1)
        above = jnp.stack(env_coords(d + rays.dDdy / 2.0), axis=-1)
        delta = jnp.abs(above - below) * 100.0
        color = jnp.concatenate([delta, jnp.zeros_like(delta[..., :1])], axis=-1)
    elif statics.which == 5:
        # 5x5 supersampled reference-image mode (fs:654-673)
        from shader_ray_tpu.ops.vecmath import dot as vdot, normalize

        right = transform_dir(
            params.camera_normal_matrix,
            jnp.stack([params.image_plane_width / W, jnp.zeros(()), jnp.zeros(())]),
        )
        up = transform_dir(
            params.camera_normal_matrix,
            jnp.stack(
                [jnp.zeros(()), params.image_plane_width * (H / W) / H, jnp.zeros(())]
            ),
        )
        n = 5
        offs = jnp.array(
            [(i / n - 0.5, j / n - 0.5) for i in range(n) for j in range(n)],
            jnp.float32,
        )

        # scan (not a Python loop): unrolling 25 copies of the full
        # trace pipeline into one program crashed the TPU backend at
        # 1024x768 (INTERNAL error) and made compiles enormous — the
        # scan body traces the pipeline ONCE
        def sample(acc, dudv):
            Ds = normalize(
                rays.D + dudv[0] * 0.2 * right + dudv[1] * 0.2 * up
            )
            dDdx = right - vdot(Ds, right)[..., None] * Ds
            dDdy = up - vdot(Ds, up)[..., None] * Ds
            sub = Rays(
                P=rays.P, D=Ds, dPdx=jnp.zeros_like(Ds), dDdx=dDdx,
                dPdy=jnp.zeros_like(Ds), dDdy=dDdy,
            )
            return acc + trace_batch(sub), None

        acc, _ = jax.lax.scan(sample, jnp.zeros_like(rays.P), offs)
        color = acc / (n * n)
    else:
        color = trace_batch(rays)

    if _laned_out and prefolded:
        return color  # (H*W, 3) kernel-lane order, no tonemap
    if prefolded:
        color = _lane_unfold_perm(color, tile, FOLD)
    if bh > 1:
        color = _unswizzle(color, H, W, bh, bw)
    if statics.do_tonemap:
        color = tonemap_and_gamma(color, statics.use_filmic)
    return color.reshape(H, W, 3)


def render_progressive_packet(
    packed: PackedScene,
    params: FrameParams,
    statics: RenderStatics,
    jitters: jnp.ndarray,
    tile: int = 1024,
    interpret: bool = False,
    interleave: int = 2,
    max_steps: int | None = None,
    mesh=None,
    leaf_mode: str | None = None,
    fused: bool = True,
    jitter_pack: int = 1,
) -> jnp.ndarray:
    """Progressive accumulation fully on device: average ``K`` frames
    rendered at the given (K, 2) sub-pixel jitters in linear space,
    tonemap once.  One dispatch renders all K samples — the host
    round-trip (tens of ms on the axon tunnel) is paid once per batch
    instead of once per batch (the host-loop analog lives in
    App.render_progressive).  When the frame can run in kernel-lane
    order, each sample accumulates LANED and the fold/swizzle
    permutations run once per batch, not once per sample.

    ``jitter_pack`` = S > 1 packs S jitter samples of the SAME pixel
    block into each kernel tile (S * tile lanes per grid step): their
    sub-pixel-shifted packets traverse a near-identical BVH footprint,
    so walk steps, leaf-visit fixed costs, and env windows amortize
    over S frames (_laned_pixel_coords_packed).  Falls back to S = 1
    when the batch/tile shape or debug mode does not allow it."""
    inner = statics._replace(do_tonemap=False)
    W, H = statics.width, statics.height
    K = jitters.shape[0]
    S = int(jitter_pack)

    # the packed kernel tile is S*tile lanes, so only the PRODUCT must
    # meet the 1024-lane minimum — sub-1024 pixel blocks (e.g. S=8 at
    # block 512) are valid packed shapes for divergent scenes, where
    # the per-block traversal union shrinks with the block
    def _packed_ok(s: int) -> bool:
        return (
            s > 1 and mesh is None and K % s == 0
            and statics.which in (0, 1, 2)
            and (H * W) % tile == 0
            and tile % FOLD == 0
            and (tile * s) % (FOLD * 128) == 0
        )

    if S > 1 and not _packed_ok(S):
        # degrade to the largest packing that still divides the batch
        # (e.g. an autotuned S=8 winner driven with K=4 runs S=4) so a
        # persisted sub-1024 block stays on the packed path for any K
        S = next((s for s in range(min(S, K), 1, -1) if _packed_ok(s)), 1)
    packed_ok = _packed_ok(S)
    if not packed_ok and tile % (FOLD * 128) != 0:
        # UNPACKED frames need the full 1024-lane kernel minimum —
        # sub-1024 pixel blocks are only a valid shape packed (the
        # kernel tile there is S * block lanes)
        tile = -(-tile // (FOLD * 128)) * (FOLD * 128)
    laned = packed_ok or _prefold_ok(statics, tile, mesh)

    def step(acc, jit2):
        prm = params._replace(pixel_jitter=jit2)
        frame = render_frame_packet(
            packed, prm, inner, tile, interpret, interleave, max_steps,
            mesh, leaf_mode, fused=fused, _laned_out=laned,
        )
        return acc + frame, None

    # scan with a running-sum carry: no (K, H, W, 3) stack materializes
    acc0 = jnp.zeros((H * W, 3) if laned else (H, W, 3), jnp.float32)
    if packed_ok:
        bh, bw = _block_dims(H, W, tile)
        nt = (H * W) // tile
        C0 = tile // FOLD
        # in-kernel raygen (kernel_mega raygen mode): the packed
        # superframe's per-lane pixel coords are closed-form, so the
        # kernel generates its own primary rays and the S*W*H-lane ray
        # arrays (2.4 GB per field at S=256 on the bench frame) never
        # materialize — the XLA glue shrinks to the two (FOLD, S*C0)
        # jitter blocks.  Requires power-of-two block geometry (the
        # kernel's div/mod lower to shifts/masks) and the fused wide
        # engine.
        use_kraygen = _kraygen_ok(packed, W, bh, bw, C0, fused)
        # full fusion: env sampling + combine + jitter-copy reduction
        # in-kernel too — the per-ray output buffers vanish (a single
        # one crosses 2^31 bytes at S=256 and kills the TPU compile)
        use_kfull = _kraygen_ok(packed, W, bh, bw, C0, fused,
                                envfuse=True)
        if not use_kraygen:
            jj, ii, _sidx = _laned_pixel_coords_packed(
                H, W, bh, bw, tile, FOLD, S
            )
        trace_batch = _make_trace(
            packed, params, inner, tile * S, interpret, interleave,
            max_steps, None, prefolded=True, leaf_mode=leaf_mode,
            fused=fused, shared_origin=True,
            raygen=(W, H, bh, bw, C0) if use_kraygen else None,
            num_rays=S * H * W,
        )

        def step_packed(acc, jit_s):  # jit_s: (S, 2) jitters
            # per-lane jitter by copy index: the laned superframe viewed
            # as (FOLD, nt, S, C0) varies its jitter copy only on axis
            # 2, so a broadcast+reshape places each copy's jitter on its
            # lanes with O(1) HLO ops.  (The old per-copy
            # ``where(sidx == s, ...)`` chain emitted 2*S full-superframe
            # selects — at S=256 that program crashed the remote XLA
            # compile helper outright, the round-9 "256-deep fails to
            # compile" verdict.)
            if use_kraygen:
                # per-TILE jitter blocks (every grid step identical):
                # lane (f, s*C0 + c0) of every tile is jitter copy s
                jxt = jnp.broadcast_to(
                    jit_s[None, :, 0:1], (FOLD, S, C0)
                ).reshape(FOLD, S * C0)
                jyt = jnp.broadcast_to(
                    jit_s[None, :, 1:2], (FOLD, S, C0)
                ).reshape(FOLD, S * C0)
                if use_kfull:
                    colsum = _fused_frame_color(
                        packed, params, inner, tile, S, jxt, jyt,
                        bh=bh, bw=bw, interpret=interpret,
                        max_steps=max_steps, leaf_mode=leaf_mode,
                    )
                    return acc + colsum, None
                color = trace_batch(None, (jxt, jyt))
            else:
                jx = jnp.broadcast_to(
                    jit_s[None, None, :, 0:1], (FOLD, nt, S, C0)
                ).reshape(-1)
                jy = jnp.broadcast_to(
                    jit_s[None, None, :, 1:2], (FOLD, nt, S, C0)
                ).reshape(-1)
                rays, _ = rays_for_pixels(
                    inner, params._replace(pixel_jitter=None),
                    jj + jy, ii + jx,
                )
                color = trace_batch(rays)  # (S*H*W, 3) packed lane order
            colsum = (
                color.reshape(FOLD, nt, S, C0, 3)
                .sum(axis=2)
                .reshape(H * W, 3)
            )
            return acc + colsum, None

        acc, _ = jax.lax.scan(step_packed, acc0, jitters.reshape(K // S, S, 2))
    else:
        acc, _ = jax.lax.scan(step, acc0, jitters)
    acc = acc / jitters.shape[0]
    if laned:
        bh, bw = _block_dims(H, W, tile)
        acc = _lane_unfold_perm(acc, tile, FOLD)
        if bh > 1:
            acc = _unswizzle(acc, H, W, bh, bw)
        acc = acc.reshape(H, W, 3)
    if statics.do_tonemap:
        acc = tonemap_and_gamma(acc, statics.use_filmic)
    return acc


def make_packet_render_fn(
    packed: PackedScene,
    statics: RenderStatics,
    tile: int = 1024,
    interpret: bool = False,
    interleave: int = 2,
    max_steps: int | None = None,
    mesh=None,
    leaf_mode: str | None = None,
    fused: bool = True,
):
    """Jit the packet frame function (scene threaded as an argument —
    see module docstring) and close a convenience wrapper over the
    packed scene.  With ``mesh``, the ray batch shards over its 1-D
    device axis (scene replicated)."""
    if mesh is not None:
        from shader_ray_tpu.parallel import replicate_scene

        packed = replicate_scene(packed, mesh)

    @functools.partial(jax.jit, static_argnames=("statics_",))
    def _fn(packed_, params, statics_):
        return render_frame_packet(
            packed_, params, statics_, tile, interpret, interleave,
            max_steps, mesh, leaf_mode, fused,
        )

    def fn(params: FrameParams) -> jnp.ndarray:
        return _fn(packed, params, statics)

    return fn
