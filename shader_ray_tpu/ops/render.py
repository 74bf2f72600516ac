"""The frame render function — TPU replacement for the GLSL megakernel.

Maps the per-pixel fragment program (raytracer.es.fs:613-682 `main` ->
trace -> intersect_and_shade -> approximate_diffuse -> environment ->
tonemap) onto a batched wavefront:

* ray-gen is computed per pixel from the camera matrices
  (the reference interpolates VS corner rays across a quad,
  raytracer.vs:39-58; here each pixel gets the exact pinhole ray — the
  corner-interpolation was a rasterizer trick, not a feature);
* the 3-bounce loop (fs:550-582) is statically unrolled over the whole
  ray batch with per-lane alive masks (wavefront style);
* each bounce's BVH walk and the optional shadow walk are the batched
  stackless traversal in ops.traversal;
* the frame is processed in fixed-size ray tiles via lax.map so each
  tile's traversal while_loop terminates as soon as *its* rays finish
  (the GL analog: fragment quads retire independently).

Everything dynamic per frame (matrices, light, material colors, fov)
enters as arguments — the function jits once per static config
(resolution/mode/material-class), mirroring how the GL program
compiled once and took uniforms per draw (ray.cpp:648-704).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from shader_ray_tpu.config import Config, get_config
from shader_ray_tpu.ops import envmap as envmap_ops
from shader_ray_tpu.ops.scene import DeviceScene
from shader_ray_tpu.ops.shading import (
    Rays,
    f_schlick_vr,
    ray_reflect,
    ray_transfer,
    tonemap_and_gamma,
)
from shader_ray_tpu.ops.traversal import INFINITELY_FAR, traverse
from shader_ray_tpu.ops.vecmath import dot, normalize, transform_dir, transform_point


class FrameParams(NamedTuple):
    """Per-frame dynamic inputs (the reference's uniforms,
    ray.cpp:648-704)."""

    camera_matrix: jnp.ndarray          # (4,4) eye->world ray transform
    camera_normal_matrix: jnp.ndarray   # (4,4)
    object_matrix: jnp.ndarray          # (4,4) world->object ray transform
    object_normal_matrix: jnp.ndarray   # (4,4)
    object_normal_inverse: jnp.ndarray  # (4,4) object->world normals
    light_dir: jnp.ndarray              # (3,)
    specular_color: jnp.ndarray         # (3,)
    diffuse_color: jnp.ndarray          # (3,)
    image_plane_width: jnp.ndarray      # () = 2*tan(fov/2)
    # sub-pixel jitter in pixels, for progressive accumulation /
    # antialiasing (no reference analog; the GL path is 1 spp)
    pixel_jitter: jnp.ndarray = None


class RenderStatics(NamedTuple):
    """Static (compile-time) render configuration."""

    width: int = 512
    height: int = 512
    bounce_count: int = 3
    max_bvh_iterations: int = 400
    max_leaf_tests: int = 10
    which: int = 0              # debug mode, fs `which` uniform
    cast_shadows: bool = True
    enable_diffuse: bool = True  # diffuse_color all > 0 (fs:570 gate)
    use_filmic: bool = True
    do_tonemap: bool = True
    mt_eps: float = 1.0e-7
    surface_fudge: float = 1.0e-4
    tile_size: int = 16384      # rays per lax.map tile
    env_aniso: int = 1          # which=1 anisotropy probe count (GL
                                # MAX_ANISOTROPY 4, ray.cpp:505-508);
                                # 1 = isotropic max-rho trilinear

    @staticmethod
    def from_config(cfg: Config | None = None, **overrides) -> "RenderStatics":
        cfg = cfg or get_config()
        base = dict(
            width=cfg.window_width,
            height=cfg.window_height,
            bounce_count=cfg.bounce_count,
            max_bvh_iterations=cfg.max_bvh_iterations,
            max_leaf_tests=cfg.max_leaf_tests,
            cast_shadows=cfg.cast_shadows,
            use_filmic=cfg.use_filmic,
            do_tonemap=cfg.do_tonemap,
            mt_eps=cfg.mt_epsilon,
            surface_fudge=cfg.surface_fudge,
            env_aniso=cfg.env_aniso,
        )
        base.update(overrides)
        return RenderStatics(**base)


def rays_for_pixels(
    statics: RenderStatics, params: FrameParams, jj: jnp.ndarray, ii: jnp.ndarray
) -> tuple[Rays, tuple]:
    """Pinhole rays + seeded differentials for arbitrary pixel index
    arrays (``jj`` = row from top, ``ii`` = column; float32, any
    shape).  Pure elementwise math, so callers may order pixels
    however the downstream kernel wants (e.g. directly in packet
    lane order, engine_pallas._laned_pixel_coords) with no transpose
    passes.  Equivalent of raytracer.vs:39-58 + fs:621-625."""
    W, H = statics.width, statics.height
    ipw = params.image_plane_width
    aspect = H / (1.0 * W)  # ray.cpp:673

    jx = 0.0 if params.pixel_jitter is None else params.pixel_jitter[0]
    jy = 0.0 if params.pixel_jitter is None else params.pixel_jitter[1]
    u = (ii + 0.5 + jx) / W
    v = 1.0 - (jj + 0.5 + jy) / H  # v=0 bottom (vs:43-45)
    shape = jnp.broadcast_shapes(jj.shape, ii.shape)
    d_eye = jnp.stack(
        [
            jnp.broadcast_to(ipw * (u - 0.5), shape),
            jnp.broadcast_to(ipw * (v - 0.5) * aspect, shape),
            jnp.full(shape, -1.0),
        ],
        axis=-1,
    )
    d_eye = normalize(d_eye)

    P = jnp.broadcast_to(
        transform_point(params.camera_matrix, jnp.zeros(3, jnp.float32)),
        shape + (3,),
    )
    D = transform_dir(params.camera_normal_matrix, d_eye)
    D = normalize(D)  # fs:619

    # per-pixel world-space spacing vectors (ray.cpp:677-683)
    right = transform_dir(
        params.camera_normal_matrix,
        jnp.stack([ipw / W, jnp.zeros(()), jnp.zeros(())]),
    )
    up = transform_dir(
        params.camera_normal_matrix,
        jnp.stack([jnp.zeros(()), ipw * aspect / H, jnp.zeros(())]),
    )
    # dDdx = (dot(d,d)*right - dot(d,right)*d) / |d|^3 with |d| = 1
    # (fs:622-625)
    dDdx = right - dot(D, right)[..., None] * D
    dDdy = up - dot(D, up)[..., None] * D

    flat = lambda x: x.reshape(-1, 3)
    zeros = jnp.zeros((int(np.prod(shape)), 3), jnp.float32)
    return Rays(
        P=flat(P), D=flat(D), dPdx=zeros, dDdx=flat(dDdx), dPdy=zeros, dDdy=flat(dDdy)
    ), (right, up)


def generate_rays(statics: RenderStatics, params: FrameParams) -> Rays:
    """Per-pixel pinhole rays + seeded differentials.
    Returns (H*W, 3) arrays, row-major, row 0 = top scanline."""
    W, H = statics.width, statics.height
    jj = jnp.arange(H, dtype=jnp.float32)[:, None]  # row, 0 = top
    ii = jnp.arange(W, dtype=jnp.float32)[None, :]
    return rays_for_pixels(statics, params, jj, ii)


def _interpolate_normal(scene: DeviceScene, which: jnp.ndarray, u, v):
    """triangle_interpolate_normal (fs:288-295): barycentric blend of
    the 3 vertex normals; uvw = (1-u-v, u, v)."""
    tri_n = jnp.take(scene.tri_normals, jnp.maximum(which, 0), axis=0, mode="clip")
    w0 = (1.0 - u - v)[..., None]
    return tri_n[:, 0:3] * w0 + tri_n[:, 3:6] * u[..., None] + tri_n[:, 6:9] * v[..., None]


def trace_rays(
    scene: DeviceScene,
    rays: Rays,
    params: FrameParams,
    statics: RenderStatics,
    active0: jnp.ndarray | None = None,
    with_counts: bool = False,
) -> jnp.ndarray:
    """The fs `trace` loop (fs:552-582) over a batch: returns linear
    (pre-tonemap) color (R, 3).  ``with_counts`` additionally returns
    the number of rays actually cast (honest Mrays/s denominator)."""
    R = rays.P.shape[0]
    f32 = jnp.float32

    accumulated = jnp.zeros((R, 3), f32)
    modulation = jnp.ones((R, 3), f32)
    alive = (
        jnp.ones((R,), bool) if active0 is None else active0
    )
    bad = jnp.zeros((R,), bool)
    cast = jnp.zeros((), jnp.int32)
    r = rays

    for _bounce in range(statics.bounce_count):
        # intersect_and_shade (fs:484-522)
        cast = cast + jnp.sum(alive.astype(jnp.int32))
        objP = transform_point(params.object_matrix, r.P)
        objD = transform_dir(params.object_normal_matrix, r.D)
        hit = traverse(
            scene,
            objP,
            objD,
            max_bvh_iterations=statics.max_bvh_iterations,
            max_leaf_tests=statics.max_leaf_tests,
            mt_eps=statics.mt_eps,
            active=alive,
        )
        missed = hit.t >= INFINITELY_FAR
        bad_now = alive & hit.bad
        bad = bad | bad_now
        hit_ok = alive & ~hit.bad & ~missed

        # shade (fs:362-377): white base color + interpolated normal
        n_obj = _interpolate_normal(scene, hit.which, hit.u, hit.v)
        world_n = transform_dir(params.object_normal_inverse, n_obj)
        # flip backfacing (fs:510-512)
        world_n = jnp.where(
            (dot(world_n, r.D) > 0.0)[..., None], -world_n, world_n
        )

        transferred = ray_transfer(r, hit.t, world_n)
        reflected = ray_reflect(transferred, world_n, statics.surface_fudge)

        spec = f_schlick_vr(params.specular_color, r.D, reflected.D)
        diffuse = params.diffuse_color  # * white object color (fs:519,375)

        if statics.enable_diffuse:
            # approximate_diffuse (fs:447-472): Lambert + hard shadow
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
                shadow = traverse(
                    scene,
                    sP,
                    sD,
                    max_bvh_iterations=statics.max_bvh_iterations,
                    max_leaf_tests=statics.max_leaf_tests,
                    mt_eps=statics.mt_eps,
                    active=sact,
                )
                lit = shadow.t >= INFINITELY_FAR  # bad shadow hits shade
            else:
                lit = jnp.ones((R,), bool)
            irradiance = (lcos * lit)[..., None]  # white light (fs:24-25)
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

    env = envmap_ops.sample_environment(
        scene, r.D, r.dDdx, r.dDdy, statics.which,
        aniso=getattr(statics, "env_aniso", 1),
    )
    color = accumulated + modulation * env
    # bad-hit lanes short-circuit to the debug color (fs:497-501,566-568)
    bad_color = jnp.array([1.0, 0.0, 0.0], f32)
    color = jnp.where(bad[..., None], bad_color, color)
    if with_counts:
        return color, cast
    return color


def _render_tile(scene, params, statics, tile):
    """One ray tile: (P, D, dPdx, dDdx, dPdy, dDdy) each (tile, 3)."""
    rays = Rays(*tile)
    if statics.which == 5:
        # 5x5 supersampled reference-image mode (fs:654-673)
        right = transform_dir(
            params.camera_normal_matrix,
            jnp.stack(
                [params.image_plane_width / statics.width, jnp.zeros(()), jnp.zeros(())]
            ),
        )
        up = transform_dir(
            params.camera_normal_matrix,
            jnp.stack(
                [
                    jnp.zeros(()),
                    params.image_plane_width
                    * (statics.height / statics.width)
                    / statics.height,
                    jnp.zeros(()),
                ]
            ),
        )
        acc = jnp.zeros_like(rays.P)
        n = 5
        for i in range(n):
            for j in range(n):
                du = i / n - 0.5
                dv = j / n - 0.5
                D = normalize(rays.D + du * 0.2 * right + dv * 0.2 * up)
                dDdx = right - dot(D, right)[..., None] * D
                dDdy = up - dot(D, up)[..., None] * D
                sub = Rays(
                    P=rays.P, D=D, dPdx=jnp.zeros_like(D), dDdx=dDdx,
                    dPdy=jnp.zeros_like(D), dDdy=dDdy,
                )
                acc = acc + trace_rays(scene, sub, params, statics)
        color = acc / (n * n)
    elif statics.which == 3:
        # visualize this pixel's env-coordinate differentials (fs:642-650)
        d = rays.D
        below = jnp.stack(envmap_ops.env_coords(d - rays.dDdy / 2.0), axis=-1)
        above = jnp.stack(envmap_ops.env_coords(d + rays.dDdy / 2.0), axis=-1)
        delta = jnp.abs(above - below) * 100.0
        color = jnp.concatenate([delta, jnp.zeros_like(delta[..., :1])], axis=-1)
    else:
        color = trace_rays(scene, rays, params, statics)

    if statics.do_tonemap:
        color = tonemap_and_gamma(color, statics.use_filmic)
    return color


def render_frame(
    scene: DeviceScene, params: FrameParams, statics: RenderStatics
) -> jnp.ndarray:
    """Render a full frame -> (H, W, 3) float32 (tonemapped unless
    disabled). Top scanline first."""
    W, H = statics.width, statics.height
    rays, _ = generate_rays(statics, params)
    R = H * W
    tile = min(statics.tile_size, R)
    pad = (-R) % tile
    n_tiles = (R + pad) // tile

    def pad_split(x):
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad, 3), x.dtype)], axis=0)
        return x.reshape(n_tiles, tile, 3)

    tiles = tuple(pad_split(x) for x in rays)
    if n_tiles == 1:
        color = _render_tile(scene, params, statics, tuple(t[0] for t in tiles))
    else:
        color = jax.lax.map(
            lambda t: _render_tile(scene, params, statics, t), tiles
        ).reshape(-1, 3)
    color = color.reshape(-1, 3)[:R]
    return color.reshape(H, W, 3)


def make_render_fn(scene: DeviceScene, statics: RenderStatics):
    """Jit the frame function once for a static config; per-frame
    uniforms are traced arguments (SURVEY.md hard-part 5: no recompiles
    on camera/material changes)."""

    @functools.partial(jax.jit, donate_argnums=())
    def fn(params: FrameParams) -> jnp.ndarray:
        return render_frame(scene, params, statics)

    return fn


def default_frame_params(
    statics: RenderStatics | None = None,
    fov: float = np.deg2rad(40.0),
) -> FrameParams:
    """Identity-view params for tests: camera at origin looking -z."""
    eye = np.eye(4, dtype=np.float32)
    return FrameParams(
        camera_matrix=jnp.asarray(eye),
        camera_normal_matrix=jnp.asarray(eye),
        object_matrix=jnp.asarray(eye),
        object_normal_matrix=jnp.asarray(eye),
        object_normal_inverse=jnp.asarray(eye),
        light_dir=jnp.asarray(np.array([0.0, 0.0, 1.0], np.float32)),
        specular_color=jnp.asarray(np.array([1.0, 0.71, 0.29], np.float32)),
        diffuse_color=jnp.asarray(np.zeros(3, np.float32)),
        image_plane_width=jnp.asarray(2.0 * np.tan(fov / 2.0), jnp.float32),
        pixel_jitter=jnp.zeros(2, jnp.float32),
    )
