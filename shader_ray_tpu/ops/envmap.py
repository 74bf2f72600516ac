"""Lat-long environment map sampling with mip selection.

Device equivalent of sample_environment (raytracer.es.fs:119-155) plus
the GL texture machinery it leaned on (mipmapped LINEAR_MIPMAP_LINEAR
sampling via textureGrad, ray.cpp:499-510):

* direction -> equirect UV: u = 1 + atan(-z, x)/tau (in [0.5, 1.5],
  REPEAT wrap), v = 1 - acos(y)/pi (fs:123,130);
* analytic texture-coordinate derivatives from ray differentials
  (fs:135-142);
* ``which`` mode 1 samples with derivatives (textureGrad -> trilinear
  between mip levels here), mode 2 visualizes the dY derivative
  (fs:148-149), any other mode samples level 0 bilinear (zero-grad
  textureGrad, fs:153);
* GL_REPEAT wrap on both axes (the GL sampler's default state).

The mip chain lives in a single vertically-stacked atlas
(models.background.pack_mip_atlas) so level selection is dynamic
per-lane arithmetic, not a dynamic array shape.

Image orientation: atlas level row 0 is the *top* scanline and v = 1
maps to it (+y pole).  [The GL path uploaded FreeImage's bottom-up
scanlines, so its v = 1 also landed on the image's visual top.]
"""

from __future__ import annotations

import jax.numpy as jnp

from shader_ray_tpu.ops.scene import DeviceScene

PI = 3.14159265259  # fs:116 (reference's slightly-off pi, kept verbatim)
TAU = 2.0 * PI


def env_coords(D: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """get_environment_map_coords (fs:121-125). D need not be unit in
    x/z (atan2 is scale-free) but y must be in [-1, 1] for acos."""
    u = 1.0 + jnp.arctan2(-D[..., 2], D[..., 0]) / TAU
    v = 1.0 - jnp.arccos(jnp.clip(D[..., 1], -1.0, 1.0)) / PI
    return u, v


def env_derivatives(D, dDdx, dDdy):
    """Analytic du/dv derivatives w.r.t. the image plane (fs:135-142)."""
    x, y, z = D[..., 0], D[..., 1], D[..., 2]
    denom_u = 2.0 * PI * (x * x + z * z)
    dudx = (x * dDdx[..., 2] - z * dDdx[..., 0]) / denom_u
    dudy = (x * dDdy[..., 2] - z * dDdy[..., 0]) / denom_u
    denom_v = PI * jnp.sqrt(jnp.maximum(1.0 - y * y, 1e-12))
    dvdx = dDdx[..., 1] / denom_v
    dvdy = dDdy[..., 1] / denom_v
    return dudx, dvdx, dudy, dvdy


def _bilinear_level(scene: DeviceScene, level: jnp.ndarray, u, v):
    """Bilinear REPEAT-wrapped fetch at a per-lane mip level."""
    atlas_w = scene.env_atlas.shape[1]
    flat = scene.env_atlas.reshape(-1, 3)
    tbl = jnp.take(scene.env_table, level, axis=0, mode="clip")  # (R, 3)
    off, h, w = tbl[..., 0], tbl[..., 1], tbl[..., 2]
    hf = h.astype(jnp.float32)
    wf = w.astype(jnp.float32)

    x = u * wf - 0.5
    yrow = (1.0 - v) * hf - 0.5  # v=1 -> top row 0
    x0 = jnp.floor(x)
    y0 = jnp.floor(yrow)
    fx = (x - x0)[..., None]
    fy = (yrow - y0)[..., None]

    def fetch(xi, yi):
        xi = jnp.mod(xi.astype(jnp.int32), w)
        yi = jnp.mod(yi.astype(jnp.int32), h)
        idx = (off + yi) * atlas_w + xi
        return jnp.take(flat, idx, axis=0, mode="clip")

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


ANISO_PROBES = 4  # probe count for the aniso approximation (GL
                  # MAX_ANISOTROPY 4, ray.cpp:505-508)


def aniso_lod_and_probes(rho_x, rho_y, dudx, dvdx, dudy, dvdy, aniso: int):
    """Shared anisotropic-sampler approximation (used verbatim by BOTH
    the wavefront oracle and the windowed Pallas path so they agree):

      N_eff = clip(rho_max / rho_min, 1, aniso)
      lod   = log2(rho_max / N_eff) = log2(max(rho_min, rho_max/aniso))
      probes: ANISO_PROBES taps at t_i = ((i+.5)/P - .5)*(1 - 1/N_eff)
              along the MAJOR gradient axis, equal 1/P weights
              (N_eff = 1 collapses every tap to the center — exact
              isotropic trilinear).

    Returns (rho_eff, [(tu_i, tv_i)] uv offsets)."""
    use_x = rho_x >= rho_y
    rho_max = jnp.maximum(rho_x, rho_y)
    rho_min = jnp.minimum(rho_x, rho_y)
    n_eff = jnp.clip(
        rho_max / jnp.maximum(rho_min, 1e-12), 1.0, float(aniso)
    )
    rho_eff = jnp.maximum(rho_min, rho_max / float(aniso))
    du_maj = jnp.where(use_x, dudx, dudy)
    dv_maj = jnp.where(use_x, dvdx, dvdy)
    spread = 1.0 - 1.0 / n_eff
    offs = []
    for i in range(ANISO_PROBES):
        t = ((i + 0.5) / ANISO_PROBES - 0.5) * spread
        offs.append((t * du_maj, t * dv_maj))
    return rho_eff, offs


def sample_environment(
    scene: DeviceScene,
    D: jnp.ndarray,
    dDdx: jnp.ndarray,
    dDdy: jnp.ndarray,
    which: int = 0,
    aniso: int = 1,
) -> jnp.ndarray:
    """sample_environment (fs:127-155). D: (R, 3) unit directions.

    ``aniso > 1`` enables the anisotropic-filtering approximation of
    the reference's GL sampler state (LINEAR_MIPMAP_LINEAR +
    MAX_ANISOTROPY 4, ray.cpp:505-508): probe taps along the major
    footprint axis at the minor-axis LOD; ``aniso=1`` is the isotropic
    max-rho trilinear."""
    u, v = env_coords(D)

    if which == 2:
        # visualize the dY differential (fs:147-149)
        _, _, dudy, dvdy = env_derivatives(D, dDdx, dDdy)
        return jnp.stack(
            [jnp.abs(dudy) * 100.0, jnp.abs(dvdy) * 100.0, jnp.zeros_like(u)],
            axis=-1,
        )

    if which == 1:
        dudx, dvdx, dudy, dvdy = env_derivatives(D, dDdx, dDdy)
        # GL textureGrad LOD: log2 of the screen-space footprint in
        # texels at the base level (GL_LINEAR_MIPMAP_LINEAR).
        h0 = scene.env_table[0, 1].astype(jnp.float32)
        w0 = scene.env_table[0, 2].astype(jnp.float32)
        rho_x = jnp.sqrt((dudx * w0) ** 2 + (dvdx * h0) ** 2)
        rho_y = jnp.sqrt((dudy * w0) ** 2 + (dvdy * h0) ** 2)
        n_levels = scene.num_env_levels

        def trilinear(ui, vi, rho):
            lod = jnp.clip(
                jnp.log2(jnp.maximum(rho, 1e-12)), 0.0, float(n_levels - 1)
            )
            l0 = jnp.floor(lod).astype(jnp.int32)
            frac = (lod - l0.astype(jnp.float32))[..., None]
            c0 = _bilinear_level(scene, l0, ui, vi)
            c1 = _bilinear_level(
                scene, jnp.minimum(l0 + 1, n_levels - 1), ui, vi
            )
            return c0 * (1 - frac) + c1 * frac

        if aniso <= 1:
            return trilinear(u, v, jnp.maximum(rho_x, rho_y))
        rho_eff, offs = aniso_lod_and_probes(
            rho_x, rho_y, dudx, dvdx, dudy, dvdy, aniso
        )
        acc = None
        for tu, tv in offs:
            c = trilinear(u + tu, v + tv, rho_eff)
            acc = c if acc is None else acc + c
        return acc / float(len(offs))

    # default: sample base level, no derivatives (fs:153)
    return _bilinear_level(scene, jnp.zeros(u.shape, jnp.int32), u, v)
