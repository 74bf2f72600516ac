"""Environment sampling via MXU one-hot matmuls (gather-free).

The GL path is a textureGrad/texture lat-long lookup
(raytracer.es.fs:119-155).  The axon TPU runtime has no usable vector
gather, so the lookup is reformulated as matrix algebra that rides the
MXU:

    out[r, c] = sum_y sum_x  Wrow[r, y] * Wcol[r, x] * Env[y, x, c]

with ``Wrow``/``Wcol`` two-hot bilinear weight vectors built from pure
vector ops (iota comparisons).  Contract y on the MXU first:

    T1 = Wrow @ Env.reshape(H, W*3)        # (R, W*3)  — MXU
    out[r, c] = sum_x Wcol[r, x] * T1[r, x*3 + c]   # VPU reduce

Cost: R*H*W*3*2 flops on the MXU — at the default 256x512 sampling
resolution and bf16 inputs, ~0.8 GFLOP per 1024 rays, microseconds on
a v5e.  Exact bilinear filtering (weights in f32, accumulation f32);
the u axis wraps (lat-long seam), v clamps, matching ops/envmap.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from shader_ray_tpu.ops.envmap import env_coords


def _bilinear_mxu(env_flat, rows, W, coords, chunk, dtype):
    """Chunked two-hot bilinear contraction: env_flat (rows, W*3)
    CHANNEL-MAJOR (lane c*W + x — splitting the matmul output to
    (R, 3, W) is then layout-free; the texel-major (R, W, 3) split
    forced a padded-minor-dim materialization costing ~5 ms/frame),
    coords = per-ray (x0, x1, y0, y1, fx, fy) with y in ATLAS rows."""
    x0i, x1i, y0i, y1i, fx, fy = coords
    R = x0i.shape[0]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, rows), 1)

    def sample_chunk(args):
        x0c, x1c, y0c, y1c, fxc, fyc = args
        wrow = (
            (row_iota == y0c[:, None]).astype(jnp.float32) * (1.0 - fyc)
            + (row_iota == y1c[:, None]).astype(jnp.float32) * fyc
        ).astype(dtype)
        wcol = (
            (col_iota == x0c[:, None]).astype(jnp.float32) * (1.0 - fxc)
            + (col_iota == x1c[:, None]).astype(jnp.float32) * fxc
        )
        t1 = jnp.dot(wrow, env_flat, preferred_element_type=jnp.float32)
        t1 = t1.reshape(-1, 3, W)
        return jnp.einsum(
            "rw,rcw->rc", wcol, t1, preferred_element_type=jnp.float32
        )

    if R <= chunk:
        return sample_chunk(coords)

    pad = (-R) % chunk
    def padded(a):
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0)
        return a.reshape(-1, chunk, *a.shape[1:])

    out = jax.lax.map(sample_chunk, tuple(padded(a) for a in coords))
    return out.reshape(-1, 3)[:R]


def sample_env_mxu(
    env: jnp.ndarray,
    D: jnp.ndarray,
    chunk: int = 2048,
    precision: str = "bf16",
) -> jnp.ndarray:
    """Bilinear lat-long sample: env (H, W, 3) f32, D (R, 3) -> (R, 3).

    ``precision``: "bf16" casts env + weights to bfloat16 for the MXU
    contraction (accumulates f32); "f32" keeps everything f32.
    """
    H, W = env.shape[0], env.shape[1]
    u, v = env_coords(D)  # u in [0,2) possibly, v in [0,1]

    # texel-space coordinates, half-texel centers (GL_LINEAR semantics)
    x = u * W - 0.5
    y = (1.0 - v) * H - 0.5  # row 0 = top scanline = v=1 pole
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0i = jnp.mod(x0.astype(jnp.int32), W)
    x1i = jnp.mod(x0i + 1, W)                       # u wraps
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)  # v clamps
    y1i = jnp.clip(y0i + 1, 0, H - 1)

    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    env_flat = env.transpose(0, 2, 1).reshape(H, 3 * W).astype(dtype)
    return _bilinear_mxu(
        env_flat, H, W, (x0i, x1i, y0i, y1i, fx, fy), chunk, dtype
    )


def sample_env_mxu_mip(
    atlas: jnp.ndarray,
    base_h: int,
    base_w: int,
    D: jnp.ndarray,
    dDdx: jnp.ndarray,
    dDdy: jnp.ndarray,
    chunk: int = 2048,
    precision: str = "bf16",
) -> jnp.ndarray:
    """textureGrad-equivalent trilinear mip sampling on the MXU
    (raytracer.es.fs:146; GL LINEAR_MIPMAP_LINEAR, ray.cpp:499-510).

    ``atlas``: (2*base_h - 1, base_w*3) f32 — power-of-two mip levels
    stacked vertically, each X-UPSAMPLED to the base width
    (pack.pack_env_atlas).  Per-ray level geometry is ARITHMETIC
    (h_l = base_h >> l, off_l = 2*base_h - 2*h_l), so no table gathers
    touch the axon XLA gather path.  Because every level shares the
    base-grid column weights, the whole trilinear blend is ONE 4-hot
    row matmul over the atlas — the row weights carry the y-bilinear
    AND level-mix factors of both levels (vs two full-atlas matmuls
    for the per-level-x formulation; 2x fewer MXU flops).  LOD math
    matches the wavefront engine (ops/envmap.py:105-125) except the
    chain stops at (1, w) instead of (1, 1) — one clamp level earlier,
    visible only for footprints wider than the whole image.  REPEAT
    wrap on both axes like the GL sampler state."""
    from shader_ray_tpu.ops.envmap import env_derivatives

    n_levels = base_h.bit_length()  # log2(base_h) + 1
    rows = atlas.shape[0]
    u, v = env_coords(D)
    dudx, dvdx, dudy, dvdy = env_derivatives(D, dDdx, dDdy)
    rho_x = jnp.sqrt((dudx * base_w) ** 2 + (dvdx * base_h) ** 2)
    rho_y = jnp.sqrt((dudy * base_w) ** 2 + (dvdy * base_h) ** 2)
    rho = jnp.maximum(rho_x, rho_y)
    lod = jnp.clip(
        jnp.log2(jnp.maximum(rho, 1e-12)), 0.0, float(n_levels - 1)
    )
    l0 = jnp.floor(lod).astype(jnp.int32)
    frac = lod - l0.astype(jnp.float32)
    l1 = jnp.minimum(l0 + 1, n_levels - 1)

    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    # texel-major (x*3+c) -> channel-major (c*W + x) lanes
    atlas_flat = (
        atlas.reshape(rows, base_w, 3).transpose(0, 2, 1).reshape(rows, 3 * base_w)
    ).astype(dtype)

    # shared base-grid column coordinates (u wraps, REPEAT)
    x = u * base_w - 0.5
    x0 = jnp.floor(x)
    fx = (x - x0)[:, None]
    x0i = jnp.mod(x0.astype(jnp.int32), base_w)
    x1i = jnp.mod(x0i + 1, base_w)

    def level_rows(l):
        h = jnp.right_shift(base_h, l)
        off = 2 * base_h - 2 * h
        y = (1.0 - v) * h.astype(jnp.float32) - 0.5
        y0 = jnp.floor(y)
        fy = y - y0
        y0i = off + jnp.mod(y0.astype(jnp.int32), h)
        y1i = off + jnp.mod(y0.astype(jnp.int32) + 1, h)
        return y0i, y1i, fy

    y00, y01, fy0 = level_rows(l0)
    y10, y11, fy1 = level_rows(l1)
    w00 = (1.0 - frac) * (1.0 - fy0)
    w01 = (1.0 - frac) * fy0
    w10 = frac * (1.0 - fy1)
    w11 = frac * fy1

    R = u.shape[0]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, base_w), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, rows), 1)

    def sample_chunk(args):
        y00c, y01c, y10c, y11c, w00c, w01c, w10c, w11c, x0c, x1c, fxc = args
        wrow = (
            (row_iota == y00c[:, None]).astype(jnp.float32) * w00c[:, None]
            + (row_iota == y01c[:, None]).astype(jnp.float32) * w01c[:, None]
            + (row_iota == y10c[:, None]).astype(jnp.float32) * w10c[:, None]
            + (row_iota == y11c[:, None]).astype(jnp.float32) * w11c[:, None]
        ).astype(dtype)
        wcol = (
            (col_iota == x0c[:, None]).astype(jnp.float32) * (1.0 - fxc)
            + (col_iota == x1c[:, None]).astype(jnp.float32) * fxc
        )
        t1 = jnp.dot(wrow, atlas_flat, preferred_element_type=jnp.float32)
        t1 = t1.reshape(-1, 3, base_w)
        return jnp.einsum(
            "rw,rcw->rc", wcol, t1, preferred_element_type=jnp.float32
        )

    coords = (y00, y01, y10, y11, w00, w01, w10, w11, x0i, x1i, fx)
    if R <= chunk:
        return sample_chunk(coords)

    pad = (-R) % chunk
    def padded(a):
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0)
        return a.reshape(-1, chunk, *a.shape[1:])

    out = jax.lax.map(sample_chunk, tuple(padded(a) for a in coords))
    return out.reshape(-1, 3)[:R]
