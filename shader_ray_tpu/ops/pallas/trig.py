"""Mosaic-lowerable inverse-trig approximations.

The environment map's direction -> lat-long mapping needs atan2 and
acos (ops/envmap.env_coords, raytracer.es.fs:121-125), which Mosaic
does not lower — that is why the env term historically ran OUTSIDE the
megakernel as its own pallas_call over XLA-computed (u, v).  These
polynomial versions (the classic Cephes single-precision atan kernel
with two-stage argument reduction) are built from ops Mosaic lowers
(mul/add/select/div/sqrt), letting the fused frame kernel sample the
environment in-kernel.

Accuracy (validated in tests/test_trig.py): max abs error ~1e-7 rad
vs numpy over the full circle — at a 2048-texel equirect width that is
~3e-5 texel of u, far below the bilinear filter's reconstruction
error.  The GL reference's own atan/acos are hardware polynomial
approximations of comparable error.
"""

from __future__ import annotations

import jax.numpy as jnp

# the reference's slightly-off pi, kept verbatim for coordinate parity
# with ops/envmap.py (fs:116)
PI_REF = 3.14159265259

_PI = 3.1415927410125732  # f32 nearest pi (reductions use true pi)
_PI_2 = _PI / 2.0
_PI_4 = _PI / 4.0
_TAN_PI_8 = 0.4142135623730951


def atan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Four-quadrant arctangent, elementwise, f32, Mosaic-lowerable.

    Octant reduction (swap + tan(pi/8) fold) brings the argument into
    [0, 0.4142]; the degree-9 odd minimax polynomial there is accurate
    to ~1 ulp f32 (Cephes atanf coefficients)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    num = jnp.minimum(ax, ay)
    den = jnp.maximum(jnp.maximum(ax, ay), 1e-30)
    t = num / den
    big = t > _TAN_PI_8
    t = jnp.where(big, (t - 1.0) / (t + 1.0), t)
    z = t * t
    p = (
        (8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1
    ) * z - 3.33329491539e-1
    r = p * z * t + t
    r = r + jnp.where(big, _PI_4, 0.0)
    r = jnp.where(swap, _PI_2 - r, r)
    r = jnp.where(x < 0.0, _PI - r, r)
    return jnp.where(y < 0.0, -r, r)


def acos(w: jnp.ndarray) -> jnp.ndarray:
    """Arccosine on [-1, 1] via acos(w) = atan2(sqrt(1 - w^2), w)."""
    w = jnp.clip(w, -1.0, 1.0)
    s = jnp.sqrt(jnp.maximum(1.0 - w * w, 0.0))
    return atan2(s, w)


def env_coords_kernel(dx, dy, dz):
    """In-kernel get_environment_map_coords (fs:121-125): identical
    formulas to ops/envmap.env_coords with the polynomial atan2/acos
    (including the reference's PI quirk in the normalization)."""
    u = 1.0 + atan2(-dz, dx) / (2.0 * PI_REF)
    v = 1.0 - acos(dy) / PI_REF
    return u, v
