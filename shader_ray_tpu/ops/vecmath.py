"""Small vector helpers over (..., 3) jnp arrays (device side).

GLSL-style conventions used by the render kernels; the batched analog
of reference vectormath.h's vec3 ops.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) dot -> (...,)"""
    return (a * b).sum(axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def normalize(v: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    n = jnp.sqrt((v * v).sum(axis=-1, keepdims=True))
    if eps:
        n = jnp.maximum(n, eps)
    return v / n


def reflect(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """GLSL reflect: d - 2*dot(d,n)*n."""
    return d - 2.0 * dot(d, n)[..., None] * n


def transform_point(m: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """(4,4) matrix times (..., 3) points with w=1 (GLSL m * vec4(p,1)).

    Precision.HIGHEST: XLA's TPU default feeds matmuls to the MXU with
    bf16 inputs, which put ~4.5e-4 rad (~0.66 px at the bench FOV) of
    warp on every XLA-path ray direction — measured on-chip vs f64
    host math (round 13).  Geometry transforms are tiny (..,3)x(3,3)
    contractions, so full-f32 costs nothing and restores exact parity
    with the in-kernel raygen (2.2e-5 rad)."""
    return (
        jnp.matmul(p, m[:3, :3].T, precision=lax.Precision.HIGHEST)
        + m[:3, 3]
    )


def transform_dir(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(4,4) matrix times (..., 3) directions with w=0 (full f32 —
    see transform_point)."""
    return jnp.matmul(v, m[:3, :3].T, precision=lax.Precision.HIGHEST)
