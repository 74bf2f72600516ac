"""Small vector helpers over (..., 3) jnp arrays (device side).

GLSL-style conventions used by the render kernels; the batched analog
of reference vectormath.h's vec3 ops.
"""

from __future__ import annotations

import jax.numpy as jnp


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
    """(4,4) matrix times (..., 3) points with w=1 (GLSL m * vec4(p,1))."""
    return p @ m[:3, :3].T + m[:3, 3]


def transform_dir(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(4,4) matrix times (..., 3) directions with w=0."""
    return v @ m[:3, :3].T
