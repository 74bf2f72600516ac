"""Ray-differential transport and Fresnel shading helpers.

Device equivalents of the GLSL ray/differential library and the
Schlick-Fresnel material model (raytracer.es.fs:58-106, 474-482,
524-548).  A batched "ray" is a dict-free tuple of (P, D, dPdx, dDdx,
dPdy, dDdy), each (R, 3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from shader_ray_tpu.ops.vecmath import dot, reflect


class Rays(NamedTuple):
    """Batched ray with image-plane differentials (fs:58-63)."""

    P: jnp.ndarray
    D: jnp.ndarray
    dPdx: jnp.ndarray
    dDdx: jnp.ndarray
    dPdy: jnp.ndarray
    dDdy: jnp.ndarray


def ray_transfer(r: Rays, t: jnp.ndarray, normal: jnp.ndarray) -> Rays:
    """Propagate differentials across a surface transfer (fs:65-81)."""
    t1 = t[..., None]
    dn = dot(r.D, normal)[..., None]
    P = r.P + r.D * t1

    dtdx = -dot(r.dPdx + t1 * r.dDdx, normal)[..., None] / dn
    dPdx = r.dPdx + t1 * r.dDdx + dtdx * r.D
    dtdy = -dot(r.dPdy + t1 * r.dDdy, normal)[..., None] / dn
    dPdy = r.dPdy + t1 * r.dDdy + dtdy * r.D
    return Rays(P=P, D=r.D, dPdx=dPdx, dDdx=r.dDdx, dPdy=dPdy, dDdy=r.dDdy)


def ray_reflect(r: Rays, normal: jnp.ndarray, surface_fudge: float = 1e-4) -> Rays:
    """Reflect with surface-fudge origin offset (fs:83-96).

    NOTE the direction-differential update replicates the reference
    verbatim: GLSL ``dDdx - 2 * dot(dDdx, normal)`` subtracts a
    *scalar* from the vector (broadcast), not the projected reflection
    term — fs:92-93 ("differentials; do this right").  Kept as-is for
    render parity; only the which==1/2 env-grad paths consume it.
    """
    D = reflect(r.D, normal)
    P = r.P + normal * surface_fudge
    dDdx = r.dDdx - 2.0 * dot(r.dDdx, normal)[..., None]
    dDdy = r.dDdy - 2.0 * dot(r.dDdy, normal)[..., None]
    return Rays(P=P, D=D, dPdx=r.dPdx, dDdx=dDdx, dPdy=r.dPdy, dDdy=dDdy)


def f_schlick_vr(cspec: jnp.ndarray, v: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Schlick Fresnel in (view . reflected) half-angle form (fs:479-482):
    cspec + (1 - cspec) * (dot(v, r) * .5 + .5)^5."""
    f = (dot(v, r) * 0.5 + 0.5)[..., None] ** 5
    return cspec + (1.0 - cspec) * f


def filmic(c: jnp.ndarray) -> jnp.ndarray:
    """Filmic tonemap curve, per channel (fs:527-531)."""
    x = jnp.maximum(0.0, c - 0.004)
    return (x * (6.2 * x + 0.5)) / (x * (6.2 * x + 1.7) + 0.06)


def tonemap_and_gamma(color: jnp.ndarray, use_filmic: bool = True) -> jnp.ndarray:
    """fs:533-548."""
    if use_filmic:
        return filmic(color)
    tone = color / (color + 1.0)
    return jnp.power(jnp.maximum(tone, 0.0), 1.0 / 2.63)
