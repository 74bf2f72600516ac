"""Brute-force numpy reference tracer (test oracle).

An independent CPU implementation of the same render model — no BVH,
every ray tests every triangle — used by the test suite to validate
the device engine on small scenes (SURVEY.md section 4: "kernel tests
compare the traversal against a vectorized-numpy reference tracer").
Shares no code with ops.render/ops.traversal beyond constants.
"""

from __future__ import annotations

import numpy as np

INFINITELY_FAR = 1.0e7
PI = 3.14159265259
TAU = 2.0 * PI


def intersect_brute(tri_pos: np.ndarray, P: np.ndarray, D: np.ndarray, eps=1e-7):
    """All-pairs Moller-Trumbore: tri_pos (T,3,3), P/D (R,3).
    Returns (t, which, u, v) closest per ray."""
    T = tri_pos.shape[0]
    R = P.shape[0]
    v0 = tri_pos[:, 0][None]  # (1,T,3)
    v1 = tri_pos[:, 1][None]
    v2 = tri_pos[:, 2][None]
    e0 = v1 - v0
    e1 = v0 - v2
    Dx = D[:, None]  # (R,1,3)
    M = np.cross(e1, Dx)
    det = (e0 * M).sum(-1)  # (R,T)
    ok = np.abs(det) >= eps
    inv_det = np.where(ok, 1.0 / np.where(det == 0, 1.0, det), 0.0)
    Tv = P[:, None] - v0
    Q = np.cross(Tv, np.broadcast_to(e0, (R, T, 3)))
    d = -(e1 * Q).sum(-1) * inv_det
    ok &= (d >= 0.0) & (d <= 1e8)
    u = (Tv * M).sum(-1) * inv_det
    ok &= (u >= 0.0) & (u <= 1.0)
    v = (Dx * Q).sum(-1) * inv_det
    ok &= (v >= 0.0) & (u + v <= 1.0)
    d = np.where(ok, d, np.inf)
    which = np.argmin(d, axis=1)
    t = d[np.arange(R), which]
    uu = u[np.arange(R), which]
    vv = v[np.arange(R), which]
    miss = ~np.isfinite(t)
    t = np.where(miss, INFINITELY_FAR, t)
    which = np.where(miss, -1, which)
    return t, which.astype(np.int64), uu, vv


def sample_env_bilinear(img: np.ndarray, D: np.ndarray) -> np.ndarray:
    """Level-0 bilinear lat-long sample, REPEAT wrap, row 0 = top."""
    h, w = img.shape[:2]
    u = 1.0 + np.arctan2(-D[:, 2], D[:, 0]) / TAU
    v = 1.0 - np.arccos(np.clip(D[:, 1], -1, 1)) / PI
    x = u * w - 0.5
    y = (1.0 - v) * h - 0.5
    x0 = np.floor(x)
    y0 = np.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    def fetch(xi, yi):
        return img[np.mod(yi.astype(int), h), np.mod(xi.astype(int), w)]

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    return (c00 * (1 - fx) + c10 * fx) * (1 - fy) + (c01 * (1 - fx) + c11 * fx) * fy


def filmic(c: np.ndarray) -> np.ndarray:
    x = np.maximum(0.0, c - 0.004)
    return (x * (6.2 * x + 0.5)) / (x * (6.2 * x + 1.7) + 0.06)


def render_reference(
    tri_pos: np.ndarray,
    tri_norm: np.ndarray,
    env_img: np.ndarray,
    width: int,
    height: int,
    fov: float = np.deg2rad(40.0),
    camera_matrix: np.ndarray | None = None,
    object_matrix: np.ndarray | None = None,
    object_normal_matrix: np.ndarray | None = None,
    object_normal_inverse: np.ndarray | None = None,
    light_dir=(0.0, 0.0, 1.0),
    specular_color=(1.0, 0.71, 0.29),
    diffuse_color=(0.0, 0.0, 0.0),
    bounce_count: int = 3,
    cast_shadows: bool = True,
    tonemap: bool = True,
    surface_fudge: float = 1e-4,
) -> np.ndarray:
    """Full-pipeline reference render -> (H, W, 3)."""
    eye = np.eye(4, dtype=np.float64)
    cm = eye if camera_matrix is None else np.asarray(camera_matrix, np.float64)
    om = eye if object_matrix is None else np.asarray(object_matrix, np.float64)
    onm = eye if object_normal_matrix is None else np.asarray(object_normal_matrix, np.float64)
    oni = eye if object_normal_inverse is None else np.asarray(object_normal_inverse, np.float64)
    light = np.asarray(light_dir, np.float64)
    spec_c = np.asarray(specular_color, np.float64)
    diff_c = np.asarray(diffuse_color, np.float64)

    ipw = 2.0 * np.tan(fov / 2.0)
    aspect = height / width
    jj, ii = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    u = (ii + 0.5) / width
    v = 1.0 - (jj + 0.5) / height
    d = np.stack(
        [ipw * (u - 0.5), ipw * (v - 0.5) * aspect, -np.ones_like(u)], axis=-1
    )
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    D = (d.reshape(-1, 3) @ cm[:3, :3].T)
    D /= np.linalg.norm(D, axis=-1, keepdims=True)
    P = np.broadcast_to(cm[:3, 3], D.shape).copy()
    R = D.shape[0]

    accumulated = np.zeros((R, 3))
    modulation = np.ones((R, 3))
    alive = np.ones(R, bool)

    tn = np.asarray(tri_norm, np.float64)
    for _ in range(bounce_count):
        objP = P @ om[:3, :3].T + om[:3, 3]
        objD = D @ onm[:3, :3].T
        t, which, uu, vv = intersect_brute(tri_pos, objP, objD)
        hit_ok = alive & (t < INFINITELY_FAR)
        w = np.maximum(which, 0)
        n_obj = (
            tn[w, 0] * (1 - uu - vv)[:, None]
            + tn[w, 1] * uu[:, None]
            + tn[w, 2] * vv[:, None]
        )
        world_n = n_obj @ oni[:3, :3].T
        flip = (world_n * D).sum(-1) > 0
        world_n[flip] *= -1

        newP = P + D * t[:, None] + world_n * surface_fudge
        refl_D = D - 2 * (D * world_n).sum(-1)[:, None] * world_n
        spec = spec_c + (1 - spec_c) * (
            ((D * refl_D).sum(-1) * 0.5 + 0.5)[:, None] ** 5
        )

        if (diff_c > 0).all():
            lcos = np.maximum(0.0, (world_n * light).sum(-1))
            if cast_shadows:
                st, _, _, _ = intersect_brute(
                    tri_pos,
                    newP @ om[:3, :3].T + om[:3, 3],
                    np.broadcast_to(light, (R, 3)) @ onm[:3, :3].T,
                )
                lit = st >= INFINITELY_FAR
            else:
                lit = np.ones(R, bool)
            accumulated[hit_ok] += (
                modulation[hit_ok] * diff_c * (lcos * lit)[hit_ok, None]
            )

        modulation[hit_ok] *= spec[hit_ok]
        P = np.where(hit_ok[:, None], newP, P)
        D = np.where(hit_ok[:, None], refl_D, D)
        alive = hit_ok

    env = sample_env_bilinear(env_img, D)
    color = accumulated + modulation * env
    if tonemap:
        color = filmic(color)
    return color.reshape(height, width, 3).astype(np.float32)
