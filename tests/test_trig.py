"""Polynomial atan2/acos (ops/pallas/trig.py) vs numpy: the in-kernel
env-coordinate math must match the XLA path to well under a texel."""

import numpy as np

from shader_ray_tpu.ops.pallas import trig


def test_atan2_full_circle():
    ang = np.linspace(-np.pi, np.pi, 20011, dtype=np.float64)
    x = np.cos(ang).astype(np.float32)
    y = np.sin(ang).astype(np.float32)
    got = np.asarray(trig.atan2(y, x), np.float64)
    want = np.arctan2(y.astype(np.float64), x.astype(np.float64))
    # wrap-aware difference (+-pi seam)
    d = np.abs(got - want)
    d = np.minimum(d, 2 * np.pi - d)
    assert d.max() < 5e-7, d.max()


def test_atan2_scale_invariance_and_axes():
    for scale in (1e-6, 1.0, 1e6):
        got = float(np.asarray(trig.atan2(
            np.float32(0.0), np.float32(scale))))
        assert abs(got) < 1e-6
        got = float(np.asarray(trig.atan2(
            np.float32(scale), np.float32(0.0))))
        assert abs(got - np.pi / 2) < 1e-6


def test_acos_range():
    w = np.linspace(-1.0, 1.0, 10007, dtype=np.float32)
    got = np.asarray(trig.acos(w), np.float64)
    want = np.arccos(np.clip(w.astype(np.float64), -1, 1))
    assert np.abs(got - want).max() < 1e-5  # worst near the poles


def test_env_coords_matches_xla_path():
    from shader_ray_tpu.ops.envmap import env_coords

    rng = np.random.default_rng(7)
    D = rng.normal(size=(4096, 3)).astype(np.float32)
    D /= np.linalg.norm(D, axis=1, keepdims=True)
    u1, v1 = env_coords(D)
    u2, v2 = trig.env_coords_kernel(D[:, 0], D[:, 1], D[:, 2])
    du = np.abs(np.asarray(u1) - np.asarray(u2))
    du = np.minimum(du, 1.0 - du)  # u REPEAT seam
    assert du.max() < 5e-7, du.max()
    assert np.abs(np.asarray(v1) - np.asarray(v2)).max() < 2e-6
