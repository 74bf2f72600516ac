"""mat4 toolkit tests (reference vectormath.h:252-600 semantics)."""

import numpy as np
import pytest

from shader_ray_tpu.utils import mat4


def test_translation_transforms_point():
    m = mat4.make_translation(1.0, 2.0, 3.0)
    p = mat4.transform_point(m, np.array([1.0, 1.0, 1.0]))
    np.testing.assert_allclose(p, [2.0, 3.0, 4.0])
    # direction is unaffected (w=0)
    v = mat4.transform_vector(m, np.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(v, [1.0, 0.0, 0.0])


def test_rotation_z_90():
    m = mat4.make_rotation(np.pi / 2, 0.0, 0.0, 1.0)
    p = mat4.transform_point(m, np.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(p, [0.0, 1.0, 0.0], atol=1e-6)


def test_mult_is_reverse_compose():
    """mult(A, B) applies A first then B (reference mat4_mult)."""
    t = mat4.make_translation(1.0, 0.0, 0.0)
    r = mat4.make_rotation(np.pi / 2, 0.0, 0.0, 1.0)
    # rotate first, then translate
    m = mat4.mult(r, t)
    p = mat4.transform_point(m, np.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(p, [1.0, 1.0, 0.0], atol=1e-6)


def test_invert_roundtrip(rng):
    m = mat4.mult(
        mat4.make_rotation(0.7, 0.0, 1.0, 0.0), mat4.make_translation(3.0, -2.0, 5.0)
    )
    inv = mat4.invert(m)
    np.testing.assert_allclose(mat4.mult(m, inv), np.eye(4), atol=1e-5)


def test_invert_singular_raises():
    s = mat4.make_scale(0.0, 1.0, 1.0)
    with pytest.raises(np.linalg.LinAlgError):
        mat4.invert(s)


def test_get_rotation_roundtrip():
    axis = np.array([1.0, 2.0, -0.5])
    axis /= np.linalg.norm(axis)
    angle = 1.1
    m = mat4.make_rotation(angle, *axis)
    r = mat4.get_rotation(m)
    np.testing.assert_allclose(r[0], angle, atol=1e-5)
    np.testing.assert_allclose(r[1:], axis, atol=1e-5)


def test_rotation_mult_rotation_composes():
    """Composition semantics match reference vectormath.h:588-600:
    result matrix = M(rot1) @ M(rot2)."""
    r1 = np.array([0.5, 0.0, 0.0, 1.0])  # 0.5 rad about z
    r2 = np.array([0.3, 0.0, 0.0, 1.0])  # 0.3 rad about z
    r = mat4.rotation_mult_rotation(r1, r2)
    np.testing.assert_allclose(r[0], 0.8, atol=1e-5)
    m = mat4.make_rotation(r[0], r[1], r[2], r[3])
    expected = mat4.make_rotation(0.5, 0, 0, 1) @ mat4.make_rotation(0.3, 0, 0, 1)
    np.testing.assert_allclose(m, expected, atol=1e-5)


def test_zero_bottom_row():
    m = np.arange(16, dtype=np.float32).reshape(4, 4)
    z = mat4.zero_bottom_row(m)
    assert z[3, 0] == 0 and z[3, 1] == 0 and z[3, 2] == 0 and z[3, 3] == m[3, 3]
