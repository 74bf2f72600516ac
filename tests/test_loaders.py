"""Loader tests: trisrc parse/write round-trip, OBJ parsing, dedup
(reference trisrc-support.cpp:43-104, obj-support.cpp:226-350,
triangle-set.h:46-102)."""

import numpy as np
import pytest

from shader_ray_tpu.config import Config, set_config, get_config
from shader_ray_tpu.models import fixtures
from shader_ray_tpu.models.obj import parse_obj_text
from shader_ray_tpu.models.triangle_set import TriangleSet
from shader_ray_tpu.models.trisrc import parse_trisrc, parse_trisrc_text, write_trisrc


@pytest.fixture(autouse=True)
def fresh_config():
    set_config(Config())
    yield
    set_config(Config())


TRISRC_ONE = '''"*" tag 1 1 1 1 10
0 0 0 0 0 1 1 1 1 1 0 0
1 0 0 0 0 1 1 1 1 1 0 0
0 1 0 0 0 1 1 1 1 1 0 0
'''


def test_trisrc_single_triangle():
    ts = parse_trisrc_text(TRISRC_ONE)
    assert ts.triangle_count == 1
    assert ts.vertex_count == 3
    np.testing.assert_allclose(ts.positions[ts.indices[0]][1], [1, 0, 0])
    # normals normalized
    np.testing.assert_allclose(np.linalg.norm(ts.normals, axis=1), 1.0, atol=1e-6)
    # colors gamma-decoded: 1^2.63 == 1
    np.testing.assert_allclose(ts.colors, 1.0)


def test_trisrc_gamma_decode():
    text = TRISRC_ONE.replace("1 1 1 1 0 0\n", "0.5 0.5 0.5 1 0 0\n")
    ts = parse_trisrc_text(text)
    np.testing.assert_allclose(ts.colors, 0.5 ** 2.63, rtol=1e-5)
    # COLORS_ARE_LINEAR skips the decode (trisrc-support.cpp:93-97)
    cfg = Config()
    cfg.colors_are_linear = True
    ts2 = parse_trisrc_text(text, cfg)
    np.testing.assert_allclose(ts2.colors, 0.5, rtol=1e-6)


def test_trisrc_geometry_scale():
    cfg = Config()
    cfg.geometry_scale = 2.0
    ts = parse_trisrc_text(TRISRC_ONE, cfg)
    np.testing.assert_allclose(ts.positions[ts.indices[0]][1], [2, 0, 0])


def test_trisrc_quoted_texture_with_spaces():
    text = TRISRC_ONE.replace('"*"', '"some texture.png"')
    ts = parse_trisrc_text(text)
    assert ts.triangle_count == 1


def test_trisrc_truncated_raises():
    with pytest.raises(ValueError):
        parse_trisrc_text('"*" tag 1 1 1 1 10\n0 0 0')


def test_trisrc_write_read_roundtrip(tmp_path):
    pos = fixtures.box()
    path = str(tmp_path / "box.trisrc")
    write_trisrc(path, pos)
    ts = parse_trisrc(path)
    assert ts.triangle_count == 12
    got = ts.positions[ts.indices]  # (T,3,3) in order
    np.testing.assert_allclose(got, pos, atol=1e-5)
    np.testing.assert_allclose(ts.colors, 1.0, atol=1e-5)


OBJ_QUAD = """
# a quad
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f 1 2 3 4
"""


def test_obj_fan_triangulation_and_computed_normals():
    ts = parse_obj_text(OBJ_QUAD)
    assert ts.triangle_count == 2  # 4-gon fans to 2 tris (obj-support.cpp:324-347)
    # area-weighted computed normals all +z here
    np.testing.assert_allclose(ts.normals, [[0, 0, 1]] * ts.vertex_count, atol=1e-6)
    # colors forced white (obj-support.cpp:344)
    np.testing.assert_allclose(ts.colors, 1.0)


def test_obj_with_explicit_normals():
    text = """
v 0 0 0
v 1 0 0
v 0 1 0
vn 0 0 -1
f 1//1 2//1 3//1
"""
    ts = parse_obj_text(text)
    assert ts.triangle_count == 1
    np.testing.assert_allclose(ts.normals, [[0, 0, -1]] * ts.vertex_count)


def test_obj_one_based_indices():
    ts = parse_obj_text(OBJ_QUAD)
    t0 = ts.positions[ts.indices[0]]
    np.testing.assert_allclose(t0[0], [0, 0, 0])
    np.testing.assert_allclose(t0[1], [1, 0, 0])


def test_dedup_shares_vertices():
    ts = parse_obj_text(OBJ_QUAD)
    # 4 unique vertices across 2 triangles (6 slots)
    assert ts.vertex_count == 4


def test_triangle_set_aabb_bump():
    ts = TriangleSet.from_arrays(fixtures.single_triangle())
    assert ts.tri_boxmin[0, 0] < -0.5
    assert ts.tri_boxmax[0, 1] > 0.5
    np.testing.assert_allclose(ts.barycenters[0], [0.0, -1 / 6, 0.0], atol=1e-6)
