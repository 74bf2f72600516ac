"""Scene-data structural sanitizer (SURVEY 5.2) + ANSI preview."""

import dataclasses

import numpy as np
import pytest

from shader_ray_tpu.models.fixtures import uv_sphere
from shader_ray_tpu.models.triangle_set import TriangleSet
from shader_ray_tpu.models.validate import (
    SceneValidationError,
    validate_scene_data,
)
from shader_ray_tpu.models.world import get_shader_data, make_world


@pytest.fixture(scope="module")
def sphere_data():
    pos, _ = uv_sphere(lat=8, lon=12)
    return get_shader_data(make_world(TriangleSet.from_arrays(pos)))


def test_valid_scene_passes(sphere_data):
    validate_scene_data(sphere_data)


def _corrupt(data, **changes):
    return dataclasses.replace(data, **changes)


def test_catches_bad_hitmiss_link(sphere_data):
    hm = sphere_data.hitmiss.copy()
    hm[3, 1, 0] = sphere_data.group_count + 7
    with pytest.raises(SceneValidationError, match="hitmiss"):
        validate_scene_data(_corrupt(sphere_data, hitmiss=hm))


def test_catches_leaf_range_overrun(sphere_data):
    obj = sphere_data.node_objects.copy()
    leaf = np.nonzero(obj[:, 1] > 0)[0][0]
    obj[leaf, 0] = sphere_data.triangle_count - 1
    with pytest.raises(SceneValidationError):
        validate_scene_data(_corrupt(sphere_data, node_objects=obj))


def test_catches_inverted_box(sphere_data):
    boxes = sphere_data.node_boxes.copy()
    boxes[0, 0] = boxes[0, 3] + 1.0
    with pytest.raises(SceneValidationError, match="box"):
        validate_scene_data(_corrupt(sphere_data, node_boxes=boxes))


def test_catches_orphan_node(sphere_data):
    ch = sphere_data.node_children.copy()
    internal = np.nonzero(sphere_data.node_objects[:, 1] == 0)[0]
    victim = internal[internal != sphere_data.tree_root][0]
    ch[victim, 0] = ch[victim, 1]  # duplicate child -> some node orphaned
    with pytest.raises(SceneValidationError):
        validate_scene_data(_corrupt(sphere_data, node_children=ch))


def test_ansi_preview_roundtrip():
    from shader_ray_tpu.utils.ansi import frame_to_ansi

    img = np.zeros((8, 6, 3), np.float32)
    img[0, 0] = [1.0, 0.0, 0.0]
    s = frame_to_ansi(img)
    assert s.count("\n") == 3  # 8 pixel rows -> 4 text rows
    assert "38;2;255;0;0" in s  # red top-left foreground
    assert s.endswith("\x1b[0m")
