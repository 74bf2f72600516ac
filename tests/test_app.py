"""App layer: materials table, trackball camera math, interaction state
machine, screenshot, CLI (reference ray.cpp:35-173, 719-943)."""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

from shader_ray_tpu.app import camera as cam
from shader_ray_tpu.app.driver import App, MotionTarget
from shader_ray_tpu.app.materials import DIFFUSE_COLORS, MATERIALS, resolve_material
from shader_ray_tpu.models.fixtures import procedural_sky, uv_sphere
from shader_ray_tpu.models.triangle_set import TriangleSet
from shader_ray_tpu.models.world import get_shader_data, make_world
from shader_ray_tpu.ops.scene import upload_scene
from shader_ray_tpu.utils import mat4
from shader_ray_tpu.utils.ppm import read_ppm


# --- materials (C17) -----------------------------------------------------


def test_materials_table():
    assert len(MATERIALS) == 7
    assert MATERIALS[0].specular_color == (1.0, 0.71, 0.29)  # gold
    assert MATERIALS[0].metal
    assert not MATERIALS[5].metal  # plastic/glass low
    assert len(DIFFUSE_COLORS) == 4


def test_metal_override_blacks_diffuse():
    spec, diff = resolve_material(0, 2)  # gold + green
    np.testing.assert_allclose(spec, [1.0, 0.71, 0.29])
    np.testing.assert_array_equal(diff, np.zeros(3))


def test_dielectric_takes_diffuse():
    spec, diff = resolve_material(5, 1)  # plastic + reddish
    np.testing.assert_allclose(spec, [0.03, 0.03, 0.03])
    np.testing.assert_allclose(diff, [1.0, 0.5, 0.5])


# --- trackball / camera (C16) -------------------------------------------


def test_drag_to_rotation():
    r = cam.drag_to_rotation(0.1, 0.0)
    assert r[0] == pytest.approx(np.pi * 0.1)
    np.testing.assert_allclose(r[1:], [0.0, 1.0, 0.0], atol=1e-7)
    r = cam.drag_to_rotation(0.0, 0.2)
    assert r[0] == pytest.approx(np.pi * 0.2)
    np.testing.assert_allclose(r[1:], [1.0, 0.0, 0.0], atol=1e-7)


def test_trackball_motion_composes():
    r0 = np.array([0.0, 0.0, 1.0, 0.0], np.float32)
    r1 = cam.trackball_motion(r0, 0.1, 0.0)
    # two quarter drags about the same axis add angles
    r2 = cam.trackball_motion(r1, 0.1, 0.0)
    assert r2[0] == pytest.approx(2 * r1[0], rel=1e-5)
    # zero drag is identity
    assert cam.trackball_motion(r1, 0.0, 0.0) is r1


def test_camera_matrix_translation_only():
    m, n = cam.create_camera_matrix(np.array([0.0, 0.0, 5.0]))
    np.testing.assert_allclose(
        mat4.transform_point(m, np.zeros(3)), [0.0, 0.0, 5.0], atol=1e-6
    )
    # normal matrix of a pure translation is the identity rotation
    np.testing.assert_allclose(n[:3, :3], np.eye(3), atol=1e-6)


def test_object_matrix_roundtrip():
    rot = np.array([0.7, 0.0, 1.0, 0.0], np.float32)
    center = np.array([1.0, 2.0, 3.0], np.float32)
    pos = np.array([0.1, -0.2, 0.3], np.float32)
    m, inv, nrm, nrm_inv = cam.create_object_matrix(center, rot, pos)
    np.testing.assert_allclose(mat4.mult(m, inv) @ np.eye(4), np.eye(4), atol=1e-5)
    # normal matrices are mutual inverses in the rotation block
    np.testing.assert_allclose(
        nrm[:3, :3] @ nrm_inv[:3, :3], np.eye(3), atol=1e-5
    )


def test_update_light_default():
    # identity rotation leaves light at +z
    ld = cam.update_light(np.array([0.0, 0.0, 1.0, 0.0], np.float32))
    np.testing.assert_allclose(ld, [0.0, 0.0, 1.0], atol=1e-6)
    # the reference's initial -20deg about normalize(+X,-Y) tilts it
    ld = cam.update_light(cam.initial_light_rotation())
    # axis uses the reference's literal .707 halves, so |dir| is only
    # approximately 1 (ray.cpp:1083-1084)
    assert np.linalg.norm(ld) == pytest.approx(1.0, abs=1e-3)
    assert ld[2] == pytest.approx(np.cos(np.deg2rad(20.0)), abs=1e-3)


def test_initial_zoom_frames_scene():
    fov = np.deg2rad(40.0)
    assert cam.initial_zoom(2.0, fov) == pytest.approx(1.0 / np.sin(fov / 2))


# --- App state machine (C19) ---------------------------------------------


@pytest.fixture(scope="module")
def app():
    pos, _ = uv_sphere(lat=6, lon=8)
    ts = TriangleSet.from_arrays(pos)
    world = make_world(ts)
    data = get_shader_data(world)
    scene = upload_scene(data, procedural_sky(32))
    return App(world, scene, width=32, height=32)


def test_key_fov(app):
    fov0 = app.fov
    app.key("[")
    assert app.fov == pytest.approx(fov0 / 1.05)
    app.key("]")
    assert app.fov == pytest.approx(fov0)
    assert app.redraw


def test_key_cycles(app):
    m0, d0 = app.which_material, app.which_diffuse_color
    app.key("m")
    app.key("d")
    assert app.which_material == (m0 + 1) % len(MATERIALS)
    assert app.which_diffuse_color == (d0 + 1) % len(DIFFUSE_COLORS)
    app.key("o")
    assert app.motion_target is MotionTarget.OBJECT
    app.key("l")
    assert app.motion_target is MotionTarget.LIGHT
    app.key("o")
    app.key("q")
    assert app.quit
    app.quit = False


def test_set_knob(app):
    """REPL `set`: live config-knob updates with type coercion; cached
    frame fns drop so the next render traces under the new knob."""
    import io

    out = io.StringIO()
    old = app.cfg.walk_pops
    assert app.set_knob("walk_pops", "2", file=out)
    assert app.cfg.walk_pops == 2
    assert app.renderer.cfg.walk_pops == 2
    assert app.redraw and not app._fn_cache
    assert app.set_knob("min_contrib", "0.004", file=out)
    assert app.cfg.min_contrib == pytest.approx(0.004)
    assert app.set_knob("cast_shadows", "off", file=out)
    assert app.cfg.cast_shadows is False
    app.set_knob("cast_shadows", "on", file=out)
    # pack-time knobs warn; unknown/garbage rejected without mutation
    assert app.set_knob("collapse", "greedy", file=out)
    assert "pack-time" in out.getvalue()
    assert not app.set_knob("no_such_knob", "1", file=out)
    assert not app.set_knob("walk_pops", "fast", file=out)
    assert app.cfg.walk_pops == 2
    # type-valid but RANGE-invalid values hit Config.validate() and
    # revert — not a Mosaic assertion deep in kernel construction
    assert not app.set_knob("walk_pops", "3", file=out)
    assert app.cfg.walk_pops == 2
    assert not app.set_knob("min_contrib", "-1", file=out)
    assert app.cfg.min_contrib == pytest.approx(0.004)
    assert not app.set_knob("ray_tile", "1000", file=out)
    assert not app.set_knob("leaf_mode", "bogus", file=out)
    assert "one of" in out.getvalue()
    # bool knobs reject garbage instead of parsing it as False
    assert not app.set_knob("cast_shadows", "maybe", file=out)
    assert app.cfg.cast_shadows is True
    # validate() may normalize: leaf_scan 'auto' stores as ''
    assert app.set_knob("leaf_scan", "auto", file=out)
    assert app.cfg.leaf_scan == ""
    app.cfg.walk_pops = old
    app.renderer.cfg.walk_pops = old
    app.cfg.min_contrib = 0.0
    app.cfg.collapse = "sah"


def test_render_damage_driven(app):
    app.redraw = True
    f1 = app.render()
    assert f1 is not None and f1.shape == (32, 32, 3)
    assert app.render() is None  # no state change -> no recompute
    app.drag(4.0, 0.0)
    assert app.redraw
    f2 = app.render()
    assert f2 is not None
    assert not np.array_equal(f1, f2)  # rotation changed the image


def test_zoom_gesture(app):
    z0 = app.zoom
    app.drag(0.0, 10.0, shift=True)
    assert app.zoom < z0  # -dy in exponent: positive dy zooms... out?
    # reference: zoom *= exp(ln5/h/2 * -dy); dy=+10 -> shrink
    assert app.zoom == pytest.approx(
        z0 * np.exp(np.log(5.0) / 32 / 2 * -10.0), rel=1e-5
    )


def test_screenshot_roundtrip(app, tmp_path):
    path = str(tmp_path / "color.ppm")
    app.redraw = True
    app.render()
    app.screenshot(path)
    img = read_ppm(path)
    assert img.shape == (32, 32, 3)
    # PPM quantizes to u8; frames are tonemapped into [0,1]
    np.testing.assert_allclose(
        img.astype(np.float32) / 255.0,
        np.clip(app._frame, 0, 1),
        atol=1.0 / 255.0 + 1e-6,
    )


def test_benchmark_histogram_format(app):
    buf = io.StringIO()
    durations = app.benchmark(frame_count=5, file=buf)
    out = buf.getvalue()
    assert len(durations) == 5
    assert out.startswith("5 frames:")
    assert out.count(" ms, ") >= 10  # 10 buckets
    assert "Mrays/s" in out


# --- CLI (C23) -------------------------------------------------------------


def test_cli_once(tmp_path):
    from shader_ray_tpu.models.trisrc import write_trisrc
    from shader_ray_tpu.models.fixtures import single_triangle

    model = str(tmp_path / "tri.trisrc")
    write_trisrc(model, single_triangle())
    out = str(tmp_path / "frame.ppm")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SRT_CACHE_DIR"] = str(tmp_path / "cache")
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "shader_ray_tpu",
            model,
            "0.2, 0.3, 0.4",
            "--width",
            "16",
            "--height",
            "16",
            "--once",
            "--out",
            out,
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    img = read_ppm(out)
    assert img.shape == (16, 16, 3)


def test_walk_stats_command(tmp_path, capsys):
    """The `stats` observability path: per-phase walk counters print
    through the App on the fused packet engine."""
    import io

    import numpy as np

    from shader_ray_tpu.app.driver import App
    from shader_ray_tpu.config import Config
    from shader_ray_tpu.models.fixtures import procedural_sky, uv_sphere
    from shader_ray_tpu.models.triangle_set import TriangleSet
    from shader_ray_tpu.models.world import make_world

    from shader_ray_tpu.engine import Renderer
    from shader_ray_tpu.models.world import get_shader_data

    cfg = Config()
    cfg.engine = "packet"
    pos, _ = uv_sphere(lat=6, lon=8)
    world = make_world(TriangleSet.from_arrays(pos))
    renderer = Renderer(
        get_shader_data(world), procedural_sky(32), config=cfg,
        engine="packet",
    )
    app = App(world, renderer, width=32, height=32, config=cfg)
    buf = io.StringIO()
    s = app.walk_stats(file=buf)
    out = buf.getvalue()
    assert s is not None and np.asarray(s)[:, 0].sum() > 0
    assert "bounce0" in out and "shadow0" in out
