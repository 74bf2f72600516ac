"""Progressive accumulation: jittered multi-sample frames converge
toward the 5x5 supersample oracle (mode 5, the reference's own
ground-truth mode, fs:654-673)."""

import numpy as np
import pytest

from shader_ray_tpu.app.driver import App
from shader_ray_tpu.models.fixtures import procedural_sky, uv_sphere
from shader_ray_tpu.models.triangle_set import TriangleSet
from shader_ray_tpu.models.world import get_shader_data, make_world
from shader_ray_tpu.ops.scene import upload_scene


@pytest.fixture(scope="module")
def app():
    pos, _ = uv_sphere(lat=6, lon=8)
    ts = TriangleSet.from_arrays(pos)
    world = make_world(ts)
    data = get_shader_data(world)
    scene = upload_scene(data, procedural_sky(32))
    return App(world, scene, width=24, height=24)


def test_progressive_runs_and_differs_from_1spp(app):
    one = app.draw_frame().copy()
    prog = app.render_progressive(samples=4)
    assert prog.shape == one.shape
    assert np.isfinite(prog).all()
    # jittered average must smooth edges: not identical to 1 spp
    assert not np.array_equal(prog, one)
    # but close to it overall (same scene)
    assert np.abs(prog - one).mean() < 0.1


def test_progressive_reduces_edge_variance(app):
    """More samples -> closer to a higher-sample render (convergence)."""
    p2 = app.render_progressive(samples=2)
    p8 = app.render_progressive(samples=8)
    p16 = app.render_progressive(samples=16)
    d_28 = np.abs(p2 - p16).mean()
    d_816 = np.abs(p8 - p16).mean()
    assert d_816 <= d_28 + 1e-6
