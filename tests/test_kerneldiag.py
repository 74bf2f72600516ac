"""Kernel-failure diagnostics (C24 CheckShaderCompile analog,
ray.cpp:187-235): a failing kernel build must produce a one-screen
actionable dump naming the kernel and the config that shaped it."""

import numpy as np
import pytest

from shader_ray_tpu.models.fixtures import procedural_sky, uv_sphere
from shader_ray_tpu.models.triangle_set import TriangleSet
from shader_ray_tpu.models.world import get_shader_data, make_world
from shader_ray_tpu.utils import kerneldiag


@pytest.fixture(scope="module")
def sphere_data():
    pos, _ = uv_sphere(lat=6, lon=8)
    return get_shader_data(make_world(TriangleSet.from_arrays(pos)))


def test_describe_failure_hints():
    msg = kerneldiag.describe_failure(
        RuntimeError("Mosaic failed: requested 130MB VMEM of 128MB")
    )
    assert "kernel failure" in msg
    assert "VMEM oversubscription" in msg  # actionable hint matched
    assert "RuntimeError" in msg


def test_describe_failure_includes_config_and_scene():
    from shader_ray_tpu.config import Config

    cfg = Config()
    cfg.jitter_pack = 256
    cfg.prog_tile = 64

    class FakePacked:
        leaves = np.zeros((12, 128), np.float32)
        n_wide = 7
        node_src = "smem"

    msg = kerneldiag.describe_failure(
        ValueError("scoped memory exceeded"), cfg=cfg, packed=FakePacked(),
        label="progressive fn (K=256)",
    )
    assert "jitter_pack=256" in msg
    assert "leaves(12, 128)" in msg
    assert "n_wide=7" in msg
    assert "progressive fn (K=256)" in msg
    assert "scoped-memory overflow" in msg


def test_renderer_dumps_on_bad_knob(sphere_data, capsys):
    """A forced bad knob (non-multiple-of-1024 fused tile) produces the
    diagnostic on stderr, naming a pallas module, then re-raises."""
    from shader_ray_tpu.config import Config
    from shader_ray_tpu.engine import Renderer
    from shader_ray_tpu.ops.render import RenderStatics, default_frame_params
    from shader_ray_tpu.utils import mat4

    cfg = Config()
    cfg.engine = "packet"
    cfg.ray_tile = 1000  # violates the fused kernel's 1024-lane shape
    r = Renderer(sphere_data, procedural_sky(256), config=cfg)
    statics = RenderStatics(width=40, height=32)
    params = default_frame_params()._replace(
        camera_matrix=mat4.make_translation(0, 0, 3.0).astype(np.float32)
    )
    fn = r.make_fn(statics)
    with pytest.raises(Exception):
        fn(params)
    err = capsys.readouterr().err
    assert "kernel failure" in err
    assert "packet frame fn" in err
    assert "ray_tile=1000" in err


def test_suppress_scope(sphere_data, capsys):
    with kerneldiag.suppress():
        kerneldiag.report_failure(RuntimeError("boom"))
    assert "kernel failure" not in capsys.readouterr().err
    kerneldiag.report_failure(RuntimeError("boom"))
    assert "kernel failure" in capsys.readouterr().err


def test_compile_helper_crash_hint():
    msg = kerneldiag.describe_failure(
        RuntimeError(
            "INTERNAL: http://127.0.0.1:8103/remote_compile: HTTP 500: "
            "tpu_compile_helper subprocess exit code 1"
        )
    )
    assert "2^31" in msg  # the deep-packing buffer-wall diagnosis
