"""Shard-count invariance: the frame must be bit-identical whether
rendered on 1 device or sharded over 2/4/8 (SURVEY.md section 4 test
strategy — CPU virtual devices stand in for the TPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shader_ray_tpu.models.fixtures import procedural_sky, uv_sphere
from shader_ray_tpu.models.triangle_set import TriangleSet
from shader_ray_tpu.models.world import get_shader_data, make_world
from shader_ray_tpu.ops.render import (
    RenderStatics,
    default_frame_params,
    make_render_fn,
)
from shader_ray_tpu.ops.scene import upload_scene
from shader_ray_tpu.parallel import make_mesh, make_sharded_render_fn, replicate_scene
from shader_ray_tpu.utils import mat4


@pytest.fixture(scope="module")
def sphere_scene():
    pos, _ = uv_sphere(lat=8, lon=12)
    ts = TriangleSet.from_arrays(pos)
    world = make_world(ts)
    data = get_shader_data(world)
    return upload_scene(data, procedural_sky(64))


@pytest.fixture(scope="module")
def frame_setup():
    statics = RenderStatics(width=48, height=40, tile_size=256)
    params = default_frame_params()
    cam = mat4.make_translation(0.0, 0.0, 3.0).astype(np.float32)
    params = params._replace(camera_matrix=jnp.asarray(cam))
    return statics, params


def test_mesh_devices_available():
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual devices"


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_shard_count_invariance(sphere_scene, frame_setup, n_dev):
    statics, params = frame_setup
    baseline = np.asarray(make_render_fn(sphere_scene, statics)(params))

    mesh = make_mesh(n_dev)
    scene_r = replicate_scene(sphere_scene, mesh)
    fn = make_sharded_render_fn(scene_r, statics, mesh)
    img = np.asarray(fn(params))
    np.testing.assert_array_equal(img, baseline)


def test_nondivisible_ray_count(sphere_scene):
    """40*37 rays do not divide 8 ways — padding path must still match."""
    statics = RenderStatics(width=37, height=40, tile_size=128)
    params = default_frame_params()
    cam = mat4.make_translation(0.0, 0.0, 3.0).astype(np.float32)
    params = params._replace(camera_matrix=jnp.asarray(cam))
    baseline = np.asarray(make_render_fn(sphere_scene, statics)(params))
    mesh = make_mesh(8)
    fn = make_sharded_render_fn(replicate_scene(sphere_scene, mesh), statics, mesh)
    np.testing.assert_array_equal(np.asarray(fn(params)), baseline)


@pytest.mark.parametrize("n_dev", [1, 2, 4])
@pytest.mark.heavy
def test_packet_shard_count_invariance(n_dev):
    """The PRODUCTION (wide packet) engine must render the same frame
    on 1 device and sharded over N (VERDICT r1 next #3)."""
    from shader_ray_tpu.ops.engine_pallas import make_packet_render_fn
    from shader_ray_tpu.ops.pallas.pack_wide import pack_scene_wide

    pos, _ = uv_sphere(lat=8, lon=12)
    data = get_shader_data(make_world(TriangleSet.from_arrays(pos)))
    packed = pack_scene_wide(data, procedural_sky(64))
    statics = RenderStatics(width=32, height=32, tile_size=256)
    params = default_frame_params()._replace(
        camera_matrix=jnp.asarray(
            mat4.make_translation(0.0, 0.0, 3.0).astype(np.float32)
        )
    )
    base_fn = make_packet_render_fn(packed, statics, tile=1024, interpret=True)
    baseline = np.asarray(base_fn(params))

    mesh = make_mesh(n_dev)
    fn = make_packet_render_fn(
        packed, statics, tile=1024, interpret=True, mesh=mesh
    )
    # tolerance, not bit-equality: the single-device frame runs the
    # fully-fused kernel (in-kernel raygen + env, round 12) while the
    # sharded path keeps XLA raygen + the standalone env call (shard
    # slicing needs pixel order) — same math, different f32 op order
    np.testing.assert_allclose(
        np.asarray(fn(params)), baseline, atol=2e-6
    )


@pytest.mark.parametrize("n_dev", [2, 8])
@pytest.mark.heavy
def test_sample_sharded_progressive_matches_single(n_dev):
    """Progressive batches shard the SAMPLE axis over the mesh (each
    device renders K/n full frames on the fast laned path; one pmean
    of the linear accumulation) — must match the single-device
    progressive batch."""
    from shader_ray_tpu.config import Config
    from shader_ray_tpu.engine import Renderer

    pos, _ = uv_sphere(lat=8, lon=12)
    data = get_shader_data(make_world(TriangleSet.from_arrays(pos)))
    env = procedural_sky(64)
    statics = RenderStatics(width=128, height=32, tile_size=1024)
    params = default_frame_params()._replace(
        camera_matrix=jnp.asarray(
            mat4.make_translation(0.0, 0.0, 3.0).astype(np.float32)
        )
    )
    cfg = Config()
    cfg.prog_tile = 1024
    single = Renderer(data, env, config=cfg, engine="packet")
    base = np.asarray(single.make_progressive_fn(statics, 8)(params))

    mesh = make_mesh(n_dev)
    sharded = Renderer(data, env, config=cfg, engine="packet", mesh=mesh)
    got = np.asarray(sharded.make_progressive_fn(statics, 8)(params))
    assert got.shape == base.shape == (32, 128, 3)
    # per-device partial means + pmean re-associate the f32 sum
    np.testing.assert_allclose(got, base, atol=2e-6)

    # checksum (reduce_sum) variant used by the benchmark fence
    s = float(np.asarray(
        sharded.make_progressive_fn(statics, 8, reduce_sum=True)(params)
    ))
    assert np.isfinite(s) and abs(s - float(base.sum())) < 1e-2


@pytest.mark.heavy
def test_sample_sharded_weak_scaling_device_invariance():
    """VERDICT r2 #6: the sample-parallel progressive path must produce
    the same frame for K samples whatever the device count (1 vs 2 vs
    8), and the K % n_devices != 0 boundary must fall back to the
    ray-sharded path and still match.  Device-count invariance is the
    weak-scaling correctness contract: per-chip work is K/n frames,
    output is identical."""
    from shader_ray_tpu.config import Config
    from shader_ray_tpu.engine import Renderer

    pos, _ = uv_sphere(lat=8, lon=12)
    data = get_shader_data(make_world(TriangleSet.from_arrays(pos)))
    env = procedural_sky(64)
    statics = RenderStatics(width=64, height=16, tile_size=1024)
    params = default_frame_params()._replace(
        camera_matrix=jnp.asarray(
            mat4.make_translation(0.0, 0.0, 3.0).astype(np.float32)
        )
    )
    cfg = Config()
    cfg.prog_tile = 1024
    K = 8
    frames = {}
    for n_dev in (1, 2, 8):
        mesh = make_mesh(n_dev)
        r = Renderer(data, env, config=cfg, engine="packet", mesh=mesh)
        frames[n_dev] = np.asarray(r.make_progressive_fn(statics, K)(params))
        assert np.isfinite(frames[n_dev]).all()
    # 1-device sample sharding IS the single-chip path (pmean over a
    # singleton axis) — exact; wider meshes re-associate the f32 mean
    np.testing.assert_allclose(frames[2], frames[1], atol=2e-6)
    np.testing.assert_allclose(frames[8], frames[1], atol=2e-6)
    np.testing.assert_allclose(frames[8], frames[2], atol=2e-6)

    # K % n_devices != 0 (6 samples on 8 devices): the sample axis
    # cannot shard; the Renderer must fall back to the ray-sharded
    # batch and still match the single-device 6-sample frame
    mesh = make_mesh(8)
    single6 = np.asarray(
        Renderer(data, env, config=cfg, engine="packet")
        .make_progressive_fn(statics, 6)(params)
    )
    fallback6 = np.asarray(
        Renderer(data, env, config=cfg, engine="packet", mesh=mesh)
        .make_progressive_fn(statics, 6)(params)
    )
    assert fallback6.shape == single6.shape == (16, 64, 3)
    np.testing.assert_allclose(fallback6, single6, atol=2e-6)
