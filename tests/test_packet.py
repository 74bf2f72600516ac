"""Packet engine (Pallas, interpret mode on CPU) vs the per-lane
wavefront engine — traversal parity, env MXU parity, full-pipeline
image parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shader_ray_tpu.models.fixtures import procedural_sky, uv_sphere
from shader_ray_tpu.models.triangle_set import TriangleSet
from shader_ray_tpu.models.world import get_shader_data, make_world
from shader_ray_tpu.ops.engine_pallas import render_frame_packet
from shader_ray_tpu.ops.envmap import env_coords
from shader_ray_tpu.ops.pallas.envmxu import sample_env_mxu
from shader_ray_tpu.ops.pallas.pack import pack_scene
from shader_ray_tpu.ops.pallas.packet import packet_trace
from shader_ray_tpu.ops.render import (
    RenderStatics,
    default_frame_params,
    render_frame,
)
from shader_ray_tpu.ops.scene import upload_scene
from shader_ray_tpu.ops.traversal import traverse
from shader_ray_tpu.utils import mat4

# binary-engine interpreter A/B: heavy tier (skipped at nproc=1;
# the production wide engine keeps default-lane coverage)
pytestmark = pytest.mark.heavy


@pytest.fixture(scope="module")
def sphere():
    pos, _ = uv_sphere(lat=8, lon=12)
    ts = TriangleSet.from_arrays(pos)
    world = make_world(ts)
    data = get_shader_data(world)
    return data


def _random_rays(rng, R):
    P = (rng.normal(size=(R, 3)) * 0.1 + [0, 0, 3]).astype(np.float32)
    D = rng.normal(size=(R, 3)).astype(np.float32)
    D[: R // 2] = ([0, 0, -1.0] + 0.3 * rng.normal(size=(R // 2, 3))).astype(
        np.float32
    )
    return P, D


def test_packet_matches_perlane_traversal(sphere, rng):
    data = sphere
    scene = upload_scene(data, procedural_sky(64))
    packed = pack_scene(data, procedural_sky(64))
    P, D = _random_rays(rng, 512)

    ref = traverse(scene, jnp.asarray(P), jnp.asarray(D))
    got = packet_trace(packed, jnp.asarray(P), jnp.asarray(D), tile=256, interpret=True)

    np.testing.assert_allclose(got.t, ref.t, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(got.which, ref.which)
    # normals: interpolate reference's (u, v) and compare
    hit = (np.asarray(ref.t) < 1e7) & (np.asarray(ref.which) >= 0)
    tri_n = data.tri_normals[np.maximum(np.asarray(ref.which), 0)]
    u = np.asarray(ref.u)[:, None]
    v = np.asarray(ref.v)[:, None]
    n_ref = tri_n[:, 0:3] * (1 - u - v) + tri_n[:, 3:6] * u + tri_n[:, 6:9] * v
    # interpolation-order differences make normals shading-grade only
    np.testing.assert_allclose(
        np.asarray(got.normal)[hit], n_ref[hit], rtol=1e-2, atol=1e-2
    )


def test_packet_active_mask(sphere, rng):
    data = sphere
    packed = pack_scene(data, procedural_sky(64))
    P, D = _random_rays(rng, 256)
    active = np.zeros(256, bool)
    active[::3] = True
    got = packet_trace(
        packed, jnp.asarray(P), jnp.asarray(D),
        active=jnp.asarray(active), tile=256, interpret=True,
    )
    t = np.asarray(got.t)
    assert (t[~active] >= 1e7).all()  # masked lanes report miss


def test_env_mxu_matches_bilinear(rng):
    env = procedural_sky(256)  # (128, 256)
    D = rng.normal(size=(777, 3)).astype(np.float32)
    D /= np.linalg.norm(D, axis=-1, keepdims=True)

    got = np.asarray(sample_env_mxu(jnp.asarray(env), jnp.asarray(D), chunk=256))

    # independent numpy bilinear with wrap/clamp semantics
    H, W = env.shape[:2]
    u, v = env_coords(jnp.asarray(D))
    u = np.asarray(u); v = np.asarray(v)
    x = u * W - 0.5
    y = (1.0 - v) * H - 0.5
    x0 = np.floor(x); y0 = np.floor(y)
    fx = (x - x0)[:, None]; fy = (y - y0)[:, None]
    x0i = np.mod(x0.astype(int), W); x1i = np.mod(x0i + 1, W)
    y0i = np.clip(y0.astype(int), 0, H - 1); y1i = np.clip(y0i + 1, 0, H - 1)
    ref = (
        env[y0i, x0i] * (1 - fx) * (1 - fy)
        + env[y0i, x1i] * fx * (1 - fy)
        + env[y1i, x0i] * (1 - fx) * fy
        + env[y1i, x1i] * fx * fy
    )
    # bf16 contraction: tolerance ~1e-2 relative on HDR values
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_env_mxu_f32_exact(rng):
    env = procedural_sky(128)
    D = rng.normal(size=(333, 3)).astype(np.float32)
    a = np.asarray(sample_env_mxu(jnp.asarray(env), jnp.asarray(D), precision="f32"))
    b = np.asarray(sample_env_mxu(jnp.asarray(env), jnp.asarray(D), precision="bf16"))
    assert np.allclose(a, b, rtol=3e-2, atol=3e-2)


def test_full_pipeline_packet_vs_wavefront(sphere):
    data = sphere
    env = procedural_sky(512)  # (256, 512) = MXU default res, comparable
    scene = upload_scene(data, env)
    packed = pack_scene(data, env, env_size=(256, 512))

    statics = RenderStatics(width=40, height=32, tile_size=512)
    params = default_frame_params()._replace(
        camera_matrix=jnp.asarray(mat4.make_translation(0, 0, 3.0).astype(np.float32)),
        diffuse_color=jnp.asarray(np.array([0.8, 0.3, 0.2], np.float32)),
        specular_color=jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32)),
    )
    ref = np.asarray(render_frame(scene, params, statics))
    got = np.asarray(
        render_frame_packet(packed, params, statics, tile=256, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-2)


def test_packet_empty_scene():
    ts = TriangleSet.from_arrays(np.zeros((0, 3, 3), np.float32))
    data = get_shader_data(make_world(ts))
    packed = pack_scene(data, procedural_sky(64))
    P = np.zeros((64, 3), np.float32)
    D = np.tile(np.array([0, 0, -1.0], np.float32), (64, 1))
    got = packet_trace(packed, jnp.asarray(P), jnp.asarray(D), tile=128, interpret=True)
    assert (np.asarray(got.t) >= 1e7).all()
    assert not np.asarray(got.bad).any()
