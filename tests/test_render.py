"""End-to-end render tests vs. the brute-force numpy oracle
(SURVEY.md section 4: pixel parity on small scenes; BASELINE configs
1-2)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from shader_ray_tpu.models import fixtures  # noqa: E402
from shader_ray_tpu.models.triangle_set import TriangleSet  # noqa: E402
from shader_ray_tpu.models.world import get_shader_data, make_world  # noqa: E402
from shader_ray_tpu.ops.reference import render_reference  # noqa: E402
from shader_ray_tpu.ops.render import (  # noqa: E402
    FrameParams,
    RenderStatics,
    default_frame_params,
    make_render_fn,
    render_frame,
)
from shader_ray_tpu.ops.scene import upload_scene  # noqa: E402


def build(tri_pos, tri_norm=None, env=None):
    ts = TriangleSet.from_arrays(tri_pos, tri_norm)
    world = make_world(ts)
    data = get_shader_data(world)
    if env is None:
        env = np.full((1, 1, 3), 0.5, np.float32)
    scene = upload_scene(data, env)
    # oracle wants BVH-ordered triangles so `which` indexing matches
    ordered_pos = ts.positions[ts.indices[world.tri_order]]
    ordered_norm = ts.normals[ts.indices[world.tri_order]]
    return world, scene, ordered_pos, ordered_norm, env


def camera_at(z):
    eye = np.eye(4, dtype=np.float32)
    eye[2, 3] = z
    return eye


def params_with(camera_z=3.0, spec=(1.0, 0.71, 0.29), diff=(0.0, 0.0, 0.0),
                light=(0.0, 0.0, 1.0)):
    base = default_frame_params()
    return base._replace(
        camera_matrix=jnp.asarray(camera_at(camera_z)),
        specular_color=jnp.asarray(np.array(spec, np.float32)),
        diffuse_color=jnp.asarray(np.array(diff, np.float32)),
        light_dir=jnp.asarray(np.array(light, np.float32)),
    )


def oracle(ordered_pos, ordered_norm, env, statics, camera_z=3.0,
           spec=(1.0, 0.71, 0.29), diff=(0.0, 0.0, 0.0), light=(0.0, 0.0, 1.0)):
    return render_reference(
        ordered_pos.astype(np.float64),
        ordered_norm.astype(np.float64),
        env,
        statics.width,
        statics.height,
        camera_matrix=camera_at(camera_z),
        specular_color=spec,
        diffuse_color=diff,
        light_dir=light,
        bounce_count=statics.bounce_count,
        cast_shadows=statics.cast_shadows,
    )


def assert_images_close(got, want, tol=2e-3, frac=0.998):
    """Allow a small fraction of edge pixels to differ (f32 vs f64
    tie-breaks on triangle edges)."""
    got = np.asarray(got)
    close = np.all(np.abs(got - want) < tol, axis=-1)
    assert close.mean() >= frac, f"only {close.mean():.4f} pixels match"


def test_single_triangle_constant_env():
    """BASELINE config 1: single triangle, constant env, 64x64."""
    world, scene, opos, onorm, env = build(fixtures.single_triangle())
    statics = RenderStatics(width=64, height=64, enable_diffuse=False)
    img = render_frame(scene, params_with(), statics)
    want = oracle(opos, onorm, env, statics)
    assert img.shape == (64, 64, 3)
    assert_images_close(img, want)
    # sanity: the triangle region differs from the background
    center = np.asarray(img)[32, 32]
    corner = np.asarray(img)[2, 2]
    assert not np.allclose(center, corner)


def test_metal_box_with_sky(rng):
    """BASELINE config 2 shape: mesh + BVH + metal + env bounces."""
    env = fixtures.procedural_sky(128)
    world, scene, opos, onorm, env = build(fixtures.box(half=0.6), env=env)
    statics = RenderStatics(width=48, height=48, enable_diffuse=False)
    img = render_frame(scene, params_with(camera_z=2.5), statics)
    want = oracle(opos, onorm, env, statics, camera_z=2.5)
    assert_images_close(img, want, tol=5e-3, frac=0.99)


def test_dielectric_diffuse_shadows(rng):
    """Dielectric material: diffuse + Lambert + hard shadows."""
    tris = np.concatenate([
        fixtures.box(center=(0, 0, 0), half=0.5),
        fixtures.quad(z=-1.2, half=2.0),  # floor behind
    ]).astype(np.float32)
    env = fixtures.procedural_sky(64)
    world, scene, opos, onorm, env = build(tris, env=env)
    statics = RenderStatics(width=48, height=48, enable_diffuse=True)
    spec = (0.05, 0.05, 0.05)
    diff = (1.0, 0.5, 0.5)
    light = np.array([0.3, 0.4, 0.85])
    light = tuple(light / np.linalg.norm(light))
    img = render_frame(scene, params_with(camera_z=3.0, spec=spec, diff=diff, light=light), statics)
    want = oracle(opos, onorm, env, statics, camera_z=3.0, spec=spec, diff=diff, light=light)
    assert_images_close(img, want, tol=6e-3, frac=0.985)


def test_object_rotation_matrices():
    """Object-space transform path (world->object ray matrices)."""
    from shader_ray_tpu.utils import mat4

    world, scene, opos, onorm, env = build(fixtures.box(half=0.6))
    rot = mat4.make_rotation(0.7, 0.0, 1.0, 0.0)
    trans = mat4.make_translation(0.1, -0.2, 0.0)
    om = mat4.mult(rot, trans)  # rotate then translate (object matrix style)
    onm = mat4.zero_bottom_row(mat4.invert(mat4.transpose(om)))
    oni = mat4.zero_bottom_row(mat4.transpose(om))
    statics = RenderStatics(width=32, height=32, enable_diffuse=False)
    params = params_with()._replace(
        object_matrix=jnp.asarray(om),
        object_normal_matrix=jnp.asarray(onm),
        object_normal_inverse=jnp.asarray(oni),
    )
    img = render_frame(scene, params, statics)
    want = render_reference(
        opos.astype(np.float64), onorm.astype(np.float64), env, 32, 32,
        camera_matrix=camera_at(3.0),
        object_matrix=om, object_normal_matrix=onm, object_normal_inverse=oni,
        diffuse_color=(0, 0, 0),
    )
    assert_images_close(img, want, tol=5e-3, frac=0.99)


def test_supersample_mode_close_to_default():
    """which==5 oracle mode (fs:654-673): 5x5 supersampled result is
    close to the 1-spp image away from edges."""
    world, scene, opos, onorm, env = build(fixtures.single_triangle())
    s1 = RenderStatics(width=24, height=24, enable_diffuse=False, which=0)
    s5 = RenderStatics(width=24, height=24, enable_diffuse=False, which=5)
    img1 = np.asarray(render_frame(scene, params_with(), s1))
    img5 = np.asarray(render_frame(scene, params_with(), s5))
    assert img5.shape == img1.shape
    # most pixels agree; edge pixels blend
    close = np.all(np.abs(img5 - img1) < 1e-2, axis=-1)
    assert close.mean() > 0.7
    assert not np.allclose(img5, img1)  # edges actually supersampled


def test_which3_differential_visualization():
    world, scene, *_ = build(fixtures.single_triangle())
    statics = RenderStatics(width=16, height=16, which=3, do_tonemap=False)
    img = np.asarray(render_frame(scene, params_with(), statics))
    assert img.shape == (16, 16, 3)
    assert (img[..., 2] == 0).all()
    assert (img >= 0).all()


def test_tile_size_invariance():
    """Tiling is an implementation detail — image must not change."""
    world, scene, *_ = build(fixtures.box(half=0.6))
    p = params_with()
    a = render_frame(scene, p, RenderStatics(width=32, height=32, tile_size=1 << 20,
                                             enable_diffuse=False))
    b = render_frame(scene, p, RenderStatics(width=32, height=32, tile_size=256,
                                             enable_diffuse=False))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_make_render_fn_jits_and_caches():
    world, scene, *_ = build(fixtures.single_triangle())
    statics = RenderStatics(width=16, height=16, enable_diffuse=False)
    fn = make_render_fn(scene, statics)
    img1 = fn(params_with())
    # changing uniforms must NOT recompile (same traced signature)
    img2 = fn(params_with(camera_z=4.0))
    assert img1.shape == (16, 16, 3)
    assert not np.allclose(np.asarray(img1), np.asarray(img2))


def test_bad_hit_sentinel_renders_red():
    """Traversal budget overflow paints the debug color (fs:436-438)."""
    tris = np.concatenate([fixtures.box(half=0.5 + 0.02 * i) for i in range(10)])
    world, scene, *_ = build(tris.astype(np.float32))
    statics = RenderStatics(
        width=16, height=16, enable_diffuse=False, max_bvh_iterations=2,
        do_tonemap=False,
    )
    img = np.asarray(render_frame(scene, params_with(camera_z=2.0), statics))
    center = img[8, 8]
    np.testing.assert_allclose(center, [1.0, 0.0, 0.0], atol=1e-6)
