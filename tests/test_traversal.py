"""Traversal kernel vs. brute-force oracle (SURVEY.md section 4)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from shader_ray_tpu.models import fixtures  # noqa: E402
from shader_ray_tpu.models.triangle_set import TriangleSet  # noqa: E402
from shader_ray_tpu.models.world import get_shader_data, make_world  # noqa: E402
from shader_ray_tpu.ops.reference import intersect_brute  # noqa: E402
from shader_ray_tpu.ops.scene import upload_scene  # noqa: E402
from shader_ray_tpu.ops.traversal import INFINITELY_FAR, ray_octant, traverse  # noqa: E402


def build_scene(tri_pos, env=None):
    ts = TriangleSet.from_arrays(tri_pos)
    world = make_world(ts)
    data = get_shader_data(world)
    if env is None:
        env = np.ones((1, 1, 3), np.float32)
    return world, data, upload_scene(data, env)


def random_rays(rng, n, origin_spread=5.0):
    P = rng.uniform(-origin_spread, origin_spread, size=(n, 3)).astype(np.float32)
    D = rng.normal(size=(n, 3)).astype(np.float32)
    D /= np.linalg.norm(D, axis=1, keepdims=True)
    return P, D


def test_octant_code():
    D = np.array(
        [[1, 1, 1], [-1, 1, 1], [1, -1, 1], [1, 1, -1], [-1, -1, -1]], np.float32
    )
    np.testing.assert_array_equal(ray_octant(jnp.asarray(D)), [7, 6, 5, 3, 0])


def test_single_triangle_hit():
    world, data, scene = build_scene(fixtures.single_triangle())
    P = jnp.asarray([[0.0, 0.0, 2.0], [0.45, 0.45, 2.0]], jnp.float32)
    D = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]], jnp.float32)
    hit = traverse(scene, P, D)
    assert float(hit.t[0]) == pytest.approx(2.0, rel=1e-5)
    assert int(hit.which[0]) == 0
    assert float(hit.t[1]) >= INFINITELY_FAR  # misses past the edge
    assert not bool(hit.bad.any())


def test_traversal_matches_brute_force(rng):
    centers = rng.uniform(-3, 3, size=(300, 1, 3))
    tris = (centers + rng.uniform(-0.4, 0.4, size=(300, 3, 3))).astype(np.float32)
    world, data, scene = build_scene(tris)
    P, D = random_rays(rng, 512)

    hit = traverse(scene, jnp.asarray(P), jnp.asarray(D))
    # brute force runs on BVH-ordered triangles so `which` is comparable
    ordered = tris[world.tri_order]
    t_ref, which_ref, u_ref, v_ref = intersect_brute(
        ordered.astype(np.float64), P.astype(np.float64), D.astype(np.float64)
    )

    t = np.asarray(hit.t)
    hit_mask = t < INFINITELY_FAR
    ref_mask = t_ref < INFINITELY_FAR
    np.testing.assert_array_equal(hit_mask, ref_mask)
    np.testing.assert_allclose(t[hit_mask], t_ref[hit_mask], rtol=2e-4, atol=1e-4)
    # barycentrics for rays whose nearest triangle is unambiguous
    same = np.asarray(hit.which) == which_ref
    assert same[hit_mask].mean() > 0.98  # ties may pick either triangle
    np.testing.assert_allclose(
        np.asarray(hit.u)[hit_mask & same], u_ref[hit_mask & same], atol=2e-3
    )
    assert not bool(hit.bad.any())


def test_traversal_unnormalized_dirs(rng):
    """Object-space rays arrive rotation-transformed and unnormalized."""
    tris = fixtures.box(half=0.7)
    world, data, scene = build_scene(tris)
    P, D = random_rays(rng, 128, origin_spread=3.0)
    s = rng.uniform(0.5, 2.0, size=(128, 1)).astype(np.float32)
    hit_a = traverse(scene, jnp.asarray(P), jnp.asarray(D))
    hit_b = traverse(scene, jnp.asarray(P), jnp.asarray(D * s))
    mask = np.asarray(hit_a.t) < INFINITELY_FAR
    np.testing.assert_allclose(
        np.asarray(hit_b.t)[mask] * s[mask, 0], np.asarray(hit_a.t)[mask], rtol=1e-3
    )


def test_active_mask_skips_rays():
    world, data, scene = build_scene(fixtures.single_triangle())
    P = jnp.asarray([[0.0, 0.0, 2.0]] * 2, jnp.float32)
    D = jnp.asarray([[0.0, 0.0, -1.0]] * 2, jnp.float32)
    hit = traverse(scene, P, D, active=jnp.asarray([True, False]))
    assert float(hit.t[0]) < INFINITELY_FAR
    assert float(hit.t[1]) >= INFINITELY_FAR


def test_bad_hit_budget():
    """Tiny traversal budget paints lanes bad (fs:436-438 sentinel)."""
    tris = np.concatenate([fixtures.box(half=0.5 + 0.01 * i) for i in range(20)])
    world, data, scene = build_scene(tris.astype(np.float32))
    P = jnp.asarray([[0.0, 0.0, 5.0]], jnp.float32)
    D = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    hit = traverse(scene, P, D, max_bvh_iterations=2)
    assert bool(hit.bad[0])
    assert float(hit.t[0]) == -1.0


def test_max_leaf_tests_clips():
    """Leaves larger than max_leaf_tests only test the first N
    triangles (fs:410-417) — triangles beyond the budget are missed."""
    # 30 identical-box triangles forced into one leaf via max_depth=0
    tris = np.concatenate([fixtures.quad(z=float(-i)) for i in range(15)])
    ts = TriangleSet.from_arrays(tris.astype(np.float32))
    from shader_ray_tpu.config import Config
    from shader_ray_tpu.models.bvh import make_bvh
    from shader_ray_tpu.models.world import World, get_shader_data as gsd

    cfg = Config()
    cfg.bvh_max_depth = 0
    bvh = make_bvh(ts.tri_boxmin, ts.tri_boxmax, ts.barycenters, cfg)
    assert bvh.node_count == 1
    world = make_world(ts)
    world.bvh = bvh
    data = gsd(world)
    scene = upload_scene(data, np.ones((1, 1, 3), np.float32))
    P = jnp.asarray([[0.2, 0.2, 5.0]], jnp.float32)
    D = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    full = traverse(scene, P, D, max_leaf_tests=30)
    clipped = traverse(scene, P, D, max_leaf_tests=2)
    assert float(full.t[0]) < INFINITELY_FAR
    # the nearest quad may or may not be in the first 2 BVH-order slots;
    # clipped either misses or hits something no closer
    assert float(clipped.t[0]) >= float(full.t[0])
