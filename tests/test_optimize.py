"""Reinsertion BVH optimizer (models/optimize.py): structural
invariants, SAH monotonicity, and closest-hit parity with the
unoptimized tree.  The optimizer only rearranges internal topology —
leaf (start, count) ranges and the triangle permutation must be
byte-identical, so hit results (t AND which) must match exactly."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from shader_ray_tpu.config import Config  # noqa: E402
from shader_ray_tpu.models import fixtures  # noqa: E402
from shader_ray_tpu.models.bvh import make_bvh  # noqa: E402
from shader_ray_tpu.models.optimize import optimize_bvh  # noqa: E402
from shader_ray_tpu.models.triangle_set import TriangleSet  # noqa: E402
from shader_ray_tpu.models.validate import validate_scene_data  # noqa: E402
from shader_ray_tpu.models.world import get_shader_data, make_world  # noqa: E402
from shader_ray_tpu.ops.scene import upload_scene  # noqa: E402
from shader_ray_tpu.ops.traversal import traverse  # noqa: E402


def _build(verts, cfg):
    ts = TriangleSet.from_arrays(verts)
    return ts, make_bvh(ts.tri_boxmin, ts.tri_boxmax, ts.barycenters, cfg)


def _sah(bvh, cfg):
    def area(nd):
        d = np.maximum(0.0, nd.boxmax - nd.boxmin)
        return 2.0 * (d[0] * d[1] + d[0] * d[2] + d[1] * d[2])

    return sum(
        cfg.sah_cisec * area(n) * n.count if n.is_leaf else cfg.sah_ctrav * area(n)
        for n in bvh.nodes
    )


def _check_structure(orig, opt):
    # same node count, same leaf set, same triangle permutation
    assert len(opt.nodes) == len(orig.nodes)
    assert np.array_equal(opt.order, orig.order)
    leaves0 = sorted((n.start, n.count) for n in orig.nodes if n.is_leaf)
    leaves1 = sorted((n.start, n.count) for n in opt.nodes if n.is_leaf)
    assert leaves0 == leaves1
    # every node reachable exactly once from the root
    seen = set()
    stack = [opt.root]
    while stack:
        i = stack.pop()
        assert i not in seen
        seen.add(i)
        nd = opt.nodes[i]
        if not nd.is_leaf:
            stack += [nd.negative, nd.positive]
    assert len(seen) == len(opt.nodes)
    # parent boxes contain children; axis convention: negative child
    # center <= positive child center on the split axis
    for i in seen:
        nd = opt.nodes[i]
        if nd.is_leaf:
            continue
        cn, cp = opt.nodes[nd.negative], opt.nodes[nd.positive]
        for c in (cn, cp):
            assert (c.boxmin >= nd.boxmin - 1e-4).all()
            assert (c.boxmax <= nd.boxmax + 1e-4).all()
        a = nd.axis
        assert 0 <= a <= 2
        assert (cn.boxmin[a] + cn.boxmax[a]) <= (cp.boxmin[a] + cp.boxmax[a]) + 1e-6


@pytest.mark.parametrize(
    "gen",
    [
        lambda: fixtures.uv_sphere(lat=12, lon=16)[0],
        lambda: fixtures.terrain_scene(3000)[0],
        lambda: fixtures.bunny_class_scene(3000)[0],
    ],
    ids=["sphere", "terrain", "bunny"],
)
def test_structure_and_sah(gen):
    cfg = Config()
    verts = gen()
    _, bvh = _build(verts, cfg)
    opt = optimize_bvh(bvh, cfg)
    _check_structure(bvh, opt)
    assert _sah(opt, cfg) <= _sah(bvh, cfg) * (1.0 + 1e-9)


def test_closest_hit_parity():
    """Optimized topology must return identical (t, which) for every
    ray — min-over-intersections is traversal-order independent and
    the leaf contents are untouched."""
    cfg = Config()
    verts = fixtures.terrain_scene(3000)[0]
    ts, bvh = _build(verts, cfg)
    opt = optimize_bvh(bvh, cfg)
    assert _sah(opt, cfg) < _sah(bvh, cfg)  # terrain must actually improve

    rng = np.random.default_rng(11)
    R = 512
    P = rng.uniform(-2, 2, size=(R, 3)).astype(np.float32)
    P[:, 2] = 3.0
    D = rng.normal(size=(R, 3)).astype(np.float32)
    D[:, 2] = -np.abs(D[:, 2]) - 0.5
    D /= np.linalg.norm(D, axis=1, keepdims=True)

    results = []
    for b in (bvh, opt):
        world = make_world(TriangleSet.from_arrays(verts), cfg, build_bvh=False)
        world.bvh = b
        world.triangles = ts
        data = get_shader_data(world, cfg)
        validate_scene_data(data)
        scene = upload_scene(data, np.ones((1, 1, 3), np.float32))
        hit = traverse(
            scene, jnp.asarray(P), jnp.asarray(D),
            max_bvh_iterations=4 * max(data.group_count, 1) + 4,
        )
        results.append((np.asarray(hit.t), np.asarray(hit.which)))
    np.testing.assert_array_equal(results[0][0], results[1][0])
    np.testing.assert_array_equal(results[0][1], results[1][1])


def test_world_pipeline_with_opt():
    """cfg.bvh_opt=reinsert through make_world/get_shader_data forces
    the Python builder and produces a valid scene."""
    cfg = Config()
    cfg.bvh_opt = "reinsert"
    cfg.scene_cache = False
    verts = fixtures.terrain_scene(2000)[0]
    world = make_world(TriangleSet.from_arrays(verts), cfg)
    assert world.flat is None  # native (pre-flattened) path must be skipped
    data = get_shader_data(world, cfg)
    validate_scene_data(data)
    assert data.triangle_count == verts.shape[0]


def test_tiny_tree_noop():
    cfg = Config()
    verts = fixtures.uv_sphere(lat=3, lon=3)[0]
    _, bvh = _build(verts, cfg)
    opt = optimize_bvh(bvh, cfg)
    assert opt is bvh or len(opt.nodes) == len(bvh.nodes)


def test_config_rejects_bad_opt():
    cfg = Config()
    cfg.bvh_opt = "bogus"
    with pytest.raises(ValueError):
        cfg.validate()
