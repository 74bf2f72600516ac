"""BVH build + flatten invariant tests.

These encode the invariants the reference asserts at build/flatten time
(world.cpp:147-173 index bounds, world.cpp:273 hitmiss stack depth,
leaf coverage) plus structural properties of the SAH build
(bvh.cpp:288-358)."""

import numpy as np
import pytest

from shader_ray_tpu.config import Config
from shader_ray_tpu.models import fixtures
from shader_ray_tpu.models.bvh import make_bvh
from shader_ray_tpu.models.flatten import SENTINEL, flatten_bvh
from shader_ray_tpu.models.triangle_set import TriangleSet
from shader_ray_tpu.models.world import get_shader_data, make_world


def build(tri_pos, **cfg_kw):
    ts = TriangleSet.from_arrays(tri_pos)
    cfg = Config(**cfg_kw) if cfg_kw else Config()
    bvh = make_bvh(ts.tri_boxmin, ts.tri_boxmax, ts.barycenters, cfg)
    return ts, bvh


def random_tris(rng, n, spread=10.0):
    centers = rng.uniform(-spread, spread, size=(n, 1, 3))
    offsets = rng.uniform(-0.5, 0.5, size=(n, 3, 3))
    return (centers + offsets).astype(np.float32)


def test_single_triangle_is_one_leaf():
    ts, bvh = build(fixtures.single_triangle())
    assert bvh.node_count == 1
    assert bvh.nodes[bvh.root].is_leaf
    assert bvh.nodes[bvh.root].count == 1


def test_leaf_max_respected(rng):
    tris = random_tris(rng, 500)
    ts, bvh = build(tris)
    for node in bvh.nodes:
        if node.is_leaf:
            # leaves can exceed leaf_max only via no-good-split/depth paths
            pass
        else:
            assert node.count == 0
    # every triangle appears in exactly one leaf
    covered = np.zeros(500, dtype=bool)
    for node in bvh.nodes:
        if node.is_leaf:
            assert not covered[node.start : node.start + node.count].any()
            covered[node.start : node.start + node.count] = True
    assert covered.all()


def test_order_is_permutation(rng):
    tris = random_tris(rng, 300)
    ts, bvh = build(tris)
    assert sorted(bvh.order.tolist()) == list(range(300))


def test_child_boxes_inside_parent(rng):
    tris = random_tris(rng, 400)
    ts, bvh = build(tris)
    for node in bvh.nodes:
        if not node.is_leaf:
            for child_id in (node.negative, node.positive):
                child = bvh.nodes[child_id]
                assert (child.boxmin >= node.boxmin - 1e-4).all()
                assert (child.boxmax <= node.boxmax + 1e-4).all()


def test_leaf_boxes_contain_triangles(rng):
    tris = random_tris(rng, 200)
    ts, bvh = build(tris)
    bmin = ts.tri_boxmin[bvh.order]
    bmax = ts.tri_boxmax[bvh.order]
    for node in bvh.nodes:
        if node.is_leaf and node.count:
            sl = slice(node.start, node.start + node.count)
            assert (bmin[sl] >= node.boxmin - 1e-5).all()
            assert (bmax[sl] <= node.boxmax + 1e-5).all()


def test_max_depth_override(rng):
    tris = random_tris(rng, 256)
    ts, bvh = build(tris, bvh_max_depth=2, bvh_leaf_max=1)
    # depth <= 2 means at most 7 nodes
    assert bvh.node_count <= 7


def test_stats_counts(rng):
    tris = random_tris(rng, 300)
    ts, bvh = build(tris)
    s = bvh.stats
    assert s.node_count == bvh.node_count
    assert s.leaf_count == sum(1 for n in bvh.nodes if n.is_leaf)
    assert sum(s.nodes_by_level.values()) == s.node_count


# ---- flatten / hitmiss ---------------------------------------------------


def test_dfs_inorder_indices(rng):
    tris = random_tris(rng, 300)
    ts, bvh = build(tris)
    flat = flatten_bvh(bvh)
    n = flat.node_count
    assert n == bvh.node_count
    # in-order property: negative subtree indices < self < positive subtree
    for i in range(n):
        neg, pos = flat.children[i]
        if neg != SENTINEL:
            assert neg < i < pos


def test_hitmiss_links_valid(rng):
    tris = random_tris(rng, 300)
    ts, bvh = build(tris)
    flat = flatten_bvh(bvh)
    n = flat.node_count
    assert flat.hitmiss.shape == (8, n, 2)
    valid = (flat.hitmiss == SENTINEL) | (
        (flat.hitmiss >= 0) & (flat.hitmiss < n)
    )
    assert valid.all()
    # leaves: hit == miss (world.cpp:250-251); branches: hit = near child
    leaf_mask = flat.children[:, 0] == SENTINEL
    for d in range(8):
        hm = flat.hitmiss[d]
        assert (hm[leaf_mask, 0] == hm[leaf_mask, 1]).all()
        branch = ~leaf_mask
        hits = hm[branch, 0]
        kids = flat.children[branch]
        assert ((hits == kids[:, 0]) | (hits == kids[:, 1])).all()


def test_hitmiss_near_child_octant(rng):
    """Near child = positive when octant dir component along split axis
    is negative (world.cpp:263-269)."""
    tris = random_tris(rng, 300)
    ts, bvh = build(tris)
    flat = flatten_bvh(bvh)
    branch_ids = np.nonzero(flat.children[:, 0] != SENTINEL)[0]
    for d in range(8):
        sign = [1 if (d & 1) else -1, 1 if (d & 2) else -1, 1 if (d & 4) else -1]
        for i in branch_ids:
            ax = flat.axis[i]
            near = flat.children[i, 1] if sign[ax] < 0 else flat.children[i, 0]
            assert flat.hitmiss[d, i, 0] == near


def test_hitmiss_chain_visits_every_node(rng):
    """Following hit links from the root enumerates the full tree in
    near-to-far order for each octant (stackless completeness)."""
    tris = random_tris(rng, 200)
    ts, bvh = build(tris)
    flat = flatten_bvh(bvh)
    n = flat.node_count
    for d in range(8):
        visited = np.zeros(n, dtype=bool)
        g = flat.root
        steps = 0
        while g != SENTINEL and steps <= n:
            assert not visited[g]
            visited[g] = True
            g = int(flat.hitmiss[d, g, 0])  # always-hit walk
            steps += 1
        assert visited.all()


def test_shader_data_layout(rng):
    tris = random_tris(rng, 100)
    ts = TriangleSet.from_arrays(tris)
    world = make_world(ts)
    data = get_shader_data(world)
    assert data.tri_positions.shape == (100, 9)
    assert data.node_boxes.shape == (data.group_count, 8)
    assert data.hitmiss.shape == (8, data.group_count, 2)
    assert 0 <= data.tree_root < data.group_count
    # triangle positions are BVH-ordered expansions of the originals
    got = data.tri_positions.reshape(100, 3, 3)
    expected = tris[world.tri_order]
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_world_center_extent():
    ts = TriangleSet.from_arrays(fixtures.box(center=(1, 2, 3), half=0.5))
    world = make_world(ts)
    np.testing.assert_allclose(world.scene_center, [1, 2, 3], atol=1e-4)
    # extent = 2 * max distance from center = 2 * sqrt(3)/2... for a
    # unit cube corner distance = sqrt(0.75)
    np.testing.assert_allclose(world.scene_extent, 2 * np.sqrt(0.75), rtol=1e-3)


def test_empty_scene():
    ts = TriangleSet().finish()
    world = make_world(ts)
    data = get_shader_data(world)
    assert data.group_count == 1
    assert data.triangle_count == 0
