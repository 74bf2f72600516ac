"""SBVH spatial-split builder (models/sbvh.py): structural invariants,
clip correctness, and closest-hit parity with the reference build and
the brute-force oracle.  Spatial splits duplicate clipped references,
so the parity contract is on HIT GEOMETRY (t, and the hit point), not
on reference ids."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from shader_ray_tpu.config import Config  # noqa: E402
from shader_ray_tpu.models import fixtures  # noqa: E402
from shader_ray_tpu.models.sbvh import _clip_tri_plane, make_sbvh  # noqa: E402
from shader_ray_tpu.models.triangle_set import TriangleSet  # noqa: E402
from shader_ray_tpu.models.validate import validate_scene_data  # noqa: E402
from shader_ray_tpu.models.world import get_shader_data, make_world  # noqa: E402
from shader_ray_tpu.ops.reference import intersect_brute  # noqa: E402
from shader_ray_tpu.ops.scene import upload_scene  # noqa: E402
from shader_ray_tpu.ops.traversal import INFINITELY_FAR, traverse  # noqa: E402


def _long_diagonal_soup(n=400, seed=3):
    """Triangle soup with long thin diagonal triangles — the geometry
    class where object-only SAH produces heavily overlapping children
    and spatial splits pay (Stich 2009 section 1)."""
    rng = np.random.default_rng(seed)
    a = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    b = a + d * rng.uniform(1.0, 2.5, size=(n, 1)).astype(np.float32)
    w = np.cross(d, rng.normal(size=(n, 3)).astype(np.float32))
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    c = a + w * rng.uniform(0.01, 0.05, size=(n, 1)).astype(np.float32)
    return np.stack([a, b, c], axis=1)


def test_clip_tri_plane():
    V = np.array(
        [[[0.0, 0.0, 0.0], [2.0, 0.0, 0.0], [0.0, 2.0, 0.0]]], np.float32
    )
    lmin, lmax, rmin, rmax = _clip_tri_plane(V, 0, 1.0)
    # left part: x in [0, 1]; crossings at (1,0,0) and (1,1,0)
    np.testing.assert_allclose(lmin[0], [0.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(lmax[0], [1.0, 2.0, 0.0], atol=1e-6)
    # right part: the small corner triangle (1,0),(2,0),(1,1)
    np.testing.assert_allclose(rmin[0], [1.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(rmax[0], [2.0, 1.0, 0.0], atol=1e-6)
    # vertex exactly on the plane belongs to both sides
    V2 = np.array(
        [[[1.0, 0.0, 0.0], [2.0, 1.0, 0.0], [0.0, 1.0, 0.0]]], np.float32
    )
    l2min, l2max, r2min, r2max = _clip_tri_plane(V2, 0, 1.0)
    assert l2min[0, 0] == 0.0 and l2max[0, 0] == 1.0
    assert r2min[0, 0] == 1.0 and r2max[0, 0] == 2.0


def _structural_check(verts, cfg):
    bvh = make_sbvh(verts, cfg)
    T = verts.shape[0]
    R = len(bvh.order)
    assert R >= T
    assert R <= int(T * 1.5) + cfg.bvh_leaf_max + 1 + T  # budget + slack
    # every triangle referenced at least once
    assert np.array_equal(np.unique(bvh.order), np.arange(T))
    # leaf ranges tile the order array exactly once
    covered = np.zeros(R, np.int32)
    for nd in bvh.nodes:
        if nd.is_leaf:
            covered[nd.start : nd.start + nd.count] += 1
    assert (covered == 1).all()
    # node boxes contain their children's
    for nd in bvh.nodes:
        if not nd.is_leaf:
            for ch in (nd.negative, nd.positive):
                c = bvh.nodes[ch]
                assert (c.boxmin >= nd.boxmin - 1e-4).all()
                assert (c.boxmax <= nd.boxmax + 1e-4).all()
    return bvh


def _beams_and_floor(grid=16, beams=12, seed=5):
    """Many small floor triangles + a few scene-spanning skinny beams:
    the geometry class where spatial splits pay — object splits must
    stretch a child box along every straddling beam, spatial splits
    clip the beam references instead (Stich 2009 fig. 1)."""
    xs = np.linspace(-1, 1, grid + 1, dtype=np.float32)
    quads = []
    for i in range(grid):
        for j in range(grid):
            x0, x1, y0, y1 = xs[i], xs[i + 1], xs[j], xs[j + 1]
            quads.append([[x0, y0, 0], [x1, y0, 0], [x0, y1, 0]])
            quads.append([[x1, y1, 0], [x0, y1, 0], [x1, y0, 0]])
    tris = np.array(quads, np.float32)
    rng = np.random.default_rng(seed)
    bm = []
    for _ in range(beams):
        a = np.array(
            [rng.uniform(-1, -0.9), rng.uniform(-1, 1), rng.uniform(0.05, 0.3)],
            np.float32,
        )
        b = np.array(
            [rng.uniform(0.9, 1), rng.uniform(-1, 1), rng.uniform(0.05, 0.3)],
            np.float32,
        )
        w = np.array([0, 0.02, 0.02], np.float32)
        bm.append([a, b, a + w])
    return np.concatenate([tris, np.array(bm, np.float32)], axis=0)


def test_sbvh_structure_and_duplication():
    cfg = Config()
    verts = _beams_and_floor()
    bvh = _structural_check(verts, cfg)
    # floor+beams MUST trigger spatial splits (else the builder is inert)
    assert len(bvh.order) > verts.shape[0]


def test_sbvh_soup_declines_spatial():
    """On a uniform soup of long triangles EVERY spatial plane
    duplicates most references — the SAH must decline them all (the
    duplication-cost term working as designed)."""
    cfg = Config()
    verts = _long_diagonal_soup()
    bvh = _structural_check(verts, cfg)
    assert len(bvh.order) == verts.shape[0]


def test_sbvh_structure_compact_mesh():
    cfg = Config()
    pos, _ = fixtures.uv_sphere(lat=10, lon=14)
    _structural_check(pos, cfg)


def test_sbvh_scene_data_validates():
    cfg = Config()
    cfg.splits = "sbvh"
    cfg.use_native = "never"
    cfg.scene_cache = False
    verts = _long_diagonal_soup()
    world = make_world(TriangleSet.from_arrays(verts), cfg)
    data = get_shader_data(world, cfg)
    assert data.triangle_count >= verts.shape[0]
    validate_scene_data(data)


def _closest_hits(verts, cfg, rays):
    world = make_world(TriangleSet.from_arrays(verts), cfg)
    data = get_shader_data(world, cfg)
    scene = upload_scene(data, np.ones((1, 1, 3), np.float32))
    P, D = rays
    hit = traverse(
        scene, jnp.asarray(P), jnp.asarray(D),
        max_bvh_iterations=4 * max(data.group_count, 1) + 4,
    )
    return np.asarray(hit.t)


@pytest.mark.parametrize("scene", ["soup", "sphere", "beams"])
def test_sbvh_closest_hit_parity(scene):
    """traverse() over the SBVH finds the SAME closest hit as over the
    reference build and as brute force, for random rays.  The "beams"
    scene is the one that actually TAKES spatial splits (soup declines
    them all; the sphere is compact) — it pins the duplicated-ref and
    clipped-planar-box path, which the strict t0 < t1 slab test
    (fs:403) rejects without BUMPOUT padding."""
    if scene == "soup":
        verts = _long_diagonal_soup(250)
    elif scene == "beams":
        verts = _beams_and_floor(grid=8, beams=8)
    else:
        verts, _ = fixtures.uv_sphere(lat=8, lon=10)
    rng = np.random.default_rng(11)
    n = 256
    P = rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    D = rng.normal(size=(n, 3)).astype(np.float32)
    D /= np.linalg.norm(D, axis=1, keepdims=True)

    obj_cfg = Config()
    obj_cfg.use_native = "never"
    obj_cfg.scene_cache = False
    sb_cfg = Config()
    sb_cfg.splits = "sbvh"
    sb_cfg.use_native = "never"
    sb_cfg.scene_cache = False

    t_obj = _closest_hits(verts, obj_cfg, (P, D))
    t_sb = _closest_hits(verts, sb_cfg, (P, D))
    np.testing.assert_allclose(t_sb, t_obj, rtol=1e-5, atol=1e-5)

    t_brute, _, _, _ = intersect_brute(verts, P, D)
    hit = t_brute < INFINITELY_FAR
    np.testing.assert_allclose(t_sb[hit], t_brute[hit], rtol=1e-5, atol=1e-5)
    assert ((t_sb < INFINITELY_FAR) == hit).all()


def test_sbvh_packet_frame_parity():
    """The production wide packet engine renders the SAME frame over
    an SBVH pack as over the reference build (duplicated leaf refs and
    clipped node boxes flow through pack_wide + the fused megakernel),
    interpreter mode."""
    from shader_ray_tpu.ops.engine_pallas import render_frame_packet
    from shader_ray_tpu.ops.pallas.pack_wide import pack_scene_wide
    from shader_ray_tpu.ops.render import RenderStatics, default_frame_params
    from shader_ray_tpu.utils import mat4

    verts = _beams_and_floor(grid=8, beams=8)
    env = fixtures.procedural_sky(32)
    statics = RenderStatics(width=32, height=32, tile_size=256)
    params = default_frame_params()._replace(
        camera_matrix=jnp.asarray(
            mat4.make_translation(0, 0, 3.0).astype(np.float32)
        )
    )
    frames = {}
    for splits in ("object", "sbvh"):
        cfg = Config()
        cfg.splits = splits
        cfg.use_native = "never"
        world = make_world(TriangleSet.from_arrays(verts), cfg)
        data = get_shader_data(world, cfg)
        if splits == "sbvh":
            assert data.triangle_count > verts.shape[0]  # dups reached pack
        packed = pack_scene_wide(data, env)
        frames[splits] = np.asarray(
            render_frame_packet(packed, params, statics, tile=1024, interpret=True)
        )
    np.testing.assert_allclose(
        frames["sbvh"], frames["object"], atol=2e-3
    )
