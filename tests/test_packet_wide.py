"""Wide (8-ary short-stack) packet engine vs the per-lane wavefront
engine — collapse invariants, traversal parity, active mask, full
pipeline, empty scene.  Pallas interpret mode on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from shader_ray_tpu.models.fixtures import procedural_sky, uv_sphere
from shader_ray_tpu.models.triangle_set import TriangleSet
from shader_ray_tpu.models.world import get_shader_data, make_world
from shader_ray_tpu.ops.engine_pallas import render_frame_packet
from shader_ray_tpu.ops.pallas.pack_wide import WIDE, pack_scene_wide
from shader_ray_tpu.ops.pallas.packet_wide import packet_trace_wide
from shader_ray_tpu.ops.render import (
    RenderStatics,
    default_frame_params,
    render_frame,
)
from shader_ray_tpu.ops.scene import upload_scene
from shader_ray_tpu.ops.traversal import traverse
from shader_ray_tpu.utils import mat4

# Pallas-interpreter heavyweights: skipped at nproc=1 (conftest heavy
# tier, VERDICT r3 #3); xdist-parallel hosts and --full run them.
pytestmark = pytest.mark.heavy


@pytest.fixture(scope="module")
def sphere():
    pos, _ = uv_sphere(lat=8, lon=12)
    ts = TriangleSet.from_arrays(pos)
    world = make_world(ts)
    return get_shader_data(world)


@pytest.fixture(scope="module")
def bumpy():
    # larger scene -> several wide levels
    pos, _ = uv_sphere(lat=24, lon=36)
    ts = TriangleSet.from_arrays(pos)
    world = make_world(ts)
    return get_shader_data(world)


def _random_rays(rng, R):
    P = (rng.normal(size=(R, 3)) * 0.1 + [0, 0, 3]).astype(np.float32)
    D = rng.normal(size=(R, 3)).astype(np.float32)
    D[: R // 2] = ([0, 0, -1.0] + 0.3 * rng.normal(size=(R // 2, 3))).astype(
        np.float32
    )
    return P, D


def test_collapse_covers_all_leaves(bumpy):
    """Every binary leaf appears exactly once as a wide child, and
    every internal child id is a valid wide node."""
    data = bumpy
    packed = pack_scene_wide(data, procedural_sky(32))
    cmeta = np.asarray(packed.cmeta_smem).reshape(packed.n_wide, WIDE)
    counts = (cmeta >> 26) & 0x1F
    is_leaf_child = (cmeta >= 0) & (counts > 0)
    leaf_rows = (cmeta & 0x3FFFFFF)[is_leaf_child]
    n_binary_leaves = int((data.node_objects[:, 1] > 0).sum())
    assert sorted(leaf_rows.tolist()) == list(range(n_binary_leaves))
    internal = cmeta[(cmeta >= 0) & (counts == 0)]
    assert ((internal > 0) & (internal < packed.n_wide)).all()
    # nodes are materially smaller than the binary tree
    assert packed.n_wide < data.group_count // 3


def test_wide_matches_perlane_traversal(sphere, rng):
    data = sphere
    scene = upload_scene(data, procedural_sky(64))
    packed = pack_scene_wide(data, procedural_sky(64), isect="mt")
    P, D = _random_rays(rng, 512)

    ref = traverse(scene, jnp.asarray(P), jnp.asarray(D))
    got = packet_trace_wide(
        packed, jnp.asarray(P), jnp.asarray(D), tile=1024, interpret=True
    )

    np.testing.assert_allclose(got.t, ref.t, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(got.which, ref.which)
    hit = (np.asarray(ref.t) < 1e7) & (np.asarray(ref.which) >= 0)
    tri_n = data.tri_normals[np.maximum(np.asarray(ref.which), 0)]
    u = np.asarray(ref.u)[:, None]
    v = np.asarray(ref.v)[:, None]
    n_ref = tri_n[:, 0:3] * (1 - u - v) + tri_n[:, 3:6] * u + tri_n[:, 6:9] * v
    np.testing.assert_allclose(
        np.asarray(got.normal)[hit], n_ref[hit], rtol=1e-2, atol=1e-2
    )


def test_wide_matches_perlane_deep(bumpy, rng):
    data = bumpy
    scene = upload_scene(data, procedural_sky(64))
    packed = pack_scene_wide(data, procedural_sky(64), isect="mt")
    P, D = _random_rays(rng, 1024)

    ref = traverse(scene, jnp.asarray(P), jnp.asarray(D))
    got = packet_trace_wide(
        packed, jnp.asarray(P), jnp.asarray(D), tile=1024, interpret=True
    )
    np.testing.assert_allclose(got.t, ref.t, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(got.which, ref.which)


def test_wide_active_mask_and_anyhit(sphere, rng):
    data = sphere
    packed = pack_scene_wide(data, procedural_sky(64))
    P, D = _random_rays(rng, 512)
    active = np.zeros(512, bool)
    active[::3] = True
    got = packet_trace_wide(
        packed, jnp.asarray(P), jnp.asarray(D),
        active=jnp.asarray(active), tile=1024, interpret=True,
    )
    t = np.asarray(got.t)
    assert (t[~active] >= 1e7).all()

    # any-hit agrees on hit/miss classification with the full trace
    occ = packet_trace_wide(
        packed, jnp.asarray(P), jnp.asarray(D),
        active=jnp.asarray(active), tile=1024, any_hit=True, interpret=True,
    )
    full_hit = np.asarray(got.t) < 1e7
    occ_hit = np.asarray(occ.t) < 1e7
    np.testing.assert_array_equal(occ_hit[active], full_hit[active])


def test_full_pipeline_wide_vs_wavefront(sphere):
    data = sphere
    env = procedural_sky(512)
    scene = upload_scene(data, env)
    packed = pack_scene_wide(data, env, env_size=(256, 512))

    statics = RenderStatics(width=40, height=32, tile_size=512)
    params = default_frame_params()._replace(
        camera_matrix=jnp.asarray(mat4.make_translation(0, 0, 3.0).astype(np.float32)),
        diffuse_color=jnp.asarray(np.array([0.8, 0.3, 0.2], np.float32)),
        specular_color=jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32)),
    )
    ref = np.asarray(render_frame(scene, params, statics))
    got = np.asarray(
        render_frame_packet(packed, params, statics, tile=1024, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-2)


def test_wide_empty_scene():
    ts = TriangleSet.from_arrays(np.zeros((0, 3, 3), np.float32))
    data = get_shader_data(make_world(ts))
    packed = pack_scene_wide(data, procedural_sky(64))
    P = np.zeros((64, 3), np.float32)
    D = np.tile(np.array([0, 0, -1.0], np.float32), (64, 1))
    got = packet_trace_wide(
        packed, jnp.asarray(P), jnp.asarray(D), tile=1024, interpret=True
    )
    assert (np.asarray(got.t) >= 1e7).all()
    assert not np.asarray(got.bad).any()


def test_which1_texturegrad_parity(sphere):
    """Packet mode 1 (MXU trilinear mip atlas) vs the wavefront
    engine's textureGrad path, identical (512, 1024) base level —
    VERDICT r1 missing #1/#3."""
    data = sphere
    env = procedural_sky(1024)  # (512, 1024) = atlas base, pow2
    scene = upload_scene(data, env)
    packed = pack_scene_wide(
        data, env, env_size=(512, 1024), env_atlas_base=(512, 1024),
        env_mode="dense",  # this test pins the dense 4-hot atlas path
    )
    assert packed.env_atlas.shape == (1023, 3072)

    statics = RenderStatics(width=40, height=32, tile_size=512, which=1)
    params = default_frame_params()._replace(
        camera_matrix=jnp.asarray(mat4.make_translation(0, 0, 3.0).astype(np.float32)),
        diffuse_color=jnp.asarray(np.array([0.8, 0.3, 0.2], np.float32)),
        specular_color=jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32)),
    )
    ref = np.asarray(render_frame(scene, params, statics))
    got = np.asarray(
        render_frame_packet(packed, params, statics, tile=1024, interpret=True)
    )
    # bf16 MXU contraction vs f32 gathers: HDR-scaled tolerance
    np.testing.assert_allclose(got, ref, atol=3e-2, rtol=3e-2)


def test_wide_large_scene_over_32k_nodes(rng):
    """A ~340k-triangle scene (binary nodes >> 32768, the binary
    engine's SMEM cap) renders correctly on the wide packet path —
    VERDICT r1 missing #2 / next #5."""
    from shader_ray_tpu.models.fixtures import bunny_class_scene

    pos, _ = bunny_class_scene(340_000)
    ts = TriangleSet.from_arrays(pos)
    data = get_shader_data(make_world(ts))
    assert data.group_count > 32768  # beyond the binary engine's cap

    packed = pack_scene_wide(data, procedural_sky(64), isect="mt")
    scene = upload_scene(data, procedural_sky(64))
    P = (rng.normal(size=(256, 3)) * 0.1 + [0, 0, 3]).astype(np.float32)
    D = ([0, 0, -1.0] + 0.2 * rng.normal(size=(256, 3))).astype(np.float32)

    ref = traverse(scene, jnp.asarray(P), jnp.asarray(D))
    got = packet_trace_wide(
        packed, jnp.asarray(P), jnp.asarray(D), tile=1024, interpret=True
    )
    np.testing.assert_allclose(got.t, ref.t, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(got.which, ref.which)


def test_vmem_node_tier_matches_smem(bumpy, rng):
    """The large-scene node tier (VMEM rows DMA'd per step) must trace
    identically to the SMEM-table tier."""
    data = bumpy
    env = procedural_sky(64)
    P, D = _random_rays(rng, 1024)
    a = pack_scene_wide(data, env, node_src="smem")
    b = pack_scene_wide(data, env, node_src="vmem")
    assert b.node_src == "vmem" and b.nodes_vmem.shape[0] >= b.n_wide
    ga = packet_trace_wide(a, jnp.asarray(P), jnp.asarray(D), tile=1024, interpret=True)
    gb = packet_trace_wide(b, jnp.asarray(P), jnp.asarray(D), tile=1024, interpret=True)
    np.testing.assert_array_equal(np.asarray(ga.t), np.asarray(gb.t))
    np.testing.assert_array_equal(np.asarray(ga.which), np.asarray(gb.which))


@pytest.mark.parametrize("pops", [1, 2, 4])
def test_multi_pop_matches_perlane(bumpy, rng, pops):
    """Multi-pop walk steps (one scalar sync serving 2/4 popped nodes)
    trace identically to the per-lane reference; the short-stack
    scratch scales by pops (disjoint branches advance together)."""
    data = bumpy
    scene = upload_scene(data, procedural_sky(64))
    packed = pack_scene_wide(data, procedural_sky(64), isect="mt")
    P, D = _random_rays(rng, 1024)
    ref = traverse(scene, jnp.asarray(P), jnp.asarray(D))
    got = packet_trace_wide(
        packed, jnp.asarray(P), jnp.asarray(D), tile=1024,
        interpret=True, pops=pops,
    )
    np.testing.assert_allclose(got.t, ref.t, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(got.which, ref.which)
    assert not np.asarray(got.bad).any()
    occ = packet_trace_wide(
        packed, jnp.asarray(P), jnp.asarray(D), tile=1024,
        interpret=True, pops=pops, any_hit=True,
    )
    np.testing.assert_array_equal(
        np.asarray(occ.t) < 1e7, np.asarray(got.t) < 1e7
    )


@pytest.mark.parametrize("leaf_mode", ["dma", "dmastatic"])
def test_leaf_data_paths_match(bumpy, rng, leaf_mode):
    """The DMA leaf data paths (dynamic-count fori / static unroll over
    SMEM scalars) trace identically to the default scalar-extraction
    path."""
    data = bumpy
    packed = pack_scene_wide(data, procedural_sky(64))
    P, D = _random_rays(rng, 1024)
    a = packet_trace_wide(
        packed, jnp.asarray(P), jnp.asarray(D), tile=1024,
        interpret=True, leaf_mode="scalar",
    )
    b = packet_trace_wide(
        packed, jnp.asarray(P), jnp.asarray(D), tile=1024,
        interpret=True, leaf_mode=leaf_mode,
    )
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    np.testing.assert_array_equal(np.asarray(a.which), np.asarray(b.which))


@pytest.mark.parametrize("leaf_mode", ["scalar", "dmastatic", "dma", "dma2"])
def test_woop_isect_matches_mt(bumpy, rng, leaf_mode):
    """The woop precomputed-affine intersector (VERDICT r1 next #1)
    agrees with raw-vertex Moller-Trumbore: same hit classification,
    t within f32 round-off, same triangle chosen except where two
    triangles' edges are within eps of each other."""
    data = bumpy
    env = procedural_sky(64)
    P, D = _random_rays(rng, 1024)
    a = pack_scene_wide(data, env, isect="mt")
    b = pack_scene_wide(data, env, isect="woop")
    assert b.isect == "woop" and b.leaves.shape != a.leaves.shape
    ga = packet_trace_wide(
        a, jnp.asarray(P), jnp.asarray(D), tile=1024, interpret=True,
        leaf_mode=leaf_mode,
    )
    gb = packet_trace_wide(
        b, jnp.asarray(P), jnp.asarray(D), tile=1024, interpret=True,
        leaf_mode=leaf_mode,
    )
    ta, tb = np.asarray(ga.t), np.asarray(gb.t)
    hit_a, hit_b = ta < 1e7, tb < 1e7
    np.testing.assert_array_equal(hit_a, hit_b)
    np.testing.assert_allclose(tb[hit_b], ta[hit_a], rtol=1e-4, atol=1e-5)
    # the chosen triangle may differ on shared-edge grazing rays only
    agree = np.asarray(ga.which) == np.asarray(gb.which)
    assert agree.mean() > 0.995, f"which agreement {agree.mean()}"
    na, nb = np.asarray(ga.normal), np.asarray(gb.normal)
    np.testing.assert_allclose(nb[agree & hit_a], na[agree & hit_a],
                               rtol=1e-3, atol=1e-3)


def test_woop_fused_frame_matches_wavefront(sphere):
    """Full fused-megakernel frame with the woop intersector vs the
    wavefront oracle."""
    data = sphere
    env = procedural_sky(512)
    scene = upload_scene(data, env)
    packed = pack_scene_wide(data, env, env_size=(256, 512), isect="woop")

    statics = RenderStatics(width=40, height=32, tile_size=512)
    params = default_frame_params()._replace(
        camera_matrix=jnp.asarray(mat4.make_translation(0, 0, 3.0).astype(np.float32)),
        diffuse_color=jnp.asarray(np.array([0.8, 0.3, 0.2], np.float32)),
        specular_color=jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32)),
    )
    ref = np.asarray(render_frame(scene, params, statics))
    got = np.asarray(
        render_frame_packet(packed, params, statics, tile=1024,
                            interpret=True, fused=True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-2)


@pytest.mark.parametrize("pops", [2, 4])
def test_vmem_node_tier_multi_pop(bumpy, rng, pops):
    """VERDICT r1 next #5: the large-scene VMEM node tier no longer
    forces pops=1 — prefetched per-pop node-group DMAs trace
    identically to the SMEM tier at any pops."""
    data = bumpy
    env = procedural_sky(64)
    P, D = _random_rays(rng, 1024)
    a = pack_scene_wide(data, env, node_src="smem")
    b = pack_scene_wide(data, env, node_src="vmem")
    ga = packet_trace_wide(
        a, jnp.asarray(P), jnp.asarray(D), tile=1024, interpret=True,
        pops=pops,
    )
    gb = packet_trace_wide(
        b, jnp.asarray(P), jnp.asarray(D), tile=1024, interpret=True,
        pops=pops,
    )
    np.testing.assert_array_equal(np.asarray(ga.t), np.asarray(gb.t))
    np.testing.assert_array_equal(np.asarray(ga.which), np.asarray(gb.which))

    # any-hit early exit keeps the DMA semaphore protocol balanced
    occ = packet_trace_wide(
        b, jnp.asarray(P), jnp.asarray(D), tile=1024, interpret=True,
        pops=pops, any_hit=True,
    )
    np.testing.assert_array_equal(
        np.asarray(occ.t) < 1e7, np.asarray(ga.t) < 1e7
    )


def test_leaf_budget_16(bumpy, rng):
    """BVH leaves above the reference's 10-triangle budget work when
    max_leaf_tests is raised to match (SRT_MAX_LEAF_TESTS; slot rows
    go to the full 16-row leaf group)."""
    from shader_ray_tpu.config import Config, set_config, get_config
    from shader_ray_tpu.models.fixtures import uv_sphere

    old = get_config()
    cfg = Config()
    cfg.bvh_leaf_max = 16
    cfg.max_leaf_tests = 16
    set_config(cfg)
    try:
        pos, _ = uv_sphere(lat=24, lon=36)
        data = get_shader_data(make_world(TriangleSet.from_arrays(pos)))
        assert data.node_objects[:, 1].max() > 10  # bigger leaves exist
        packed = pack_scene_wide(
            data, procedural_sky(64), max_leaf_tests=16, isect="mt"
        )
        assert packed.max_count > 10
        scene = upload_scene(data, procedural_sky(64))
        P, D = _random_rays(rng, 512)
        ref = traverse(
            scene, jnp.asarray(P), jnp.asarray(D), max_leaf_tests=16
        )
        got = packet_trace_wide(
            packed, jnp.asarray(P), jnp.asarray(D), tile=1024,
            interpret=True,
        )
        np.testing.assert_allclose(got.t, ref.t, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(got.which, ref.which)
    finally:
        set_config(old)


@pytest.mark.parametrize("node_src", ["smem", "vmem"])
def test_queue_leaf_scan_matches_ctz(bumpy, rng, node_src):
    """leaf_scan="queue" (hit-leaf metas enqueued to per-class SMEM
    queues during the push pass, drained by index) must be bit-exact
    vs the default per-visit ctz bit-scan, on both node tiers and
    under multi-pop; any-hit exercises the early-exit drain."""
    data = bumpy
    env = procedural_sky(64)
    P, D = _random_rays(rng, 1024)
    packed = pack_scene_wide(data, env, node_src=node_src)
    args = (packed, jnp.asarray(P), jnp.asarray(D))
    kw = dict(tile=1024, interpret=True, pops=2)
    a = packet_trace_wide(*args, **kw, leaf_scan="ctz")
    b = packet_trace_wide(*args, **kw, leaf_scan="queue")
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    np.testing.assert_array_equal(np.asarray(a.which), np.asarray(b.which))
    np.testing.assert_array_equal(np.asarray(a.normal), np.asarray(b.normal))

    occ_a = packet_trace_wide(*args, **kw, leaf_scan="ctz", any_hit=True)
    occ_b = packet_trace_wide(*args, **kw, leaf_scan="queue", any_hit=True)
    np.testing.assert_array_equal(
        np.asarray(occ_a.t) < 1e7, np.asarray(occ_b.t) < 1e7
    )


def test_hbm_leaf_tier_bit_identical():
    """leaf_src="hbm" (million-triangle tier: the leaf table stays in
    device memory and dma2 group copies pull from HBM) must render
    bit-identically to the VMEM-resident table; incompatible leaf
    modes coerce to dma2."""
    import jax.numpy as jnp

    from shader_ray_tpu.models.fixtures import procedural_sky, uv_sphere
    from shader_ray_tpu.models.triangle_set import TriangleSet
    from shader_ray_tpu.models.world import get_shader_data, make_world
    from shader_ray_tpu.ops.engine_pallas import render_frame_packet
    from shader_ray_tpu.ops.pallas.pack_wide import pack_scene_wide
    from shader_ray_tpu.ops.render import RenderStatics, default_frame_params
    from shader_ray_tpu.utils import mat4

    pos, _ = uv_sphere(lat=8, lon=12)
    data = get_shader_data(make_world(TriangleSet.from_arrays(pos)))
    params = default_frame_params()._replace(
        camera_matrix=jnp.asarray(
            mat4.make_translation(0, 0, 3.0).astype(np.float32)
        ),
        diffuse_color=jnp.asarray(np.array([0.8, 0.3, 0.2], np.float32)),
        specular_color=jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32)),
    )
    st = RenderStatics(width=64, height=32)
    outs = {}
    packs = {}
    for src in ("vmem", "hbm"):
        packed = pack_scene_wide(
            data, procedural_sky(256), env_size=(128, 256), leaf_src=src
        )
        assert packed.leaf_src == src
        packs[src] = packed
        outs[src] = np.asarray(
            render_frame_packet(packed, params, st, tile=1024,
                                interpret=True)
        )
    np.testing.assert_array_equal(outs["hbm"], outs["vmem"])

    # hit-id tracking on the hbm tier (VERDICT r4 #4): the tribase now
    # rides in the leaf group's spare lane, so the UNFUSED trace —
    # which returns per-ray triangle ids — must match the vmem tier
    # bit-exactly (no SMEM tribase table exists on the hbm path)
    rng = np.random.default_rng(11)
    P = (rng.normal(size=(512, 3)) * 0.1 + [0, 0, 3]).astype(np.float32)
    D = ([0, 0, -1.0] + 0.3 * rng.normal(size=(512, 3))).astype(np.float32)
    ga = packet_trace_wide(packs["vmem"], jnp.asarray(P), jnp.asarray(D),
                           tile=1024, interpret=True)
    gb = packet_trace_wide(packs["hbm"], jnp.asarray(P), jnp.asarray(D),
                           tile=1024, interpret=True)
    assert (np.asarray(ga.which) >= 0).any()
    np.testing.assert_array_equal(np.asarray(ga.t), np.asarray(gb.t))
    np.testing.assert_array_equal(np.asarray(ga.which), np.asarray(gb.which))
