"""Fused shading megakernel (ONE pallas_call per frame) vs the unfused
bounce loop and the wavefront engine.  Pallas interpret mode on CPU.

The fused kernel evaluates the same formulas in a different f32 op
order (in-kernel scalar madds vs XLA (R,3) matmuls), so comparisons
use tolerances — see kernel_mega.py's exact-f32 caveat.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from shader_ray_tpu.models.fixtures import procedural_sky, uv_sphere
from shader_ray_tpu.models.triangle_set import TriangleSet
from shader_ray_tpu.models.world import get_shader_data, make_world
from shader_ray_tpu.ops.engine_pallas import (
    render_frame_packet,
    render_progressive_packet,
    trace_rays_packet,
)
from shader_ray_tpu.ops.pallas.pack_wide import pack_scene_wide
from shader_ray_tpu.ops.render import (
    RenderStatics,
    default_frame_params,
    generate_rays,
    render_frame,
)
from shader_ray_tpu.ops.scene import upload_scene
from shader_ray_tpu.utils import mat4

# Pallas-interpreter heavyweights: skipped at nproc=1 (conftest heavy
# tier, VERDICT r3 #3); xdist-parallel hosts and --full run them.
pytestmark = pytest.mark.heavy


@pytest.fixture(scope="module")
def sphere():
    pos, _ = uv_sphere(lat=8, lon=12)
    ts = TriangleSet.from_arrays(pos)
    return get_shader_data(make_world(ts))


@pytest.fixture(scope="module")
def packed(sphere):
    return pack_scene_wide(sphere, procedural_sky(512), env_size=(256, 512))


def _params():
    return default_frame_params()._replace(
        camera_matrix=jnp.asarray(
            mat4.make_translation(0, 0, 3.0).astype(np.float32)
        ),
        diffuse_color=jnp.asarray(np.array([0.8, 0.3, 0.2], np.float32)),
        specular_color=jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32)),
    )


@pytest.mark.parametrize("which", [0, 1, 2])
def test_fused_matches_unfused(packed, which):
    statics = RenderStatics(width=40, height=32, which=which)
    params = _params()
    un = np.asarray(
        render_frame_packet(packed, params, statics, tile=1024,
                            interpret=True, fused=False)
    )
    fu = np.asarray(
        render_frame_packet(packed, params, statics, tile=1024,
                            interpret=True, fused=True)
    )
    np.testing.assert_allclose(fu, un, atol=2e-3)


def test_fused_matches_wavefront(sphere, packed):
    statics = RenderStatics(width=40, height=32, tile_size=512)
    params = _params()
    ref = np.asarray(render_frame(upload_scene(sphere, procedural_sky(512)),
                                  params, statics))
    fu = np.asarray(
        render_frame_packet(packed, params, statics, tile=1024,
                            interpret=True, fused=True)
    )
    np.testing.assert_allclose(fu, ref, atol=2e-2)


@pytest.mark.parametrize(
    "overrides",
    [
        dict(cast_shadows=False),
        dict(enable_diffuse=False),
        dict(bounce_count=1),
        dict(bounce_count=2, cast_shadows=False),
    ],
)
def test_fused_static_flag_combos(packed, overrides):
    statics = RenderStatics(width=40, height=32, **overrides)
    params = _params()
    un = np.asarray(
        render_frame_packet(packed, params, statics, tile=1024,
                            interpret=True, fused=False)
    )
    fu = np.asarray(
        render_frame_packet(packed, params, statics, tile=1024,
                            interpret=True, fused=True)
    )
    np.testing.assert_allclose(fu, un, atol=2e-3)


def test_fused_cast_counts_match(packed):
    """The in-kernel cast-ray accounting (honest Mrays/s denominator)
    must agree with the unfused XLA count."""
    statics = RenderStatics(width=40, height=32)
    params = _params()
    rays, _ = generate_rays(statics, params)
    _, cast_un = trace_rays_packet(
        packed, rays, params, statics, tile=1024, interpret=True,
        with_counts=True, fused=False,
    )
    _, cast_fu = trace_rays_packet(
        packed, rays, params, statics, tile=1024, interpret=True,
        with_counts=True, fused=True,
    )
    assert int(cast_un) == int(cast_fu)
    # sanity: between R (all primary) and R * 6 (all potential)
    R = statics.width * statics.height
    assert R <= int(cast_fu) <= 6 * R


def test_fused_min_contrib_cutoff(packed):
    """SRT_MIN_CONTRIB throughput cutoff: retiring lanes whose Schlick
    modulation fell below the threshold must (a) actually cast fewer
    rays and (b) stay within the documented error bound — a retired
    lane's env term uses its current direction, so per-pixel error is
    bounded by ~min_contrib * radiance range (kernel_mega.py)."""
    from shader_ray_tpu.config import Config, use_config

    statics = RenderStatics(width=40, height=32)
    params = _params()
    rays, _ = generate_rays(statics, params)
    exact, cast_exact = trace_rays_packet(
        packed, rays, params, statics, tile=1024, interpret=True,
        with_counts=True, fused=True,
    )
    # the fixture sphere is convex (reflections never re-hit), so only
    # a cutoff ABOVE the off-grazing bounce-0 modulation (F0 = 0.1)
    # retires anything here; grazing-Fresnel lanes must survive it
    cutoff = 0.15
    cfg = Config()
    cfg.min_contrib = cutoff
    with use_config(cfg):
        cut, cast_cut = trace_rays_packet(
            packed, rays, params, statics, tile=1024, interpret=True,
            with_counts=True, fused=True,
        )
    assert int(cast_cut) < int(cast_exact), "cutoff retired no lanes"
    delta = np.abs(np.asarray(cut) - np.asarray(exact)).max()
    assert delta <= 3 * cutoff, f"cutoff error {delta} exceeds bound"
    # default config is reference-exact (min_contrib = 0)
    assert Config().min_contrib == 0.0


def test_fused_ray_padding(packed):
    """A ray count that does not divide the tile exercises the padded
    inactive lanes (unit-z directions, zero active mask)."""
    statics = RenderStatics(width=40, height=32)
    params = _params()
    rays, _ = generate_rays(statics, params)
    R = 1000  # < one 1024-lane fold block
    sub = type(rays)(*[x[:R] for x in rays])
    un = trace_rays_packet(
        packed, sub, params, statics, tile=1024, interpret=True,
        fused=False,
    )
    fu = trace_rays_packet(
        packed, sub, params, statics, tile=1024, interpret=True, fused=True,
    )
    np.testing.assert_allclose(np.asarray(fu), np.asarray(un), atol=2e-3)
    assert np.isfinite(np.asarray(fu)).all()


def test_fused_progressive(packed):
    """Progressive scan-carry batch with the fused kernel inside."""
    statics = RenderStatics(width=40, height=32)
    params = _params()
    jitters = jnp.asarray([[0.0, 0.0], [0.25, -0.25]], jnp.float32)
    un = render_progressive_packet(
        packed, params, statics, jitters, tile=1024, interpret=True,
        fused=False,
    )
    fu = render_progressive_packet(
        packed, params, statics, jitters, tile=1024, interpret=True,
        fused=True,
    )
    np.testing.assert_allclose(np.asarray(fu), np.asarray(un), atol=2e-3)


def test_fused_sharded(packed):
    """shard_map over the rays axis with the fused kernel per shard."""
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("rays",))
    statics = RenderStatics(width=40, height=32)
    params = _params()
    solo = np.asarray(
        render_frame_packet(packed, params, statics, tile=1024,
                            interpret=True, fused=True)
    )
    shard = np.asarray(
        render_frame_packet(packed, params, statics, tile=1024,
                            interpret=True, fused=True, mesh=mesh)
    )
    # the windowed env sampler picks footprint windows PER RAY TILE;
    # sharding regroups tiles, so borderline packets may legitimately
    # resolve one mip level apart — tolerance covers that (the
    # traversal itself is bit-identical across shard counts, pinned by
    # test_parallel's wavefront-engine invariance tests)
    np.testing.assert_allclose(shard, solo, atol=6e-3)


def test_fused_phase_stats(packed):
    """The megakernel's per-phase counters decode: walks ran, shadows
    only after hits, cast matches column 0."""
    import jax

    from shader_ray_tpu.ops.engine_pallas import _pack_uniforms
    from shader_ray_tpu.ops.pallas.packet_mega import packet_shade
    from shader_ray_tpu.ops.render import generate_rays

    statics = RenderStatics(width=40, height=32)
    params = _params()
    rays, _ = generate_rays(statics, params)
    res = packet_shade(
        packed, rays.P, rays.D, None, None, _pack_uniforms(params),
        tile=1024, interpret=True,
    )
    s = np.asarray(res.stats)
    assert s.shape[1] == 13
    assert int(np.asarray(res.cast)) == int(s[:, 0].sum())
    b0_steps = s[:, 1]
    assert (b0_steps > 0).all()          # primary walk ran everywhere
    assert s[:, 2].sum() > 0             # ...and visited leaves
    # later bounce walks only step where earlier ones hit
    assert s[:, 5].sum() <= s[:, 1].sum() * 3


@pytest.mark.parametrize(
    "bounces,shadows,diffuse",
    [(3, True, False), (3, False, True), (2, True, True), (4, True, True)],
)
def test_fused_phase_stats_column_layout(packed, bounces, shadows, diffuse):
    """Regression (VERDICT r1 weak #6 / ADVICE): the stats block must
    size and label columns by the kernel's actual phase emission —
    shadow phases exist iff cast_shadows AND enable_diffuse — for any
    bounce count, not a hard-coded 13."""
    from shader_ray_tpu.ops.engine_pallas import _pack_uniforms
    from shader_ray_tpu.ops.pallas.packet_mega import packet_shade, stats_phases
    from shader_ray_tpu.ops.render import generate_rays

    statics = RenderStatics(width=40, height=32)
    params = _params()
    rays, _ = generate_rays(statics, params)
    res = packet_shade(
        packed, rays.P, rays.D, None, None, _pack_uniforms(params),
        tile=1024, interpret=True, bounce_count=bounces,
        cast_shadows=shadows, enable_diffuse=diffuse,
    )
    phases = stats_phases(bounces, shadows, diffuse)
    s = np.asarray(res.stats)
    assert s.shape[1] == 1 + 2 * len(phases)
    assert int(np.asarray(res.cast)) == int(s[:, 0].sum())
    # the primary bounce walk always runs
    assert s[:, 1].sum() > 0
    has_shadow = shadows and diffuse
    assert any(p.startswith("shadow") for p in phases) == has_shadow


def test_shadow_walk_axis_aligned_light():
    """Regression (round 3): with the default light (0, 0, 1) — zero x
    and y components — the wide walker's folded dequant affine produced
    NaN slab tests (inf*0 + -inf) and occlusion walks died after the
    root pop, silently rendering every surface unshadowed.  A small
    plate in front of a large one must cast a shadow, identically
    across the fused, unfused, and wavefront engines."""

    def quad(z, s):
        a = [-s, -s, z]; b = [s, -s, z]; c = [s, s, z]; d = [-s, s, z]
        return [[a, b, c], [a, c, d]]

    tris = np.array(quad(0.5, 0.3) + quad(0.0, 1.1), np.float32)
    data = get_shader_data(make_world(TriangleSet.from_arrays(tris)))
    env = procedural_sky(64)
    packed_p = pack_scene_wide(data, env, env_size=(32, 64))
    statics = RenderStatics(width=48, height=48, tile_size=512)
    # camera OFF the light axis (a light parallel to the view axis
    # always hides the shadow behind its caster): rotate about y, then
    # translate — light stays the default (0, 0, 1)
    th = np.deg2rad(-22.0)
    R4 = np.eye(4, dtype=np.float32)
    R4[:3, :3] = np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]],
        np.float32,
    )
    T4 = mat4.make_translation(-1.1, 0.15, 2.7).astype(np.float32)
    params = default_frame_params()._replace(
        camera_matrix=jnp.asarray(T4 @ R4),
        camera_normal_matrix=jnp.asarray(R4),
        diffuse_color=jnp.asarray(np.array([0.9, 0.9, 0.9], np.float32)),
        specular_color=jnp.asarray(np.array([0.04, 0.04, 0.04], np.float32)),
    )

    ref = np.asarray(render_frame(upload_scene(data, env), params, statics))
    lum = ref.mean(axis=-1)
    # the reference must actually show the shadow: dark (occluded
    # diffuse) AND bright (lit plate) pixels both present
    assert (lum < 0.5).mean() > 0.01, "no shadowed pixels in reference"
    assert (lum > 0.75).mean() > 0.05, "no lit plate pixels in reference"

    fu = np.asarray(
        render_frame_packet(packed_p, params, statics, tile=1024,
                            interpret=True, fused=True)
    )
    un = np.asarray(
        render_frame_packet(packed_p, params, statics, tile=1024,
                            interpret=True, fused=False)
    )
    # silhouette pixels may classify differently between the exact
    # wavefront slabs and the quantized packet boxes on razor-thin
    # plate geometry; the shadow REGION must match everywhere else
    for got in (fu, un):
        bad = np.abs(got - ref).max(axis=-1) > 2e-2
        assert bad.mean() < 0.02, f"{bad.mean():.4f} of pixels disagree"


def test_fused_vmem_node_tier(sphere):
    """The fused megakernel over the large-scene node tier (VMEM rows
    DMA'd to SMEM scratch per step) matches the SMEM-table tier."""
    env = procedural_sky(512)
    a = pack_scene_wide(sphere, env, env_size=(256, 512), node_src="smem")
    b = pack_scene_wide(sphere, env, env_size=(256, 512), node_src="vmem")
    statics = RenderStatics(width=40, height=32)
    params = _params()
    fa = np.asarray(
        render_frame_packet(a, params, statics, tile=1024,
                            interpret=True, fused=True)
    )
    fb = np.asarray(
        render_frame_packet(b, params, statics, tile=1024,
                            interpret=True, fused=True)
    )
    np.testing.assert_array_equal(fa, fb)


def test_fused_multi_pop_frame(packed):
    """The fused frame pipeline with multi-pop walk steps (production
    default pops=4; tests otherwise pin pops=1) matches single-pop."""
    from shader_ray_tpu.config import get_config

    statics = RenderStatics(width=40, height=32)
    params = _params()
    base = np.asarray(
        render_frame_packet(packed, params, statics, tile=1024,
                            interpret=True, fused=True)
    )
    cfg = get_config()
    old = cfg.walk_pops
    cfg.walk_pops = 2
    try:
        multi = np.asarray(
            render_frame_packet(packed, params, statics, tile=1024,
                                interpret=True, fused=True)
        )
    finally:
        cfg.walk_pops = old
    np.testing.assert_array_equal(multi, base)


@pytest.mark.parametrize("shape", [(32, 64, 1024), (96, 128, 1024), (64, 64, 4096)])
def test_laned_pixel_coords_match_permutations(shape):
    """_laned_pixel_coords is the closed-form composition of the
    _swizzle and _lane_fold_perm permutations (the definitional
    reference for the lane-order raygen)."""
    from shader_ray_tpu.ops.engine_pallas import (
        FOLD,
        _block_dims,
        _lane_fold_perm,
        _laned_pixel_coords,
        _swizzle,
    )

    H, W, tile = shape
    bh, bw = _block_dims(H, W, tile)
    jj, ii = _laned_pixel_coords(H, W, bh, bw, tile, FOLD)
    x = jnp.arange(H * W, dtype=jnp.float32).reshape(H * W, 1)
    if bh > 1:
        x = _swizzle(x, H, W, bh, bw)
    x = _lane_fold_perm(x, tile, FOLD)
    want = np.asarray(x).reshape(-1)
    got = np.asarray(jj) * W + np.asarray(ii)
    np.testing.assert_array_equal(got, want)


def test_fused_empty_scene():
    """Empty scene through the fused pipeline: pure environment, no
    hits, finite output."""
    ts = TriangleSet.from_arrays(np.zeros((0, 3, 3), np.float32))
    data = get_shader_data(make_world(ts))
    packed_e = pack_scene_wide(data, procedural_sky(64), env_size=(32, 64))
    statics = RenderStatics(width=40, height=32)
    img = np.asarray(
        render_frame_packet(packed_e, default_frame_params(), statics,
                            tile=1024, interpret=True, fused=True)
    )
    assert img.shape == (32, 40, 3)
    assert np.isfinite(img).all()


def test_packet_supersample_oracle_mode(packed):
    """which==5 (the reference's 5x5 supersampled ground-truth mode,
    fs:654-673) on the packet engine: implemented as a lax.scan over
    the 25 subsamples (a 25x-unrolled pipeline crashed the TPU backend
    at full res).  Close to 1-spp away from edges, different at edges."""
    s1 = RenderStatics(width=32, height=32, which=0)
    s5 = RenderStatics(width=32, height=32, which=5)
    params = _params()
    img1 = np.asarray(
        render_frame_packet(packed, params, s1, tile=1024, interpret=True)
    )
    img5 = np.asarray(
        render_frame_packet(packed, params, s5, tile=1024, interpret=True)
    )
    assert img5.shape == img1.shape
    assert np.isfinite(img5).all()
    close = np.all(np.abs(img5.astype(np.float32) - img1) < 3.0, axis=-1)
    assert close.mean() > 0.7
    assert not np.array_equal(img5, img1)
