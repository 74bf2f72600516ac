"""Progressive accumulation: jittered multi-sample frames converge
toward the 5x5 supersample oracle (mode 5, the reference's own
ground-truth mode, fs:654-673)."""

import numpy as np
import pytest

from shader_ray_tpu.app.driver import App
from shader_ray_tpu.models.fixtures import procedural_sky, uv_sphere
from shader_ray_tpu.models.triangle_set import TriangleSet
from shader_ray_tpu.models.world import get_shader_data, make_world
from shader_ray_tpu.ops.scene import upload_scene


@pytest.fixture(scope="module")
def app():
    pos, _ = uv_sphere(lat=6, lon=8)
    ts = TriangleSet.from_arrays(pos)
    world = make_world(ts)
    data = get_shader_data(world)
    scene = upload_scene(data, procedural_sky(32))
    return App(world, scene, width=24, height=24)


def test_progressive_runs_and_differs_from_1spp(app):
    one = app.draw_frame().copy()
    prog = app.render_progressive(samples=4)
    assert prog.shape == one.shape
    assert np.isfinite(prog).all()
    # jittered average must smooth edges: not identical to 1 spp
    assert not np.array_equal(prog, one)
    # but close to it overall (same scene)
    assert np.abs(prog - one).mean() < 0.1


def test_progressive_reduces_edge_variance(app):
    """More samples -> closer to a higher-sample render (convergence)."""
    p2 = app.render_progressive(samples=2)
    p8 = app.render_progressive(samples=8)
    p16 = app.render_progressive(samples=16)
    d_28 = np.abs(p2 - p16).mean()
    d_816 = np.abs(p8 - p16).mean()
    assert d_816 <= d_28 + 1e-6


@pytest.mark.heavy
def test_device_batched_progressive_matches_host_loop():
    """render_progressive_packet (one-dispatch scan) == averaging the
    same jittered frames host-side, packet engine, interpret mode."""
    import jax.numpy as jnp
    import numpy as np

    from shader_ray_tpu.models.fixtures import procedural_sky, uv_sphere
    from shader_ray_tpu.models.triangle_set import TriangleSet
    from shader_ray_tpu.models.world import get_shader_data, make_world
    from shader_ray_tpu.ops.engine_pallas import (
        render_frame_packet,
        render_progressive_packet,
    )
    from shader_ray_tpu.ops.pallas.pack_wide import pack_scene_wide
    from shader_ray_tpu.ops.render import RenderStatics, default_frame_params
    from shader_ray_tpu.ops.shading import tonemap_and_gamma
    from shader_ray_tpu.utils import mat4
    from shader_ray_tpu.utils.halton import halton

    pos, _ = uv_sphere(lat=6, lon=8)
    data = get_shader_data(make_world(TriangleSet.from_arrays(pos)))
    packed = pack_scene_wide(data, procedural_sky(64))
    statics = RenderStatics(width=32, height=32, tile_size=256)
    params = default_frame_params()._replace(
        camera_matrix=jnp.asarray(
            mat4.make_translation(0, 0, 3.0).astype(np.float32)
        )
    )
    jitters = jnp.asarray(
        [[halton(s + 1, 2) - 0.5, halton(s + 1, 3) - 0.5] for s in range(3)],
        jnp.float32,
    )
    got = np.asarray(
        render_progressive_packet(
            packed, params, statics, jitters, tile=1024, interpret=True
        )
    )

    inner = statics._replace(do_tonemap=False)
    acc = None
    for j in np.asarray(jitters):
        f = np.asarray(
            render_frame_packet(
                packed,
                params._replace(pixel_jitter=jnp.asarray(j)),
                inner,
                tile=1024,
                interpret=True,
            )
        )
        acc = f if acc is None else acc + f
    ref = np.asarray(tonemap_and_gamma(jnp.asarray(acc / 3.0), True))
    # f32 accumulation-order differences (device scan vs host loop)
    np.testing.assert_allclose(got, ref, atol=1e-3)


@pytest.mark.heavy
def test_jitter_pack_matches_sequential():
    """jitter_pack=S (S jitter samples of the same pixel block packed
    per kernel tile — the progressive batch's walk/leaf amortization)
    renders the SAME accumulation as the sequential scan, up to f32
    add order.  Covers S=2 and S=4 and a K % S != 0 fallback."""
    import jax.numpy as jnp

    from shader_ray_tpu.models.fixtures import bunny_class_scene
    from shader_ray_tpu.ops.engine_pallas import render_progressive_packet
    from shader_ray_tpu.ops.pallas.pack_wide import pack_scene_wide
    from shader_ray_tpu.ops.render import RenderStatics, default_frame_params
    from shader_ray_tpu.utils import mat4

    pos, _ = bunny_class_scene(600)
    data = get_shader_data(make_world(TriangleSet.from_arrays(pos)))
    packed = pack_scene_wide(data, procedural_sky(64))
    statics = RenderStatics(width=64, height=64, tile_size=1024)
    params = default_frame_params()._replace(
        camera_matrix=jnp.asarray(
            mat4.make_translation(0, 0, 4.0).astype(np.float32)
        ),
        diffuse_color=jnp.asarray(np.array([0.8, 0.2, 0.2], np.float32)),
        specular_color=jnp.asarray(np.array([0.05, 0.05, 0.05], np.float32)),
    )
    jitters = jnp.asarray(
        [[0.1, -0.2], [-0.3, 0.25], [0.05, 0.4], [-0.15, -0.1]], jnp.float32
    )
    args = (packed, params, statics, jitters)
    seq = np.asarray(
        render_progressive_packet(*args, tile=1024, interpret=True)
    )
    packs = {}
    for S in (2, 4):
        packs[S] = np.asarray(
            render_progressive_packet(
                *args, tile=1024, interpret=True, jitter_pack=S
            )
        )
        np.testing.assert_allclose(packs[S], seq, atol=2e-3, err_msg=f"S={S}")
    # K=4 not divisible by S=3: degrades to the largest packing that
    # divides the batch (S=2) — bit-identical to an explicit S=2 run
    fb = np.asarray(
        render_progressive_packet(
            *args, tile=1024, interpret=True, jitter_pack=3
        )
    )
    np.testing.assert_array_equal(fb, packs[2])
    # an autotuned S=8 winner driven with a K=4 batch runs as S=4
    fb8 = np.asarray(
        render_progressive_packet(
            *args, tile=1024, interpret=True, jitter_pack=8
        )
    )
    np.testing.assert_array_equal(fb8, packs[4])
    # UNPACKED sub-1024 block: rounds up to the 1024-lane kernel
    # minimum instead of building an invalid Mosaic shape
    up = np.asarray(
        render_progressive_packet(
            *args, tile=512, interpret=True, jitter_pack=1
        )
    )
    np.testing.assert_array_equal(up, seq)
    # sub-1024 pixel block: only the PACKED kernel tile (S*block) must
    # meet the 1024-lane minimum — S=4 at block 512 is a valid shape
    got = np.asarray(
        render_progressive_packet(
            *args, tile=512, interpret=True, jitter_pack=4
        )
    )
    np.testing.assert_allclose(got, seq, atol=2e-3, err_msg="S=4,block=512")
    # deep packing at the FOLD-floor block (tile 64, the round-9
    # autotune frontier): S=16 @ 64 = a 1024-lane packed tile — the
    # smallest block the validator now admits
    jit16 = jnp.concatenate([jitters] * 4, axis=0)
    args16 = (packed, params, statics, jit16)
    seq16 = np.asarray(
        render_progressive_packet(*args16, tile=1024, interpret=True)
    )
    got = np.asarray(
        render_progressive_packet(
            *args16, tile=64, interpret=True, jitter_pack=16
        )
    )
    np.testing.assert_allclose(got, seq16, atol=2e-3, err_msg="S=16,block=64")


@pytest.mark.heavy
def test_kernel_raygen_matches_xla_raygen():
    """In-kernel primary-ray generation (kernel_mega raygen mode: the
    packed progressive path generates rays from closed-form pixel
    coords inside the megakernel, rays_for_pixels semantics) matches
    the XLA-raygen path per debug mode, up to f32 op order.  The
    superframe ray arrays never materialize on the raygen path — the
    round-9 "256-deep fails to compile" fix."""
    import jax.numpy as jnp

    from shader_ray_tpu import config as cfgmod
    from shader_ray_tpu.models.fixtures import bunny_class_scene
    from shader_ray_tpu.ops.engine_pallas import render_progressive_packet
    from shader_ray_tpu.ops.pallas.pack_wide import pack_scene_wide
    from shader_ray_tpu.ops.render import RenderStatics, default_frame_params
    from shader_ray_tpu.utils import mat4

    pos, _ = bunny_class_scene(600)
    data = get_shader_data(make_world(TriangleSet.from_arrays(pos)))
    packed = pack_scene_wide(data, procedural_sky(64))
    params = default_frame_params()._replace(
        camera_matrix=jnp.asarray(
            mat4.make_translation(0, 0, 4.0).astype(np.float32)
        ),
        diffuse_color=jnp.asarray(np.array([0.8, 0.2, 0.2], np.float32)),
        specular_color=jnp.asarray(np.array([0.05, 0.05, 0.05], np.float32)),
    )
    jitters = jnp.asarray(
        [[0.1, -0.2], [-0.3, 0.25], [0.05, 0.4], [-0.15, -0.1]], jnp.float32
    )
    for which in (0, 1, 2):
        # 64x32 halves the interpreter's eager per-tile execution
        statics = RenderStatics(
            width=64, height=32, tile_size=1024, which=which,
            env_aniso=4 if which == 1 else 1,
        )
        outs = {}
        for kr in (False, True):
            cfg = cfgmod.Config()
            cfg.kernel_raygen = kr
            with cfgmod.use_config(cfg):
                outs[kr] = np.asarray(render_progressive_packet(
                    packed, params, statics, jitters,
                    tile=256, interpret=True, jitter_pack=4,
                ))
        np.testing.assert_allclose(
            outs[True], outs[False], atol=2e-3,
            err_msg=f"which={which}",
        )
