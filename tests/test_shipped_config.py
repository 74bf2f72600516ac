"""Parity test at EXACTLY the shipped production configuration
(VERDICT r1 next #6: "no production tuple ships untested" — the r2
shadow bug lived in an untested production path).

Tuple under test (config.py defaults): fused megakernel, pops=4,
tile=4096, three-class leaf split, leaf_mode=scalar, isect=woop,
collapse=sah, windowed env — vs the wavefront oracle, in Pallas
interpret mode.  Slow-ish (~minutes: the interpreter executes the
pops=4 step math eagerly), kept to one frame."""

import jax.numpy as jnp
import numpy as np

from shader_ray_tpu.config import Config, get_config, set_config
from shader_ray_tpu.models.fixtures import procedural_sky, uv_sphere
from shader_ray_tpu.models.triangle_set import TriangleSet
from shader_ray_tpu.models.world import get_shader_data, make_world
from shader_ray_tpu.ops.render import (
    RenderStatics,
    default_frame_params,
    render_frame,
)
from shader_ray_tpu.ops.scene import upload_scene
from shader_ray_tpu.utils import mat4


def test_shipped_production_tuple_matches_wavefront():
    prod = Config()  # dataclass defaults = the shipped config
    assert (prod.packet_fused, prod.walk_pops, prod.ray_tile,
            prod.leaf_mode, prod.leaf_isect, prod.collapse,
            prod.jitter_pack, prod.prog_tile, prod.leaf_scan) == (
        True, 4, 4096, "dma2", "woop", "sah", 2, 2048, "",
    ), "shipped defaults changed — update this test to the new tuple"
    # leaf_scan "" = auto: ctz on the SMEM node tier, queue on vmem
    from shader_ray_tpu.ops.pallas.packet_wide import _default_leaf_scan

    assert _default_leaf_scan("smem") == "ctz"
    assert _default_leaf_scan("vmem") == "queue"

    old = get_config()
    set_config(prod)
    try:
        from shader_ray_tpu.engine import Renderer

        pos, _ = uv_sphere(lat=24, lon=36)
        data = get_shader_data(make_world(TriangleSet.from_arrays(pos)))
        env = procedural_sky(512)

        # 128 x 64 = 2 full 4096-ray tiles (no padding path)
        statics = RenderStatics(width=128, height=64, tile_size=1024)
        params = default_frame_params()._replace(
            camera_matrix=jnp.asarray(
                mat4.make_translation(0, 0, 3.0).astype(np.float32)
            ),
            diffuse_color=jnp.asarray(np.array([0.8, 0.3, 0.2], np.float32)),
            specular_color=jnp.asarray(
                np.array([0.1, 0.1, 0.1], np.float32)
            ),
        )

        renderer = Renderer(data, env, config=prod, engine="packet")
        assert renderer.packed.isect == "woop"
        assert renderer.packed.env_planes is not None
        got = np.asarray(renderer.make_fn(statics)(params))

        scene = upload_scene(data, env)
        ref = np.asarray(render_frame(scene, params, statics))

        # tonemapped u8-scale output; fused in-kernel f32 op order and
        # per-tile env windows vs per-ray gathers need loose-ish atol
        err = np.abs(got.astype(np.float32) - ref.astype(np.float32))
        assert err.mean() < 0.01, err.mean()
        assert (err.max(axis=-1) > 0.05).mean() < 0.01, "too many off pixels"

        # the bench path additionally ships jitter_pack=2 (paired
        # jitter samples packed per kernel tile): one progressive
        # batch through make_progressive_fn must agree with the
        # single-frame render at the same scale
        pfn = renderer.make_progressive_fn(statics, samples=2)
        prog = np.asarray(pfn(params))
        perr = np.abs(prog.astype(np.float32) - ref.astype(np.float32))
        assert perr.mean() < 0.02, perr.mean()
    finally:
        set_config(old)
