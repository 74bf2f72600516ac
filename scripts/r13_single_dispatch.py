#!/usr/bin/env python
"""Attribute the interactive single-dispatch frame latency (VERDICT r4
weak #7 / next #6): BENCH_r04 measured 56.87 ms for the REPL `draw`
path vs ~40 ms axon RPC floor and 4.75 ms amortized frame compute —
where do the remaining ~12 ms go?

Measures, on the bench bunny scene with the committed tune applied:
  rpc        tiny cached jit dispatch+fetch (the RPC floor)
  fsum       the timed single-dispatch path (frame + sum + fetch)
  laned      same frame but summing the LANED kernel output (skips the
             unfold + unswizzle XLA permutes and tonemap epilogue)
  tile=N     fsum with ray_tile=N (the S=1 frame pays the un-amortized
             per-packet walk union; tile changes the union/lane economics
             and the autotuner never tunes the single-frame path)
  prog K=1   the progressive path at batch 1 (jitter-packed S=1)

Usage: python scripts/r13_single_dispatch.py
"""

import copy
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench  # noqa: E402

REPS = int(os.environ.get("REPS", "15"))


def timed(fn, label):
    fn()  # warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts) * 1e3
    print(f"{label:28s} median {np.median(ts):7.2f} ms  "
          f"min {ts.min():7.2f}  max {ts.max():7.2f}", flush=True)
    return float(np.median(ts))


def main() -> None:
    bench._wait_for_backend()
    import functools

    import jax
    import jax.numpy as jnp

    from shader_ray_tpu.engine import Renderer
    from shader_ray_tpu.ops.engine_pallas import render_frame_packet
    from shader_ray_tpu.ops.render import RenderStatics, default_frame_params
    from shader_ray_tpu.utils import mat4

    data, env, scene_key = bench.build_scene_data()
    renderer = Renderer(data, env)
    statics = RenderStatics.from_config(
        width=bench.WIDTH, height=bench.HEIGHT, tile_size=65536
    )
    fov = np.deg2rad(40.0)
    zoom = 2.6 / 2.0 / np.sin(fov / 2.0)
    cam = mat4.make_translation(0.0, 0.0, zoom).astype(np.float32)
    params = default_frame_params(fov=fov)._replace(
        camera_matrix=jnp.asarray(cam),
        diffuse_color=jnp.asarray(np.array([0.8, 0.2, 0.2], np.float32)),
        specular_color=jnp.asarray(np.array([0.05, 0.05, 0.05], np.float32)),
    )
    bench._maybe_tune(renderer, statics, params, scene_key)
    print(f"tuned cfg: ray_tile={renderer.cfg.ray_tile} "
          f"prog_tile={renderer.cfg.prog_tile} "
          f"jitter_pack={renderer.cfg.jitter_pack} "
          f"pops={renderer.cfg.walk_pops} leaf_mode={renderer.cfg.leaf_mode}",
          flush=True)

    tiny = jax.jit(lambda x: jnp.sum(x))
    x8 = jnp.ones((8, 8))
    np.asarray(tiny(x8))
    timed(lambda: np.asarray(tiny(x8)), "rpc floor (tiny jit)")

    fsum = renderer.make_checksum_fn(statics)
    t_fsum = timed(lambda: np.asarray(fsum(params)), "fsum (current path)")

    # laned checksum: skip unfold/unswizzle/tonemap epilogue
    cfg = renderer.cfg

    @functools.partial(jax.jit, static_argnames=("tile",))
    def _laned(packed_, params, tile):
        return jnp.sum(render_frame_packet(
            packed_, params, statics, tile=tile, interpret=False,
            leaf_mode=cfg.leaf_mode or None, fused=True, _laned_out=True,
        ))

    from shader_ray_tpu.config import use_config
    with use_config(cfg):
        np.asarray(_laned(renderer.packed, params, cfg.ray_tile))
        timed(lambda: np.asarray(_laned(renderer.packed, params,
                                        cfg.ray_tile)),
              f"laned sum (tile {cfg.ray_tile})")

        for tile in (2048, 8192, 16384, 32768):
            try:
                np.asarray(_laned(renderer.packed, params, tile))
                timed(lambda: np.asarray(_laned(renderer.packed, params,
                                                tile)),
                      f"laned sum (tile {tile})")
            except Exception as e:
                print(f"tile {tile}: FAILED {str(e)[:120]}", flush=True)

    # progressive batch K=1 (prog_tile block, S=1 packing)
    pfn = renderer.make_progressive_fn(statics, 1, reduce_sum=True)
    if pfn is not None:
        np.asarray(pfn(params))
        timed(lambda: np.asarray(pfn(params)), "progressive K=1")
    # K=8: amortization slope
    pfn8 = renderer.make_progressive_fn(statics, 8, reduce_sum=True)
    if pfn8 is not None:
        np.asarray(pfn8(params))
        t8 = timed(lambda: np.asarray(pfn8(params)), "progressive K=8")
        print(f"  -> K=8 amortized {t8 / 8:.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
