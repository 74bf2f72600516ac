#!/usr/bin/env python
"""On-TPU packing-frontier probe, generalized (round 12 / driver r4).

VERDICT r3 next-#1: the 256-deep jitter-packing candidate "failed to
compile (VMEM)" in the round-9 probe and was never retried after a
megakernel VMEM diet.  This probe reproduces any (jitter_pack S,
prog_tile block) candidate on EITHER bench scene with the scene's
committed winner knobs, printing the full compile error when one
fails — the diagnosis the round-9 note never captured.

Env:
  PROBE_SCENE    bunny | terrain          (default bunny)
  PROBE_BATCH    progressive batch K      (default 256)
  PROBE_CONFIGS  comma list "S:block"     (default "256:64")
  PROBE_KNOBS    json dict of extra Config knobs
                 (default: the scene's committed winner knobs)
  PROBE_ERRLEN   chars of error text      (default 2000)
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench  # noqa: E402

WINNERS = {
    # committed round-10 winners (tunes/*-83bba7239708.json)
    "bunny": {"leaf_scan": "ctz", "walk_pops": 2, "leaf_mode": "dma2"},
    "terrain": {"leaf_scan": "", "walk_pops": 4, "leaf_mode": "dma2"},
}


def main() -> None:
    bench._wait_for_backend()
    import jax.numpy as jnp

    from shader_ray_tpu.config import get_config
    from shader_ray_tpu.engine import Renderer
    from shader_ray_tpu.models.fixtures import (
        bunny_class_scene,
        procedural_sky,
        terrain_scene,
    )
    from shader_ray_tpu.models.triangle_set import TriangleSet
    from shader_ray_tpu.models.world import get_shader_data, make_world
    from shader_ray_tpu.ops.render import RenderStatics, default_frame_params
    from shader_ray_tpu.utils import mat4
    from shader_ray_tpu.utils.cache import cached_scene_data

    scene = os.environ.get("PROBE_SCENE", "bunny")
    fov = np.deg2rad(40.0)
    if scene == "terrain":
        tris = int(os.environ.get("BENCH_TRIS", "69000"))
        cfg0 = get_config()
        key = (f"bench-terrain-{tris // 1000}k"
               f"-l{cfg0.bvh_leaf_max}-d{cfg0.bvh_max_depth}")
        data = cached_scene_data(
            key,
            lambda: get_shader_data(
                make_world(TriangleSet.from_arrays(terrain_scene(tris)[0]))
            ),
            verbose=True,
        )
        env = procedural_sky(2048)
        light = np.array([0.78, 0.5, 0.37], np.float32)
        light /= np.linalg.norm(light)
        zoom = 2.9 / 2.0 / np.sin(fov / 2.0)
        cam = mat4.make_translation(0.0, 0.0, zoom).astype(np.float32)
        params = default_frame_params(fov=fov)._replace(
            camera_matrix=jnp.asarray(cam),
            light_dir=jnp.asarray(light),
            diffuse_color=jnp.asarray(np.array([0.7, 0.6, 0.45], np.float32)),
            specular_color=jnp.asarray(
                np.array([0.04, 0.04, 0.04], np.float32)),
        )
    else:
        data, env, _ = bench.build_scene_data()
        zoom = 2.6 / 2.0 / np.sin(fov / 2.0)
        cam = mat4.make_translation(0.0, 0.0, zoom).astype(np.float32)
        params = default_frame_params(fov=fov)._replace(
            camera_matrix=jnp.asarray(cam),
            diffuse_color=jnp.asarray(np.array([0.8, 0.2, 0.2], np.float32)),
            specular_color=jnp.asarray(
                np.array([0.05, 0.05, 0.05], np.float32)),
        )

    statics = RenderStatics.from_config(
        width=bench.WIDTH, height=bench.HEIGHT,
        tile_size=int(os.environ.get("BENCH_TILE", "65536")),
        which=int(os.environ.get("BENCH_WHICH", "0")),
    )
    knobs = dict(WINNERS.get(scene, {}))
    knobs.update(json.loads(os.environ.get("PROBE_KNOBS", "{}")))

    K = int(os.environ.get("PROBE_BATCH", "256"))
    errlen = int(os.environ.get("PROBE_ERRLEN", "2000"))
    combos = [
        tuple(int(v) for v in c.split(":"))
        for c in os.environ.get("PROBE_CONFIGS", "256:64").split(",")
    ]
    rays = bench.WIDTH * bench.HEIGHT * 6
    for s, tile in combos:
        cfg = dataclasses.replace(
            get_config(), jitter_pack=s, prog_tile=tile, **knobs
        )
        r = Renderer(data, env, config=cfg)
        label = f"{scene} S={s} block={tile} K={K} {knobs}"
        try:
            t0 = time.perf_counter()
            pfn = r.make_progressive_fn(statics, K, reduce_sum=True)
            np.asarray(pfn(params))  # compile + warm
            print(f"{label}: compiled in {time.perf_counter() - t0:.1f}s",
                  flush=True)
            ts = []
            for _ in range(bench.FRAMES):
                t0 = time.perf_counter()
                np.asarray(pfn(params))
                ts.append(time.perf_counter() - t0)
            ms = float(np.median(ts)) / K * 1e3
            print(f"{label}: {ms:.3f} ms amortized "
                  f"({rays / ms / 1e3:.1f} Mrays/s potential)", flush=True)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:errlen]}",
                  flush=True)


if __name__ == "__main__":
    main()
