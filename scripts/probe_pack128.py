#!/usr/bin/env python
"""On-TPU probe: is 128-deep jitter packing past the 64-deep frontier?

Every autotune so far has won at the EDGE of the packing space
(8 -> 32 -> 64 deep, see tunes/); 128-deep was never representable
because the bench batch is 64 (render_progressive_packet requires
K % S == 0).  This probes the bunny headline at batch K=128:

  A: S=64  @ prog_tile 128 (control: does K=128 alone move 9.37 ms?)
  B: S=128 @ prog_tile 128 (16384-lane tiles, C=2048 per fold row —
     r5 saw register pressure kill C=2048 at S=4, but the r8 frontier
     keeps rewarding depth; measure, don't assume)

Committed bunny winners otherwise (leaf_scan ctz, pops 2, scalar).
No tune-space edit: custom-config Renderers only.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench  # noqa: E402


def main() -> None:
    bench._wait_for_backend()
    import jax.numpy as jnp

    from shader_ray_tpu.config import get_config
    from shader_ray_tpu.engine import Renderer
    from shader_ray_tpu.ops.render import RenderStatics, default_frame_params
    from shader_ray_tpu.utils import mat4

    data, env, _ = bench.build_scene_data()
    statics = RenderStatics.from_config(
        width=bench.WIDTH, height=bench.HEIGHT,
        tile_size=int(os.environ.get("BENCH_TILE", "65536")),
    )
    # identical framing/materials to bench's headline (bench.py:262-271)
    fov = np.deg2rad(40.0)
    zoom = 2.6 / 2.0 / np.sin(fov / 2.0)
    cam = mat4.make_translation(0.0, 0.0, zoom).astype(np.float32)
    params = default_frame_params(fov=fov)._replace(
        camera_matrix=jnp.asarray(cam),
        diffuse_color=jnp.asarray(np.array([0.8, 0.2, 0.2], np.float32)),
        specular_color=jnp.asarray(np.array([0.05, 0.05, 0.05], np.float32)),
    )

    K = int(os.environ.get("PROBE_BATCH", "128"))
    combos = [
        tuple(int(v) for v in c.split(":"))
        for c in os.environ.get("PROBE_CONFIGS", "64:128,128:128").split(",")
    ]
    for s, tile in combos:
        cfg = dataclasses.replace(
            get_config(), jitter_pack=s, prog_tile=tile,
            leaf_scan="ctz", walk_pops=2, leaf_mode="scalar",
        )
        r = Renderer(data, env, config=cfg)
        try:
            pfn = r.make_progressive_fn(statics, K, reduce_sum=True)
            np.asarray(pfn(params))  # compile + warm
            ts = []
            for _ in range(bench.FRAMES):
                t0 = time.perf_counter()
                np.asarray(pfn(params))
                ts.append(time.perf_counter() - t0)
            ms = float(np.median(ts)) / K * 1e3
            rays = bench.WIDTH * bench.HEIGHT * 6
            print(f"S={s} tile={tile} @ K={K}: {ms:.2f} ms amortized "
                  f"({rays / ms / 1e3:.1f} Mrays/s potential)", flush=True)
        except Exception as e:
            print(f"S={s} tile={tile} @ K={K}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
