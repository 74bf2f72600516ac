#!/usr/bin/env python
"""Re-establish and PERSIST the 2M-triangle tier's tune (round 13).

The round-12 host's local tune for the 2M scene was never committed,
so a fresh host runs the 2M progressive batch at shipped defaults —
which crashes the TPU worker (kernel fault at {S=2 @ 2048, hbm,
pops 4}; see CLAUDE.md round 13).  This script times the documented
round-12 winner {1024@8, pops 2} (leaf_mode forced dma2 by the hbm
tier) with the bench methodology and persists it in the standard tune
format (cache dir + committed tunes/ with SRT_TUNE_REPO=1), so
BENCH_TRIS=2000000 applies it automatically.

Usage: SRT_TUNE_REPO=1 python scripts/r13_2m_tune.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench  # noqa: E402

KNOBS = {"jitter_pack": 1024, "prog_tile": 8, "leaf_scan": "ctz",
         "walk_pops": 2, "leaf_mode": "dma2"}


def main() -> None:
    bench._wait_for_backend()
    import jax.numpy as jnp

    from shader_ray_tpu.engine import Renderer
    from shader_ray_tpu.ops.render import RenderStatics, default_frame_params
    from shader_ray_tpu.utils import mat4
    from shader_ray_tpu.utils.autotune import (
        DEFAULT_SPACE,
        _apply,
        _space_key,
        _statics_tag,
        _tune_path,
        _repo_tune_path,
    )

    data, env, key = bench.build_scene_data(2_000_000)
    r = Renderer(data, env)
    _apply(r.cfg, KNOBS)
    statics = RenderStatics.from_config(width=1024, height=768,
                                        tile_size=65536)
    fov = np.deg2rad(40.0)
    zoom = 2.6 / 2.0 / np.sin(fov / 2.0)
    cam = mat4.make_translation(0.0, 0.0, zoom).astype(np.float32)
    params = default_frame_params(fov=fov)._replace(
        camera_matrix=jnp.asarray(cam),
        diffuse_color=jnp.asarray(np.array([0.8, 0.2, 0.2], np.float32)),
        specular_color=jnp.asarray(np.array([0.05, 0.05, 0.05], np.float32)),
    )
    pfn = r.make_progressive_fn(statics, 1024, reduce_sum=True)
    np.asarray(pfn(params))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(pfn(params))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) / 1024 * 1e3
    mrays = 1024 * 768 * 6 / (ms / 1e3) / 1e6
    print(f"2M @ {KNOBS}: {ms:.2f} ms amortized = {mrays:.1f} Mrays/s "
          f"potential", flush=True)

    h = _space_key(statics, 1024, DEFAULT_SPACE)
    payload = {"best": KNOBS, "samples": 1024, "ts": time.time(),
               "results_ms": {json.dumps(KNOBS, sort_keys=True): ms},
               "statics_tag": _statics_tag(statics)}
    paths = [_tune_path(key, h)]
    rp = _repo_tune_path(key, h)
    if rp:
        paths.append(rp)
    for p in paths:
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"persisted {p}", flush=True)


if __name__ == "__main__":
    main()
