#!/usr/bin/env python
"""Deep-packing frontier A/B on the live chip (round 8b).

The round-8 tune's winner (32-deep jitter packing @ 256-pixel blocks,
8192-lane tiles) again sits at the EDGE of the searched space, and the
sweep data shows the 512-pixel block never lost at any tested pack
depth — yet 32@512 (16384 lanes) was never measured.  64-deep packing
needs a 64-sample progressive batch (pack must divide the batch), so
those candidates time against a K=64 re-baseline, not the K=32 tune.

Run AFTER scripts/r8_retune.sh finishes (one chip; interleaved
dispatches corrupt timings).  Prints one JSON line per candidate; on a
win, extend autotune.DEFAULT_SPACE (and bench BATCH if K=64 pays) and
re-tune — the space hash changes, so committed tunes must be
re-persisted.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from shader_ray_tpu.engine import Renderer  # noqa: E402
from shader_ray_tpu.ops.render import (  # noqa: E402
    RenderStatics,
    default_frame_params,
)
from shader_ray_tpu.utils import mat4  # noqa: E402
from shader_ray_tpu.utils.autotune import _apply, _time_candidate  # noqa: E402

# (knobs, progressive batch K) — K=32 entries compare against the
# round-8 tuned 10.13 ms; K=64 entries against their own 32@256 re-base
CANDIDATES: list[tuple[dict, int]] = [
    ({"jitter_pack": 32, "prog_tile": 512}, 32),
    ({"jitter_pack": 32, "prog_tile": 256}, 64),
    ({"jitter_pack": 64, "prog_tile": 256}, 64),
    ({"jitter_pack": 64, "prog_tile": 128}, 64),
    ({"jitter_pack": 64, "prog_tile": 512}, 64),
]


def main() -> None:
    tris = int(os.environ.get("BENCH_TRIS", "69000"))
    data, env, key = bench.build_scene_data(tris)
    renderer = Renderer(data, env)
    statics = RenderStatics.from_config(
        width=bench.WIDTH, height=bench.HEIGHT, tile_size=65536
    )
    import jax.numpy as jnp

    fov = np.deg2rad(40.0)
    zoom = 2.6 / 2.0 / np.sin(fov / 2.0)
    params = default_frame_params(fov=fov)._replace(
        camera_matrix=jnp.asarray(
            mat4.make_translation(0.0, 0.0, zoom).astype(np.float32)
        ),
        diffuse_color=jnp.asarray(np.array([0.8, 0.2, 0.2], np.float32)),
        specular_color=jnp.asarray(np.array([0.05, 0.05, 0.05], np.float32)),
    )
    # start from the round-8 tuned base so only pack/block/K vary
    base = renderer.cfg
    base.walk_pops = 2
    base.leaf_mode = "scalar"
    base.leaf_scan = ""
    for knobs, samples in CANDIDATES:
        try:
            t = _time_candidate(
                renderer, _apply(base, knobs), statics, params,
                samples, frames=3,
            )
            print(json.dumps({"knobs": knobs, "samples": samples,
                              "ms_per_frame": round(t * 1e3, 3)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"knobs": knobs, "samples": samples,
                              "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
