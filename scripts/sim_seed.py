#!/usr/bin/env python
"""Simulator experiment: shadow-walk OCCLUDER SEEDING.

Shadow rays from adjacent packets share occluders (same light, nearby
origins).  Before each any-hit walk, test the leaf that retired the
most lanes in the PREVIOUS packet of the same phase: retired lanes
shrink the walk union from step 0, so the whole walk can end early.
Output-preserving (any-hit results are order-independent); the kernel
analog is one SMEM scratch scalar persisting across grid steps plus a
per-leaf retirement argmax (a ~150 ns any-reduce per leaf visit).

Caveat: --stride 8 simulates every 8th packet, so "previous packet"
is 8 blocks away — the production (stride-1) coherence is HIGHER, so
a win here underestimates the real one.

Usage: python scripts/sim_seed.py [--scene terrain|bunny] [--stride 8]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="terrain", choices=["terrain", "bunny"])
    ap.add_argument("--tris", type=int, default=69000)
    ap.add_argument("--stride", type=int, default=8)
    ap.add_argument("--tile", type=int, default=4096)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from shader_ray_tpu.config import get_config
    from shader_ray_tpu.models.fixtures import bunny_class_scene, terrain_scene
    from shader_ray_tpu.models.quality import simulate_frame
    from shader_ray_tpu.models.triangle_set import TriangleSet
    from shader_ray_tpu.models.world import get_shader_data, make_world
    from shader_ray_tpu.utils import mat4
    from shader_ray_tpu.utils.cache import cached_scene_data

    cfg = get_config()
    gen, stem, extent, light = (
        (terrain_scene, "bench-terrain", 2.9,
         np.array([0.78, 0.5, 0.37], np.float32))
        if args.scene == "terrain"
        else (bunny_class_scene, "bench-bunny-class", 2.6,
              np.array([0.0, 0.0, 1.0], np.float32))
    )
    key = f"{stem}-{args.tris // 1000}k-l{cfg.bvh_leaf_max}-d{cfg.bvh_max_depth}"

    def builder():
        pos, _ = gen(args.tris)
        return get_shader_data(make_world(TriangleSet.from_arrays(pos)))

    data = cached_scene_data(key, builder, verbose=True)
    fov = np.deg2rad(40.0)
    zoom = extent / 2.0 / np.sin(fov / 2.0)
    cam = mat4.make_translation(0.0, 0.0, zoom).astype(np.float32)

    results = {}
    for seed in ("", "best", "last"):
        t0 = time.time()
        res = simulate_frame(
            data, cam_matrix=cam, tile=args.tile,
            light_dir=light / np.linalg.norm(light),
            tile_stride=args.stride, anyhit_seed=seed,
        )
        sh = [p for p in res.phases if p.name.startswith("shadow")]
        line = {
            "variant": f"seed-{seed}" if seed else "base",
            "scene": args.scene,
            "shadow_steps_per_pkt": round(sum(p.steps_per_pkt for p in sh), 1),
            "shadow_leafs_per_pkt": round(sum(p.leafs_per_pkt for p in sh), 1),
            "shadow_slot_tests": sum(p.slot_tests for p in sh),
            "total_steps_per_pkt": round(res.total_steps_per_pkt, 1),
            "total_leafs_per_pkt": round(res.total_leafs_per_pkt, 1),
        }
        base = results.get("base")
        if seed and base is not None:
            line["shadow_steps_vs_base"] = round(
                line["shadow_steps_per_pkt"]
                / max(base["shadow_steps_per_pkt"], 1e-9), 3,
            )
            line["shadow_leafs_vs_base"] = round(
                line["shadow_leafs_per_pkt"]
                / max(base["shadow_leafs_per_pkt"], 1e-9), 3,
            )
        results[line["variant"]] = line
        print(json.dumps(line), flush=True)
        print(f"  ({time.time() - t0:.1f}s)", file=sys.stderr)


if __name__ == "__main__":
    main()
