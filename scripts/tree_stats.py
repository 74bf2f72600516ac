#!/usr/bin/env python
"""Host-side tree-quality A/B: object splits vs SBVH on the bench scenes.

Runs the numpy packet-walk simulator (models/quality.py) over the same
scenes, camera framings, and light directions bench.py measures, for
each requested SRT_SPLITS value, and prints per-phase walk steps and
leaf visits per packet.  Steps x leaf-visits is the product that
dominates on-chip frame time (CLAUDE.md anatomy), so this predicts —
without TPU access — whether a tree-build change is worth on-chip
bench time.  Scene builds share bench.py's cache keys, so any SBVH
scene built here is a warm cache hit for the later on-chip run.

Usage:
  python scripts/tree_stats.py [--scenes bunny,terrain] [--tris 69000]
                               [--stride 8] [--splits object,sbvh]

Runs entirely on the CPU backend (forced before jax import).
"""

import argparse
import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="bunny,terrain")
    ap.add_argument("--tris", type=int, default=69000)
    ap.add_argument("--stride", type=int, default=8,
                    help="simulate every k-th 4096-ray packet")
    ap.add_argument("--splits", "--variants", dest="splits",
                    default="object,sbvh",
                    help="comma list of variants: SPLITS[+BVH_OPT], e.g. "
                         "'object,object+reinsert,sbvh+reinsert'")
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

    fov = np.deg2rad(40.0)
    scene_specs = {
        # (generator, cache-key stem, camera extent, light dir) — the
        # exact framings bench.py measures (bench.main / bench_occluded)
        "bunny": (bunny_class_scene, "bench-bunny-class", 2.6,
                  np.array([0.0, 0.0, 1.0], np.float32)),
        "terrain": (terrain_scene, "bench-terrain", 2.9,
                    np.array([0.78, 0.5, 0.37], np.float32)),
    }

    for scene in args.scenes.split(","):
        gen, stem, extent, light = scene_specs[scene.strip()]
        results = {}
        for variant in args.splits.split(","):
            variant = variant.strip()
            splits, _, opt = variant.partition("+")
            cfg = dataclasses.replace(get_config(), splits=splits, bvh_opt=opt)
            key = (
                f"{stem}-{args.tris // 1000}k"
                f"-l{cfg.bvh_leaf_max}-d{cfg.bvh_max_depth}"
                + (f"-{splits}" if splits != "object" else "")
                + (f"-opt{opt}" if opt else "")
            )

            def builder():
                pos, _ = gen(args.tris)
                return get_shader_data(
                    make_world(TriangleSet.from_arrays(pos), config=cfg),
                    config=cfg,
                )

            data = cached_scene_data(key, builder, verbose=True)
            zoom = extent / 2.0 / np.sin(fov / 2.0)
            cam = mat4.make_translation(0.0, 0.0, zoom).astype(np.float32)
            print(
                f"== {scene} / splits={splits}: {data.triangle_count} refs,"
                f" {data.group_count} nodes",
                file=sys.stderr,
            )
            t0 = time.time()
            res = simulate_frame(
                data, width=1024, height=768, fov=fov, cam_matrix=cam,
                light_dir=light / np.linalg.norm(light),
                tile=args.tile, tile_stride=args.stride, config=cfg,
            )
            res.print()
            print(f"  ({time.time() - t0:.1f}s simulated)", file=sys.stderr)
            results[variant] = res
        base = args.splits.split(",")[0].strip()
        for variant, res in results.items():
            line = {
                "scene": scene,
                "splits": variant,
                "steps_per_pkt": round(res.total_steps_per_pkt, 1),
                "leafs_per_pkt": round(res.total_leafs_per_pkt, 1),
            }
            if variant != base and base in results:
                b = results[base]
                line["steps_vs_" + base] = round(
                    res.total_steps_per_pkt / max(b.total_steps_per_pkt, 1e-9), 3
                )
                line["leafs_vs_" + base] = round(
                    res.total_leafs_per_pkt / max(b.total_leafs_per_pkt, 1e-9), 3
                )
            print(json.dumps(line))


if __name__ == "__main__":
    main()
