#!/usr/bin/env python
"""Simulator experiment: occlusion-walk visit ORDER.

The production kernel walks any-hit (shadow) phases with the same
near-to-far child ordering as closest-hit walks.  For occlusion the
optimal order is "most likely occluder first": any accepted hit
retires the lane, so ordering by triangle density should retire lanes
(and whole packets) sooner.  This script A/Bs the host simulator's
shadow phases under leaf_order="near" (production) vs "count"
(densest leaf first + densest subtree popped first) on the bench
scenes.

If "count" wins materially, the production change is a second
per-octant child-order table in pack_wide (density-sorted) selected by
the walker's any_hit flag — ~3 bits x 8 x Nw extra SMEM — then an
on-chip A/B.

Usage: python scripts/sim_anyhit.py [--scene terrain|bunny] [--stride 8]
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
    gen, stem, extent = (
        (terrain_scene, "bench-terrain", 2.9)
        if args.scene == "terrain"
        else (bunny_class_scene, "bench-bunny-class", 2.6)
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
    for order in ("near", "count"):
        t0 = time.time()
        res = simulate_frame(
            data, cam_matrix=cam, tile=args.tile,
            tile_stride=args.stride, anyhit_leaf_order=order,
        )
        sh = [p for p in res.phases if p.name.startswith("shadow")]
        line = {
            "variant": order,
            "scene": args.scene,
            "shadow_steps_per_pkt": round(sum(p.steps_per_pkt for p in sh), 1),
            "shadow_leafs_per_pkt": round(sum(p.leafs_per_pkt for p in sh), 1),
            "shadow_slot_tests": sum(p.slot_tests for p in sh),
            "total_steps_per_pkt": round(res.total_steps_per_pkt, 1),
            "total_leafs_per_pkt": round(res.total_leafs_per_pkt, 1),
        }
        base = results.get("near")
        if order != "near" and base is not None:
            line["shadow_steps_vs_near"] = round(
                line["shadow_steps_per_pkt"]
                / max(base["shadow_steps_per_pkt"], 1e-9), 3,
            )
            line["shadow_leafs_vs_near"] = round(
                line["shadow_leafs_per_pkt"]
                / max(base["shadow_leafs_per_pkt"], 1e-9), 3,
            )
        results[order] = line
        print(json.dumps(line))
        print(f"  ({time.time() - t0:.1f}s)", file=sys.stderr)


if __name__ == "__main__":
    main()
