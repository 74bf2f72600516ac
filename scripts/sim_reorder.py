#!/usr/bin/env python
"""Simulator experiment: does reordering bounce rays pay on DIVERGENT
scenes?

Round-2 ruled out ray reordering BY ON-CHIP MEASUREMENT on the
bunny-class scene (every variant neutral-or-worse: pixel-block layout
is already near-optimal for coherent work).  The occluded-terrain
scene landed later and is union-divergence-bound (~2084 steps +
4070 leafs/pkt, round-4 stats) — this experiment re-tests the idea
there, in the host simulator, before spending chip time.

Method: trace bounce0 per pixel-tile (as production does), collect the
reflected bounce-1 ray population over a sampled tile set, then walk
bounce1 under several packings of the SAME ray population:
  - baseline: original pixel-tile packing
  - octant:   stable sort by direction-sign octant
  - octant+o: sort by (octant, hit-point morton code) — spatial+dir
Totals (steps, leaf visits) over the population are the comparison;
fewer = smaller per-packet traversal unions.

If a variant wins big here, the production experiment is to unfuse the
megakernel for divergent scenes (reordering needs XLA ops between
pallas calls — in-kernel permutes have no gather on this target) and
re-measure on chip; the ~10-15 ms refusing overhead (round-3 numbers)
is the price to beat.

Usage: python scripts/sim_reorder.py [--scene terrain] [--stride 8]
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


def morton3(p: np.ndarray, bits: int = 8) -> np.ndarray:
    """Interleave-free coarse morton proxy: quantized coords weighted
    so nearby points share high bits (exact bit-interleave not needed
    for a sort key experiment)."""
    q = p - p.min(axis=0)
    q = q / np.maximum(q.max(axis=0), 1e-20)
    g = (q * (2**bits - 1)).astype(np.int64)
    key = np.zeros(len(p), np.int64)
    for b in range(bits - 1, -1, -1):
        for d in range(3):
            key = (key << 1) | ((g[:, d] >> b) & 1)
    return key


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
    from shader_ray_tpu.models.quality import (
        WalkStats,
        _camera_rays,
        build_wide_tree,
        simulate_packet_walk,
    )
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
    wt = build_wide_tree(data, cfg)
    normals = np.asarray(data.tri_normals, np.float32)

    fov = np.deg2rad(40.0)
    zoom = extent / 2.0 / np.sin(fov / 2.0)
    cam = mat4.make_translation(0.0, 0.0, zoom).astype(np.float32)
    P_all, D_all = _camera_rays(1024, 768, fov, cam)
    n_rays = P_all.shape[0]
    tile = args.tile
    n_tiles = (n_rays + tile - 1) // tile

    # ---- bounce0 per pixel tile (production layout), collect bounce1
    b1_P, b1_D = [], []
    t0 = time.time()
    for ti in range(0, n_tiles, args.stride):
        sl = slice(ti * tile, min((ti + 1) * tile, n_rays))
        P = P_all[sl]
        D = D_all[sl]
        st = WalkStats()
        t, which, uu, vv, hit = simulate_packet_walk(
            data, wt, P, D, pops=cfg.walk_pops or 4,
            max_leaf_tests=cfg.max_leaf_tests, stats=st,
        )
        w = np.maximum(which, 0)
        n = (
            (1.0 - uu - vv)[:, None] * normals[w, 0:3]
            + uu[:, None] * normals[w, 3:6]
            + vv[:, None] * normals[w, 6:9]
        )
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
        dn = (D * n).sum(-1)
        n = np.where((dn > 0.0)[:, None], -n, n)
        dn = (D * n).sum(-1)
        hp = P + t[:, None] * D
        b1_P.append((hp + n * 1e-4)[hit])
        b1_D.append((D - 2.0 * dn[:, None] * n)[hit])
    b1_P = np.concatenate(b1_P)
    b1_D = np.concatenate(b1_D)
    print(
        f"bounce0 done ({time.time() - t0:.1f}s); bounce1 rays: {len(b1_P)}",
        file=sys.stderr,
    )

    octant = (
        (b1_D[:, 0] < 0).astype(np.int64)
        | ((b1_D[:, 1] < 0).astype(np.int64) << 1)
        | ((b1_D[:, 2] < 0).astype(np.int64) << 2)
    )
    orders = {
        "baseline": np.arange(len(b1_P)),
        "octant": np.argsort(octant, kind="stable"),
        "octant+morton": np.lexsort((morton3(b1_P), octant)),
    }

    results = {}
    for name, order in orders.items():
        P = b1_P[order]
        D = b1_D[order]
        st = WalkStats()
        t0 = time.time()
        packets = 0
        for s in range(0, len(P), tile):
            simulate_packet_walk(
                data, wt, P[s : s + tile], D[s : s + tile],
                pops=cfg.walk_pops or 4,
                max_leaf_tests=cfg.max_leaf_tests, stats=st,
            )
            packets += 1
        results[name] = st
        line = {
            "variant": name,
            "scene": args.scene,
            "steps_total": st.steps,
            "leafs_total": st.leaf_visits,
            "steps_per_pkt": round(st.steps / packets, 1),
            "leafs_per_pkt": round(st.leaf_visits / packets, 1),
        }
        base = results.get("baseline")
        if name != "baseline" and base is not None:
            line["steps_vs_baseline"] = round(st.steps / max(base.steps, 1), 3)
            line["leafs_vs_baseline"] = round(
                st.leaf_visits / max(base.leaf_visits, 1), 3
            )
        print(json.dumps(line))
        print(f"  ({time.time() - t0:.1f}s)", file=sys.stderr)


if __name__ == "__main__":
    main()
