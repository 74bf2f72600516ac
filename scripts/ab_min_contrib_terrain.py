#!/usr/bin/env python
"""On-TPU error + timing A/B for SRT_MIN_CONTRIB on the OCCLUDED
TERRAIN bench scene (the case the cutoff was designed for and the one
scene it was never measured on: F0=0.04 dielectric specular means the
bounce-2 Schlick modulation is ~F0^2 = 0.0016 < 0.003, so a 0.003
cutoff retires the grazing-reflection bounce-2 lanes that dominate
terrain's frame time — see CLAUDE.md round-4/5 stats).

Mirrors bench.bench_occluded's exact scene/camera/light/materials and
the committed tune, so the timing delta reads directly against the
bench occluded sub-metric.  Device-side error scalars only (tunnel
D2H would dominate a frame fetch).

Usage: python scripts/ab_min_contrib_terrain.py [thresh ...]
       (default 0.003 0.01)
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench  # noqa: E402


def main() -> None:
    thresholds = [float(a) for a in sys.argv[1:]] or [0.003, 0.01]

    bench._wait_for_backend()
    import jax.numpy as jnp

    from shader_ray_tpu.config import get_config
    from shader_ray_tpu.engine import Renderer
    from shader_ray_tpu.models.fixtures import procedural_sky, terrain_scene
    from shader_ray_tpu.models.triangle_set import TriangleSet
    from shader_ray_tpu.models.world import get_shader_data, make_world
    from shader_ray_tpu.ops.render import RenderStatics, default_frame_params
    from shader_ray_tpu.utils import mat4
    from shader_ray_tpu.utils.cache import cached_scene_data

    tris = int(os.environ.get("BENCH_TRIS", "69000"))

    def builder():
        pos, _ = terrain_scene(tris)
        return get_shader_data(make_world(TriangleSet.from_arrays(pos)))

    cfg0 = get_config()
    key = (
        f"bench-terrain-{tris // 1000}k"
        f"-l{cfg0.bvh_leaf_max}-d{cfg0.bvh_max_depth}"
    )
    data = cached_scene_data(key, builder, verbose=True)
    env = procedural_sky(2048)

    statics = RenderStatics.from_config(
        width=bench.WIDTH, height=bench.HEIGHT,
        tile_size=int(os.environ.get("BENCH_TILE", "65536")),
    )
    fov = 40.0 * np.pi / 180.0
    light = np.array([0.78, 0.5, 0.37], np.float32)
    light /= np.linalg.norm(light)
    zoom = 2.9 / 2.0 / np.sin(fov / 2.0)
    cam = mat4.make_translation(0.0, 0.0, zoom).astype(np.float32)
    params = default_frame_params(fov=fov)._replace(
        camera_matrix=jnp.asarray(cam),
        light_dir=jnp.asarray(light),
        diffuse_color=jnp.asarray(np.array([0.7, 0.6, 0.45], np.float32)),
        specular_color=jnp.asarray(np.array([0.04, 0.04, 0.04], np.float32)),
    )

    def make(min_contrib: float) -> Renderer:
        cfg = dataclasses.replace(get_config(), min_contrib=min_contrib)
        r = Renderer(data, env, config=cfg)
        bench._maybe_tune(r, statics, params, key)
        return r

    def timed_ms(r: Renderer) -> float:
        pfn = r.make_progressive_fn(statics, bench.BATCH, reduce_sum=True)
        np.asarray(pfn(params))  # compile + warm
        bt = []
        for _ in range(bench.FRAMES):
            t0 = time.perf_counter()
            np.asarray(pfn(params))
            bt.append(time.perf_counter() - t0)
        return float(np.median(bt)) / bench.BATCH * 1e3

    exact = make(0.0)
    ref_img = exact.make_fn(statics)(params)
    t_exact = timed_ms(exact)
    print(f"exact (min_contrib=0): {t_exact:.2f} ms amortized "
          f"over batch={bench.BATCH}", flush=True)

    for thresh in thresholds:
        r = make(thresh)
        img = r.make_fn(statics)(params)
        err = jnp.abs(img - ref_img)
        max_err = float(np.asarray(jnp.max(err)))
        mean_err = float(np.asarray(jnp.mean(err)))
        npix = float(np.asarray(
            jnp.sum((jnp.max(err, axis=-1) > 0.0).astype(jnp.int32))))
        t = timed_ms(r)
        print(
            f"min_contrib={thresh}: {t:.2f} ms ({t / t_exact * 100:.1f}% "
            f"of exact)  max_abs_err={max_err:.5f} mean={mean_err:.2e} "
            f"pixels_changed={npix:.0f}", flush=True)


if __name__ == "__main__":
    main()
