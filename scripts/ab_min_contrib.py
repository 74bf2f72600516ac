#!/usr/bin/env python
"""On-TPU error A/B for the SRT_MIN_CONTRIB throughput cutoff.

Renders the bench scene (bench.build_scene_data, same camera/material
as bench.py's headline) once with min_contrib=0 (reference-exact) and
once per candidate threshold, and prints the DEVICE-SIDE max/mean
absolute pixel error of each candidate against exact — scalars are the
only thing fetched (the axon tunnel's ~25 MB/s D2H would dominate a
full-frame fetch; see CLAUDE.md).

The cutoff's error bound is per-pixel <= mod_max * |env(reflected) -
traced radiance| at retirement, so max-error is expected O(thresh).
The frame-time win is measured separately by bench.py with
SRT_MIN_CONTRIB set (scripts/r7_measure.sh runs both).

Usage: python scripts/ab_min_contrib.py [thresh ...]   (default 0.003 0.01)
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench  # noqa: E402  (repo-root bench.py: scene builder + camera)


def main() -> None:
    thresholds = [float(a) for a in sys.argv[1:]] or [0.003, 0.01]

    bench._wait_for_backend()
    import jax
    import jax.numpy as jnp

    from shader_ray_tpu.config import get_config
    from shader_ray_tpu.engine import Renderer
    from shader_ray_tpu.ops.render import RenderStatics, default_frame_params
    from shader_ray_tpu.utils import mat4

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    data, env, scene_key = bench.build_scene_data()
    statics = RenderStatics(
        width=bench.WIDTH, height=bench.HEIGHT, tile_size=65536,
        cast_shadows=True, bounce_count=3, which=0,
    )
    fov = np.deg2rad(40.0)
    zoom = 2.6 / 2.0 / np.sin(fov / 2.0)
    cam = mat4.make_translation(0.0, 0.0, zoom).astype(np.float32)
    params = default_frame_params(fov=fov)._replace(
        camera_matrix=jnp.asarray(cam),
        diffuse_color=jnp.asarray(np.array([0.8, 0.2, 0.2], np.float32)),
        specular_color=jnp.asarray(np.array([0.05, 0.05, 0.05], np.float32)),
    )

    base_cfg = dataclasses.replace(get_config(), min_contrib=0.0)
    ref_img = Renderer(data, env, config=base_cfg).make_fn(statics)(params)
    ref_max = float(np.asarray(jnp.max(ref_img)))
    print(f"exact frame max radiance: {ref_max:.4f}", file=sys.stderr)

    for thresh in thresholds:
        cfg = dataclasses.replace(base_cfg, min_contrib=thresh)
        img = Renderer(data, env, config=cfg).make_fn(statics)(params)
        d = jnp.abs(img - ref_img)
        mx = float(np.asarray(jnp.max(d)))
        mean = float(np.asarray(jnp.mean(d)))
        nz = int(np.asarray(jnp.sum(jnp.any(d > 1e-6, axis=-1))))
        print(
            f'{{"min_contrib": {thresh}, "max_abs_err": {mx:.6f}, '
            f'"mean_abs_err": {mean:.8f}, "pixels_changed": {nz}}}'
        )


if __name__ == "__main__":
    main()
