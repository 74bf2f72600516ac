#!/usr/bin/env python
"""On-chip validation of the HBM leaf tier's hit-id tracking and
which=1 at the 2M-triangle scale (VERDICT r4 #4).

1. Mid-size (69k bunny): pack the SAME scene with leaf_src=vmem and
   leaf_src=hbm, trace 1024 rays through the UNFUSED wide walker on
   the real chip — t and which must match bit-exactly (the hbm tier's
   tribase comes from the leaf group's spare lane via tb_from_buf,
   never the SMEM table).
2. 2M triangles (the flagship HBM-tier scene): unfused trace returns
   real hit ids; which=1 (textureGrad) and which=0 fused frames render
   finite, timed.

Usage: python scripts/r13_hbm_which.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench  # noqa: E402


def main() -> None:
    bench._wait_for_backend()
    import jax.numpy as jnp

    from shader_ray_tpu.engine import Renderer
    from shader_ray_tpu.models.fixtures import procedural_sky
    from shader_ray_tpu.ops.pallas.pack_wide import pack_scene_wide
    from shader_ray_tpu.ops.pallas.packet_wide import packet_trace_wide
    from shader_ray_tpu.ops.render import RenderStatics, default_frame_params
    from shader_ray_tpu.utils import mat4

    rng = np.random.default_rng(5)
    P = (rng.normal(size=(1024, 3)) * 0.1 + [0, 0, 3]).astype(np.float32)
    D = ([0, 0, -1.0] + 0.3 * rng.normal(size=(1024, 3))).astype(np.float32)

    # --- 1. mid-size bit parity on-chip ---
    data, env, _ = bench.build_scene_data()
    env_small = procedural_sky(256)
    got = {}
    for src in ("vmem", "hbm"):
        packed = pack_scene_wide(data, env_small, env_size=(128, 256),
                                 leaf_src=src)
        assert packed.leaf_src == src
        h = packet_trace_wide(packed, jnp.asarray(P), jnp.asarray(D),
                              tile=1024)
        got[src] = (np.asarray(h.t), np.asarray(h.which))
    hits = (got["vmem"][1] >= 0).sum()
    t_eq = np.array_equal(got["vmem"][0], got["hbm"][0])
    w_eq = np.array_equal(got["vmem"][1], got["hbm"][1])
    print(f"69k on-chip parity: hits={hits}/1024 t_bitexact={t_eq} "
          f"which_bitexact={w_eq}", flush=True)
    assert t_eq and w_eq and hits > 0

    # --- 2. the 2M-triangle HBM tier ---
    data2, env2, key2 = bench.build_scene_data(2_000_000)
    r = Renderer(data2, env2)
    print(f"2M scene: {data2.triangle_count} tris, leaf_src="
          f"{r.packed.leaf_src}, leaf table "
          f"{r.packed.leaves.shape[0] * 512 / 1e6:.0f} MB", flush=True)
    assert r.packed.leaf_src == "hbm"

    h2 = packet_trace_wide(r.packed, jnp.asarray(P), jnp.asarray(D),
                           tile=1024, leaf_mode="dma2")
    w2 = np.asarray(h2.which)
    t2 = np.asarray(h2.t)
    print(f"2M unfused trace: hits={(w2 >= 0).sum()}/1024, "
          f"id range [{w2[w2 >= 0].min() if (w2 >= 0).any() else -1}, "
          f"{w2.max()}], t finite={np.isfinite(t2).all()}", flush=True)
    assert (w2 >= 0).any() and w2.max() < data2.triangle_count

    fov = np.deg2rad(40.0)
    zoom = 2.6 / 2.0 / np.sin(fov / 2.0)
    cam = mat4.make_translation(0.0, 0.0, zoom).astype(np.float32)
    params = default_frame_params(fov=fov)._replace(
        camera_matrix=jnp.asarray(cam),
        diffuse_color=jnp.asarray(np.array([0.8, 0.2, 0.2], np.float32)),
        specular_color=jnp.asarray(np.array([0.05, 0.05, 0.05], np.float32)),
    )
    for which in (0, 1):
        st = RenderStatics.from_config(width=1024, height=768,
                                       tile_size=65536, which=which)
        fsum = r.make_checksum_fn(st)
        v = float(np.asarray(fsum(params)))  # compile + first
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fsum(params))
            ts.append(time.perf_counter() - t0)
        print(f"2M which={which}: checksum {v:.4g} finite={np.isfinite(v)} "
              f"median {np.median(ts) * 1e3:.2f} ms single-dispatch",
              flush=True)
        assert np.isfinite(v)
    print("HBM which-tier validation OK", flush=True)


if __name__ == "__main__":
    main()
