#!/usr/bin/env python
"""Generate the committed mesh fixture + its golden render.

VERDICT r3 next #4: golden/parity evidence rested entirely on
procedural spheres and heightfields built in-process.  This writes a
STORED asset — tests/assets/knot.obj, a radially-displaced trefoil
knot tube (~3k tris: irregular silhouette, self-occlusion, cavities,
real shadow structure, no symmetry planes) — and a committed golden
frame rendered by the wavefront oracle.  Tests then exercise the REAL
asset path: OBJ parse (native C++ and Python), vertex dedup, BVH
build, and both engines against the committed image
(tests/test_knot_golden.py).

Deterministic: re-running reproduces the identical .obj byte-for-byte.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ASSET = os.path.join(
    os.path.dirname(__file__), "..", "tests", "assets", "knot.obj"
)
GOLD = os.path.join(
    os.path.dirname(__file__), "..", "tests", "golden", "knot_gold_64.npy"
)

SEG = 96   # segments along the knot
RING = 16  # vertices around the tube


def knot_mesh():
    t = np.linspace(0.0, 2 * np.pi, SEG, endpoint=False)
    # trefoil centerline
    cx = np.sin(t) + 2.0 * np.sin(2 * t)
    cy = np.cos(t) - 2.0 * np.cos(2 * t)
    cz = -np.sin(3 * t)
    C = np.stack([cx, cy, cz], axis=1)
    # frame along the curve (finite-difference tangent + stable normal)
    T = np.roll(C, -1, axis=0) - np.roll(C, 1, axis=0)
    T /= np.linalg.norm(T, axis=1, keepdims=True)
    up = np.array([0.12, 0.34, 0.93])
    N = np.cross(T, up)
    N /= np.linalg.norm(N, axis=1, keepdims=True)
    B = np.cross(T, N)

    th = np.linspace(0.0, 2 * np.pi, RING, endpoint=False)
    verts = []
    for i in range(SEG):
        # radial displacement: breaks the tube's symmetry, adds bumps
        r = 0.32 + 0.06 * np.sin(5 * th + 3 * t[i]) \
            + 0.03 * np.cos(2 * th - 7 * t[i])
        ring = (
            C[i][None, :]
            + np.outer(r * np.cos(th), N[i])
            + np.outer(r * np.sin(th), B[i])
        )
        verts.append(ring)
    V = np.concatenate(verts, axis=0)
    # normalize to ~unit extent around the origin (bench-style framing)
    V -= V.mean(axis=0, keepdims=True)
    V /= np.abs(V).max()

    faces = []
    for i in range(SEG):
        for j in range(RING):
            a = i * RING + j
            b = i * RING + (j + 1) % RING
            c = ((i + 1) % SEG) * RING + j
            d = ((i + 1) % SEG) * RING + (j + 1) % RING
            faces.append((a, b, d))
            faces.append((a, d, c))
    return V, np.asarray(faces, np.int64)


def write_obj(path, V, F):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", newline="\n") as f:
        f.write("# displaced trefoil knot fixture (scripts/make_knot_fixture.py)\n")
        f.write("o knot\n")
        for v in V:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in F:
            f.write(f"f {a + 1} {b + 1} {c + 1}\n")


def render_golden():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from shader_ray_tpu.models.fixtures import procedural_sky
    from shader_ray_tpu.models.obj import parse_obj
    from shader_ray_tpu.models.world import get_shader_data, make_world
    from shader_ray_tpu.ops.render import (
        RenderStatics,
        default_frame_params,
        render_frame,
    )
    from shader_ray_tpu.ops.scene import upload_scene
    from shader_ray_tpu.utils import mat4

    ts = parse_obj(os.path.abspath(ASSET))
    data = get_shader_data(make_world(ts))
    statics = RenderStatics(width=64, height=64, tile_size=1024)
    light = np.array([0.5, 0.6, 0.62], np.float32)
    light /= np.linalg.norm(light)
    params = default_frame_params()._replace(
        camera_matrix=jnp.asarray(
            mat4.make_translation(0, 0, 3.0).astype(np.float32)
        ),
        light_dir=jnp.asarray(light),
        diffuse_color=jnp.asarray(np.array([0.6, 0.5, 0.3], np.float32)),
        specular_color=jnp.asarray(np.array([0.08, 0.08, 0.08], np.float32)),
    )
    scene = upload_scene(data, procedural_sky(512))
    img = np.asarray(render_frame(scene, params, statics))
    np.save(GOLD, img.astype(np.float32))
    print("golden:", img.shape, float(img.mean()), float(img.std()))


if __name__ == "__main__":
    V, F = knot_mesh()
    write_obj(ASSET, V, F)
    print(f"wrote {ASSET}: {len(V)} verts, {len(F)} tris")
    render_golden()
