"""Device-resident scene arrays.

The TPU analog of the reference's data-texture upload (ray.cpp:357-513):
SoA arrays placed in HBM once at load (``jax.device_put``, replicated
across the mesh by the parallel layer) and read by every frame; only
per-frame scalars (matrices, light, material colors) travel per draw
(reference ray.cpp:648-704 uniform sets).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from shader_ray_tpu.models.background import build_mip_pyramid, pack_mip_atlas
from shader_ray_tpu.models.world import SceneData


class DeviceScene(NamedTuple):
    """Pytree of device arrays + static metadata.

    hitmiss is flattened to (8*N, 2) so a traversal step's link fetch is
    a single gather at ``node + octant * N`` (the GL shader's bank
    offset arithmetic, raytracer.es.fs:389-392, with int32 indices).
    """

    tri_positions: jnp.ndarray   # (T, 9) f32
    tri_normals: jnp.ndarray     # (T, 9) f32
    tri_colors: jnp.ndarray      # (T, 9) f32
    node_boxes: jnp.ndarray      # (N, 8) f32: boxmin xyz, boxmax xyz, pad
    node_objects: jnp.ndarray    # (N, 2) i32: (start, count)
    hitmiss: jnp.ndarray         # (8*N, 2) i32
    env_atlas: jnp.ndarray       # (rows, W, 3) f32 mip atlas
    env_table: jnp.ndarray       # (L, 3) i32: (row_offset, height, width)
    tree_root: jnp.ndarray       # () i32
    node_count: jnp.ndarray      # () i32

    # static python ints (leaves of aux_data when jitted via closure)
    @property
    def num_triangles(self) -> int:
        return int(self.tri_positions.shape[0])

    @property
    def num_nodes(self) -> int:
        return int(self.node_boxes.shape[0])

    @property
    def num_env_levels(self) -> int:
        return int(self.env_table.shape[0])


def upload_scene(
    data: SceneData,
    background: np.ndarray,
    device=None,
) -> DeviceScene:
    """Build the device scene from host SceneData + a background image.

    Builds the env mip pyramid host-side (GL did glGenerateMipmap,
    ray.cpp:509) and packs it into a single atlas array.
    """
    levels = build_mip_pyramid(background)
    atlas, table = pack_mip_atlas(levels)

    n = data.group_count
    put = (lambda x: jax.device_put(x, device)) if device is not None else jax.device_put
    return DeviceScene(
        tri_positions=put(jnp.asarray(data.tri_positions, jnp.float32)),
        tri_normals=put(jnp.asarray(data.tri_normals, jnp.float32)),
        tri_colors=put(jnp.asarray(data.tri_colors, jnp.float32)),
        node_boxes=put(jnp.asarray(data.node_boxes, jnp.float32)),
        node_objects=put(jnp.asarray(data.node_objects, jnp.int32)),
        hitmiss=put(jnp.asarray(data.hitmiss.reshape(8 * n, 2), jnp.int32)),
        env_atlas=put(jnp.asarray(atlas, jnp.float32)),
        env_table=put(jnp.asarray(table, jnp.int32)),
        tree_root=put(jnp.asarray(data.tree_root, jnp.int32)),
        node_count=put(jnp.asarray(n, jnp.int32)),
    )
