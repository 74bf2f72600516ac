"""Device mesh + sharded frame rendering.

Design (SURVEY.md sections 5.7-5.8): flatten the frame to a ray batch,
shard that batch 1-D over a ``("rays",)`` mesh with ``shard_map`` —
rays are independent so there is **zero** cross-chip communication in
the hot path; XLA inserts the single output all-gather when the caller
asks for the assembled frame.  Scene arrays are replicated to every
chip at upload (the TPU version of the reference binding every data
texture to every GL shader core, ray.cpp:599-644).

Scaling story: per-chip work is (H*W*spp)/n_devices rays; ICI carries
only the (H*W*3*4)/n bytes of final framebuffer per chip.  DCN never
enters unless a frame is sharded across pods, which this layout also
supports unmodified (the mesh axis just spans more devices).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shader_ray_tpu.ops.render import (
    FrameParams,
    RenderStatics,
    _render_tile,
    generate_rays,
)
from shader_ray_tpu.ops.scene import DeviceScene

RAY_AXIS = "rays"


def make_mesh(devices: Sequence[jax.Device] | int | None = None) -> Mesh:
    """1-D ``("rays",)`` mesh over the given devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    elif isinstance(devices, int):
        devices = jax.devices()[:devices]
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def shard_rays_spec() -> P:
    return P(RAY_AXIS)


def replicate_scene(scene: DeviceScene, mesh: Mesh) -> DeviceScene:
    """Replicate every scene array to all mesh devices (the reference's
    one-time texture upload, ray.cpp:470-510, broadcast over ICI)."""
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, repl), scene)


def _local_render(scene, params, statics, tile_size, *ray_cols):
    """Per-shard body: render this device's rays in fixed tiles."""
    R = ray_cols[0].shape[0]
    tile = min(tile_size, R)
    n_tiles = -(-R // tile)
    pad = n_tiles * tile - R

    def pad_split(x):
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad, 3), x.dtype)], axis=0)
        return x.reshape(n_tiles, tile, 3)

    tiles = tuple(pad_split(x) for x in ray_cols)
    if n_tiles == 1:
        color = _render_tile(scene, params, statics, tuple(t[0] for t in tiles))
    else:
        color = jax.lax.map(
            lambda t: _render_tile(scene, params, statics, t), tiles
        ).reshape(-1, 3)
    return color.reshape(-1, 3)[:R]


def make_sharded_render_fn(
    scene: DeviceScene,
    statics: RenderStatics,
    mesh: Mesh,
):
    """Jit a frame function whose ray batch shards across ``mesh``.

    Returns ``fn(params) -> (H, W, 3)``.  Ray generation happens inside
    jit (replicated math, negligible); the generated ray arrays carry a
    ``P("rays")`` sharding constraint so each chip materializes only its
    own shard, then ``shard_map`` runs the wavefront loop per shard with
    no collectives.
    """
    n_dev = mesh.devices.size
    W, H = statics.width, statics.height
    R = H * W
    # pad the ray batch so it divides evenly across devices
    pad = (-R) % n_dev
    Rp = R + pad

    shard_spec = NamedSharding(mesh, P(RAY_AXIS))

    def _shard_body(scene_, params_, *ray_cols):
        return _local_render(scene_, params_, statics, statics.tile_size, *ray_cols)

    sharded = jax.shard_map(
        _shard_body,
        mesh=mesh,
        in_specs=(P(), P()) + (P(RAY_AXIS),) * 6,
        out_specs=P(RAY_AXIS),
        check_vma=False,
    )

    @jax.jit
    def fn(params: FrameParams) -> jnp.ndarray:
        rays, _ = generate_rays(statics, params)

        def pad_to(x):
            if pad:
                x = jnp.concatenate([x, jnp.zeros((pad, 3), x.dtype)], axis=0)
            return jax.lax.with_sharding_constraint(x, shard_spec)

        cols = tuple(pad_to(x) for x in rays)
        color = sharded(scene, params, *cols)
        return color[:R].reshape(H, W, 3)

    return fn
