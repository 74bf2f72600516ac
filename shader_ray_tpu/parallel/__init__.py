"""Parallelism layer: pixel/ray data parallelism over a TPU mesh.

The reference has no distributed anything (SURVEY.md section 2 末:
one thread, one GL context, ray.cpp:954-1148); its implicit parallelism
is the fragment-shader SIMT dispatch over pixels (ray.cpp:707).  On TPU
the analogous first-class strategy is data parallelism over the ray
batch: the frame's rays shard across chips via ``shard_map`` over an
ICI mesh, the scene arrays are replicated (the GL analog: every core
sees every data texture), and the only collective is the implicit
all-gather of the output framebuffer shards.
"""

from shader_ray_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_render_fn,
    replicate_scene,
    shard_rays_spec,
)

__all__ = [
    "make_mesh",
    "make_sharded_render_fn",
    "replicate_scene",
    "shard_rays_spec",
]
