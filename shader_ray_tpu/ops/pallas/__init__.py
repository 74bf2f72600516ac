"""Pallas TPU kernels — the production device path.

The axon TPU runtime compiles XLA gather/dynamic-slice pathologically
slowly (minutes per program) and executes them serially, so the
gather-heavy per-lane traversal in ops.traversal is CPU-only.  The
TPU path instead uses a *packet* megakernel (ops.pallas.packet):
rays ride the 128-wide vector lanes, the BVH walk advances with
scalar hit/miss links shared by the whole packet, and every node and
triangle test is a full-width vector op — no gathers anywhere.
Environment lookups become MXU one-hot matmuls (ops.pallas.envmxu).
"""

from shader_ray_tpu.ops.pallas.pack import PackedScene, pack_scene
from shader_ray_tpu.ops.pallas.packet import packet_trace

__all__ = ["PackedScene", "pack_scene", "packet_trace"]
