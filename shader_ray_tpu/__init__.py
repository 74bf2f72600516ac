"""shader_ray_tpu — a TPU-native ray-tracing framework.

A ground-up rebuild of the capabilities of bradgrantham/shader-ray (an
OpenGL-ES-fragment-shader interactive ray tracer) as an idiomatic
JAX/XLA/Pallas framework for TPU:

* host scene pipeline (trisrc/OBJ loaders, binned-SAH BVH, stackless
  8-octant hit/miss link flattening) producing HBM-ready SoA arrays
  (reference: trisrc-support.cpp, obj-support.cpp, bvh.cpp, world.cpp),
  with both a pure-numpy builder and a native C++ `libscene` builder;
* a batched wavefront render engine (ray-gen -> BVH traversal ->
  Moller-Trumbore -> Schlick/Lambert/shadow shading -> lat-long HDR
  environment lookup -> filmic tonemap) replacing the GLSL megakernel
  (reference: raytracer.vs, raytracer.es.fs), jitted once and driven
  per-frame with camera/material scalars as arguments;
* data-parallel frame sharding across a TPU mesh via jax.sharding
  (the reference's implicit per-pixel SIMT becomes explicit ray-batch
  data parallelism);
* the interactive application layer (trackball camera, material/light
  state machine, benchmark histogram, PPM screenshot) re-hosted on a
  headless-friendly driver (reference: ray.cpp).
"""

__version__ = "0.1.0"

from shader_ray_tpu.config import Config, get_config  # noqa: F401
