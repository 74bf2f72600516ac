"""Application layer: interaction state machine, materials, camera,
benchmark, screenshot, CLI — the TPU-native equivalent of the
reference's GLFW app (ray.cpp:719-1148), driving the jitted frame
function instead of a GL draw."""

from shader_ray_tpu.app.materials import DIFFUSE_COLORS, MATERIALS, resolve_material
from shader_ray_tpu.app.driver import App

__all__ = ["App", "MATERIALS", "DIFFUSE_COLORS", "resolve_material"]
