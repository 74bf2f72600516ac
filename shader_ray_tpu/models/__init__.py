from shader_ray_tpu.models.triangle_set import TriangleSet  # noqa: F401
from shader_ray_tpu.models.world import World, SceneData, load_world, get_shader_data  # noqa: F401
