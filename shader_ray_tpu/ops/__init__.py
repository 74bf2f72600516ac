from shader_ray_tpu.ops.scene import DeviceScene, upload_scene  # noqa: F401
from shader_ray_tpu.ops.render import RenderStatics, FrameParams, make_render_fn  # noqa: F401
