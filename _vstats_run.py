import time, numpy as np, jax, jax.numpy as jnp
from shader_ray_tpu.models.fixtures import bunny_class_scene, procedural_sky
from shader_ray_tpu.models.triangle_set import TriangleSet
from shader_ray_tpu.models.world import make_world, get_shader_data
from shader_ray_tpu.utils.cache import cached_scene_data
from shader_ray_tpu.ops.pallas.pack import pack_scene
from shader_ray_tpu.ops.pallas.packet import packet_trace
from shader_ray_tpu.ops.render import RenderStatics, default_frame_params, generate_rays
from shader_ray_tpu.ops.engine_pallas import _block_dims, _swizzle
from shader_ray_tpu.ops.shading import Rays
import shader_ray_tpu.utils.mat4 as m4

def builder():
    pos, _ = bunny_class_scene(69000)
    return get_shader_data(make_world(TriangleSet.from_arrays(pos)))
data = cached_scene_data("bench-bunny-class-69k", builder)
packed = pack_scene(data, procedural_sky(2048))
print("N:", packed.node_count, "L:", packed.leaf_count, flush=True)

W, H, TILE = 1024, 768, 1024
statics = RenderStatics(width=W, height=H)
fov = np.deg2rad(40.0)
zoom = 2.6/2.0/np.sin(fov/2.0)
params = default_frame_params(fov=fov)._replace(
    camera_matrix=jnp.asarray(m4.make_translation(0,0,zoom).astype(np.float32)))
rays, _ = generate_rays(statics, params)
bh, bw = _block_dims(H, W, TILE)
rays = Rays(*[_swizzle(x, H, W, bh, bw) for x in rays])
print("block:", bh, bw, flush=True)

f = jax.jit(lambda sc, P, D: packet_trace(sc, P, D, tile=TILE))
t0=time.time()
hit = f(packed, rays.P, rays.D)
stats = np.asarray(hit.stats)
print("compile+run:", time.time()-t0, flush=True)
print("packets:", stats.shape[0], flush=True)
print("node steps: mean %.0f median %.0f max %d total %d" % (stats[:,0].mean(), np.median(stats[:,0]), stats[:,0].max(), stats[:,0].sum()), flush=True)
print("leaf visits: mean %.0f median %.0f max %d total %d" % (stats[:,1].mean(), np.median(stats[:,1]), stats[:,1].max(), stats[:,1].sum()), flush=True)
t0=time.time()
for _ in range(5):
    r = f(packed, rays.P, rays.D)
    np.asarray(r.t)
dt=(time.time()-t0)/5
tot=stats[:,0].sum()
print(f"primary-only walk: {dt*1e3:.1f}ms -> per-step {dt/tot*1e9:.1f}ns", flush=True)
