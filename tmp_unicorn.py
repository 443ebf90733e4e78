import time, numpy as np
from raytracer_tpu.models.loader import load_scene
from raytracer_tpu.render.renderer import Renderer
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.utils.platform import enable_compilation_cache
enable_compilation_cache()
t0=time.time()
s = load_scene('scenes/flying_unicorn.toml')
print('load+bvh build: %.1fs, tris %d, bvh nodes %d' % (time.time()-t0, s.n_triangles, s.bvh_lo.shape[0]))
r = Renderer(s, RenderConfig())
t0=time.time(); img = r.render_image(4); print('first render (compile): %.1fs' % (time.time()-t0))
r.ray_counts.clear()
t0=time.time(); img = r.render_image(16); dt=time.time()-t0
rays = r.rays_traced()
print('600x450@16spp: %.2fs, %.1f Mrays/s' % (dt, rays/dt/1e6))
from PIL import Image
Image.fromarray(img).save('/tmp/unicorn16.png')
