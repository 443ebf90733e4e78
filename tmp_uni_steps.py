import numpy as np, jax, jax.numpy as jnp, time, sys
from raytracer_tpu.models.loader import load_scene
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.ops.intersect import scene_precompute, trace
from raytracer_tpu.models.camera import camera_rays
from raytracer_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()
s = load_scene('scenes/flying_unicorn.toml')
cfg = RenderConfig()
pre = scene_precompute(s)

# Step A: single full trace of coherent camera rays
N = 1 << 18
yy, xx = np.mgrid[0:437, 0:600]
px = jnp.asarray(xx.reshape(-1)[:N], jnp.float32)
py = jnp.asarray(yy.reshape(-1)[:N], jnp.float32)
z = jnp.zeros(N); h = z + 0.5
ro, rd = camera_rays(s, 600, 450, cfg.fov_scale, px, py, z, z, h, h)
f = jax.jit(lambda ro, rd: trace(s, pre, ro, rd, cfg.eps).t)
t0 = time.time(); out = f(ro, rd); out.block_until_ready()
print('A: camera trace compile+run %.1fs' % (time.time() - t0)); sys.stdout.flush()
t0 = time.time(); out = f(ro, rd); out.block_until_ready()
dt = time.time() - t0
print('A: camera trace steady %.3fs -> %.1f Mrays/s' % (dt, N / dt / 1e6)); sys.stdout.flush()

# Step B: incoherent (diffuse-like) rays from the floor
rng = np.random.default_rng(0)
o = np.asarray([50, 0.1, 80.0]) + rng.uniform(-30, 30, (N, 3)) * np.asarray([1, 0, 1])
d = rng.normal(size=(N, 3)); d[:, 1] = np.abs(d[:, 1])
ro2 = jnp.asarray(o, jnp.float32)
rd2 = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
t0 = time.time(); out = f(ro2, rd2); out.block_until_ready()
dt = time.time() - t0
print('B: diffuse-like trace %.3fs -> %.1f Mrays/s' % (dt, N / dt / 1e6)); sys.stdout.flush()
