import numpy as np, jax, jax.numpy as jnp, time
from raytracer_tpu.models.loader import load_scene
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.ops.bvh import bvh_intersect

s = load_scene('scenes/flying_unicorn.toml')
cfg = RenderConfig()
rng = np.random.default_rng(0)
N = 8192
ro = jnp.asarray(np.broadcast_to(np.asarray([50, 52, 295.6]), (N, 3)), jnp.float32)
d = rng.normal(size=(N, 3)); d[:, 2] = -np.abs(d[:, 2]) * 3
rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
f = jax.jit(lambda ro, rd: bvh_intersect(s, ro, rd, cfg.eps))
t0 = time.time(); t, idx = f(ro, rd); t.block_until_ready()
print('bvh compile+run: %.1fs' % (time.time() - t0))
t0 = time.time(); t, idx = f(ro, rd); t.block_until_ready()
dt = time.time() - t0
print('bvh steady: %.3fs for %d rays -> %.2f Mrays/s' % (dt, N, N / dt / 1e6))
print('hits:', int((np.asarray(t) < 1e30).sum()))
