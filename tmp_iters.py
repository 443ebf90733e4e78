"""Measure packet-traversal iteration counts and per-iteration cost."""
import numpy as np, jax, jax.numpy as jnp, time, sys
from raytracer_tpu.models.loader import load_scene
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models.camera import camera_rays
from raytracer_tpu.ops import bvh as B
from raytracer_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()
s = load_scene('scenes/flying_unicorn.toml')
cfg = RenderConfig()
print('nodes', s.bvh_lo.shape[0])

def count_iters(scene, ro, rd, eps):
    lo, hi = scene.bvh_lo, scene.bvh_hi
    skip = scene.bvh_skip
    n_nodes = lo.shape[0]
    n = ro.shape[0]
    order, inverse = B._coherence_order(ro, rd, lo[0], hi[0], eps)
    ro = ro[order]; rd = rd[order]
    g = n // B.BLOCK
    rog = ro.reshape(g, B.BLOCK, 3); rdg = rd.reshape(g, B.BLOCK, 3)
    safe_d = jnp.where(jnp.abs(rdg) < 1e-12, jnp.float32(1e-12), rdg)
    inv_d = 1.0 / safe_d
    def cond(st):
        node, it, visits = st
        return jnp.any(node < n_nodes)
    def body(st):
        node, it, visits = st
        live = node < n_nodes
        nc = jnp.minimum(node, n_nodes - 1)
        lo_g = lo[nc][:, None, :]; hi_g = hi[nc][:, None, :]
        t0 = (lo_g - rog) * inv_d; t1 = (hi_g - rog) * inv_d
        tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
        ray_hit = (tnear <= tfar) & (tfar > eps.tri_tmin)
        box_any = live & jnp.any(ray_hit, axis=-1)
        node = jnp.where(live, jnp.where(box_any, node + 1, skip[nc]), node)
        return node, it + 1, visits + live.astype(jnp.int32)
    node0 = jnp.zeros(g, jnp.int32)
    _, iters, visits = jax.lax.while_loop(cond, body, (node0, jnp.int32(0), jnp.zeros(g, jnp.int32)))
    return iters, visits

N = 1 << 18
yy, xx = np.mgrid[0:437, 0:600]
px = jnp.asarray(xx.reshape(-1)[:N], jnp.float32); py = jnp.asarray(yy.reshape(-1)[:N], jnp.float32)
z = jnp.zeros(N); h = z + 0.5
ro, rd = camera_rays(s, 600, 450, cfg.fov_scale, px, py, z, z, h, h)
f = jax.jit(lambda ro, rd: count_iters(s, ro, rd, cfg.eps))
iters, visits = f(ro, rd)
v = np.asarray(visits)
print('A coherent: lockstep iters %d, packet visits mean %.0f p50 %.0f p99 %.0f max %d'
      % (int(iters), v.mean(), np.percentile(v,50), np.percentile(v,99), v.max()))
sys.stdout.flush()
rng = np.random.default_rng(0)
o = np.asarray([50, 0.1, 80.0]) + rng.uniform(-30, 30, (N, 3)) * np.asarray([1, 0, 1])
d = rng.normal(size=(N, 3)); d[:, 1] = np.abs(d[:, 1])
ro2 = jnp.asarray(o, jnp.float32); rd2 = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
iters, visits = f(ro2, rd2)
v = np.asarray(visits)
print('B diffuse: lockstep iters %d, packet visits mean %.0f p50 %.0f p99 %.0f max %d'
      % (int(iters), v.mean(), np.percentile(v,50), np.percentile(v,99), v.max()))
