"""Ablation profile: where does the cornell wavefront iteration spend time?"""
import time
import jax, jax.numpy as jnp
from raytracer_tpu.models.loader import load_scene
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.ops.intersect import scene_precompute, trace, trace_t
from raytracer_tpu.ops import brdf
from raytracer_tpu.models import vecmath as vm
from raytracer_tpu.render.integrator import sample_light
from raytracer_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()
s = load_scene('scenes/cornell_box.toml')
cfg = RenderConfig()
pre = scene_precompute(s)
N = 120_000
key = jax.random.key(0)
ro = jnp.broadcast_to(s.cam_pos, (N, 3)) + 0.0
d = jax.random.normal(jax.random.fold_in(key, 1), (N, 3))
rd = d / jnp.linalg.norm(d, axis=1, keepdims=True)

ITER = 50

def bench(name, fn):
    f = jax.jit(fn)
    out = f(ro, rd); jax.block_until_ready(out)
    t0 = time.time()
    out = f(ro, rd); jax.block_until_ready(out)
    dt = (time.time() - t0) / ITER
    print(f"{name}: {dt*1e6:.0f} us/iter ({N/dt/1e6:.0f} M/s)")

def loop(body):
    def run(ro, rd):
        def step(i, carry):
            ro, rd, acc = carry
            out = body(i, ro, rd)
            return (ro, rd, acc + out)
        _, _, acc = jax.lax.fori_loop(0, ITER, step, (ro, rd, jnp.zeros(N)))
        return acc
    return run

bench("trace (full)", loop(lambda i, ro, rd: trace(s, pre, ro, rd, cfg.eps).t))
bench("trace_t", loop(lambda i, ro, rd: trace_t(s, pre, ro, rd, cfg.eps)[0]))

def rng_body(i, ro, rd):
    us = jax.random.uniform(jax.random.fold_in(jax.random.key(0, impl='rbg'), i), (9, N))
    return us[0]
bench("rng 9xN (rbg)", rng_body and loop(rng_body))

def shade_body(i, ro, rd):
    obj = (jnp.arange(N) % s.n_objects).astype(jnp.int32)
    mat = brdf.gather_mat(s, obj)
    us = jax.random.uniform(jax.random.fold_in(jax.random.key(1, impl='rbg'), i), (3, N))
    wi, pdf = brdf.sample(mat, rd, -rd, us[0], us[1], us[2])
    f = brdf.eval_nonspecular(mat, rd, -rd, wi)
    return f[:, 0] * pdf
bench("brdf sample+eval+gather", loop(shade_body))

def light_body(i, ro, rd):
    us = jax.random.uniform(jax.random.fold_in(jax.random.key(2, impl='rbg'), i), (3, N))
    y, ny, pdf = sample_light(s, us[0], us[1], us[2])
    return y[:, 0] * pdf
bench("light sample", loop(light_body))
