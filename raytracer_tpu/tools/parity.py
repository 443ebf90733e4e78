"""Hardware parity check: Pallas BVH kernel vs the XLA packet traversal.

CI has no TPU, so `tests/test_pallas_bvh.py` exercises the kernel in
interpret mode only.  This tool runs the SAME comparison on whatever
backend is live — on a real chip it validates the compiled Mosaic kernel
against the XLA oracle end-to-end (nearest-hit t within f32 tolerance,
identical hit masks and triangle ids).

Usage:  python -m raytracer_tpu.tools.parity [scenes/flying_unicorn.toml]
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models.camera import camera_rays
from raytracer_tpu.models.loader import load_scene
from raytracer_tpu.ops.bvh import bvh_intersect
from raytracer_tpu.ops.pallas.bvh_kernel import bvh_intersect_pallas
from raytracer_tpu.utils.platform import enable_compilation_cache


def run(scene_path: str, n: int = 1 << 17, seed: int = 0) -> bool:
    enable_compilation_cache()
    cfg = RenderConfig()
    eps = cfg.eps
    scene = load_scene(scene_path)
    if not scene.use_bvh:
        print(f"{scene.name}: no BVH (no mesh) — nothing to compare")
        return True

    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    # Half camera rays (coherent), half box-interior random rays (stress).
    nc = n // 2
    px = jax.random.uniform(ks[0], (nc,)) * cfg.width
    py = jax.random.uniform(ks[1], (nc,)) * cfg.height
    z = jnp.zeros(nc)
    ro_c, rd_c = camera_rays(
        scene, cfg.width, cfg.height, cfg.fov_scale, px, py, z, z,
        jax.random.uniform(ks[2], (nc,)), jax.random.uniform(ks[3], (nc,)),
    )
    lo, hi = scene.bvh_lo[0], scene.bvh_hi[0]
    c, ext = (lo + hi) / 2, hi - lo
    ro_r = c + (jax.random.uniform(ks[4], (n - nc, 3)) - 0.5) * ext * 2.0
    v = jax.random.normal(ks[5], (n - nc, 3))
    rd_r = v / jnp.linalg.norm(v, axis=1, keepdims=True)
    ro = jnp.concatenate([ro_c, ro_r])
    rd = jnp.concatenate([rd_c, rd_r])

    interp = jax.default_backend() != "tpu"  # Mosaic needs a TPU; else interpret
    t_x, i_x = jax.jit(lambda a, b: bvh_intersect(scene, a, b, eps))(ro, rd)
    t_p, i_p = jax.jit(
        lambda a, b: bvh_intersect_pallas(scene, a, b, eps, interpret=interp)
    )(ro, rd)

    t_x, i_x, t_p, i_p = map(np.asarray, (t_x, i_x, t_p, i_p))
    hit_x, hit_p = t_x < 1e30, t_p < 1e30
    mask_eq = (hit_x == hit_p).mean()
    both = hit_x & hit_p
    t_rel = (
        np.abs(t_p[both] - t_x[both]) / np.maximum(np.abs(t_x[both]), 1e-6)
        if both.any()
        else np.zeros(1)
    )
    id_eq = (i_p[both] == i_x[both]).mean() if both.any() else 1.0
    # The two paths use DIFFERENT f32 formulations (per-packet cross
    # products vs precomputed f64-derived gradient fields), so grazing
    # hits carry a small relative-t tail; measured on v5e/flying_unicorn:
    # q0.999 ~1e-4, max ~9e-4.  Tri-id disagreement at equal t is a ray
    # through a shared edge/vertex (a genuine tie).
    q999 = float(np.quantile(t_rel, 0.999))
    ok = (
        mask_eq == 1.0
        and q999 < 3e-4
        and t_rel.max() < 5e-3
        and id_eq > 0.999
    )
    print(
        f"{scene.name}: backend={jax.default_backend()} rays={n} "
        f"hit-mask-agree={mask_eq:.6f} t-rel q0.999={q999:.2e} "
        f"max={t_rel.max():.2e} tri-id-agree={id_eq:.6f} "
        f"-> {'OK' if ok else 'MISMATCH'}"
    )
    return bool(ok)


def main() -> None:
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
    paths = sys.argv[1:] or [os.path.join(here, "scenes", "flying_unicorn.toml")]
    ok = all(run(p) for p in paths)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
