"""Isolated BVH traversal-kernel microbenchmark.

The round-2/3 optimization logs in BENCHMARKS.md quote "ms per 1M coherent
rays" numbers that were measured ad hoc; this tool makes them reproducible.
It times ONLY the Pallas traversal kernel (rays pre-packed and presorted,
results block-until-ready), for each requested kernel variant, on two
wavefront shapes:

- ``coherent``: camera rays through the full frame (the easy case the
  coherence sort produces for primary rays);
- ``bounce``: cosine-hemisphere rays from the camera-hit points (the hard
  case — mid-path wavefronts), still coherence-sorted like production.

Usage:
  python -m raytracer_tpu.tools.kbench [scenes/flying_unicorn.toml] \
      [--n 1048576] [--variants wide,widesmem] [--reps 5]
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="raytracer-tpu-kbench")
    p.add_argument("scene", nargs="?", default="scenes/flying_unicorn.toml")
    p.add_argument("--n", type=int, default=1 << 20)
    p.add_argument("--variants", default="wide,widesmem")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.models.camera import camera_rays
    from raytracer_tpu.models import vecmath as vm
    from raytracer_tpu.models.loader import load_scene
    from raytracer_tpu.ops.bvh import _coherence_order, bvh_intersect
    from raytracer_tpu.ops.pallas import bvh_kernel as bk
    from raytracer_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    cfg = RenderConfig()
    eps = cfg.eps
    variants = [v for v in args.variants.split(",") if v]
    # The MXU-leaf variant needs its tables built before scene load.
    if "widemxu" in variants:
        os.environ["RT_BVH_KERNEL"] = "widemxu"
    scene = load_scene(args.scene)
    if not scene.use_bvh:
        print(f"{scene.name}: no BVH — nothing to measure")
        return 1
    n = args.n

    ks = jax.random.split(jax.random.PRNGKey(args.seed), 4)
    px = jax.random.uniform(ks[0], (n,)) * cfg.width
    py = jax.random.uniform(ks[1], (n,)) * cfg.height
    z = jnp.zeros(n)
    ro_c, rd_c = camera_rays(
        scene, cfg.width, cfg.height, cfg.fov_scale, px, py, z, z,
        jax.random.uniform(ks[2], (n,)), jax.random.uniform(ks[3], (n,)),
    )
    # Bounce wavefront: cosine-hemisphere directions from the camera hits
    # (misses fall back to their camera ray so every lane traces).
    t0, _ = jax.jit(lambda a, b: bvh_intersect(scene, a, b, eps))(ro_c, rd_c)
    hit = t0 < 1e30
    pos = ro_c + rd_c * jnp.minimum(t0, 1e3)[:, None]
    kb = jax.random.split(jax.random.PRNGKey(args.seed + 1), 2)
    u1 = jax.random.uniform(kb[0], (n,))
    u2 = jax.random.uniform(kb[1], (n,))
    # crude flat-normal frame: reflect off +Y hemisphere (direction quality
    # only matters statistically for a traversal benchmark)
    st = jnp.sqrt(u1)
    phi = 2 * jnp.pi * u2
    d = jnp.stack(
        [st * jnp.cos(phi), jnp.sqrt(1 - u1), st * jnp.sin(phi)], axis=1
    )
    ro_b = jnp.where(hit[:, None], pos, ro_c)
    rd_b = jnp.where(hit[:, None], vm.normalize(d), rd_c)

    def pack(ro, rd):
        order, _ = _coherence_order(scene, ro, rd, eps)
        ro, rd = jnp.take(ro, order, axis=0), jnp.take(rd, order, axis=0)
        fields = [ro[:, k] for k in range(3)] + [rd[:, k] for k in range(3)]
        fields += [jnp.full((n,), bk.INF), jnp.zeros((n,))]
        g = -(-n // bk.PACKET)
        pad = g * bk.PACKET - n
        if pad:
            fields = [
                jnp.concatenate([f, jnp.full((pad,), 1.0 if k == 7 else 0.0)])
                for k, f in enumerate(fields)
            ]
        return jnp.stack([f.reshape(g, 8, 128) for f in fields], axis=1)

    wavefronts = {
        "coherent": jax.block_until_ready(jax.jit(pack)(ro_c, rd_c)),
        "bounce": jax.block_until_ready(jax.jit(pack)(ro_b, rd_b)),
    }

    print(f"{scene.name}: {n} rays, reps={args.reps}, backend={jax.default_backend()}")
    interp = jax.default_backend() != "tpu"
    for variant in variants:
        mxu = variant == "widemxu"
        smem = variant == "widesmem"
        for wname, rays in wavefronts.items():
            def run(r):
                return bk.bvh8_intersect_pallas_raw(
                    r,
                    scene.bvh8_nodes_flat if smem else scene.bvh8_nodes_packed,
                    scene.bvh_tris_mxu if mxu else scene.bvh_tris_packed,
                    max_stack=scene.bvh8_max_stack,
                    base=scene.bvh_tri_start,
                    tri_tmin=eps.tri_tmin,
                    tri_parallel=eps.tri_parallel,
                    mxu_leaf=mxu,
                    smem_nodes=smem,
                    interpret=interp,
                )

            tc0 = time.perf_counter()
            out = jax.block_until_ready(run(rays))
            compile_s = time.perf_counter() - tc0
            best = float("inf")
            for _ in range(args.reps):
                t1 = time.perf_counter()
                out = jax.block_until_ready(run(rays))
                best = min(best, time.perf_counter() - t1)
            hits = float((out[0].reshape(-1)[:n] < 1e30).mean())
            ms_per_m = best * 1e3 / (n / 1e6)
            print(
                f"  {variant:10s} {wname:9s} {ms_per_m:8.2f} ms/1Mray  "
                f"(best of {args.reps}; hit {hits:.3f}; first call {compile_s:.1f}s)"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
