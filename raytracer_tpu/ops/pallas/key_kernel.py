"""Pallas coherence-key kernel.

The streaming engine computes a traversal-coherence sort key TWICE per
bounce iteration (main-ray lane permutation + the shadow trace's own
sort; render/wavefront.py).  The XLA form (`ops.bvh._coherence_key`) is a
static loop of 32 treetop-cut AABB slab tests over [N] component vectors
— correct, but the device profile shows it compiled as ~32 separate
small fusions totalling ~5 ms/iteration at 540k lanes (each fusion
re-reads the six ray-component columns from HBM), which made the key the
single largest non-kernel cost of the bounce loop.

This kernel computes the IDENTICAL key in one pass: the six ray
components stream through VMEM once (24 B in + 4 B out per ray), the
~32 cut AABBs + root box ride SMEM as scalars, and the slab/octant/
Morton math is dense VPU work on [R,128] blocks.  Arithmetic mirrors
`_cut_entry`/`_coherence_key` expression-for-expression so the produced
keys are bit-identical (tests/test_pallas_bvh.py checks exact equality
in interpret mode) — the argsort consuming the key stays in XLA.

Spec anchor: the coherence sort exists to make ray packets share their
BVH descent (the reference traverses per-ray recursively and needs no
such machinery: /root/reference/src/geometry.rs:1237-1295).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.config import Epsilons

ROWS = 256  # sublane-rows per program: [256,128] f32 blocks (128 KiB/operand)
INF = float("inf")


def _key_kernel(
    params_ref,  # SMEM [C+1, 8]: rows 0..C-1 = cut (lo.xyz, hi.xyz, 0, 0);
    # row C = root (lo.xyz, hi.xyz, 0, 0) for the Morton quantization
    rox_ref, roy_ref, roz_ref,  # [R,128] f32
    rdx_ref, rdy_ref, rdz_ref,  # [R,128] f32
    key_ref,  # [R,128] i32 out
    *,
    n_cut: int,
    tri_tmin: float,
):
    ro = [rox_ref[...], roy_ref[...], roz_ref[...]]
    rd = [rdx_ref[...], rdy_ref[...], rdz_ref[...]]
    inv = [
        1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.float32(1e-12), d) for d in rd
    ]
    shape = ro[0].shape

    # --- nearest-entry treetop-cut subtree (ops.bvh._cut_entry) ---
    best_t = jnp.full(shape, INF)
    best_i = jnp.zeros(shape, jnp.int32)
    for c in range(n_cut):
        tnear = jnp.full(shape, -INF)
        tfar = jnp.full(shape, INF)
        for k in range(3):
            t0 = (params_ref[c, k] - ro[k]) * inv[k]
            t1 = (params_ref[c, 3 + k] - ro[k]) * inv[k]
            tnear = jnp.maximum(tnear, jnp.minimum(t0, t1))
            tfar = jnp.minimum(tfar, jnp.maximum(t0, t1))
        hit = (tnear <= tfar) & (tfar > tri_tmin)
        tn = jnp.where(hit, tnear, INF)
        take = tn < best_t  # strict: ties keep the lower cut index
        best_t = jnp.where(take, tn, best_t)
        best_i = jnp.where(take, c, best_i)
    miss = (best_t == INF).astype(jnp.int32)

    # --- secondary: direction octant (ops.bvh._coherence_key) ---
    octant = (
        (rd[0] < 0).astype(jnp.int32)
        + 2 * (rd[1] < 0).astype(jnp.int32)
        + 4 * (rd[2] < 0).astype(jnp.int32)
    )

    # --- tertiary: 12-bit origin Morton in the root box (_morton12) ---
    def spread(v):  # 4 bits -> every 3rd bit
        v = (v | (v << 4)) & 0x0C3
        v = (v | (v << 2)) & 0x249
        return v

    morton = jnp.zeros(shape, jnp.int32)
    for k in range(3):
        rlo = params_ref[n_cut, k]
        rhi = params_ref[n_cut, 3 + k]
        # Same divide form as _morton12 (a precomputed reciprocal can
        # differ by 1 ulp and flip a quantization bucket).
        q = jnp.clip(
            (ro[k] - rlo) / jnp.maximum(rhi - rlo, 1e-6) * 15.0, 0.0, 15.0
        ).astype(jnp.int32)
        morton = morton | (spread(q) << k)

    key_ref[...] = (miss << 30) | (best_i << 17) | (octant << 13) | morton


@functools.partial(jax.jit, static_argnames=("tri_tmin", "interpret"))
def coherence_key_pallas_raw(
    params: Array,  # [C+1, 8] f32 (cut lo/hi rows + root row; cols 6-7 pad)
    rox: Array, roy: Array, roz: Array,  # [R,128] f32, R % ROWS == 0
    rdx: Array, rdy: Array, rdz: Array,
    tri_tmin: float,
    interpret: bool = False,
) -> Array:
    rows = rox.shape[0]
    g = rows // ROWS
    kernel = functools.partial(
        _key_kernel, n_cut=params.shape[0] - 1, tri_tmin=tri_tmin
    )
    ray_spec = pl.BlockSpec((ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(params.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
        ]
        + [ray_spec] * 6,
        out_specs=pl.BlockSpec(
            (ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        interpret=interpret,
    )(params, rox, roy, roz, rdx, rdy, rdz)


def coherence_key_pallas(
    scene, ro, rd, eps: Epsilons, interpret: bool = False
) -> Array:
    """[N] i32 coherence key — bit-identical to ops.bvh._coherence_key."""
    from raytracer_tpu.models import vecmath as vm

    ro3, rd3 = vm.as3(ro), vm.as3(rd)
    n = ro3[0].shape[0]
    params = jnp.concatenate(
        [
            jnp.concatenate([scene.bvh_cut_lo, scene.bvh_cut_hi], axis=1),
            jnp.concatenate([scene.bvh_lo[0], scene.bvh_hi[0]])[None, :],
        ],
        axis=0,
    )
    # SMEM rows pad to 8 floats so scalar loads stay within one sublane row.
    params = jnp.pad(params, ((0, 0), (0, 2)))
    block = ROWS * 128
    npad = -(-n // block) * block
    cols = []
    for f in list(ro3) + list(rd3):
        if npad != n:
            # Padded lanes produce garbage keys that are sliced off below.
            f = jnp.concatenate([f, jnp.zeros((npad - n,), f.dtype)])
        cols.append(f.reshape(npad // 128, 128))
    key = coherence_key_pallas_raw(
        params, *cols, tri_tmin=eps.tri_tmin, interpret=interpret
    )
    return key.reshape(-1)[:n]
