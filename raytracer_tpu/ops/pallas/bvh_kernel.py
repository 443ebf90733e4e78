"""Pallas BVH packet-traversal kernel.

The XLA packet traversal (ops/bvh.py) pays ~200us of kernel-launch overhead
PER tree step and locksteps every packet to the slowest one: wall time is
``max-visits x per-iteration-overhead``.  This kernel moves the whole
traversal inside ONE Mosaic kernel:

- grid = one program per 1024-ray packet; each program runs its OWN
  ``while`` loop over the skip-link tree, so total work is the *sum* of
  packet visit counts, not ``n_packets x max``;
- the complete BVH lives in VMEM: nodes packed [NR,16,128] (node i at
  [i//128, field, i%128]) and leaf triangle groups packed
  [TR, 12*MAX_LEAF, 128] (MAX_LEAF tris x 12 precomputed
  barycentric-gradient fields per group) — one dynamic sublane-block read
  + one masked lane-reduction fetches a whole node or leaf (no per-lane
  gathers, which Mosaic lacks);
- rays are [8,128] vregs (8 fields: ro.xyz, rd.xyz, t bound, resolved
  flag); slab tests and the MAX_LEAF leaf triangle tests are dense VPU
  math; leaf work is guarded by a scalar ``lax.cond``.

A per-sublane-row variant (8 independent 128-ray subpackets per program,
SMEM links + row-layout tables) was built and measured SLOWER (74 vs
54 ms per 1M coherent rays): the treetop-cut coherence sort already
removes the union-descent waste per-row pointers target, and the 8x
dynamic sublane fetches + scalar extracts cost more than they save.

Same nearest-hit semantics as ops.bvh.bvh_intersect; parity is tested in
interpret mode (tests/test_pallas_bvh.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.config import Epsilons
from raytracer_tpu.ops import bvh as _bvh  # _bvh.MAX_LEAF read at call time

PACKET = 1024  # rays per program: [8,128] vregs
INF = 3.0e38  # python float: jnp constants captured by the kernel are rejected


def _traverse_kernel(
    rays_ref,  # [1,8,8,128] ro.xyz, rd.xyz, t_init, resolved0
    nodes_ref,  # [NR,16,128]
    tris_ref,  # [TR, 12*MAX_LEAF, 128]
    t_ref,  # [1,8,128] out
    i_ref,  # [1,8,128] i32 out
    *,
    n_nodes: int,
    base: int,
    tri_tmin: float,
    tri_parallel: float,
    any_hit: bool,
):
    ro = [rays_ref[0, k] for k in range(3)]  # 3 x [8,128]
    rd = [rays_ref[0, 3 + k] for k in range(3)]
    t_init = rays_ref[0, 6]  # per-ray search bound (INF when unbounded)
    resolved0 = rays_ref[0, 7] > 0.5  # any-hit mode: lanes already occluded
    inv = [
        1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.float32(1e-12), d) for d in rd
    ]

    node_lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 16, 128), 2)
    tri_lanes = jax.lax.broadcasted_iota(jnp.int32, (1, _bvh.MAX_LEAF * 12, 128), 2)

    def cond(st):
        return st[0] < n_nodes

    def body(st):
        node, t_best, i_best = st

        blk = nodes_ref[pl.ds(node // 128, 1), :, :]  # [1,16,128]
        nf = jnp.sum(jnp.where(node_lanes == node % 128, blk, 0.0), axis=2)  # [1,16]
        lo = [nf[0, 0], nf[0, 1], nf[0, 2]]
        hi = [nf[0, 3], nf[0, 4], nf[0, 5]]
        skip = nf[0, 6].astype(jnp.int32)
        first = nf[0, 7].astype(jnp.int32)
        count = nf[0, 8].astype(jnp.int32)

        # Slab test, dense over the packet.
        tnear = jnp.full((8, 128), -INF)
        tfar = jnp.full((8, 128), INF)
        for k in range(3):
            t0 = (lo[k] - ro[k]) * inv[k]
            t1 = (hi[k] - ro[k]) * inv[k]
            tnear = jnp.maximum(tnear, jnp.minimum(t0, t1))
            tfar = jnp.minimum(tfar, jnp.maximum(t0, t1))
        ray_hit = (tnear <= tfar) & (tfar > tri_tmin) & (tnear < t_best)
        hit_any = jnp.any(ray_hit)

        def leaf(carry):
            t_best, i_best = carry
            g = first // _bvh.MAX_LEAF
            tb = tris_ref[pl.ds(g // 128, 1), :, :]  # [1,12*MAX_LEAF,128]
            tf = jnp.sum(jnp.where(tri_lanes == g % 128, tb, 0.0), axis=2)  # [1,12*MAX_LEAF]
            for j in range(_bvh.MAX_LEAF):
                f = tf[0, 12 * j : 12 * (j + 1)]  # [12]
                nx, ny, nz, n_d = f[0], f[1], f[2], f[3]
                q1x, q1y, q1z, q1a = f[4], f[5], f[6], f[7]
                q2x, q2y, q2z, q2a = f[8], f[9], f[10], f[11]
                denom = nx * rd[0] + ny * rd[1] + nz * rd[2]
                safe_denom = jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
                n_ro = nx * ro[0] + ny * ro[1] + nz * ro[2]
                t = (n_d - n_ro) / safe_denom
                u = (
                    (q1x * ro[0] + q1y * ro[1] + q1z * ro[2])
                    + t * (q1x * rd[0] + q1y * rd[1] + q1z * rd[2])
                    - q1a
                )
                v = (
                    (q2x * ro[0] + q2y * ro[1] + q2z * ro[2])
                    + t * (q2x * rd[0] + q2y * rd[1] + q2z * rd[2])
                    - q2a
                )
                ok = (
                    (jnp.abs(denom) >= tri_parallel)
                    & (u >= 0.0)
                    & (u <= 1.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t > tri_tmin)
                    & (j < count)
                    & (t < t_best)
                )
                t_best = jnp.where(ok, t, t_best)
                i_best = jnp.where(ok, base + first + j, i_best)
            return t_best, i_best

        t_best, i_best = jax.lax.cond(
            hit_any & (count > 0), leaf, lambda c: c, (t_best, i_best)
        )
        node = jnp.where(hit_any, node + 1, skip)
        if any_hit:
            # Shadow mode: stop once every lane is resolved (found any hit
            # below its bound, or was occluded before the mesh search).
            resolved = jnp.all(resolved0 | (t_best < t_init))
            node = jnp.where(resolved, n_nodes, node)
        return node, t_best, i_best

    _, t_best, i_best = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.int32(0),
            t_init,
            jnp.zeros((8, 128), jnp.int32),
        ),
    )
    t_ref[0] = t_best
    i_ref[0] = i_best


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_nodes", "base", "tri_tmin", "tri_parallel", "any_hit", "interpret"
    ),
)
def bvh_intersect_pallas_raw(
    rays: Array,  # [G,8,8,128]
    nodes: Array,  # [NR,16,128]
    tris: Array,  # [TR,12*MAX_LEAF,128]
    n_nodes: int,
    base: int,
    tri_tmin: float,
    tri_parallel: float,
    any_hit: bool = False,
    interpret: bool = False,
):
    g = rays.shape[0]
    kernel = functools.partial(
        _traverse_kernel,
        n_nodes=n_nodes,
        base=base,
        tri_tmin=tri_tmin,
        tri_parallel=tri_parallel,
        any_hit=any_hit,
    )
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 8, 8, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(nodes.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tris.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((g, 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(rays, nodes, tris)


def bvh_intersect_pallas(
    scene, ro: Array, rd: Array, eps: Epsilons,
    t_init: Array | None = None, any_hit: bool = False,
    resolved0: Array | None = None, interpret: bool = False,
    presorted: bool = False,
):
    """Nearest BVH hit via the Pallas kernel -> (t[N], global tri idx[N]).

    Applies the same root-cull + coherence sort as the XLA path, reshapes
    rays into [G,8,8,128] packets (fields 6/7 = per-ray t bound and
    already-resolved flag; see ops.bvh.bvh_intersect for the pruning
    contract), and unsorts the results.  ``presorted`` callers (the
    streaming engine permutes its lane state by the same key) skip both.
    """
    from raytracer_tpu.ops.bvh import _coherence_order

    n = ro.shape[0]
    if t_init is None:
        t_init = jnp.full((n,), INF, jnp.float32)
    if resolved0 is None:
        resolved0 = jnp.zeros((n,), jnp.float32)
    else:
        resolved0 = resolved0.astype(jnp.float32)
    # Pack ray fields BEFORE permuting so the sort costs ONE row gather
    # (separate ro[order]/rd[order]/... gathers measured ~2x slower).
    rays8 = jnp.concatenate(
        [ro, rd, t_init[:, None], resolved0[:, None]], axis=1
    )  # [N,8]
    if not presorted:
        order, inverse = _coherence_order(scene, ro, rd, eps)
        rays8 = jnp.take(rays8, order, axis=0)

    g = -(-n // PACKET)
    pad = g * PACKET - n
    if pad:
        # Padded lanes: degenerate rays (d=0 -> slab miss), resolved=1.
        pad_row = jnp.zeros((pad, 8)).at[:, 7].set(1.0)
        rays8 = jnp.concatenate([rays8, pad_row], axis=0)
    rays = rays8.reshape(g, 8, 128, 8).transpose(0, 3, 1, 2)  # [G,8f,8,128]

    t, idx = bvh_intersect_pallas_raw(
        rays,
        scene.bvh_nodes_packed,
        scene.bvh_tris_packed,
        n_nodes=scene.bvh_lo.shape[0],
        base=scene.bvh_tri_start,
        tri_tmin=eps.tri_tmin,
        tri_parallel=eps.tri_parallel,
        any_hit=any_hit,
        interpret=interpret,
    )
    t = t.reshape(-1)[:n]
    idx = idx.reshape(-1)[:n]
    if not presorted:
        t = t[inverse]
        idx = idx[inverse]
    return t, jnp.clip(idx, 0, scene.tri_a.shape[0] - 1)
