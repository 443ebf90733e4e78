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


def _traverse8_kernel(
    rays_ref,  # [1,8,8,128] ro.xyz, rd.xyz, t_init, resolved0
    nodes8_ref,  # [NR8,64,128] 8-wide nodes (node i at [i//128, :, i%128])
    tris_ref,  # [TR, 12*MAX_LEAF, 128], or [GL, 8, 6*MAX_LEAF] when mxu_leaf
    t_ref,  # [1,8,128] out
    i_ref,  # [1,8,128] i32 out
    stack_ref,  # SMEM [STACK] i32 scratch
    *,
    base: int,
    tri_tmin: float,
    tri_parallel: float,
    any_hit: bool,
    mxu_leaf: bool = False,
    smem_nodes: bool = False,
):
    """8-wide BVH traversal with a per-packet SMEM stack.

    ``smem_nodes``: nodes8_ref is instead a [Nw,64] SMEM array — node
    fields become 64 native scalar loads per visit instead of a dynamic
    VMEM block read + masked lane reduction + 64 vector extracts (the
    node path dominated once leaves got fat: RT_LEAF_TRIS=0 measured
    17.6 of the 21.1 ms/1M kernel).

    vs the binary skip-link kernel (_traverse_kernel): ONE node fetch
    (dynamic VMEM block read + masked lane reduction) now yields EIGHT
    child AABBs, so the per-step fixed cost (the measured bottleneck —
    BENCHMARKS.md round-2 log) is amortized 8x, and the stack descends
    only into children the packet actually hit instead of stepping through
    every node of the union's DFS order.  Stack entries: wide-node id
    (>= 0) or an encoded leaf ``-(group)-1`` — leaf work stays a single
    lax.cond body instead of being inlined 8x per node visit (which would
    blow the kernel's code size out 8x).
    """
    ml = _bvh.MAX_LEAF
    ro = [rays_ref[0, k] for k in range(3)]  # 3 x [8,128]
    rd = [rays_ref[0, 3 + k] for k in range(3)]
    t_init = rays_ref[0, 6]
    resolved0 = rays_ref[0, 7] > 0.5
    inv = [
        1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.float32(1e-12), d) for d in rd
    ]

    if not smem_nodes:
        node_lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 64, 128), 2)
    if not mxu_leaf:
        tri_lanes = jax.lax.broadcasted_iota(jnp.int32, (1, ml * 12, 128), 2)

    stack_ref[0] = 0  # root wide node

    def cond(st):
        return st[0] > 0

    def body(st):
        sp, t_best, i_best = st
        sp = sp - 1
        x = stack_ref[sp]

        def leaf_case_mxu(carry):
            """MXU leaf: per 128-ray chunk c (= sublane row c of the packet
            layout), out = T_g^T @ R_c puts all six barycentric-gradient dot
            products for (64 tris x 128 rays) in ONE [384,128] matmul with
            triangles on SUBLANES — no scalar extracts, no masked block
            reduction (see ops.bvh.pack_tris_mxu for the column layout).
            The leaf argmin is a 6-step sublane tree; strict < keeps the
            lower triangle slot on ties, matching the dense form's j order.
            """
            sp, t_best, i_best = carry
            g = -x - 1
            first = g * ml
            tg = tris_ref[pl.ds(g, 1), :, :][0]  # [8, 6*ml]
            row_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            sub_iota = jax.lax.broadcasted_iota(jnp.int32, (ml, 128), 0)
            t_rows = []
            i_rows = []
            for c in range(8):
                rc = rays_ref[0, :, c, :]  # [8,128] fields on sublanes
                # Row 6 (t bound) becomes the constant-1 row the table's
                # folded n_d/q1a/q2a terms multiply; row 7's weights are 0.
                rc = jnp.where(row_iota == 6, 1.0, rc)
                # Precision.HIGHEST is REQUIRED: against a host-f64 oracle
                # a [8,384]x[8,128] transposed-lhs probe on this platform
                # returns garbage at default precision (rel err ~7, not a
                # bf16 truncation) and ~1e-4 at HIGHEST.  With HIGHEST the
                # whole variant measured 34.4 vs the dense leaf's 21.3
                # ms/1M coherent rays — see BENCHMARKS.md round-3 dead
                # ends; kept env-gated for re-measurement on fixed stacks.
                out = jax.lax.dot_general(
                    tg,
                    rc,
                    (((0,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )  # [6*ml, 128]
                denom = out[0 * ml : 1 * ml]
                numer = out[1 * ml : 2 * ml]
                u0 = out[2 * ml : 3 * ml]
                u1 = out[3 * ml : 4 * ml]
                v0 = out[4 * ml : 5 * ml]
                v1 = out[5 * ml : 6 * ml]
                t = numer / denom
                u = u0 + t * u1
                v_ = v0 + t * v1
                tb_row = t_best[c : c + 1, :]  # [1,128]
                ok = (
                    (jnp.abs(denom) >= tri_parallel)
                    & (u >= 0.0)
                    & (v_ >= 0.0)
                    & (u + v_ <= 1.0)
                    & (t > tri_tmin)
                    & (t < tb_row)
                )
                tc = jnp.where(ok, t, INF)
                jc = sub_iota
                s = ml
                while s > 1:
                    s //= 2
                    tl, tr = tc[:s], tc[s : 2 * s]
                    jl, jr = jc[:s], jc[s : 2 * s]
                    take = tr < tl  # strict: ties keep the lower slot
                    tc = jnp.where(take, tr, tl)
                    jc = jnp.where(take, jr, jl)
                better = tc < tb_row  # [1,128]
                t_rows.append(jnp.where(better, tc, tb_row))
                i_rows.append(
                    jnp.where(better, base + first + jc, i_best[c : c + 1, :])
                )
            return (
                sp,
                jnp.concatenate(t_rows, axis=0),
                jnp.concatenate(i_rows, axis=0),
            )

        def leaf_case(carry):
            sp, t_best, i_best = carry
            g = -x - 1
            first = g * ml
            tb = tris_ref[pl.ds(g // 128, 1), :, :]  # [1,12*ml,128]
            tf = jnp.sum(jnp.where(tri_lanes == g % 128, tb, 0.0), axis=2)
            # RT_LEAF_TRIS: measurement hook — unroll only the first k
            # triangle tests per leaf (k=0 isolates the fetch+reduce cost;
            # the traversal then prunes less, so treat splits as bounds).
            import os as _os

            ml_test = int(_os.environ.get("RT_LEAF_TRIS", ml))
            for j in range(min(ml, ml_test)):
                f = tf[0, 12 * j : 12 * (j + 1)]  # [12]
                nx, ny, nz, n_d = f[0], f[1], f[2], f[3]
                q1x, q1y, q1z, q1a = f[4], f[5], f[6], f[7]
                q2x, q2y, q2z, q2a = f[8], f[9], f[10], f[11]
                denom = nx * rd[0] + ny * rd[1] + nz * rd[2]
                n_ro = nx * ro[0] + ny * ro[1] + nz * ro[2]
                # Leaf-math trims vs the binary kernel (measured ~15% off
                # the leaf-bound kernel time, parity tests unchanged):
                # - denom==0 divides to inf/nan whose compares are False,
                #   so no safe-denominator select is needed;
                # - padded slots are all-zero (degenerate -> denom 0), so
                #   no j<count mask is needed;
                # - u<=1 is implied by v>=0 & u+v<=1.
                # (A Newton-refined pl.reciprocal(approx=True) in place of
                # this divide measured SLIGHTLY SLOWER on kbench (31.4 vs
                # 30.1 ms/1M coherent) — the Mosaic divide is already fast
                # and the leaf is not divide-bound.  Round-4 probe.)
                t = (n_d - n_ro) / denom
                u = (
                    (q1x * ro[0] + q1y * ro[1] + q1z * ro[2])
                    + t * (q1x * rd[0] + q1y * rd[1] + q1z * rd[2])
                    - q1a
                )
                v_ = (
                    (q2x * ro[0] + q2y * ro[1] + q2z * ro[2])
                    + t * (q2x * rd[0] + q2y * rd[1] + q2z * rd[2])
                    - q2a
                )
                ok = (
                    (jnp.abs(denom) >= tri_parallel)
                    & (u >= 0.0)
                    & (v_ >= 0.0)
                    & (u + v_ <= 1.0)
                    & (t > tri_tmin)
                    & (t < t_best)
                )
                t_best = jnp.where(ok, t, t_best)
                i_best = jnp.where(ok, base + first + j, i_best)
            return sp, t_best, i_best

        def node_case(carry):
            sp, t_best, i_best = carry
            if smem_nodes:
                def nfld(f):  # native SMEM scalar load
                    return nodes8_ref[x, f]
            else:
                blk = nodes8_ref[pl.ds(x // 128, 1), :, :]  # [1,64,128]
                nf = jnp.sum(
                    jnp.where(node_lanes == x % 128, blk, 0.0), axis=2
                )

                def nfld(f):  # vector extract from the reduced row
                    return nf[0, f]

            pv = []  # per-child encoded push value
            cnts = []
            rowmins = []  # per-child [128] min-over-sublanes of masked tnear
            for c in range(8):
                f0 = 8 * c
                lo = [nfld(f0), nfld(f0 + 1), nfld(f0 + 2)]
                hi = [nfld(f0 + 3), nfld(f0 + 4), nfld(f0 + 5)]
                child = nfld(f0 + 6).astype(jnp.int32)
                cnt = nfld(f0 + 7).astype(jnp.int32)
                tnear = jnp.full((8, 128), -INF)
                tfar = jnp.full((8, 128), INF)
                for k in range(3):
                    t0 = (lo[k] - ro[k]) * inv[k]
                    t1 = (hi[k] - ro[k]) * inv[k]
                    tnear = jnp.maximum(tnear, jnp.minimum(t0, t1))
                    tfar = jnp.minimum(tfar, jnp.maximum(t0, t1))
                ray_hit = (tnear <= tfar) & (tfar > tri_tmin) & (tnear < t_best)
                # Encode: internal as wide-node id, leaf as -(group)-1
                # (count==0 slots are empty and never pushed; the leaf body
                # needs no count — padded slots are degenerate).
                pv.append(jnp.where(cnt > 0, -(child // ml) - 1, child))
                cnts.append(cnt)
                # Defer the cross-lane reduction: fold sublanes now (cheap),
                # stack the 8 children's rows, and pay ONE lane reduction
                # for the whole node instead of 16 (any + min per child).
                rowmins.append(
                    jnp.min(jnp.where(ray_hit, tnear, INF), axis=0)  # [128]
                )
            tmin8 = jnp.min(jnp.stack(rowmins), axis=1)  # [8] per-child min
            tm = []  # per-child packet-min entry distance (-INF = no push)
            for c in range(8):
                tmin_c = tmin8[c]
                # hit_any == (some lane kept a finite tnear) == tmin_c < INF
                tm.append(
                    jnp.where(
                        (tmin_c < jnp.float32(1e38)) & (cnts[c] != 0),
                        tmin_c,
                        jnp.float32(-INF),
                    )
                )
            # Ordered descent: sort children by packet-min entry distance
            # (descending) so the NEAREST child is pushed last and popped
            # first — earlier t_best hits then prune farther subtrees.
            # Batcher's 19-comparator network on 8 scalars; non-pushed
            # children carry tm=-INF and sink to the end harmlessly.
            for a, b in (
                (0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6),
                (5, 7), (1, 2), (5, 6), (0, 4), (1, 5), (2, 6), (3, 7),
                (2, 4), (3, 5), (1, 2), (3, 4), (5, 6),
            ):
                swap = tm[a] < tm[b]
                tm[a], tm[b] = (
                    jnp.where(swap, tm[b], tm[a]),
                    jnp.where(swap, tm[a], tm[b]),
                )
                pv[a], pv[b] = (
                    jnp.where(swap, pv[b], pv[a]),
                    jnp.where(swap, pv[a], pv[b]),
                )
            for c in range(8):
                stack_ref[sp] = pv[c]
                sp = sp + (tm[c] > jnp.float32(-1e38)).astype(jnp.int32)
            return sp, t_best, i_best

        sp, t_best, i_best = jax.lax.cond(
            x < 0,
            leaf_case_mxu if mxu_leaf else leaf_case,
            node_case,
            (sp, t_best, i_best),
        )
        if any_hit:
            resolved = jnp.all(resolved0 | (t_best < t_init))
            sp = jnp.where(resolved, 0, sp)
        return sp, t_best, i_best

    _, t_best, i_best = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.int32(1),
            t_init,
            jnp.zeros((8, 128), jnp.int32),
        ),
    )
    t_ref[0] = t_best
    i_ref[0] = i_best


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_stack", "base", "tri_tmin", "tri_parallel", "any_hit",
        "mxu_leaf", "smem_nodes", "interpret",
    ),
)
def bvh8_intersect_pallas_raw(
    rays: Array,  # [G,8,8,128]
    nodes8: Array,  # [NR8,64,128], or [Nw,64] when smem_nodes
    tris: Array,  # [TR,12*MAX_LEAF,128], or [GL,8,6*MAX_LEAF] when mxu_leaf
    max_stack: int,
    base: int,
    tri_tmin: float,
    tri_parallel: float,
    any_hit: bool = False,
    mxu_leaf: bool = False,
    smem_nodes: bool = False,
    interpret: bool = False,
):
    g = rays.shape[0]
    kernel = functools.partial(
        _traverse8_kernel,
        base=base,
        tri_tmin=tri_tmin,
        tri_parallel=tri_parallel,
        any_hit=any_hit,
        mxu_leaf=mxu_leaf,
        smem_nodes=smem_nodes,
    )
    if smem_nodes:
        nodes_spec = pl.BlockSpec(
            nodes8.shape, lambda i: (0, 0), memory_space=pltpu.SMEM
        )
    else:
        nodes_spec = pl.BlockSpec(
            nodes8.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 8, 8, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            nodes_spec,
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
        scratch_shapes=[pltpu.SMEM((max(max_stack, 16),), jnp.int32)],
        interpret=interpret,
    )(rays, nodes8, tris)


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

    ``ro``/``rd`` may be [N,3] arrays or SoA component tuples.  The
    kernel's input layout is FIELD-major ([G, 8 fields, 8, 128]), so SoA
    components pack with pure reshapes + one stack on a leading axis — no
    cross-lane interleave at all (the [N,8] concat + transpose the array
    form needs costs a relayout of every field).
    """
    from raytracer_tpu.models import vecmath as vm
    from raytracer_tpu.ops.bvh import _coherence_key, _coherence_order

    import os

    ro3, rd3 = vm.as3(ro), vm.as3(rd)
    n = ro3[0].shape[0]
    if t_init is None:
        t_init = jnp.full((n,), INF, jnp.float32)
    if resolved0 is None:
        resolved0 = jnp.zeros((n,), jnp.float32)
    else:
        resolved0 = resolved0.astype(jnp.float32)
    fields = list(ro3) + list(rd3) + [t_init, resolved0]  # 8 x [N]

    # widesmem default: node fields as native SMEM scalar loads measured
    # 5.46 vs 5.59 s end-to-end on flying_unicorn @16spp (and faster on
    # both kbench shapes) vs the VMEM masked-lane-reduction form.
    variant = os.environ.get("RT_BVH_KERNEL", "widesmem")

    def run(rays):
        """Dispatch the selected kernel variant on [G,8,8,128] packets."""
        if variant in ("wide", "widemxu", "widesmem"):
            mxu = variant == "widemxu"
            smem = variant == "widesmem"
            if mxu and not scene.has_mxu_tris:
                raise ValueError(
                    "RT_BVH_KERNEL=widemxu but the scene was built without "
                    "MXU leaf matrices — set the env var BEFORE loading the "
                    "scene"
                )
            return bvh8_intersect_pallas_raw(
                rays,
                scene.bvh8_nodes_flat if smem else scene.bvh8_nodes_packed,
                scene.bvh_tris_mxu if mxu else scene.bvh_tris_packed,
                max_stack=scene.bvh8_max_stack,
                base=scene.bvh_tri_start,
                tri_tmin=eps.tri_tmin,
                tri_parallel=eps.tri_parallel,
                any_hit=any_hit,
                mxu_leaf=mxu,
                smem_nodes=smem,
                interpret=interpret,
            )
        return bvh_intersect_pallas_raw(
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

    g = -(-n // PACKET)
    if not presorted:
        # Pack ray fields BEFORE permuting so the sort costs ONE row gather
        # (separate ro[order]/rd[order]/... gathers measured ~2x slower).
        rays8 = jnp.stack(fields, axis=1)  # [N,8]
        # Shadow-wavefront compaction: lanes needing no mesh query — root
        # misses (parked / back-face-culled rays) and lanes resolved before
        # the mesh search (occluded by a sphere/plane, or t_cap <= 0) —
        # sort to the TAIL (the key's bit 30).  In production ~half or more
        # of each NEE wavefront is such dead freight (the cull alone
        # removes ~half), so when the live count fits, dispatch the pack
        # gather + kernel on only the first half of the sorted packets; the
        # tail's result is its own t_init, which is exactly what the kernel
        # returns for resolved lanes.  lax.cond falls back to the full
        # width when more than half the lanes are live.
        # Measured WALL-NEUTRAL end-to-end (BENCHMARKS.md round-3 dead
        # ends: 3.89 vs 3.91 s on flying_unicorn @16spp, both slice-on-live
        # and forced-always-slice) — kept env-gated OFF for re-measurement
        # if the glue/kernel cost ratio shifts.
        compact = (
            any_hit
            and g >= 2
            and os.environ.get("RT_SHADOW_COMPACT", "0") != "0"
        )
        if compact:
            key = _coherence_key(scene, ro3, rd3, eps)
            key = key | ((resolved0 >= 0.5).astype(jnp.int32) << 30)
            order = jnp.argsort(key)
            g_half = (g + 1) // 2
            n_half = g_half * PACKET  # < n whenever g >= 2
            n_live = jnp.sum(((key >> 30) == 0).astype(jnp.int32))

            def sliced(r8):
                # HALF the pack gather: only the live prefix's rows move.
                r = jnp.take(r8, order[:n_half], axis=0)
                rp = r.reshape(g_half, 8, 128, 8).transpose(0, 3, 1, 2)
                t, idx = run(rp)
                return (
                    jnp.concatenate(
                        [t.reshape(-1), jnp.take(t_init, order[n_half:])]
                    ),
                    jnp.concatenate(
                        [idx.reshape(-1), jnp.zeros((n - n_half,), jnp.int32)]
                    ),
                )

            def full(r8):
                r = jnp.take(r8, order, axis=0)
                pad = g * PACKET - n
                if pad:
                    pad_row = jnp.zeros((pad, 8)).at[:, 7].set(1.0)
                    r = jnp.concatenate([r, pad_row], axis=0)
                rp = r.reshape(g, 8, 128, 8).transpose(0, 3, 1, 2)
                t, idx = run(rp)
                return t.reshape(-1)[:n], idx.reshape(-1)[:n]

            if os.environ.get("RT_SHADOW_COMPACT") == "force":
                t, idx = sliced(rays8)  # timing probe: image invalid if >half live
            else:
                t, idx = jax.lax.cond(n_live <= n_half, sliced, full, rays8)
        elif os.environ.get("RT_BVH_VSORT", "0") == "1":
            # Variadic-sort pack: ONE stable 10-operand lax.sort (key, lane
            # iota, 8 ray fields) replaces the [N,8] field stack (a
            # cross-lane relayout), the key argsort, AND the row gather by
            # `order` — the sorted fields then pack with the presorted
            # path's contiguous reshapes.  The iota payload column IS the
            # forward permutation the unsort below needs (ties resolve by
            # lane order, exactly like the stable argsort it replaces).
            # Round 3 measured a 24-operand variant of this SLOWER than the
            # packed gather for the 20-column state permutation; at 8 ray
            # columns the trade may flip — env-gated for measurement.
            key = _coherence_key(scene, ro3, rd3, eps)
            iota = jnp.arange(n, dtype=jnp.int32)
            out = jax.lax.sort((key, iota, *fields), num_keys=1)
            order = out[1]
            sfields = list(out[2:])
            pad = g * PACKET - n
            if pad:
                sfields = [
                    jnp.concatenate(
                        [f, jnp.full((pad,), 1.0 if k == 7 else 0.0, f.dtype)]
                    )
                    for k, f in enumerate(sfields)
                ]
            rays = jnp.stack(
                [f.reshape(g, 8, 128) for f in sfields], axis=1
            )
            t, idx = run(rays)
            t, idx = t.reshape(-1)[:n], idx.reshape(-1)[:n]
        else:
            # Group-quantized order: measured 3.3x SLOWER end-to-end at G=8
            # (see render/wavefront._SORT_GROUP — a min-key group drags dead
            # lanes into live packets, defeating the sort's dead-lane
            # compaction, which matters more than the fatter gather rows it
            # buys).  Env-gated OFF; default is the per-lane order below.
            G = int(os.environ.get("RT_SORT_GROUP", "1"))
            order = order_g = None
            if G > 1 and n % G == 0:
                key = _coherence_key(scene, ro3, rd3, eps)
                gkey = jnp.min(key.reshape(n // G, G), axis=1)
                order_g = jnp.argsort(gkey)
                rays8 = jnp.take(
                    rays8.reshape(n // G, G * 8), order_g, axis=0
                ).reshape(n, 8)
            else:
                order, _ = _coherence_order(scene, ro3, rd3, eps)
                rays8 = jnp.take(rays8, order, axis=0)
            pad = g * PACKET - n
            if pad:
                # Padded lanes: degenerate rays (d=0 -> slab miss), resolved=1.
                pad_row = jnp.zeros((pad, 8)).at[:, 7].set(1.0)
                rays8 = jnp.concatenate([rays8, pad_row], axis=0)
            rays = rays8.reshape(g, 8, 128, 8).transpose(0, 3, 1, 2)
            t, idx = run(rays)
            t, idx = t.reshape(-1), idx.reshape(-1)
    else:
        pad = g * PACKET - n
        if pad:
            fields = [
                jnp.concatenate(
                    [f, jnp.full((pad,), 1.0 if k == 7 else 0.0, f.dtype)]
                )
                for k, f in enumerate(fields)
            ]
        rays = jnp.stack(
            [f.reshape(g, 8, 128) for f in fields], axis=1
        )  # [G,8f,8,128] — contiguous reshapes, no interleave
        t, idx = run(rays)
        t, idx = t.reshape(-1), idx.reshape(-1)
    t = t[:n]
    idx = idx[:n]
    if not presorted:
        if order is None:
            # Grouped unsort: one inverse argsort at N/G plus one gather of
            # N/G rows of G results per output (fat contiguous rows again).
            inv_g = jnp.argsort(order_g)
            ng = order_g.shape[0]
            t = jnp.take(t.reshape(ng, -1), inv_g, axis=0).reshape(-1)
            idx = jnp.take(idx.reshape(ng, -1), inv_g, axis=0).reshape(-1)
        else:
            # Unsort by SORTING on the forward permutation: out[order[i]] =
            # x[i] is exactly "sort x by key=order".  A 540k 2-operand
            # lax.sort is ~0.76 ms on v5e where the equivalent 1-D
            # gather-by-inverse measured 3.6 ms (profiler, round 3) — and no
            # inverse permutation is ever materialized.  Separate sorts per
            # output so XLA drops the idx one entirely for trace_t callers
            # that discard it.
            _, t = jax.lax.sort((order, t), num_keys=1)
            _, idx = jax.lax.sort((order, idx), num_keys=1)
    return t, jnp.clip(idx, 0, scene.tri_a.shape[0] - 1)
