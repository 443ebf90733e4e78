"""Flattened BVH: host-side build + stackless device traversal.

The reference accelerates meshes with a pointer-style octree
(src/geometry.rs:1133-1301) whose recursive traversal early-outs on the
first leaf hit (a known quirk; not provably nearest).  Pointer chasing and
recursion do not map to XLA, so the TPU design is:

- **Build (host, numpy):** median-split BVH over triangle centroids,
  flattened in DFS pre-order with *skip links*: ``skip[i]`` is the node
  index right after i's subtree.  Traversal then needs no stack at all:
  on AABB hit continue to ``i+1``, on miss jump to ``skip[i]``.  Leaves
  own a contiguous, reordered triangle range, so leaf tests are dense.

- **Traverse (device, jnp):** a ``lax.while_loop`` per ray, vmapped over
  the wavefront.  Lanes run in lockstep until all finish; cost is the max
  node-path length in the batch.  Nearest-hit semantics (the octree's
  first-leaf early-out quirk is deliberately NOT reproduced — SURVEY §5
  classifies it as a bug to fix).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from raytracer_tpu.config import Epsilons

MAX_LEAF = 4
INF = jnp.float32(3.0e38)


def build_bvh(tri_pts: np.ndarray, max_leaf: int = MAX_LEAF):
    """Build a flattened BVH.

    Args:
      tri_pts: [F,3,3] f64 triangle vertices (a,b,c).

    Returns:
      ((lo[Nn,3] f32, hi[Nn,3] f32, skip[Nn] i32, first[Nn] i32,
        count[Nn] i32), order[F] i64)
      where ``order`` is the leaf-contiguous permutation of input triangles;
      ``first`` indexes into the *reordered* triangle batch.
    """
    n_tris = tri_pts.shape[0]
    centroids = tri_pts.mean(axis=1)

    los: list[np.ndarray] = []
    his: list[np.ndarray] = []
    skips: list[int] = []
    firsts: list[int] = []
    counts: list[int] = []
    order: list[int] = []

    def alloc() -> int:
        los.append(None)  # type: ignore[arg-type]
        his.append(None)  # type: ignore[arg-type]
        skips.append(-1)
        firsts.append(-1)
        counts.append(0)
        return len(skips) - 1

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000))

    def build(idx: np.ndarray) -> None:
        my = alloc()
        pts = tri_pts[idx].reshape(-1, 3)
        los[my] = pts.min(axis=0)
        his[my] = pts.max(axis=0)
        if len(idx) <= max_leaf:
            firsts[my] = len(order)
            counts[my] = len(idx)
            order.extend(idx.tolist())
        else:
            cen = centroids[idx]
            axis = int(np.argmax(cen.max(axis=0) - cen.min(axis=0)))
            perm = np.argsort(cen[:, axis], kind="stable")
            half = len(idx) // 2
            build(idx[perm[:half]])
            build(idx[perm[half:]])
        # skip[i] = first node index past i's subtree; when this line runs the
        # whole subtree has been emitted, so that is exactly len(skips).
        skips[my] = len(skips)

    build(np.arange(n_tris))
    sys.setrecursionlimit(old_limit)

    bvh = (
        np.asarray(los, np.float32),
        np.asarray(his, np.float32),
        np.asarray(skips, np.int32),
        np.asarray(firsts, np.int32),
        np.asarray(counts, np.int32),
    )
    return bvh, np.asarray(order, np.int64)


def _tri_hit_scalar(ro, rd, a, b, c, eps: Epsilons):
    """Scalar Moller-Trumbore t (reference semantics, src/geometry.rs:637-670)."""
    e1 = b - a
    e2 = c - a
    ng = jnp.cross(e1, e2)
    nn = jnp.maximum(jnp.dot(ng, ng), 1e-30)
    n_unit = ng / jnp.sqrt(nn)
    denom = jnp.dot(rd, n_unit)
    t = jnp.dot(a - ro, n_unit) / denom
    p = ro + t * rd
    u = jnp.dot(p - a, jnp.cross(e2, ng)) / nn
    v = jnp.dot(p - a, jnp.cross(ng, e1)) / nn
    ok = (
        (jnp.abs(denom) >= eps.tri_parallel)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > eps.tri_tmin)
    )
    return jnp.where(ok, t, INF)


def bvh_intersect(scene, ro: Array, rd: Array, eps: Epsilons):
    """Nearest BVH-triangle hit per ray.

    Returns (t[N] f32 — INF on miss, tri_idx[N] i32 — GLOBAL triangle index
    into scene.tri_* arrays).
    """
    lo, hi = scene.bvh_lo, scene.bvh_hi
    skip, first, count = scene.bvh_skip, scene.bvh_first, scene.bvh_count
    n_nodes = lo.shape[0]
    base = scene.bvh_tri_start
    tri_a, tri_b, tri_c = scene.tri_a, scene.tri_b, scene.tri_c

    def one_ray(o, d):
        safe_d = jnp.where(jnp.abs(d) < 1e-12, jnp.float32(1e-12), d)
        inv_d = 1.0 / safe_d

        def cond(state):
            node, _, _ = state
            return node < n_nodes

        def body(state):
            node, t_best, i_best = state
            t0 = (lo[node] - o) * inv_d
            t1 = (hi[node] - o) * inv_d
            tnear = jnp.max(jnp.minimum(t0, t1))
            tfar = jnp.min(jnp.maximum(t0, t1))
            box_hit = (tnear <= tfar) & (tfar > eps.tri_tmin) & (tnear < t_best)

            leaf_first = first[node]
            leaf_count = count[node]
            is_leaf_hit = box_hit & (leaf_count > 0)

            def leaf_test(carry):
                t_best, i_best = carry
                for j in range(MAX_LEAF):
                    idx = jnp.clip(base + leaf_first + j, 0, tri_a.shape[0] - 1)
                    t = _tri_hit_scalar(o, d, tri_a[idx], tri_b[idx], tri_c[idx], eps)
                    take = (j < leaf_count) & (t < t_best)
                    t_best = jnp.where(take, t, t_best)
                    i_best = jnp.where(take, idx, i_best)
                return t_best, i_best

            t_best, i_best = jax.lax.cond(
                is_leaf_hit, leaf_test, lambda c: c, (t_best, i_best)
            )
            node = jnp.where(box_hit, node + 1, skip[node])
            return node, t_best, i_best

        _, t_best, i_best = jax.lax.while_loop(
            cond, body, (jnp.int32(0), INF, jnp.int32(0))
        )
        return t_best, i_best

    return jax.vmap(one_ray)(ro, rd)
