"""Batched ray-primitive intersection.

The reference intersects one ray against one object at a time through an
enum dispatch (src/geometry.rs:512-571) inside a per-object linear scan
(src/scene.rs:272-289).  Here a whole wavefront of N rays is tested
against all primitives at once, laid out for the TPU's VPU:

- every per-(ray, primitive) quantity lives in a ``[K, N]`` array —
  primitives on the *sublane* axis, rays on the dense 128-wide *lane*
  axis.  (The transposed ``[N, K]`` layout leaves 15/16 of every vector
  register empty at K=8 and measured ~2x slower.)
- dot products are expanded into component FMAs (exact f32 on the VPU;
  an earlier MXU-matmul formulation needed 6-pass Precision.HIGHEST
  because the TPU's default bf16 matmul corrupts the sphere
  discriminant's 5-digit cancellation at this scene's scale).
- empty primitive groups compile away entirely (static scene metadata).

Semantics preserved from the reference (two-sided normals, epsilon
cutoffs, near-then-far sphere root) with f32-retuned epsilons from
``config.Epsilons``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct
from jax import Array

from raytracer_tpu.config import Epsilons
from raytracer_tpu.models import vecmath as vm
from raytracer_tpu.models.scene import SceneArrays

INF = jnp.float32(3.0e38)


@struct.dataclass
class Hit:
    """Nearest-hit record for a wavefront (reference Hit: src/geometry.rs:418-424)."""

    t: Array  # [N]
    pos: Array  # [N,3] (offset along the normal for planes/triangles)
    n: Array  # [N,3] two-sided shading normal (faces the incoming ray)
    obj: Array  # [N] i32 object index
    valid: Array  # [N] bool


class TriPre(NamedTuple):
    """Per-triangle precomputed intersection data (loop-invariant)."""

    n_unit: Array  # [T,3] unit geometric normal
    n_d: Array  # [T] plane offset a.n_unit
    q1: Array  # [T,3] barycentric gradient for u
    q2: Array  # [T,3] barycentric gradient for v
    q1_a: Array  # [T] a.q1
    q2_a: Array  # [T] a.q2


def tri_precompute(a: Array, b: Array, c: Array) -> TriPre:
    e1 = b - a
    e2 = c - a
    ng = vm.cross(e1, e2)  # [T,3] unnormalized geometric normal
    nn = jnp.maximum(vm.norm2(ng), jnp.float32(1e-30))
    n_unit = ng / jnp.sqrt(nn)[..., None]
    q1 = vm.cross(e2, ng) / nn[..., None]
    q2 = vm.cross(ng, e1) / nn[..., None]
    return TriPre(
        n_unit=n_unit,
        n_d=vm.dot(a, n_unit),
        q1=q1,
        q2=q2,
        q1_a=vm.dot(a, q1),
        q2_a=vm.dot(a, q2),
    )


def _dot_kn(p: Array, v3) -> Array:
    """dot(p[K,3], v=(x,y,z) of [N]) -> [K,N] via component FMAs.

    ``v3`` is an SoA component tuple — [K,N] intermediates are fully
    lane-dense and no [N,3] slice relayouts occur (each ``v[:, k]`` on an
    [N,3] array is a cross-lane gather that measured ~1-2 ms per use at
    540k lanes)."""
    return (
        p[:, 0:1] * v3[0][None, :]
        + p[:, 1:2] * v3[1][None, :]
        + p[:, 2:3] * v3[2][None, :]
    )


def intersect_spheres(
    ro, rd, pos: Array, r: Array, valid: Array, eps: Epsilons
) -> Array:
    """t of nearest valid root per (sphere, ray) -> [S,N]; INF on miss.

    smallpt quadratic with near-root-then-far-root selection
    (reference: src/geometry.rs:514-550).  ``ro``/``rd`` may be [N,3]
    arrays or SoA component tuples (the hot path).
    """
    ro, rd = vm.as3(ro), vm.as3(rd)
    b = _dot_kn(pos, rd) - vm.dot3(ro, rd)[None, :]  # [S,N] op.d
    opop = (
        vm.norm2(pos)[:, None] - 2.0 * _dot_kn(pos, ro) + vm.norm2_3(ro)[None, :]
    )  # [S,N] op.op
    det = b * b - opop + (r * r)[:, None]
    sq = jnp.sqrt(jnp.maximum(det, 0.0))
    t_near = b - sq
    t_far = b + sq
    t = jnp.where(t_near > eps.sphere_tmin, t_near, jnp.where(t_far > eps.sphere_tmin, t_far, INF))
    return jnp.where((det >= 0.0) & valid[:, None], t, INF)


def intersect_planes(
    ro, rd, pos: Array, n: Array, valid: Array, eps: Epsilons
) -> Array:
    """t per (plane, ray) -> [P,N]; INF on miss.

    Reference: parallel cutoff |d.n|<1e-4, accepts t>=0 (src/geometry.rs:551-568).
    """
    ro, rd = vm.as3(ro), vm.as3(rd)
    d_dot_n = _dot_kn(n, rd)  # [P,N]
    po_dot_n = vm.dot(pos, n)[:, None] - _dot_kn(n, ro)  # [P,N] (pos-ro).n
    t = po_dot_n / d_dot_n
    ok = (jnp.abs(d_dot_n) >= eps.plane_parallel) & (t >= 0.0) & valid[:, None]
    return jnp.where(ok, t, INF)


def intersect_triangles(
    ro, rd, pre: TriPre, valid: Array, eps: Epsilons
) -> Array:
    """t per (triangle, ray) -> [T,N]; INF on miss.

    Moller-Trumbore rewritten in barycentric-gradient form: with
    per-triangle q1=(e2 x n)/|n|^2, q2=(n x e1)/|n|^2 the test needs six
    [T,N] dot maps and a handful of FMAs (reference: src/geometry.rs:637-670).
    """
    ro, rd = vm.as3(ro), vm.as3(rd)
    denom = _dot_kn(pre.n_unit, rd)  # [T,N] d.n
    t = (pre.n_d[:, None] - _dot_kn(pre.n_unit, ro)) / denom
    # p.q = ro.q + t * rd.q  without materializing p per pair
    u = _dot_kn(pre.q1, ro) + t * _dot_kn(pre.q1, rd) - pre.q1_a[:, None]
    v = _dot_kn(pre.q2, ro) + t * _dot_kn(pre.q2, rd) - pre.q2_a[:, None]
    ok = (
        (jnp.abs(denom) >= eps.tri_parallel)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > eps.tri_tmin)
        & valid[:, None]
    )
    return jnp.where(ok, t, INF)


def use_pallas_bvh() -> bool:
    """Mesh traversal backend choice: the Pallas kernel on real TPUs, the
    XLA packet traversal elsewhere (and under RT_NO_PALLAS=1)."""
    import os

    if os.environ.get("RT_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


class ScenePre(NamedTuple):
    """Loop-invariant precomputed intersection data for a scene."""

    tri: TriPre
    # Combined hit-attribute table [S+P+T, 4]: per row a 3-vector (sphere
    # center / plane normal / triangle unit normal) and the object id as
    # f32 (exact below 2^24).  trace() gathers the winner's attributes
    # with ONE row gather instead of three per-group gathers + selects.
    att: Array


def scene_precompute(scene: SceneArrays) -> ScenePre:
    tri = tri_precompute(scene.tri_a, scene.tri_b, scene.tri_c)
    att = jnp.concatenate(
        [
            jnp.concatenate(
                [scene.sph_pos, scene.sph_obj[:, None].astype(jnp.float32)], axis=1
            ),
            jnp.concatenate(
                [scene.pln_n, scene.pln_obj[:, None].astype(jnp.float32)], axis=1
            ),
            jnp.concatenate(
                [tri.n_unit, scene.tri_obj[:, None].astype(jnp.float32)], axis=1
            ),
        ],
        axis=0,
    )
    return ScenePre(tri=tri, att=att)


def _group_ts(
    scene: SceneArrays,
    pre: ScenePre,
    ro: Array,
    rd: Array,
    eps: Epsilons,
    t_cap: Array | None = None,
    any_hit: bool = False,
    presorted: bool = False,
):
    """Per-group (nearest t [N], argmin [N]) with empty groups compiled out.

    ``t_cap`` optionally bounds the search (hits at/beyond it may be
    dropped) — only the BVH honors it today (mesh traversal is the only
    path where pruning pays).  ``any_hit`` additionally lets the mesh
    search stop at the first sub-cap hit per ray (shadow queries).
    """
    ro, rd = vm.as3(ro), vm.as3(rd)
    n_rays = ro[0].shape[0]
    inf = jnp.full((n_rays,), INF)
    zero = jnp.zeros((n_rays,), jnp.int32)

    if scene.n_spheres > 0:
        ts = intersect_spheres(ro, rd, scene.sph_pos, scene.sph_r, scene.sph_valid, eps)
        ts_best, ts_arg = jnp.min(ts, axis=0), jnp.argmin(ts, axis=0).astype(jnp.int32)
    else:
        ts_best, ts_arg = inf, zero

    if scene.n_planes > 0:
        tp = intersect_planes(ro, rd, scene.pln_pos, scene.pln_n, scene.pln_valid, eps)
        tp_best, tp_arg = jnp.min(tp, axis=0), jnp.argmin(tp, axis=0).astype(jnp.int32)
    else:
        tp_best, tp_arg = inf, zero

    if scene.n_triangles == 0:
        tt_best, tt_arg = inf, zero
    elif scene.use_bvh:
        # Brute-force prefix (cube/prism tris) + BVH over the mesh tail.
        k = scene.bvh_tri_start
        if k > 0:
            pre_prefix = TriPre(*(x[:k] for x in pre.tri))
            tt = intersect_triangles(ro, rd, pre_prefix, scene.tri_valid[:k], eps)
            tt_best = jnp.min(tt, axis=0)
            tt_arg = jnp.argmin(tt, axis=0).astype(jnp.int32)
        else:
            tt_best, tt_arg = inf, zero
        # Seed traversal with everything already known to be closer: the
        # nearest sphere/plane/prefix hit (ties resolve to the lower group
        # index downstream, so an un-improved seed never wins) and the
        # caller's cap.
        t_init = jnp.minimum(jnp.minimum(ts_best, tp_best), tt_best)
        resolved0 = None
        if t_cap is not None:
            if any_hit:
                # Lanes already occluded by a sphere/plane/prefix hit need
                # no mesh confirmation; neither do lanes with a nonpositive
                # bound (parked/non-NEE lanes pass t_max=0).
                resolved0 = (t_init < t_cap) | (t_cap <= 0.0)
            t_init = jnp.minimum(t_init, t_cap)
        if use_pallas_bvh():
            from raytracer_tpu.ops.pallas.bvh_kernel import bvh_intersect_pallas

            bt, bidx = bvh_intersect_pallas(
                scene, ro, rd, eps, t_init=t_init,
                any_hit=any_hit and t_cap is not None, resolved0=resolved0,
                presorted=presorted,
            )
        else:
            from raytracer_tpu.ops.bvh import bvh_intersect

            bt, bidx = bvh_intersect(
                scene, ro, rd, eps, t_init=t_init,
                any_hit=any_hit and t_cap is not None, resolved0=resolved0,
                presorted=presorted,
            )
        use_b = bt < tt_best
        tt_best = jnp.where(use_b, bt, tt_best)
        tt_arg = jnp.where(use_b, bidx, tt_arg)
    else:
        tt = intersect_triangles(ro, rd, pre.tri, scene.tri_valid, eps)
        tt_best = jnp.min(tt, axis=0)
        tt_arg = jnp.argmin(tt, axis=0).astype(jnp.int32)

    return (ts_best, ts_arg), (tp_best, tp_arg), (tt_best, tt_arg)


def trace_t(
    scene: SceneArrays,
    pre: ScenePre,
    ro: Array,
    rd: Array,
    eps: Epsilons,
    t_max: Array | None = None,
    any_hit: bool = False,
    presorted: bool = False,
):
    """Nearest-hit distance only -> (t [N], valid [N]).

    The visibility/shadow test (Scene::mutually_visible, src/scene.rs:258-270)
    needs just the distance — skipping the winner's attribute gathers and
    normal math saves a chunk of the per-bounce cost.  With ``t_max`` the
    mesh search is pruned at the target distance: hits beyond it may be
    dropped (the returned t can equal t_max), which visibility tests of the
    form ``t + margin >= dist`` cannot distinguish from a miss — exactly
    what they want.  ``any_hit`` further lets the mesh stop at the first
    sub-cap hit (the returned t then proves occlusion but isn't nearest).
    """
    (ts, _), (tp, _), (tt, _) = _group_ts(
        scene, pre, ro, rd, eps, t_cap=t_max, any_hit=any_hit,
        presorted=presorted,
    )
    t = jnp.minimum(jnp.minimum(ts, tp), tt)
    return t, t < INF


class HitSoA(NamedTuple):
    """Nearest-hit record in SoA component form (hot-path variant of Hit)."""

    t: Array  # [N]
    pos: tuple  # (x, y, z) of [N]
    n: tuple  # (x, y, z) of [N] — two-sided shading normal
    obj: Array  # [N] i32
    valid: Array  # [N] bool


def trace_soa(
    scene: SceneArrays,
    pre: ScenePre,
    ro,
    rd,
    eps: Epsilons,
    t_cap: Array | None = None,
    presorted: bool = False,
) -> HitSoA:
    """Nearest hit of each ray against the whole scene (SoA form).

    Equivalent of Scene::trace_ray (src/scene.rs:272-289) for a wavefront:
    per-group argmin-t, then a cross-group argmin, then one gather of the
    winning primitive's attributes.  ``t_cap`` (per-ray) optionally prunes
    the mesh search like in trace_t — lanes that only need a bounded
    answer (fused shadow queries) pass their bound here.

    All per-lane 3-vector math runs in component form ([N] vectors);
    [N,3] intermediates would run at 3/128 vreg lane occupancy and every
    slice/stack would relayout across lanes.
    """
    ro, rd = vm.as3(ro), vm.as3(rd)
    (ts_best, ts_arg), (tp_best, tp_arg), (tt_best, tt_arg) = _group_ts(
        scene, pre, ro, rd, eps, t_cap=t_cap, presorted=presorted
    )

    group_t = jnp.stack([ts_best, tp_best, tt_best], axis=0)  # [3,N]
    group = jnp.argmin(group_t, axis=0)  # 0=sphere 1=plane 2=triangle
    t_best = jnp.min(group_t, axis=0)
    valid = t_best < INF

    # Winning primitive's attributes.  Small scenes (no mesh): an unrolled
    # per-component select-sum over the table — a [N]-row gather from even a
    # 24-row table is a kCustom gather + a transposed layout copy, measured
    # 164+44 us/iteration at 120k lanes (40% of the whole cornell iteration,
    # round-5 device trace); the select chain fuses into neighboring
    # elementwise work and the per-row scalar extracts hoist out of the
    # bounce loop.  Mesh scenes keep the single row gather (tables there are
    # tens of thousands of triangle rows).
    s_off = scene.sph_pos.shape[0]
    p_off = s_off + scene.pln_pos.shape[0]
    idx = jnp.where(
        group == 0, ts_arg, jnp.where(group == 1, s_off + tp_arg, p_off + tt_arg)
    )
    n_att = pre.att.shape[0]
    if n_att <= 64:  # covers cubes' 40 rows; see the cost note above
        att = pre.att
        comp = [jnp.broadcast_to(att[0, c], idx.shape) for c in range(4)]
        for r_i in range(1, n_att):
            m = idx == r_i
            comp = [jnp.where(m, att[r_i, c], comp[c]) for c in range(4)]
        v3 = (comp[0], comp[1], comp[2])
        obj = comp[3].astype(jnp.int32)
    else:
        row = jnp.take(pre.att, idx, axis=0)  # [N,4]
        obj = row[:, 3].astype(jnp.int32)
        v3 = vm.as3(row)  # sphere center / plane n / tri n

    is_sph = group == 0
    pos_raw = tuple(ro[k] + t_best * rd[k] for k in range(3))
    d = vm.sub3(pos_raw, v3)
    inv_l = 1.0 / jnp.sqrt(jnp.maximum(vm.norm2_3(d), 1e-20))
    n_geo = vm.where3(is_sph, vm.scale3(d, inv_l), v3)
    # Two-sided normal: keep when n.(-rd) >= 0 (src/geometry.rs:532,:558,:660).
    sign = jnp.where(vm.dot3(n_geo, rd) <= 0.0, 1.0, -1.0)
    n_ff = vm.scale3(n_geo, sign)

    # Hit-position offset along the normal: the reference offsets plane and
    # triangle hits by 1e-5*n (src/geometry.rs:561,:663) but not spheres.
    off = jnp.where(is_sph, 0.0, eps.hit_offset)
    pos = tuple(pos_raw[k] + off * n_ff[k] for k in range(3))

    return HitSoA(t=t_best, pos=pos, n=n_ff, obj=obj, valid=valid)


def trace(
    scene: SceneArrays,
    pre: ScenePre,
    ro: Array,
    rd: Array,
    eps: Epsilons,
    t_cap: Array | None = None,
    presorted: bool = False,
) -> Hit:
    """Array-layout wrapper over ``trace_soa`` (oracle/test paths)."""
    h = trace_soa(scene, pre, ro, rd, eps, t_cap=t_cap, presorted=presorted)
    return Hit(
        t=h.t, pos=vm.stack3(h.pos), n=vm.stack3(h.n), obj=h.obj, valid=h.valid
    )
