"""Pallas bounce megakernel: the whole per-sample path-trace loop in ONE
TPU kernel for sphere/plane/small-triangle scenes.

The streaming XLA engine (render/wavefront.py) is already one fused XLA
while-loop, but XLA materializes the carried lane state ([N,23] f32) to HBM
between iterations and splits the bounce body into several fusions (RNG,
intersect reductions, gathers): a cornell-class bounce moves ~100 MB of HBM
traffic per iteration.  This kernel instead keeps EVERY per-lane register —
ray, throughput, radiance, sample counter — in vregs for the entire render:

- grid = one program per 1024-lane band slice ([8,128] vregs); each program
  runs the full per-lane sample-streaming loop (regenerate -> trace ->
  NEE -> RR -> BSDF bounce) to completion with zero HBM round trips;
- the scene (spheres, planes, materials, camera, light) is a few dozen
  scalars, unpacked from SMEM params and statically unrolled into the
  intersection loops (the reference's linear object scan,
  src/scene.rs:272-289, becomes S+P dense [8,128] primitive tests);
- RNG is a counter-based in-kernel hash (murmur3 finalizer over
  (lane, iteration, draw)) — portable to interpret mode, deterministic,
  and free of cross-lane state.

The estimator is IDENTICAL in distribution to render_band_regen's NEE path
(same camera, tent filter, light sampling, RR schedule, specular emission
rules — reference semantics per src/scene.rs:161-244 with the documented
divergences of render/integrator.py).  MIS, Phong, and mesh scenes fall
back to the XLA engine (render/renderer.py gates on scene metadata).

Scope: matches BASELINE's north star — "intersect + shade + RNG fused into
a Pallas megakernel" — for the scenes whose whole geometry fits in
registers (cornell_box: 3 spheres + 6 planes; cubes: 1 sphere + 6 planes +
24 statically-unrolled prism triangles, see MEGA_MAX_TRIS).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models.camera import camera_basis
from raytracer_tpu.models.scene import BRDF_SPECULAR, SceneArrays

# Component-tuple vector algebra: the shared SoA helpers from
# models/vecmath (one implementation repo-wide; they trace to identical
# Mosaic code inside the kernel).
from raytracer_tpu.models.vecmath import (
    add3 as _add3,
    cross3 as _cross3,
    dot3 as _dot3,
    mul3 as _mul3,
    normalize3 as _normalize3,
    scale3 as _scale3,
    sub3 as _sub3,
    where3 as _where3,
)

# Lanes per program = ROWS x 128.  ROWS=8 (one vreg per op) measured 77
# Mrays/s on cornell: every op in the bounce chain depends on the previous
# one, so the VPU stalls on op latency.  Wider blocks give Mosaic
# independent vregs to interleave (the same latency-hiding XLA gets from
# batching); ROWS is tunable for sweeps via RT_MEGA_ROWS.
DEFAULT_ROWS = 32
INF = 3.0e38
INV_PI = float(1.0 / math.pi)
TWO_PI = float(2.0 * math.pi)


def _hash3(a, b, c):
    """murmur3-finalizer mix of three u32 [8,128] counters -> u32."""
    h = a * jnp.uint32(0xCC9E2D51) ^ b * jnp.uint32(0x1B873593) ^ c * jnp.uint32(
        0x85EBCA6B
    )
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return h


def _uniform(seed, lane, it, draw):
    """Uniform [0,1) f32 [8,128] from the counter hash."""
    bits = _hash3(lane ^ seed, it, jnp.uint32(draw))
    return (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))




def _mega_kernel(
    pf_ref,  # SMEM f32 params
    pi_ref,  # SMEM i32 params: [y0, num_samples, n_valid, seed]
    acc_r,  # [1,8,128] out per-channel banked radiance sums
    acc_g,
    acc_b,
    rays_ref,  # [1,8,128] i32 out per-lane traced-ray counts
    *,
    n_spheres: int,
    n_planes: int,
    n_tris: int,
    n_objects: int,
    width: int,
    height: int,
    rows: int,
    hw_rng: bool,
    cfg_tuple: tuple,
):
    (fov_scale, rr_start_depth, rr_survival, max_depth, sphere_tmin,
     plane_parallel, hit_offset, visibility_margin, tri_tmin,
     tri_parallel) = cfg_tuple

    # ---- unpack scene scalars from SMEM ----
    p = 0

    def rd_(k):
        return pf_ref[k]

    cam_pos = [rd_(0), rd_(1), rd_(2)]
    cam_dir = [rd_(3), rd_(4), rd_(5)]
    cx = [rd_(6), rd_(7), rd_(8)]
    cy = [rd_(9), rd_(10), rd_(11)]
    light_pos = [rd_(12), rd_(13), rd_(14)]
    light_r = rd_(15)
    light_e = [rd_(16), rd_(17), rd_(18)]
    light_area = rd_(19)  # area pdf = 1/light_area
    p = 20
    sph = []  # (pos3, r)
    for s in range(n_spheres):
        sph.append(([rd_(p), rd_(p + 1), rd_(p + 2)], rd_(p + 3), rd_(p + 4)))
        p += 5  # pos3, r, obj
    pln = []  # (pos3, n3, obj)
    for s in range(n_planes):
        pln.append((
            [rd_(p), rd_(p + 1), rd_(p + 2)],
            [rd_(p + 3), rd_(p + 4), rd_(p + 5)],
            rd_(p + 6),
        ))
        p += 7
    tri = []  # (n_unit3, n_d, q1_3, q1a, q2_3, q2a, obj) — the barycentric-
    # gradient form shared with ops.intersect.tri_precompute (six dots per
    # (tri, ray); reference Moller-Trumbore semantics, src/geometry.rs:637-670)
    for s in range(n_tris):
        tri.append((
            [rd_(p), rd_(p + 1), rd_(p + 2)],
            rd_(p + 3),
            [rd_(p + 4), rd_(p + 5), rd_(p + 6)],
            rd_(p + 7),
            [rd_(p + 8), rd_(p + 9), rd_(p + 10)],
            rd_(p + 11),
            rd_(p + 12),
        ))
        p += 13
    mats = []  # (is_spec, f_d3 = c_d*k_d/pi, c_s3, em3)
    for o in range(n_objects):
        mats.append((
            rd_(p),
            [rd_(p + 1), rd_(p + 2), rd_(p + 3)],
            [rd_(p + 4), rd_(p + 5), rd_(p + 6)],
            [rd_(p + 7), rd_(p + 8), rd_(p + 9)],
        ))
        p += 10

    y0 = pi_ref[0]
    num_samples = pi_ref[1]
    n_valid = pi_ref[2]
    seed = pi_ref[3].astype(jnp.uint32)

    pid = pl.program_id(0)
    if hw_rng:
        # Hardware PRNG: the portable counter hash costs 35 u32 multiplies
        # per bounce, and the VPU has no native 32-bit integer multiply —
        # Mosaic's emulation measured ~300x slower than the surrounding
        # f32 math.  Seed per program; draws are a sequential stream.
        pltpu.prng_seed(pi_ref[3], pid)
    slot = (
        pid * (rows * 128)
        + jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    )
    lane_u = slot.astype(jnp.uint32)
    pix = slot // 4
    sub = slot % 4
    px = (pix % width).astype(jnp.float32)
    py = (y0 + pix // width).astype(jnp.float32)
    sx = (sub % 2).astype(jnp.float32)
    sy = (sub // 2).astype(jnp.float32)

    z = jnp.zeros((rows, 128), jnp.float32)
    zero3 = (z, z, z)  # tuple: must match the vecmath helpers' pytree type
    hard_cap = num_samples * (max_depth + 2) + 64

    def obj_select(obj, field):
        """Per-lane material field via select chain over the objects."""
        out = jnp.zeros(z.shape, jnp.float32)
        for o in range(n_objects):
            out = jnp.where(obj == o, field(mats[o]), out)
        return out

    def obj_select3(obj, field):
        return [obj_select(obj, lambda m, k=k: field(m)[k]) for k in range(3)]

    def trace(ro, rd):
        """Nearest sphere/plane hit -> (t, obj, n(two-sided), pos, valid).

        Same per-group-then-argmin semantics as ops.intersect: spheres use
        the smallpt quadratic (near then far root, src/geometry.rs:514-550),
        planes the |d.n| cutoff + t>=0 rule (:551-568); ties resolve to the
        sphere group like trace()'s group argmin.
        """
        t_best = jnp.full(z.shape, INF)
        v3 = zero3  # sphere center / plane normal of the winner
        is_sph = jnp.zeros(z.shape, jnp.bool_)
        obj = jnp.zeros(z.shape, jnp.float32)
        for (c, r, ob) in sph:
            oc = _sub3(c, ro)
            b = _dot3(oc, rd)
            det = b * b - _dot3(oc, oc) + r * r
            sq = jnp.sqrt(jnp.maximum(det, 0.0))
            t_near = b - sq
            t_far = b + sq
            t = jnp.where(
                t_near > sphere_tmin, t_near,
                jnp.where(t_far > sphere_tmin, t_far, INF),
            )
            t = jnp.where(det >= 0.0, t, INF)
            take = t < t_best
            t_best = jnp.where(take, t, t_best)
            v3 = _where3(take, c, v3)
            is_sph = is_sph | take
            obj = jnp.where(take, ob, obj)
        for (c, nrm, ob) in pln:
            d_n = _dot3(nrm, rd)
            t = (_dot3(nrm, c) - _dot3(nrm, ro)) / d_n
            ok = (jnp.abs(d_n) >= plane_parallel) & (t >= 0.0)
            t = jnp.where(ok, t, INF)
            take = t < t_best
            t_best = jnp.where(take, t, t_best)
            v3 = _where3(take, nrm, v3)
            is_sph = is_sph & ~take
            obj = jnp.where(take, ob, obj)
        for (nrm, n_d, q1, q1a, q2, q2a, ob) in tri:
            denom = _dot3(nrm, rd)
            t = (n_d - _dot3(nrm, ro)) / denom
            u = _dot3(q1, ro) + t * _dot3(q1, rd) - q1a
            v_ = _dot3(q2, ro) + t * _dot3(q2, rd) - q2a
            ok = (
                (jnp.abs(denom) >= tri_parallel)
                & (u >= 0.0) & (u <= 1.0) & (v_ >= 0.0) & (u + v_ <= 1.0)
                & (t > tri_tmin)
            )
            t = jnp.where(ok, t, INF)
            take = t < t_best
            t_best = jnp.where(take, t, t_best)
            v3 = _where3(take, nrm, v3)  # unit normal (tri_precompute)
            is_sph = is_sph & ~take
            obj = jnp.where(take, ob, obj)
        valid = t_best < INF
        pos = _add3(ro, _scale3(rd, t_best))
        n_sph = _normalize3(_sub3(pos, v3), eps=1e-20)
        n = _where3(is_sph, n_sph, v3)
        # two-sided: keep n when n . -rd >= 0
        flip = _dot3(n, rd) > 0.0
        n = _where3(flip, _scale3(n, jnp.float32(-1.0)), n)
        # plane hits offset along the normal (spheres don't, trace())
        off = jnp.where(is_sph, 0.0, hit_offset)
        pos = _add3(pos, _scale3(n, off))
        return t_best, obj.astype(jnp.int32), n, pos, valid

    def occluded(ro, rd, bound):
        """ANY valid hit strictly below ``bound`` (mutually_visible test,
        src/scene.rs:258-270: invisible iff nearest t + margin < dist)."""
        occ = jnp.zeros(z.shape, jnp.bool_)
        for (c, r, _ob) in sph:
            oc = _sub3(c, ro)
            b = _dot3(oc, rd)
            det = b * b - _dot3(oc, oc) + r * r
            sq = jnp.sqrt(jnp.maximum(det, 0.0))
            t_near = b - sq
            t_far = b + sq
            t = jnp.where(
                t_near > sphere_tmin, t_near,
                jnp.where(t_far > sphere_tmin, t_far, INF),
            )
            occ = occ | ((det >= 0.0) & (t < bound))
        for (c, nrm, _ob) in pln:
            d_n = _dot3(nrm, rd)
            t = (_dot3(nrm, c) - _dot3(nrm, ro)) / d_n
            occ = occ | ((jnp.abs(d_n) >= plane_parallel) & (t >= 0.0) & (t < bound))
        for (nrm, n_d, q1, q1a, q2, q2a, _ob) in tri:
            denom = _dot3(nrm, rd)
            t = (n_d - _dot3(nrm, ro)) / denom
            u = _dot3(q1, ro) + t * _dot3(q1, rd) - q1a
            v_ = _dot3(q2, ro) + t * _dot3(q2, rd) - q2a
            occ = occ | (
                (jnp.abs(denom) >= tri_parallel)
                & (u >= 0.0) & (u <= 1.0) & (v_ >= 0.0) & (u + v_ <= 1.0)
                & (t > tri_tmin) & (t < bound)
            )
        return occ

    # Loop-carry constraints on this toolchain (jax 0.8.x-era Mosaic,
    # round 5): (a) an i1 vector loop state fails to legalize
    # ("failed to legalize operation 'scf.yield'", vpad layout mismatch),
    # so the active mask crosses the while_loop boundary as i32; (b) a
    # vector->scalar reduction inside the while_loop *condition*
    # miscompiles silently (the loop exits early and renders dim), so the
    # condition is kept purely scalar: body computes the "any lane still
    # has work" bit into an i32 scalar carried in the state, and cond only
    # compares scalars.
    def cond(st):
        it, n_work = st[0], st[1]
        return (it < hard_cap) & (n_work > 0)

    def body(st):
        (it, _n_work, rays, active_i, j, depth, ro, rd, L, beta, emis,
         acc) = st
        active = active_i != 0
        it_u = it.astype(jnp.uint32)

        def u(draw):
            if hw_rng:
                # prng_random_bits returns SIGNED i32 on this toolchain
                # (round-5 regression: previously u32); without the bitcast
                # the >>8 is an arithmetic shift and ~47% of draws come out
                # negative (NaN tent/cosine samples, dim renders).
                bits = pltpu.bitcast(
                    pltpu.prng_random_bits((rows, 128)), jnp.uint32
                )
                # u32->f32 casts don't lower in Mosaic; the 24-bit value
                # fits i32 exactly, so round-trip through i32.
                return (bits >> 8).astype(jnp.int32).astype(
                    jnp.float32
                ) * jnp.float32(1.0 / (1 << 24))
            return _uniform(seed, lane_u, it_u, draw)

        # ---- 1) regenerate: idle lanes start their next sample ----
        got = ~active & (j < num_samples) & (slot < n_valid)
        dx_u = u(0)
        dy_u = u(1)
        r1 = 2.0 * dx_u
        dx = jnp.where(r1 < 1.0, jnp.sqrt(r1) - 1.0,
                       1.0 - jnp.sqrt(jnp.maximum(2.0 - r1, 0.0)))
        r2_ = 2.0 * dy_u
        dy = jnp.where(r2_ < 1.0, jnp.sqrt(r2_) - 1.0,
                       1.0 - jnp.sqrt(jnp.maximum(2.0 - r2_, 0.0)))
        fx = ((sx + 0.5 + dx) / 2.0 + px) / width - 0.5
        fy = ((sy + 0.5 + dy) / 2.0 + py) / height - 0.5
        crd = _normalize3(_add3(_add3(_scale3(cx, fx), _scale3(cy, fy)), cam_dir))
        ro = _where3(got, cam_pos, ro)
        rd = _where3(got, crd, rd)
        depth = jnp.where(got, 0, depth)
        L = _where3(got, zero3, L)
        beta = _where3(got, [1.0 + z, 1.0 + z, 1.0 + z], beta)
        emis = _where3(got, [1.0 + z, 1.0 + z, 1.0 + z], emis)
        j = jnp.where(got, j + 1, j)
        active = active | got

        # ---- 2) main trace ----
        rays = rays + active.astype(jnp.int32)
        t, obj, nrm, x, hit_valid = trace(ro, rd)
        valid = active & hit_valid
        done_miss = active & ~hit_valid

        # ---- 3) arrival emission (NEE rules: weight carried in emis) ----
        em = obj_select3(obj, lambda m: m[3])
        L = _where3(valid, _add3(L, _mul3(emis, em)), L)

        o = _scale3(rd, jnp.float32(-1.0))
        depth = jnp.where(active, depth + 1, depth)
        is_spec = obj_select(obj, lambda m: m[0]) > 0.5
        f_d = obj_select3(obj, lambda m: m[1])
        c_s = obj_select3(obj, lambda m: m[2])

        # ---- 4) NEE: uniform sphere-light sample + shadow test ----
        u1l = u(2)
        u2l = u(3)
        zl = 2.0 * u1l - 1.0
        rl = jnp.sqrt(jnp.maximum(1.0 - zl * zl, 0.0))
        phil = TWO_PI * u2l
        ny = [rl * jnp.cos(phil), rl * jnp.sin(phil), zl]
        y = _add3(light_pos, _scale3(ny, light_r))
        to_y = _sub3(y, x)
        dist = jnp.sqrt(jnp.maximum(_dot3(to_y, to_y), 1e-20))
        wi_d = _scale3(to_y, 1.0 / dist)
        r2 = jnp.maximum(dist * dist, 1e-20)
        nee = valid & ~is_spec
        rays = rays + nee.astype(jnp.int32)
        occ = occluded(x, wi_d, dist - visibility_margin)
        cos_x = _dot3(nrm, wi_d)
        cos_y = _dot3(ny, _scale3(wi_d, jnp.float32(-1.0)))
        scale = jnp.where(~occ, 1.0, 0.0) * cos_x * cos_y * (light_area / r2)
        direct = [light_e[k] * f_d[k] * scale for k in range(3)]
        L = _where3(nee, _add3(L, _mul3(beta, direct)), L)

        # ---- 5) RR + BSDF sample ----
        p_rr = jnp.where(depth <= rr_start_depth, 1.0, rr_survival)
        cont = valid & (u(4) < p_rr) & (depth < max_depth)
        # cosine-weighted hemisphere in the local frame (create_local_coord,
        # src/scene.rs:58-66,112-123)
        zc = jnp.sqrt(u(5))
        rc = jnp.sqrt(jnp.maximum(1.0 - zc * zc, 0.0))
        phic = TWO_PI * u(6)
        use_y_ax = jnp.abs(nrm[0]) > 0.1
        helper = [
            jnp.where(use_y_ax, 0.0, 1.0),
            jnp.where(use_y_ax, 1.0, 0.0),
            z,
        ]
        ub = _normalize3(_cross3(helper, nrm))
        vb = _cross3(nrm, ub)
        wi_diff = _add3(
            _add3(_scale3(ub, rc * jnp.cos(phic)), _scale3(vb, rc * jnp.sin(phic))),
            _scale3(nrm, zc),
        )
        wi_spec = _sub3(_scale3(nrm, 2.0 * _dot3(o, nrm)), o)  # flip_across
        wi = _where3(is_spec, wi_spec, wi_diff)
        cos_c = _dot3(nrm, wi_diff)
        pdf_b = jnp.maximum(cos_c, 0.0) * INV_PI
        w_nonspec3 = [
            jnp.where(pdf_b > 1e-12, f_d[k] * cos_c / jnp.maximum(pdf_b, 1e-12), 0.0)
            for k in range(3)
        ]
        inv_p = 1.0 / p_rr
        weight = _scale3(_where3(is_spec, c_s, w_nonspec3), inv_p)
        beta_next = _mul3(beta, weight)
        live = cont & (
            (beta_next[0] > 0.0) | (beta_next[1] > 0.0) | (beta_next[2] > 0.0)
        )
        # specular collects next-hit emission at beta/p; NEE lanes collect
        # none (no double counting) — src/scene.rs:161-244 rules.
        emis = _where3(is_spec, _scale3(beta, inv_p), zero3)
        beta = beta_next

        # ---- 6) completion: bank finished paths ----
        completed = done_miss | (valid & ~live)
        acc = _where3(completed, _add3(acc, L), acc)
        active = live
        ro = _where3(live, x, ro)
        rd = _where3(live, wi, rd)
        # Scalar "work remains" bit for the (scalar-only) loop condition:
        # any live lane, or any lane with samples still to draw.
        work = live | (j < num_samples)
        n_work = jnp.max(work.astype(jnp.int32))
        return (it + 1, n_work, rays, active.astype(jnp.int32), j, depth,
                ro, rd, L, beta, emis, acc)

    st = (
        jnp.int32(0),
        jnp.int32(1),  # scalar work-remains bit (see cond); 1 = run once
        jnp.zeros(z.shape, jnp.int32),
        jnp.zeros(z.shape, jnp.int32),  # active mask (i32 carry, see cond)
        # Padded lanes (slot >= n_valid) start with their sample budget
        # exhausted so the loop's j<num_samples guard can terminate.
        jnp.where(slot < n_valid, 0, num_samples),
        jnp.zeros(z.shape, jnp.int32),
        zero3,
        zero3,
        zero3,
        zero3,
        zero3,
        zero3,
    )
    out = jax.lax.while_loop(cond, body, st)
    rays, acc = out[2], out[11]
    acc_r[0] = acc[0]
    acc_g[0] = acc[1]
    acc_b[0] = acc[2]
    rays_ref[0] = rays


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_spheres", "n_planes", "n_tris", "n_objects", "width", "height", "rows",
        "hw_rng", "cfg_tuple", "grid", "interpret",
    ),
)
def _mega_raw(
    pf: Array,
    pi: Array,
    n_spheres: int,
    n_planes: int,
    n_tris: int,
    n_objects: int,
    width: int,
    height: int,
    rows: int,
    hw_rng: bool,
    cfg_tuple: tuple,
    grid: int,
    interpret: bool = False,
):
    kernel = functools.partial(
        _mega_kernel,
        n_spheres=n_spheres,
        n_planes=n_planes,
        n_tris=n_tris,
        n_objects=n_objects,
        width=width,
        height=height,
        rows=rows,
        hw_rng=hw_rng,
        cfg_tuple=cfg_tuple,
    )
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid, rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((grid, rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((grid, rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((grid, rows, 128), jnp.int32),
        ],
        interpret=interpret,
    )(pf, pi)


# Triangle-count cap for the register-resident subset: every triangle adds
# ~60 statically-unrolled vector ops to the bounce body (trace + occlusion
# arms), so the cap bounds kernel code size; cubes' 24 prism tris are the
# target workload (reference scenes/cubes.toml).  BVH meshes stay on the
# streaming engine — per-lane divergent traversal has no efficient
# register-resident form (the coherence-sorted packet kernel wins there,
# BENCHMARKS.md round-5 deferred-shadow adjudication).
MEGA_MAX_TRIS = 32


def supports_megakernel(scene: SceneArrays, cfg: RenderConfig) -> bool:
    """The megakernel covers the register-resident estimator subset:
    sphere/plane/small-triangle geometry (<= MEGA_MAX_TRIS unrolled tris,
    no BVH), diffuse/specular materials, sphere light, NEE (no MIS).
    Everything else uses the XLA streaming engine."""
    return (
        not scene.use_bvh
        and scene.n_triangles <= MEGA_MAX_TRIS
        and not scene.has_phong
        and scene.light_type == 0
        and not cfg.use_mis
    )


def render_band_mega(
    scene: SceneArrays,
    pre,  # ScenePre — unused (megakernel precomputes nothing) but kept for
    # interface parity with render_band_regen
    cfg: RenderConfig,
    y0: Array,
    rows: int,
    num_samples: Array,
    key: Array,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """Render a row band with the bounce megakernel.

    Same contract as render_band_regen: returns (sums [rows, W, 4, 3],
    rays-traced i32); num_samples is dynamic (one compile per band shape).
    """
    assert supports_megakernel(scene, cfg), "scene outside megakernel subset"
    import os

    w = cfg.width
    n = rows * w * 4
    block_rows = int(os.environ.get("RT_MEGA_ROWS", DEFAULT_ROWS))
    grid = -(-n // (block_rows * 128))
    eps = cfg.eps

    cx, cy = camera_basis(scene, cfg.width, cfg.height, cfg.fov_scale)
    ns, npl, no = scene.n_spheres, scene.n_planes, scene.n_objects
    light_e = scene.obj_emitted[scene.light_idx]
    parts = [
        scene.cam_pos, scene.cam_dir, cx, cy,
        scene.light_sph_pos, scene.light_sph_r[None],
        light_e, scene.light_area[None],
    ]
    for s in range(ns):
        parts += [scene.sph_pos[s], scene.sph_r[s][None],
                  scene.sph_obj[s][None].astype(jnp.float32)]
    for s in range(npl):
        parts += [scene.pln_pos[s], scene.pln_n[s],
                  scene.pln_obj[s][None].astype(jnp.float32)]
    nt = int(scene.n_triangles)
    if nt:
        from raytracer_tpu.ops.intersect import tri_precompute

        tp = tri_precompute(scene.tri_a, scene.tri_b, scene.tri_c)
        # Invalid (padded) slots are zeroed: n_unit=0 -> denom=0 -> the
        # parallel cutoff rejects every test, same as tri_valid masking.
        vmask = scene.tri_valid.astype(jnp.float32)
        for s in range(nt):
            parts += [
                tp.n_unit[s] * vmask[s], tp.n_d[s][None] * vmask[s],
                tp.q1[s] * vmask[s], tp.q1_a[s][None] * vmask[s],
                tp.q2[s] * vmask[s], tp.q2_a[s][None] * vmask[s],
                scene.tri_obj[s][None].astype(jnp.float32),
            ]
    is_spec = (scene.brdf_type == BRDF_SPECULAR).astype(jnp.float32)
    f_d = scene.c_d * (scene.k_d * jnp.float32(INV_PI))[:, None]
    for o in range(no):
        parts += [is_spec[o][None], f_d[o], scene.c_s[o], scene.obj_emitted[o]]
    pf = jnp.concatenate(parts).astype(jnp.float32)

    seed = jax.random.randint(
        key, (), minval=jnp.iinfo(jnp.int32).min, maxval=jnp.iinfo(jnp.int32).max
    )
    pi = jnp.stack([
        jnp.asarray(y0, jnp.int32),
        jnp.asarray(num_samples, jnp.int32),
        jnp.int32(n),
        seed.astype(jnp.int32),
    ])

    cfg_tuple = (
        float(cfg.fov_scale), int(cfg.rr_start_depth), float(cfg.rr_survival),
        int(cfg.max_depth), float(eps.sphere_tmin), float(eps.plane_parallel),
        float(eps.hit_offset), float(eps.visibility_margin),
        float(eps.tri_tmin), float(eps.tri_parallel),
    )
    ar, ag, ab, rays = _mega_raw(
        pf, pi, n_spheres=ns, n_planes=npl, n_tris=nt, n_objects=no,
        width=cfg.width, height=cfg.height, rows=block_rows,
        hw_rng=not interpret, cfg_tuple=cfg_tuple, grid=grid,
        interpret=interpret,
    )
    acc = jnp.stack([ar.reshape(-1), ag.reshape(-1), ab.reshape(-1)], axis=-1)
    return acc[:n].reshape(rows, w, 4, 3), jnp.sum(rays)
