"""Wavefront path-tracing integrator.

The reference integrator is a per-sample recursion
(``Scene::received_radiance`` / ``reflected_radiance``,
/root/reference/src/scene.rs:152-244): next-event estimation (explicit
light sampling) at every non-specular vertex, BSDF-sampled continuation
with Russian roulette (p=1 through depth 5, then 0.9), specular vertices
skipping NEE and instead collecting emission through the mirror bounce.

Recursion and data-dependent branching are hostile to XLA, so here the same
estimator runs as a *wavefront*: N lanes advance in lockstep through a
``lax.while_loop`` over bounce depth, with per-lane alive masks instead of
control flow.  The loop exits early once every lane is dead (or at the
static ``max_depth`` cap — the reference's RR tail is unbounded; see
``RenderConfig.max_depth``).

RNG is counter-based (rbg by default, threefry selectable — see
``RenderConfig.rng_impl``): the per-bounce key is
``fold_in(lane_batch_key, depth)`` and each bounce draws one ``[7,N]``
uniform block (3 light + 1 RR + 3 BSDF lanes), making every render fully
deterministic — something the reference (thread-local ``rand::random``)
cannot do.

MIS: ``use_mis=True`` enables a *correct* balance-heuristic combination of
light and BSDF sampling.  (The reference's MIS is dead code behind
``if false`` with a broken brdf-pdf lookup, src/scene.rs:187-216; SURVEY §5
directs implementing it properly as a toggle.)

Documented divergences from the live reference path (invisible on the three
shipped scenes, see SURVEY §5):
- the specular recursion's stale ``o`` (src/scene.rs:178) is corrected to
  ``-i``;
- the specular branch's emission term is divided by the RR survival
  probability (the reference omits the division, a small bias only past
  depth 5);
- mesh-light sample positions use real barycentric interpolation (the
  reference's ``get_barycentric`` drops the ``a`` offset and normalizes the
  edges, src/geometry.rs:622-628 — no shipped scene has a mesh light).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models import vecmath as vm
from raytracer_tpu.models.scene import LIGHT_SPHERE, BRDF_SPECULAR, SceneArrays
from raytracer_tpu.ops import brdf
from raytracer_tpu.ops.intersect import ScenePre, trace, trace_t

TWO_PI = jnp.float32(2.0 * jnp.pi)


def sample_light(scene: SceneArrays, u1: Array, u2: Array, u3: Array):
    """Sample a point on THE light source -> (y[N,3], ny[N,3], pdf_area[N]).

    Sphere: uniform area point, pdf 1/(4 pi r^2) (src/geometry.rs:575-587).
    Mesh: triangle picked proportional to area, uniform in triangle,
    pdf 1/surface_area (src/geometry.rs:588-592).
    """
    if scene.light_type == LIGHT_SPHERE:
        z = 2.0 * u1 - 1.0
        r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        phi = TWO_PI * u2
        n = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
        y = scene.light_sph_pos[None, :] + n * scene.light_sph_r
        pdf = jnp.full(u1.shape, 1.0) / scene.light_area
        return y, n, pdf
    # Mesh light: CDF-pick a triangle, then uniform barycentric point.
    k = jnp.searchsorted(scene.light_tri_cdf, u1, side="left").astype(jnp.int32)
    k = jnp.clip(k, 0, scene.light_tri_idx.shape[0] - 1)
    ti = scene.light_tri_idx[k]
    a, b, c = scene.tri_a[ti], scene.tri_b[ti], scene.tri_c[ti]
    b0 = 1.0 - jnp.sqrt(u2)
    b1 = (1.0 - b0) * u3
    y = a + (b - a) * b0[:, None] + (c - a) * b1[:, None]
    # Reference Triangle::normal() = normalize((c-a) x (b-a)) (src/geometry.rs:606-608).
    n = vm.normalize(vm.cross(c - a, b - a), eps=1e-20)
    pdf = jnp.full(u1.shape, 1.0) / scene.light_area
    return y, n, pdf


def sample_light3(scene: SceneArrays, u1: Array, u2: Array, u3: Array):
    """Component-tuple ``sample_light`` -> (y=(x,y,z), ny=(x,y,z), pdf[N]).

    Same distribution and formulas; the SoA layout keeps the streaming
    engine's shading core free of [N,3] stacks/reduces (BENCHMARKS.md
    round-4 cornell trace)."""
    if scene.light_type == LIGHT_SPHERE:
        z = 2.0 * u1 - 1.0
        r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        phi = TWO_PI * u2
        n = (r * jnp.cos(phi), r * jnp.sin(phi), z)
        y = tuple(scene.light_sph_pos[k] + n[k] * scene.light_sph_r for k in range(3))
        pdf = jnp.full(u1.shape, 1.0) / scene.light_area
        return y, n, pdf
    y, n, pdf = sample_light(scene, u1, u2, u3)
    return vm.as3(y), vm.as3(n), pdf


def radiance(
    scene: SceneArrays,
    pre: ScenePre,
    cfg: RenderConfig,
    ro: Array,
    rd: Array,
    key: Array,
) -> tuple[Array, Array]:
    """Estimate incoming radiance for N camera rays -> ([N,3], rays i32).

    Equivalent of ``Scene::received_radiance`` (src/scene.rs:152-159) over a
    wavefront.  The second output counts rays actually traced (camera +
    shadow + continuation, matching how the reference's loop would count
    them) for Mrays/s accounting.
    """
    eps = cfg.eps
    n_lanes = ro.shape[0]
    light_e = scene.obj_emitted[scene.light_idx]  # [3]

    hit = trace(scene, pre, ro, rd, eps)
    l0 = jnp.where(hit.valid[:, None], scene.obj_emitted[hit.obj], 0.0)
    beta0 = jnp.where(hit.valid[:, None], 1.0, 0.0) * jnp.ones((n_lanes, 3))

    def cond(state):
        d, _l, _beta, _x, _n, _obj, _o, alive, _rays = state
        return (d <= cfg.max_depth) & jnp.any(alive)

    def body(state):
        d, L, beta, x, n, obj, o, alive, rays = state
        us = jax.random.uniform(jax.random.fold_in(key, d), (7, n_lanes))
        p = jnp.where(d <= cfg.rr_start_depth, 1.0, cfg.rr_survival)

        mat = brdf.gather_mat(scene, obj)
        is_spec = mat.brdf_type == BRDF_SPECULAR

        # ---- Next-event estimation (non-specular lanes) ----
        y, ny, pdf_l = sample_light(scene, us[0], us[1], us[2])
        to_y = y - x
        dist = vm.length(to_y)
        wi_d = to_y / jnp.maximum(dist, 1e-20)[:, None]
        r2 = jnp.maximum(dist * dist, 1e-20)
        # Shadow query bounded at dist - margin: finding a hit below
        # that bound is EXACTLY the reference's invisibility test
        # hit.t + margin < dist (src/scene.rs:258-270).  (any_hit kept off;
        # see render/wavefront.py for the measurement notes.)
        sh_t, sh_valid = trace_t(
            scene, pre, x, wi_d, eps, t_max=dist - eps.visibility_margin
        )
        # mutually_visible: nearest hit at/just beyond y (src/scene.rs:258-270)
        vis = (~sh_valid) | (sh_t + eps.visibility_margin >= dist)
        f_d = brdf.eval_nonspecular(mat, n, o, wi_d, scene.has_phong)
        cos_x = vm.dot(n, wi_d)
        cos_y = vm.dot(ny, -wi_d)
        if cfg.use_mis:
            pdf_l_sa = pdf_l * r2 / jnp.maximum(cos_y, 1e-8)
            pdf_b_at = brdf.pdf(mat, n, o, wi_d)
            ok = vis & (cos_y > 0.0) & (cos_x > 0.0)
            direct = jnp.where(
                ok[:, None],
                light_e[None, :] * f_d * (cos_x / (pdf_l_sa + pdf_b_at))[:, None],
                0.0,
            )
        else:
            # Exact reference estimator (src/scene.rs:218-229): note no
            # cosine clamping — matches the live code path bit-for-bit.
            scale = jnp.where(vis, 1.0, 0.0) * cos_x * cos_y / (r2 * pdf_l)
            direct = light_e[None, :] * f_d * scale[:, None]
        L = L + jnp.where((alive & ~is_spec)[:, None], beta * direct, 0.0)

        # ---- Russian roulette + BSDF continuation ----
        cont = alive & (us[3] < p)
        wi, pdf_b = brdf.sample(
            mat, n, o, us[4], us[5], us[6], cfg.fix_phong_frame, scene.has_phong
        )
        nxt = trace(scene, pre, x, wi, eps)
        good = cont & nxt.valid

        f_c = brdf.eval_nonspecular(mat, n, o, wi, scene.has_phong)
        cos_c = vm.dot(n, wi)
        w_nonspec = jnp.where(
            (pdf_b > 1e-12)[:, None], f_c * (cos_c / jnp.maximum(pdf_b, 1e-12))[:, None], 0.0
        )
        # Mirror: f*cos/pdf collapses analytically to ks
        # (eval ks/(n.i) * cos / pdf=1, src/scene.rs:34-39,:68).
        weight = jnp.where(is_spec[:, None], mat.c_s, w_nonspec) / p

        # ---- Emission picked up at the next vertex ----
        nxt_e = scene.obj_emitted[nxt.obj]  # [N,3]
        if cfg.use_mis:
            # Balance-heuristic weight for the BSDF sampling strategy; a
            # specular bounce is a delta (no competing light strategy), so
            # it collects emission fully.
            hit_light = nxt.obj == scene.light_idx
            cos_yb = jnp.maximum(vm.dot(nxt.n, -wi), 1e-8)
            pdf_l_sa_b = (nxt.t * nxt.t) / (cos_yb * scene.light_area)
            w_b = jnp.where(hit_light, pdf_b / (pdf_b + pdf_l_sa_b), 1.0)
            emis = jnp.where(
                is_spec[:, None], nxt_e / p, weight * w_b[:, None] * nxt_e
            )
            L = L + jnp.where(good[:, None], beta * emis, 0.0)
        else:
            # Live reference path: only specular sees emission through the
            # bounce (src/scene.rs:170-185); non-specular excludes it (no
            # double counting with NEE, :231-240).
            L = L + jnp.where((good & is_spec)[:, None], beta * nxt_e / p, 0.0)

        beta = jnp.where(good[:, None], beta * weight, 0.0)
        rays = (
            rays
            + jnp.sum((alive & ~is_spec).astype(jnp.int32))  # shadow rays
            + jnp.sum(cont.astype(jnp.int32))  # continuation rays
        )
        alive = good & jnp.any(beta > 0.0, axis=-1)
        return (d + 1, L, beta, nxt.pos, nxt.n, nxt.obj, -wi, alive, rays)

    state = (
        jnp.int32(1), l0, beta0, hit.pos, hit.n, hit.obj, -rd, hit.valid,
        jnp.int32(n_lanes),  # camera rays
    )
    out = jax.lax.while_loop(cond, body, state)
    return out[1], out[8]
