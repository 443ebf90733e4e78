"""Streaming wavefront with FUSED tracing (experiment — measured SLOWER).

v5e measurements: cornell 256spp 70 Mrays/s vs the plain streaming
engine's 109; flying_unicorn 31s vs 29s.  The doubled trace width plus the
extra pipeline state outweigh the one saved dispatch per bounce.  Kept as
a selectable engine (cfg.engine="fused") because it documents the negative
result and exercises trace()'s per-ray t_cap path.

Identical estimator to ``render/wavefront.py`` (same NEE + RR + emission
rules; MIS not supported here — the plain engine serves that), but software
pipelined so each loop iteration issues ONE double-width trace instead of
two sequential ones:

- at a vertex, both the continuation ray and the NEE shadow ray are known;
  instead of tracing the shadow ray immediately, its query and the
  direct-light contribution it gates are carried as *pending* state;
- the next iteration traces [continuation rays ; shadow rays] as one 2N
  batch (per-ray t-caps prune the shadow half at the light distance), then
  resolves the previous vertex's NEE from the second half.

Bookkeeping subtlety: a path that dies at a vertex (Russian roulette, depth
cap) banks its radiance immediately, but its final NEE query is still
pending — the resolved contribution is routed straight into the lane's
accumulator (``nee_to_acc``) while the lane regenerates a new path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models import vecmath as vm
from raytracer_tpu.models.camera import camera_rays
from raytracer_tpu.models.scene import BRDF_SPECULAR, SceneArrays
from raytracer_tpu.ops import brdf
from raytracer_tpu.ops.intersect import ScenePre, trace
from raytracer_tpu.render.integrator import sample_light

INF = 3.0e38


def render_band_fused(
    scene: SceneArrays,
    pre: ScenePre,
    cfg: RenderConfig,
    y0: Array,
    rows: int,
    num_samples: Array,
    key: Array,
) -> tuple[Array, Array]:
    """Render a row band -> (sums [rows, W, 4, 3], rays-traced i32)."""
    assert not cfg.use_mis, "fused engine supports the NEE path only"
    eps = cfg.eps
    w = cfg.width
    n_pix = rows * w
    n = n_pix * 4
    light_e = scene.obj_emitted[scene.light_idx]
    num_samples = jnp.asarray(num_samples, jnp.int32)

    lane = jnp.arange(n, dtype=jnp.int32)
    pix = lane // 4
    sub = lane % 4
    lane_px = (pix % w).astype(jnp.float32)
    lane_py_off = (pix // w).astype(jnp.float32)
    lane_sx = (sub % 2).astype(jnp.float32)
    lane_sy = (sub // 2).astype(jnp.float32)

    hard_cap = num_samples * (cfg.max_depth + 2) + 64

    light_draws = 3 if scene.light_type != 0 else 2
    bsdf_draws = 3 if scene.has_phong else 2
    i_light = 2
    i_rr = i_light + light_draws
    i_bsdf = i_rr + 1
    n_draws = i_bsdf + bsdf_draws

    zero3 = jnp.zeros((n, 3))

    def cond(st):
        it, _rays, active, j, _d, has_nee, *_ = st
        return (it < hard_cap) & jnp.any(active | (j < num_samples) | has_nee)

    def body(st):
        (it, rays, active, j, depth, has_nee, nee_to_acc,
         ro, rd, sh_ro, sh_rd, sh_bound, nee_val,
         L, beta, emis, acc) = st
        us = jax.random.uniform(jax.random.fold_in(key, it), (n_draws, n))
        u_light3 = us[i_light + 2] if light_draws == 3 else us[i_light]
        u_bsdf3 = us[i_bsdf + 2] if bsdf_draws == 3 else us[i_bsdf]

        # ---- 1) regenerate idle lanes ----
        got = ~active & (j < num_samples)
        cro, crd = camera_rays(
            scene, cfg.width, cfg.height, cfg.fov_scale,
            lane_px, y0.astype(jnp.float32) + lane_py_off,
            lane_sx, lane_sy, us[0], us[1],
        )
        g3 = got[:, None]
        ro = jnp.where(g3, cro, ro)
        rd = jnp.where(g3, crd, rd)
        depth = jnp.where(got, 0, depth)
        L = jnp.where(g3, 0.0, L)
        beta = jnp.where(g3, 1.0, beta)
        emis = jnp.where(g3, 1.0, emis)
        j = jnp.where(got, j + 1, j)
        active = active | got

        # ---- 2) ONE fused trace: [continuations+camera ; shadows] ----
        rays = rays + jnp.sum(active.astype(jnp.int32)) + jnp.sum(has_nee.astype(jnp.int32))
        ro2 = jnp.concatenate([ro, sh_ro], axis=0)
        rd2 = jnp.concatenate([rd, sh_rd], axis=0)
        cap2 = jnp.concatenate([jnp.full((n,), INF), sh_bound], axis=0)
        hit2 = trace(scene, pre, ro2, rd2, eps, t_cap=cap2)
        hit_t, hit_pos = hit2.t[:n], hit2.pos[:n]
        hit_n, hit_obj, hit_valid = hit2.n[:n], hit2.obj[:n], hit2.valid[:n]
        sh_t, sh_hit = hit2.t[n:], hit2.valid[n:]

        # ---- 3) resolve the PREVIOUS vertex's NEE from the shadow half ----
        # occluded iff some hit lies strictly below the bound (= dist-margin,
        # exactly the reference's hit.t + margin < dist, src/scene.rs:258-270)
        vis = (~sh_hit) | (sh_t >= sh_bound)
        direct = jnp.where((has_nee & vis)[:, None], nee_val, 0.0)
        # routed to the live path's L or, for already-banked paths, to acc
        L = L + jnp.where(nee_to_acc[:, None], 0.0, direct)
        acc = acc + jnp.where(nee_to_acc[:, None], direct, 0.0)
        has_nee = jnp.zeros_like(has_nee)

        # ---- 4) arrival ----
        valid = active & hit_valid
        done_miss = active & ~hit_valid
        em_next = scene.obj_emitted[hit_obj]
        L = jnp.where(valid[:, None], L + emis * em_next, L)
        x = hit_pos
        nrm = hit_n
        o = -rd
        depth = jnp.where(active, depth + 1, depth)

        # ---- 5) vertex shading: build NEE pending + sample continuation ----
        mat = brdf.gather_mat(scene, hit_obj)
        is_spec = mat.brdf_type == BRDF_SPECULAR

        y, ny, pdf_l = sample_light(scene, us[i_light], us[i_light + 1], u_light3)
        to_y = y - x
        dist = vm.length(to_y)
        wi_d = to_y / jnp.maximum(dist, 1e-20)[:, None]
        r2 = jnp.maximum(dist * dist, 1e-20)
        nee_lanes = valid & ~is_spec
        f_d = brdf.eval_nonspecular(mat, nrm, o, wi_d, scene.has_phong)
        cos_x = vm.dot(nrm, wi_d)
        cos_y = vm.dot(ny, -wi_d)
        scale = cos_x * cos_y / (r2 * pdf_l)
        nee_val = jnp.where(
            nee_lanes[:, None], light_e[None, :] * f_d * (beta * scale[:, None]), 0.0
        )
        has_nee = nee_lanes
        sh_ro = x
        # Non-NEE lanes get degenerate shadow rays (d=0, bound 0) so their
        # half of the fused trace root-culls instantly.
        sh_rd = jnp.where(nee_lanes[:, None], wi_d, 0.0)
        sh_bound = jnp.where(nee_lanes, dist - eps.visibility_margin, 0.0)

        p = jnp.where(depth <= cfg.rr_start_depth, 1.0, cfg.rr_survival)
        cont = valid & (us[i_rr] < p) & (depth < cfg.max_depth)
        wi, pdf_b = brdf.sample(
            mat, nrm, o, us[i_bsdf], us[i_bsdf + 1], u_bsdf3,
            cfg.fix_phong_frame, scene.has_phong,
        )
        f_c = brdf.eval_nonspecular(mat, nrm, o, wi, scene.has_phong)
        cos_c = vm.dot(nrm, wi)
        w_nonspec = jnp.where(
            (pdf_b > 1e-12)[:, None],
            f_c * (cos_c / jnp.maximum(pdf_b, 1e-12))[:, None],
            0.0,
        )
        weight = jnp.where(is_spec[:, None], mat.c_s, w_nonspec) / p[:, None]
        beta_next = beta * weight
        live = cont & jnp.any(beta_next > 0.0, axis=-1)
        emis = jnp.where(is_spec[:, None], beta / p[:, None], 0.0)

        # ---- 6) completion: bank L now; the fresh NEE pending (if any)
        # will be routed straight into acc when it resolves next iteration.
        completed = done_miss | (valid & ~live)
        acc = acc + jnp.where(completed[:, None], L, 0.0)
        nee_to_acc = completed

        active = live
        beta = beta_next
        ro = jnp.where(live[:, None], x, ro)
        rd = jnp.where(live[:, None], wi, rd)
        return (it + 1, rays, active, j, depth, has_nee, nee_to_acc,
                ro, rd, sh_ro, sh_rd, sh_bound, nee_val, L, beta, emis, acc)

    st = (
        jnp.int32(0),
        jnp.int32(0),
        jnp.zeros(n, bool),
        jnp.zeros(n, jnp.int32),
        jnp.zeros(n, jnp.int32),
        jnp.zeros(n, bool),  # has_nee
        jnp.zeros(n, bool),  # nee_to_acc
        zero3,  # ro
        zero3,  # rd
        zero3,  # sh_ro
        zero3,  # sh_rd
        jnp.zeros(n),  # sh_bound
        zero3,  # nee_val
        zero3,  # L
        zero3,  # beta
        zero3,  # emis
        zero3,  # acc
    )
    out = jax.lax.while_loop(cond, body, st)
    rays, acc = out[1], out[16]
    return acc.reshape(rows, w, 4, 3), rays
