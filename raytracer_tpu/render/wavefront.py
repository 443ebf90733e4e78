"""Streaming wavefront integrator — the production render path.

The plain wavefront (`integrator.radiance`) marches every lane through the
bounce loop in lockstep; with Russian roulette survival at 0.9
(src/scene.rs:109-110) a closed scene keeps ~54% average lane occupancy
over a 24-deep loop — half the VPU work is masked-out dead lanes.

This module keeps occupancy high with *per-lane sample streaming*
(persistent-threads path regeneration, re-designed for XLA's static
shapes and the TPU's cost model):

- one lane per (pixel, subpixel) slot; each lane renders its
  ``num_samples`` paths back to back;
- the moment a lane's path dies (miss, Russian roulette, dead BSDF
  sample, depth cap) the lane generates its next sample's camera ray in
  the same loop — no idle bounce iterations;
- radiance accumulates into a per-lane register (``acc``) — there is NO
  cross-lane communication at all: no prefix-sum allocation, no
  scatter-add (a first global-regeneration design lost ~20% to exactly
  those two ops on the VPU).

Run length per lane is the sum of its k path lengths; by concentration
the max over lanes stays close to the mean for k >= 8, so utilization is
~85-95% vs the lockstep loop's ~54%.

Every loop iteration traces one *main* ray per lane (camera ray for fresh
paths, BSDF continuation otherwise — a single batched ``trace``) plus the
NEE shadow ray.

The estimator is IDENTICAL in distribution to ``integrator.radiance``
(same NEE + RR + emission rules, same MIS toggle); only the scheduling
changes.  `tests/test_wavefront.py` checks statistical agreement.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import Array

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models import vecmath as vm
from raytracer_tpu.models.camera import camera_rays
from raytracer_tpu.models.scene import BRDF_SPECULAR, LIGHT_SPHERE, SceneArrays
from raytracer_tpu.ops import brdf
from raytracer_tpu.ops.intersect import ScenePre, trace_soa, trace_t
from raytracer_tpu.render.integrator import sample_light3

BIG = jnp.float32(1e30)
# Parking spot for lanes with no ray to trace this iteration: far outside
# any reference-scale scene (coords ~1e2), pointing away, so every slab /
# primitive test misses cheaply and the coherence sort groups parked lanes
# into miss-packets that exit after one root test.
PARK_RO = jnp.float32(3.0e7)
PARK_RD = jnp.array([1.0, 0.0, 0.0], jnp.float32)

# Measurement hook (see ARCHITECTURE.md env inventory): RT_PERMUTE_STATE=0
# keeps the lane state in slot order and lets the traversal wrapper sort
# just the 8 ray columns around the kernel (sort+unsort per trace) instead
# of permuting the whole packed state each iteration.  Round 2 measured the
# persistent permutation faster when unsorts were scatter-based; unsorts
# are lax.sorts now, so this re-measures the trade on current toolchains.
_PERMUTE_STATE = os.environ.get("RT_PERMUTE_STATE", "1") == "1"

# Group-quantized coherence permutation: a MEASURED NEGATIVE RESULT, kept
# env-gated OFF (RT_SORT_GROUP=1, per-lane order).  The idea: the round-4
# microbench pinned the per-iteration state permutation as HBM-random-
# access bound (1M independent 56-byte rows at ~17 GB/s), so sorting
# GROUPS of G consecutive lanes — one min-key per group, one argsort of
# N/G keys, one gather of N/G rows of G*C floats — moves the same bytes
# in G-times-fatter contiguous rows and shrinks every sort G-fold.
# Measured (v5e, flying_unicorn 600x450@16spp, warm): G=8 11.82 s vs
# 3.62 s per-lane — a 3.3x LOSS.  Cause is structural, not bandwidth: the
# per-lane sort's dominant job is not packing similar LIVE rays, it is
# compacting DEAD lanes (parked / exhausted / pre-resolved, most of every
# late-dispatch wavefront) into pure-miss packets that exit at the root.
# A min-key group with one live lane drags its seven dead neighbors into
# a live packet, so the traversal's effective wavefront never shrinks —
# the same dead-lane-compaction effect that beat the shared-order
# deferred-shadow design (see _DEFER_SHADOW).  The gather-bandwidth win
# it chased is bounded by ~11 ms/iter; the kernel regression is ~3x that.
_SORT_GROUP = int(os.environ.get("RT_SORT_GROUP", "1"))

# Reversed shadow segments (BVH scenes with a sphere light): trace the NEE
# visibility segment LIGHT -> SURFACE instead of surface -> light.
# Occlusion of an open segment is symmetric, and the reversal buys the
# whole per-iteration shadow glue chain: reversed rays all start on the
# light sphere and point at the main-trace hit positions, so lanes already
# permuted by the MAIN ray's coherence key run ``presorted`` — NO key
# kernel, NO argsort, NO [N,8] pack gather, NO unsort sorts.
# MEASURED SLOWER (round 4): 5.78 s vs 3.84 s on flying_unicorn
# 600x450@16spp.  The saved glue (~11 ms/iter) is dwarfed by the kernel
# regression: a reversed segment's traversal starts at the light and
# walks TOWARD the surface, so every unoccluded lane (most of them)
# descends the full depth of the tree along its whole segment before the
# t-bound prunes, where the forward form's t_init seeding (nearest
# sphere/plane hit toward the light) kills most descents early; and
# main-order packets, coherent for hit POSITIONS, fan out in direction
# once re-rooted at the light.  Kept env-gated (RT_SHADOW_REVERSE=1) for
# re-measurement; the light sphere is masked from the reversed query
# (scene_shadow below) since a convex light cannot occlude a segment that
# leaves its own surface, and endpoint epsilons swap sides — both inside
# the reference's ERR_MARGIN blur band (src/scene.rs:258-270).
_SHADOW_REVERSE = os.environ.get("RT_SHADOW_REVERSE", "0") == "1"

# Deferred NEE shadow queries (round 5): a MEASURED NEGATIVE RESULT, kept
# env-gated OFF.  The idea (round-4 VERDICT #1 — "fuse the shadow query
# into the main-bounce traversal"): ride the visibility segment in the lane
# state into the NEXT iteration and resolve it presorted alongside that
# iteration's main trace, deleting the whole per-query glue chain (own
# coherence key + argsort + [N,8] pack gather + unsort — the chain is 27%
# of flying_unicorn wall, round-4 RT_ABLATE=shadow).  The shadow origin is
# the SAME point as the continuation ray's origin, so the shared
# permutation hands the shadow wavefront exact-origin-coherent packets —
# unlike the round-2/3 "inherit" experiment whose sort origins sat one full
# bounce away.  Measured (v5e, flying_unicorn 600x450@16spp, warm):
#
#   structure                  full    RT_ABLATE=shadow   shadow cost
#   same-iteration (own sort)  3.63 s  2.62 s             1.01 s
#   deferred (shared order)    4.60 s  2.83 s             1.77 s
#
# Two causes, both structural: (a) the own-key sort does double duty the
# shared order can't — it clusters DEAD shadow lanes (parked / culled /
# pre-resolved, ~2/3 of each wavefront) into pure-miss packets that exit at
# the root, where the main-ray order scatters live queries across nearly
# every packet; (b) within a main-key packet, lanes share the CONTINUATION
# ray's treetop-cut entry, not a tight origin cluster, so shadow frustums
# fan.  +0.21 s is deferral bookkeeping itself (10 extra f32 state columns
# through the row-bound permutation gather + one trailing iteration).  An
# in-kernel main+shadow fused traversal would inherit the same order by
# construction, so this measurement also prices that design out.
# RT_DEFER_SHADOW=1 re-enables for re-measurement on future tree/sort
# layouts; the path is backend-agnostic and CPU-tested.
_DEFER_SHADOW = os.environ.get("RT_DEFER_SHADOW", "0") == "1"


def render_band_regen(
    scene: SceneArrays,
    pre: ScenePre,
    cfg: RenderConfig,
    y0: Array,  # scalar i32 first render-space row
    rows: int,
    num_samples: Array,  # scalar i32 samples per subpixel — DYNAMIC, so one
    # compile per band shape serves every spp (jit compiles of the bounce
    # loop run tens of seconds)
    key: Array,
) -> tuple[Array, Array]:
    """Render a row band -> (sums [rows, W, 4, 3], rays-traced i32)."""
    eps = cfg.eps
    w = cfg.width
    n_pix = rows * w
    n = n_pix * 4  # one lane per (pixel, subpixel)
    # Int lane state travels through the coherence permutation BITCAST into
    # f32 columns (pure data moves — bit-exact at any magnitude), so band
    # size carries no exactness bound; j must stay below 2^24 for the
    # packed (active|depth|j) field, which renderer.plan() enforces.
    light_e = scene.obj_emitted[scene.light_idx]
    num_samples = jnp.asarray(num_samples, jnp.int32)

    # Reversed-shadow scene view: the light sphere masked out (it can never
    # legitimately occlude a reversed segment, but a reversed ray STARTS on
    # its surface where f32 root noise could fake a t just above eps).
    shadow_reverse = (
        scene.use_bvh and scene.light_type == LIGHT_SPHERE and _SHADOW_REVERSE
    )
    scene_shadow = (
        scene.replace(
            sph_valid=scene.sph_valid & (scene.sph_obj != scene.light_idx)
        )
        if shadow_reverse
        else scene
    )

    # Safety cap; RR terminates the while-loop far earlier in practice.
    hard_cap = num_samples * (cfg.max_depth + 2) + 64

    # Deferred shadow queries (see _DEFER_SHADOW): only where the per-
    # iteration state permutation exists to carry them (BVH scenes).
    # Non-BVH scenes trace shadows as dense [prims, N] math with no
    # sorting at all, so deferral would only add state columns.
    deferred = (
        scene.use_bvh and _PERMUTE_STATE and _DEFER_SHADOW
        and not shadow_reverse
    )

    # RNG draw layout (threefry/rbg bits cost ~a trace per bounce, so only
    # draw what this scene's static material/light mix consumes).  Camera
    # jitter is drawn pre-permutation (fold 2*it), the shading draws post
    # (fold 2*it+1): [light..., rr, bsdf...].
    light_draws = 3 if scene.light_type != 0 else 2  # mesh lights pick a tri
    bsdf_draws = 3 if scene.has_phong else 2
    i_light = 0
    i_rr = i_light + light_draws
    i_bsdf = i_rr + 1
    n_draws = i_bsdf + bsdf_draws

    zero3 = jnp.zeros((n, 3))

    # Packed lane-state column layout (shared by the per-iteration coherence
    # permutation and the tail-compaction gather): slot(0), meta(1),
    # ro(2:5), rd(5:8), then beta/emis — one bf16-pair column per component
    # by default (8:11), or two f32 triples (8:14) under RT_STATE_BF16=0 —
    # then acc(3), then pdf_prev(1, MIS only — NEE never reads it, and
    # leaving it out lets XLA drop the carry entirely); the C_* offsets
    # below are the single source of truth.  There is NO per-path radiance column:
    # every bounce contribution banks straight into the lane accumulator
    # ``acc`` (paths always complete — miss, RR, dead BSDF, or depth cap —
    # so the sum is the same terms; only the f32 summation grouping changed
    # vs the carried-L form.  One edge case differs: a path still in flight
    # when it == hard_cap now keeps its partial contributions in acc where
    # the carried-L form discarded them — both are truncation bias, and the
    # cap is unreachable in practice since RR terminates far earlier).
    # Dropping the carried L trims 3 columns off the per-iteration
    # permutation gather, whose cost is ~(fixed + per-column).  Int state travels BITCAST into the f32
    # columns (concat/gather/slice are pure data moves — bit-exact at any
    # magnitude): active in meta's sign bit, depth in bits 24..30, j below
    # (j < 2^24 == 64M samples/subpixel, enforced by renderer.plan()).
    if cfg.max_depth >= 128:
        raise ValueError("max_depth >= 128 overflows the packed lane-state field")
    _bc_f = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
    _bc_i = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)

    # beta/emis ride ONE bf16-pair column each instead of two f32 columns
    # (round-to-nearest; 17 -> 14 columns, the gather cost is
    # ~(fixed + per-column)).  Error budget: re-rounding an already-bf16
    # value is exact, so each path-weight component absorbs <= 2^-9
    # relative error once per BOUNCE (when beta/emis actually change), a
    # ~0.2%/bounce jitter far under MC noise; the f32 accumulator ``acc``
    # and the geometry columns are untouched.  RT_STATE_BF16=0 restores
    # full-f32 state for A/B measurement and oracle work.
    state_bf16 = os.environ.get("RT_STATE_BF16", "1") == "1"

    def _pack2(hi, lo):
        """Two f32 arrays -> one f32 array holding (bf16(hi) << 16) | bf16(lo)."""
        h = _bc_u16(hi.astype(jnp.bfloat16)).astype(jnp.uint32)
        l = _bc_u16(lo.astype(jnp.bfloat16)).astype(jnp.uint32)
        return jax.lax.bitcast_convert_type((h << 16) | l, jnp.float32)

    def _unpack2(col):
        u = jax.lax.bitcast_convert_type(col, jnp.uint32)
        hi = _bc_bf16((u >> 16).astype(jnp.uint16)).astype(jnp.float32)
        lo = _bc_bf16((u & 0xFFFF).astype(jnp.uint16)).astype(jnp.float32)
        return hi, lo

    _bc_u16 = lambda a: jax.lax.bitcast_convert_type(a, jnp.uint16)
    _bc_bf16 = lambda a: jax.lax.bitcast_convert_type(a, jnp.bfloat16)

    # Column offsets: slot(0), meta(1), ro(2:5), rd(5:8), then either
    # beta/emis as bf16 pairs (8:11) or as f32 triples (8:11, 11:14),
    # then acc, then pdf_prev (MIS only — NEE never reads it, and leaving
    # it out lets XLA drop the carry entirely), then — deferred-shadow mode
    # only — the pending visibility query: s_ro(3), s_rd(3), s_cap(1) and
    # the pending direct contribution pend(3).  The round-4 microbench
    # showed the permutation gather is ROW/latency bound, so these +10
    # columns cost far less than the key+argsort+pack+unsort chain they
    # delete (see _DEFER_SHADOW).
    C_BE = 8
    C_ACC = C_BE + (3 if state_bf16 else 6)
    C_PDF = C_ACC + 3
    C_SH = C_PDF + (1 if cfg.use_mis else 0)

    def pack_state(active, j, slot, depth, ro, rd, beta, emis, pdf_prev,
                   acc, sh=None):
        meta = _bc_f((active.astype(jnp.int32) << 31) | (depth << 24) | j)
        parts = [_bc_f(slot)[:, None], meta[:, None], ro, rd]
        if state_bf16:
            parts.append(_pack2(beta, emis))
        else:
            parts += [beta, emis]
        parts.append(acc)
        if cfg.use_mis:
            parts.append(pdf_prev[:, None])
        if deferred:
            s_ro, s_rd, s_cap, pend = sh
            parts += [s_ro, s_rd, s_cap[:, None], pend]
        return jnp.concatenate(parts, axis=1)

    def unpack_state(cols, pdf_prev_passthru):
        """cols [M, C] -> state tuple (layout above)."""
        meta = _bc_i(cols[:, 1])
        if state_bf16:
            beta, emis = _unpack2(cols[:, C_BE:C_BE + 3])
        else:
            beta, emis = cols[:, C_BE:C_BE + 3], cols[:, C_BE + 3:C_BE + 6]
        base = (
            meta < 0,
            meta & 0xFFFFFF,
            _bc_i(cols[:, 0]),
            (meta >> 24) & 0x7F,
            cols[:, 2:5], cols[:, 5:8],
            beta, emis,
            cols[:, C_PDF] if cfg.use_mis else pdf_prev_passthru,
            cols[:, C_ACC:C_ACC + 3],
        )
        if deferred:
            base = base + (
                cols[:, C_SH:C_SH + 3],       # s_ro
                cols[:, C_SH + 3:C_SH + 6],   # s_rd
                cols[:, C_SH + 6],            # s_cap
                cols[:, C_SH + 7:C_SH + 10],  # pend
            )
        return base

    def lane_work(st):
        """Lanes still holding work: an in-flight path, remaining samples,
        or (deferred mode) an unresolved visibility query."""
        _it, _rays, active, j, *rest = st
        work = active | (j < num_samples)
        if deferred:
            work = work | (rest[-2] > 0.0)  # s_cap
        return work

    def cond(st):
        it = st[0]
        return (it < hard_cap) & jnp.any(lane_work(st))

    def body(st):
        (it, rays, active, j, slot, depth, ro, rd, beta, emis, pdf_prev,
         acc, *sh_st) = st
        if deferred:
            s_ro, s_rd, s_cap, pend = sh_st
        # Width-agnostic: the same body serves the full band and the
        # compacted straggler tail (shapes are static per trace).
        n = active.shape[0]

        # ---- 1) regenerate: idle lanes start their next sample ----
        # Pixel/subpixel coordinates derive from the lane's carried SLOT id
        # (lanes migrate under the coherence permutation below; their
        # pixel identity travels with them).
        pix = slot // 4
        sub = slot % 4
        jit = jax.random.uniform(jax.random.fold_in(key, 2 * it), (2, n))
        got = ~active & (j < num_samples)
        cro, crd = camera_rays(
            scene, cfg.width, cfg.height, cfg.fov_scale,
            (pix % w).astype(jnp.float32),
            y0.astype(jnp.float32) + (pix // w).astype(jnp.float32),
            (sub % 2).astype(jnp.float32), (sub // 2).astype(jnp.float32),
            jit[0], jit[1],
        )
        g3 = got[:, None]
        ro = jnp.where(g3, cro, ro)
        rd = jnp.where(g3, crd, rd)
        depth = jnp.where(got, 0, depth)
        beta = jnp.where(g3, 1.0, beta)
        # A camera ray collects its first vertex's emission at weight 1
        # (Scene::received_radiance, src/scene.rs:152-159).
        emis = jnp.where(g3, 1.0, emis)
        pdf_prev = jnp.where(got, BIG, pdf_prev)  # delta => MIS weight 1
        j = jnp.where(got, j + 1, j)
        active = active | got

        # ---- 1b) park + persistent coherence permutation ----
        # Park dead lanes (all samples done) on a ray far outside every
        # primitive pointing away: they sort into the miss group and their
        # BVH packets terminate after one root test, so exhausted lanes
        # stop paying traversal cost while the band's stragglers finish.
        a3 = active[:, None]
        ro = jnp.where(a3, ro, PARK_RO)
        rd = jnp.where(a3, rd, PARK_RD)
        if scene.use_bvh and _PERMUTE_STATE:
            # Permute the WHOLE lane state by the traversal-coherence key;
            # the main trace then runs presorted (no per-trace sort/unsort)
            # and the NEE shadow trace inherits the order (shadow origins
            # are the sorted main hits).  Cheaper than the two independent
            # sort+unsort cycles it replaces.  (Sorting only every 2nd
            # iteration measured ~1.8x SLOWER overall: one-iteration-stale
            # orders leave fresh camera rays and newly-parked lanes in the
            # wrong packets, and the kernel-time penalty dwarfs the saved
            # argsort.)
            from raytracer_tpu.ops.bvh import _coherence_key, _coherence_order

            # ONE row gather of the whole packed state: separate per-array
            # takes measured 42ms vs ~6ms packed (TPU gathers amortize over
            # the row), and the gather's cost is ~(fixed + per-column), so
            # every column trimmed is real time.
            packed = pack_state(active, j, slot, depth, ro, rd, beta, emis,
                                pdf_prev, acc,
                                (s_ro, s_rd, s_cap, pend) if deferred else None)
            G = _SORT_GROUP
            if G > 1 and n % G == 0:
                # Group-quantized order (see _SORT_GROUP): one key per G
                # consecutive lanes, G-times-fatter gather rows.
                key_lane = _coherence_key(scene, ro, rd, eps)
                gkey = jnp.min(key_lane.reshape(n // G, G), axis=1)
                order_g = jnp.argsort(gkey)
                C = packed.shape[1]
                cols = jnp.take(
                    packed.reshape(n // G, G * C), order_g, axis=0
                ).reshape(n, C)
            else:
                order, _ = _coherence_order(scene, ro, rd, eps)
                cols = jnp.take(packed, order, axis=0)
            (active, j, slot, depth, ro, rd, beta, emis, pdf_prev,
             acc, *sh_st) = unpack_state(cols, pdf_prev)
            if deferred:
                s_ro, s_rd, s_cap, pend = sh_st

        # ---- 2) main trace (camera + continuation rays together) ----
        rays = rays + jnp.sum(active.astype(jnp.int32))
        if os.environ.get("RT_ABLATE") == "rng":  # timing probe only
            us = jnp.broadcast_to(
                jnp.linspace(0.1, 0.9, n_draws)[:, None], (n_draws, n)
            )
        else:
            us = jax.random.uniform(
                jax.random.fold_in(key, 2 * it + 1), (n_draws, n)
            )
        # Unused third draws (sphere lights / non-Phong BSDFs) alias an
        # earlier lane — the consuming code statically ignores them.
        u_light3 = us[i_light + 2] if light_draws == 3 else us[i_light]
        u_bsdf3 = us[i_bsdf + 2] if bsdf_draws == 3 else us[i_bsdf]

        # The whole shading core runs on SoA component tuples ([N] vectors):
        # the round-4 device trace pinned ~190 us of the ~675 us cornell
        # iteration on ~15 [N,3]->[N] reduce fusions at 3/128 lane occupancy
        # (dot/length chains below).  Elementwise [N,3] math stays [N,3]
        # (XLA flattens it densely — the round-3 FULL-SoA engine rewrite
        # measured 2.7x slower, BENCHMARKS.md); only the reduction-feeding
        # vectors are component-form.
        rd3 = vm.as3(rd)
        hit = trace_soa(
            scene, pre, ro, rd, eps,
            presorted=scene.use_bvh and _PERMUTE_STATE,
        )
        valid = active & hit.valid

        if deferred:
            # ---- 2b) resolve the PREVIOUS iteration's shadow queries ----
            # The pending segments left the previous shading vertex — the
            # same origin as this iteration's continuation ray — so the
            # state permutation above already ordered them into origin-
            # coherent packets; presorted=True skips the whole per-query
            # sort/pack/unsort chain (see _DEFER_SHADOW).  The visibility
            # test "nearest hit at/just beyond the light sample"
            # (src/scene.rs:258-270) is sh_t >= cap with cap = dist -
            # margin, carried from issue time.
            if os.environ.get("RT_ABLATE") == "shadow":  # timing probe only
                vis_prev = jnp.ones_like(s_cap, bool)
            else:
                sh_t, sh_valid = trace_t(
                    scene, pre, vm.as3(s_ro), vm.as3(s_rd), eps,
                    t_max=s_cap, presorted=True,
                )
                vis_prev = (~sh_valid) | (sh_t >= s_cap)
            acc = acc + jnp.where(vis_prev[:, None], pend, 0.0)
            pend = jnp.zeros_like(pend)
            s_cap = jnp.zeros_like(s_cap)

        # ---- 3) arrival: collect emission through the bounce ----
        # Contributions bank STRAIGHT into acc (see the layout note above):
        # paths always terminate, so acc's final value is the same sum of
        # the same terms, without a carried per-path L column.
        em_next = brdf.take_obj_rows(scene.obj_emitted, hit.obj)
        if cfg.use_mis:
            hit_light = hit.obj == scene.light_idx
            cos_yb = jnp.maximum(-vm.dot3(hit.n, rd3), 1e-8)
            pdf_l_sa = (hit.t * hit.t) / (cos_yb * scene.light_area)
            w_b = jnp.where(hit_light, pdf_prev / (pdf_prev + pdf_l_sa), 1.0)
            acc = jnp.where(
                valid[:, None], acc + emis * em_next * w_b[:, None], acc
            )
        else:
            acc = jnp.where(valid[:, None], acc + emis * em_next, acc)

        x = hit.pos  # (x, y, z) of [N]
        nrm = hit.n
        obj = hit.obj
        o3 = vm.neg3(rd3)
        depth = jnp.where(active, depth + 1, depth)

        # ---- 4) vertex shading: NEE + RR + BSDF sampling ----
        mat = brdf.gather_mat(scene, obj)
        is_spec = mat.brdf_type == BRDF_SPECULAR

        y, ny, pdf_l = sample_light3(scene, us[i_light], us[i_light + 1], u_light3)
        to_y = vm.sub3(y, x)
        dist = jnp.sqrt(vm.norm2_3(to_y))
        wi_d = vm.scale3(to_y, 1.0 / jnp.maximum(dist, 1e-20))
        r2 = jnp.maximum(dist * dist, 1e-20)
        cos_y = -vm.dot3(ny, wi_d)
        nee_lanes = valid & ~is_spec
        park_rd3 = (jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0))
        # Ray accounting counts every NEE lane — the reference traces every
        # visibility ray unconditionally (src/scene.rs:218-229), so culled
        # lanes (below) are still reference-equivalent rays: the cull is an
        # optimization of OUR tracer, not a change in the estimator's ray
        # demand.  This matches the lockstep engine and the native C++
        # baseline's counters, keeping Mrays/s comparable across engines
        # and rounds (round 3 briefly counted post-cull rays; re-grounded
        # in round 4 — see BENCHMARKS.md).
        rays = rays + jnp.sum(nee_lanes.astype(jnp.int32))
        # Back-face shadow cull (sphere lights, BVH scenes): a light sample
        # on the far hemisphere (cos_y <= 0) is self-occluded by the convex
        # light sphere, so the reference's visibility trace returns 0 for it
        # anyway (src/scene.rs:219-227 has no cosine gate — occlusion does
        # the zeroing; the only divergence is within the 1e-3 silhouette
        # margin, where the cos_y factor makes the term ~0).  Uniform area
        # sampling puts ~half of all light samples there, so culling them
        # before the trace halves shadow BVH traversal.  Non-BVH scenes keep
        # the unculled form: their shadow test is dense [prims,rays] math
        # that masked lanes don't make cheaper, and renders stay
        # bit-identical with the pre-cull code.
        cull = scene.use_bvh and scene.light_type == LIGHT_SPHERE
        shadow_lanes = nee_lanes & (cos_y > 0.0) if cull else nee_lanes
        # Shadow query bounded at dist - margin: finding a hit below
        # that bound is EXACTLY the reference's invisibility test
        # hit.t + margin < dist (src/scene.rs:258-270).  (any_hit=True
        # re-measured after the treetop-cut sort: +24% on an all-lanes-live
        # shadow wavefront in isolation, but a wash in production where
        # ~half the lanes are parked — unoccluded lanes can never resolve,
        # so the per-step all-reduce buys exits too rarely.  Kept off.)
        # Shadow-query ordering: in deferred mode (the BVH default, see
        # _DEFER_SHADOW) the query rides the state into the NEXT iteration
        # and shares its permutation — exact-origin coherence with the
        # continuation wavefront, no per-query sort chain.  Same-iteration
        # (non-deferred) shadow rays sort by their OWN key: inheriting the
        # PREVIOUS segment's order lost its re-measurement twice (round 2
        # skip-links, round 3 wide stack kernel: 12.7 vs 8.8 s on
        # flying_unicorn @16spp — there the sort origins sit one full
        # bounce away from the shadow origins).
        if deferred:
            vis = None  # resolved next iteration (step 2b)
            s_ro = vm.stack3(vm.where3(shadow_lanes, x, PARK_RO))
            s_rd = vm.stack3(vm.where3(shadow_lanes, wi_d, park_rd3))
            s_cap = jnp.where(
                shadow_lanes, dist - eps.visibility_margin, 0.0
            )
        elif os.environ.get("RT_ABLATE") == "shadow":  # timing probe only
            vis = shadow_lanes
        elif shadow_reverse:
            # Light -> surface (see _SHADOW_REVERSE above).  presorted: the
            # lane permutation's main-ray order is coherent for rays that
            # all leave the light toward the sorted hit points.
            sh_t, sh_valid = trace_t(
                scene_shadow, pre,
                vm.where3(shadow_lanes, y, PARK_RO),
                vm.where3(shadow_lanes, vm.neg3(wi_d), park_rd3),
                eps,
                t_max=jnp.where(shadow_lanes, dist - eps.visibility_margin, 0.0),
                presorted=True,
            )
            vis = (~sh_valid) | (sh_t + eps.visibility_margin >= dist)
        else:
            sh_t, sh_valid = trace_t(
                scene, pre,
                vm.where3(shadow_lanes, x, PARK_RO),
                vm.where3(shadow_lanes, wi_d, park_rd3),
                eps,
                t_max=jnp.where(shadow_lanes, dist - eps.visibility_margin, 0.0),
            )
            vis = (~sh_valid) | (sh_t + eps.visibility_margin >= dist)
        if not deferred and cull:
            vis = vis & (cos_y > 0.0)  # culled lanes were never traced
        f_d = brdf.eval_nonspecular3(mat, nrm, o3, wi_d, scene.has_phong)
        cos_x = vm.dot3(nrm, wi_d)
        # In deferred mode the direct term is computed WITHOUT the
        # visibility factor and parked in ``pend``; it banks into acc next
        # iteration multiplied by the resolved visibility bit.  Culled
        # lanes (cos_y <= 0) are excluded from shadow_lanes, so their pend
        # is zero — exactly the reference's occluded-anyway outcome.
        vis_f = jnp.float32(1.0) if deferred else jnp.where(vis, 1.0, 0.0)
        if cfg.use_mis:
            pdf_l_sa_d = pdf_l * r2 / jnp.maximum(cos_y, 1e-8)
            pdf_b_at = brdf.pdf3(mat, nrm, o3, wi_d)
            ok_geo = (cos_y > 0.0) & (cos_x > 0.0)
            ok = ok_geo if deferred else (vis & ok_geo)
            direct = jnp.where(
                ok[:, None],
                light_e[None, :] * f_d * (cos_x / (pdf_l_sa_d + pdf_b_at))[:, None],
                0.0,
            )
        else:
            scale = vis_f * cos_x * cos_y / (r2 * pdf_l)
            direct = light_e[None, :] * f_d * scale[:, None]
        if deferred:
            pend = jnp.where(shadow_lanes[:, None], beta * direct, 0.0)
        else:
            acc = acc + jnp.where(nee_lanes[:, None], beta * direct, 0.0)

        p = jnp.where(depth <= cfg.rr_start_depth, 1.0, cfg.rr_survival)
        cont = valid & (us[i_rr] < p) & (depth < cfg.max_depth)
        wi, pdf_b = brdf.sample3(
            mat, nrm, o3, us[i_bsdf], us[i_bsdf + 1], u_bsdf3,
            cfg.fix_phong_frame, scene.has_phong,
        )
        f_c = brdf.eval_nonspecular3(mat, nrm, o3, wi, scene.has_phong)
        cos_c = vm.dot3(nrm, wi)
        w_nonspec = jnp.where(
            (pdf_b > 1e-12)[:, None],
            f_c * (cos_c / jnp.maximum(pdf_b, 1e-12))[:, None],
            0.0,
        )
        weight = jnp.where(is_spec[:, None], mat.c_s, w_nonspec) / p[:, None]
        beta_next = beta * weight
        bn3 = vm.as3(beta_next)
        live = cont & ((bn3[0] > 0.0) | (bn3[1] > 0.0) | (bn3[2] > 0.0))

        # Next-arrival emission coefficient (see integrator.radiance):
        # specular collects full emission (scaled only by 1/p); MIS lanes
        # collect beta_next * balance-weight; plain NEE lanes collect none.
        if cfg.use_mis:
            emis = jnp.where(is_spec[:, None], beta / p[:, None], beta_next)
            pdf_prev = jnp.where(is_spec, BIG, pdf_b)
        else:
            emis = jnp.where(is_spec[:, None], beta / p[:, None], 0.0)
            pdf_prev = pdf_b

        # ---- 5) continue: dead paths regenerate at the next iteration ----
        active = live
        beta = beta_next
        ro = jnp.where(live[:, None], vm.stack3(x), ro)
        rd = jnp.where(live[:, None], vm.stack3(wi), rd)
        out = (it + 1, rays, active, j, slot, depth, ro, rd, beta, emis,
               pdf_prev, acc)
        if deferred:
            out = out + (s_ro, s_rd, s_cap, pend)
        return out

    st = (
        jnp.int32(0),
        jnp.int32(0),
        jnp.zeros(n, bool),
        jnp.zeros(n, jnp.int32),
        jnp.arange(n, dtype=jnp.int32),  # slot: lane -> (pixel, subpixel)
        jnp.zeros(n, jnp.int32),
        zero3,
        zero3,
        zero3,
        zero3,
        jnp.zeros(n),
        zero3,
    )
    if deferred:
        st = st + (
            jnp.full((n, 3), PARK_RO),        # s_ro: parked, no query yet
            jnp.broadcast_to(PARK_RD, (n, 3)),  # s_rd
            jnp.zeros(n),                      # s_cap: 0 = no pending query
            zero3,                             # pend
        )
    # ---- tail compaction (BVH scenes) ----
    # In a closed scene lanes die only by Russian roulette (survival 0.9
    # past depth 5), so per-lane run lengths have a fat geometric tail: the
    # loop spends its last ~10 iterations with <25% of lanes holding work,
    # while every iteration's permutation gather / sorts / shadow pack cost
    # the FULL band width (~25 ms of N-proportional glue per iteration at
    # 1M lanes).  Fix: run the full band only until <= N/4 lanes still have
    # work, then compact the stragglers (one extra state gather, stable so
    # the coherence order survives) into an N/4-wide loop that finishes the
    # tail at a quarter of the glue cost.  Finished lanes' banked acc rides
    # the compaction gather's tail rows.  Samples-per-lane regen makes the
    # lane->pixel mapping travel in the state (slot column), so compaction
    # composes with the per-iteration coherence permutation for free.
    widths = []
    if scene.use_bvh and cfg.tail_compact:
        wcur = n
        while len(widths) < cfg.tail_compact_stages:
            cand = -(-(wcur // 2) // 1024) * 1024  # half, 1024-lane rounded
            if cand >= wcur or cand < 1024:
                break
            widths.append(cand)
            wcur = cand
    if widths:
        tail_slots, tail_accs = [], []
        for w2 in widths:
            def cond_wide(st, _w2=w2):
                it = st[0]
                work = lane_work(st)
                return (
                    (it < hard_cap)
                    & jnp.any(work)
                    & (jnp.sum(work.astype(jnp.int32)) > _w2)
                )

            st = jax.lax.while_loop(cond_wide, body, st)
            (it, rays, active, j, slot, depth, ro, rd, beta, emis,
             pdf_prev, acc, *sh_st) = st
            # A lane with an unresolved deferred visibility query still
            # holds work: its acc must not be frozen into the tail rows
            # before the pending contribution banks (lane_work covers it).
            work = lane_work(st)
            # Stable sort, working lanes first: survivors keep their
            # coherence order, done lanes' final acc/slot land in the
            # tail rows.
            order2 = jnp.argsort(jnp.where(work, 0, 1), stable=True)
            cols = jnp.take(
                pack_state(active, j, slot, depth, ro, rd, beta, emis,
                           pdf_prev, acc, tuple(sh_st) if deferred else None),
                order2, axis=0,
            )
            tail_slots.append(_bc_i(cols[w2:, 0]))
            tail_accs.append(cols[w2:, C_ACC:C_ACC + 3])
            st = (it, rays) + unpack_state(cols[:w2], pdf_prev[:w2])
        out = jax.lax.while_loop(cond, body, st)
        rays = out[1]
        slot = jnp.concatenate([out[4]] + tail_slots)
        acc = jnp.concatenate([out[11]] + tail_accs, axis=0)
        acc = jnp.take(acc, jnp.argsort(slot), axis=0)
        return acc.reshape(rows, w, 4, 3), rays

    out = jax.lax.while_loop(cond, body, st)
    rays, slot, acc = out[1], out[4], out[11]
    if scene.use_bvh:
        # Lanes migrated under the per-iteration permutation; restore slot
        # order via argsort + gather (TPU sorts are ~60x faster than the
        # equivalent scatter, see ops/bvh._coherence_order).
        acc = jnp.take(acc, jnp.argsort(slot), axis=0)
    return acc.reshape(rows, w, 4, 3), rays
