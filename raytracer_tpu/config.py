"""Render configuration.

The reference keeps its knobs as hard-coded constants scattered through the
source (WIDTH/HEIGHT in src/server.rs:29-30, MAX_BOUNCES=5 and
SURVIVAL_PROBABILITY=0.9 in src/scene.rs:109-110, the camera FOV constant
0.5135 in src/server.rs:330-331, epsilons inline in src/geometry.rs) and an
unread vestigial config.toml.  Here they are a real config layer.

All geometry epsilons were tuned for the reference's f64 math; TPUs compute
in f32, so the defaults below are re-tuned (scene units are ~100, f32 ulp at
coordinate 300 is ~3e-5).  Each field documents the reference value.
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass(frozen=True)
class Epsilons:
    """Geometric epsilons (reference values noted; re-tuned for f32).

    Reference (f64): sphere eps 1e-4 (src/geometry.rs:516), plane parallel
    cutoff 1e-4 (:553), triangle parallel cutoff 1e-4 and t>1e-4 (:640,:659),
    hit offset 1e-5 (:561,:663), visibility margin 1e-3 (src/scene.rs:259).
    """

    sphere_tmin: float = 2e-3
    plane_parallel: float = 1e-4
    tri_parallel: float = 1e-4
    tri_tmin: float = 1e-3
    hit_offset: float = 1e-3
    visibility_margin: float = 1e-2
    specular_match: float = 1e-3  # BRDF::eval specular dir match, src/scene.rs:35


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Full render configuration.

    Defaults reproduce the reference's live code path: NEE + Russian
    roulette, MIS off (the reference's MIS is dead code behind ``if false``,
    src/scene.rs:188), 600x450 output (src/server.rs:29-30).
    """

    width: int = 600
    height: int = 450

    # Integrator (reference: src/scene.rs:109-110).
    rr_start_depth: int = 5  # MAX_BOUNCES: depth <= 5 always continues
    rr_survival: float = 0.9  # SURVIVAL_PROBABILITY beyond that
    # The reference recurses unboundedly (geometric tail, p=0.9).  A wavefront
    # integrator needs a static cap; at depth 5+k the surviving throughput is
    # ~(albedo/0.9)^k so 24 keeps truncation bias far below MC noise at any
    # spp used by the benchmark configs.
    max_depth: int = 24
    use_mis: bool = False

    # Camera (reference: src/server.rs:330-331).
    fov_scale: float = 0.5135

    # Fix the reference's Phong sample_incoming bug where the sampled
    # direction is returned in the local tangent frame without being rotated
    # into world space (src/scene.rs:74-95; compare the diffuse arm :64-66
    # which does rotate).  True = physically-correct world-frame directions.
    fix_phong_frame: bool = True

    eps: Epsilons = dataclasses.field(default_factory=Epsilons)

    # Wavefront batching: lane budget per device step.  Empirically tuned
    # on v5e (cornell 256spp sweep): ~120K-lane bands outperform both
    # smaller (dispatch overhead) and larger (cache/VMEM pressure) ones.
    rays_per_pass: int = 1 << 17
    # Mesh (BVH) scenes amortize their much heavier per-dispatch cost over
    # bigger bands (v5e sweep: 2^20 beat 2^17 by ~30% on flying_unicorn;
    # 2^21 — the whole 600x450 frame as one band — is another ~6%).  2^21
    # became the default once the round-3 kernel/glue optimizations pushed
    # the per-dispatch wall under ~1.2 s, the same worst-case cancellation
    # latency the 2^20 default was originally chosen for.
    mesh_rays_per_pass: int = 1 << 21

    # BVH tail compaction: each time <= half the current loop width's
    # lanes still hold work, compact the stragglers (one extra stable
    # state gather) into a half-width loop, so the fat Russian-roulette
    # tail stops paying the full band's per-iteration permutation / sort /
    # pack glue (which is N-proportional regardless of lane activity).
    # Each stage costs one extra while-loop compile per band shape;
    # tiny bands skip stages automatically (min width 1024 lanes).
    # Three stages (N/2, N/4, N/8): round 3 measured stage 2 worth 0.54 s
    # on flying_unicorn @16spp (BENCHMARKS.md); the geometric RR tail past
    # depth 5 keeps ~10% of lanes alive long enough that an N/8 stage
    # still amortizes its one extra state gather.
    tail_compact: bool = True
    tail_compact_stages: int = 3

    # Integrator scheduling: "mega" = Pallas bounce megakernel (whole
    # per-sample loop in one TPU kernel, zero HBM state traffic; covers
    # sphere/plane NEE scenes — cornell_box @256spp measured 2329 Mrays/s
    # vs regen's 505, round 5) with automatic fallback to "regen" for
    # meshes/Phong/MIS/CPU; "regen" = regenerating XLA wavefront (dead
    # lanes immediately claim fresh camera samples, ~2x occupancy;
    # render/wavefront.py); "simple" = plain lockstep wavefront
    # (render/integrator.py — the readable reference path).
    engine: str = "mega"

    # RNG base seed.  The reference uses unseeded thread-local RNG
    # (non-reproducible); we use counter-based keys derived from
    # (seed, tile, sample, bounce, purpose) so renders are deterministic.
    seed: int = 0
    # PRNG implementation: "rbg" is several times faster than
    # "threefry2x32" on TPU (the integrator draws 9N uniforms per bounce)
    # and still deterministic/counter-based; both pass the statistical
    # oracle tests.
    rng_impl: str = "rbg"


def config_from_toml(path: str) -> "RenderConfig":
    """Build a RenderConfig from a TOML file.

    The reference ships a ``config.toml`` (width/height/samples_per_pixel/
    scene/use_mis/show_window) that NOTHING reads (README references a
    commented-out config module; SURVEY §2 'Config file (vestigial)').
    Here the same keys actually work; unknown keys are rejected.
    """
    import tomllib

    with open(path, "rb") as fh:
        doc = tomllib.load(fh)
    known = {
        "width": "width",
        "height": "height",
        "use_mis": "use_mis",
        "max_bounces": "rr_start_depth",
        "max_depth": "max_depth",
        "survival_probability": "rr_survival",
        "seed": "seed",
        "engine": "engine",
        # accepted for reference-compat but not config fields here:
        "samples_per_pixel": None,  # spp comes per render request
        "scene": None,  # scenes are all loaded at startup
        "show_window": None,  # no native window path
    }
    kwargs = {}
    for key, val in doc.items():
        if key not in known:
            raise ValueError(f"unknown config key {key!r} in {path}")
        if known[key] is not None:
            kwargs[known[key]] = val
    return RenderConfig(**kwargs)


DEFAULT_PORT = 8080  # reference: src/main.rs:16 (overridable via PORT env)
SCENE_NAMES = ("cornell_box", "cubes", "flying_unicorn")  # src/main.rs:17


def port_from_env() -> int:
    return int(os.environ.get("PORT", DEFAULT_PORT))
