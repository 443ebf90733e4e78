"""Regenerating-wavefront integrator: statistical equivalence with the
plain lockstep integrator, path accounting, and determinism."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models.loader import load_scene
from raytracer_tpu.ops.intersect import scene_precompute
from raytracer_tpu.render.renderer import Renderer
from raytracer_tpu.render.wavefront import render_band_regen

SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")


@pytest.fixture(scope="module")
def cornell():
    return load_scene(os.path.join(SCENES, "cornell_box.toml"))


def _mean_image(scene, cfg, spp):
    return Renderer(scene, cfg).render_image(spp).astype(np.float64)


def test_regen_matches_simple_engine(cornell):
    """Same estimator, different scheduling: images agree to MC noise.

    The per-pixel noise floor is measured from two independent simple-engine
    renders (different seeds); regen-vs-simple must not exceed ~1.15x it.
    """
    base = dict(width=72, height=54, rays_per_pass=1 << 14)
    spp = 64
    a = _mean_image(cornell, RenderConfig(engine="simple", seed=0, **base), spp)
    a2 = _mean_image(cornell, RenderConfig(engine="simple", seed=1, **base), spp)
    b = _mean_image(cornell, RenderConfig(engine="regen", seed=0, **base), spp)
    floor = np.abs(a - a2).mean()
    assert abs(a.mean() - b.mean()) < 1.5
    assert np.abs(a - b).mean() < 1.15 * floor + 0.5


def test_regen_mis_matches_simple_mis(cornell):
    base = dict(width=48, height=36, rays_per_pass=1 << 13, use_mis=True)
    a = _mean_image(cornell, RenderConfig(engine="simple", **base), 32)
    b = _mean_image(cornell, RenderConfig(engine="regen", **base), 32)
    assert abs(a.mean() - b.mean()) < 2.0


def test_regen_deterministic(cornell):
    cfg = RenderConfig(width=40, height=30, rays_per_pass=1 << 12)
    a = _mean_image(cornell, cfg, 16)
    b = _mean_image(cornell, cfg, 16)
    np.testing.assert_array_equal(a, b)


def test_regen_covers_all_paths_exactly(cornell):
    """Every (pixel, subpixel) slot accumulates exactly num_samples paths.

    Render a constant-emission closed environment? Instead: use the fact
    that with spp samples the sums of a pure-emitter-facing pixel equal
    spp * emitted; check the light-disk pixel sums scale linearly in spp.
    """
    cfg = RenderConfig(width=608, height=456, rays_per_pass=1 << 12)
    pre = scene_precompute(cornell)
    sums4, rays4 = render_band_regen(cornell, pre, cfg, jnp.int32(340), 1, 4, jax.random.key(1))
    sums8, rays8 = render_band_regen(cornell, pre, cfg, jnp.int32(340), 1, 8, jax.random.key(2))
    # pixel 300 looks straight at the light: every path collects emitted=50
    # at the first vertex, so sums = 50 * num_samples exactly.
    np.testing.assert_allclose(np.asarray(sums4)[0, 300], 50.0 * 4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(sums8)[0, 300], 50.0 * 8, rtol=1e-4)
    assert int(rays8) > int(rays4) > 0


def test_band_rows_independent_of_k_for_streaming(cornell):
    # streaming engine: lanes = rows*W*4 regardless of sample count
    cfg = RenderConfig(width=100, height=96, rays_per_pass=1 << 16, engine="regen")
    r = Renderer(cornell, cfg)
    rows_lo, _, _ = r.plan(16)
    rows_hi, _, _ = r.plan(1024)
    assert rows_lo == rows_hi


def test_fused_matches_regen_engine(cornell):
    """The fused-trace engine is the same estimator as the streaming one."""
    base = dict(width=72, height=54, rays_per_pass=1 << 14)
    spp = 64
    a = _mean_image(cornell, RenderConfig(engine="regen", seed=0, **base), spp)
    a2 = _mean_image(cornell, RenderConfig(engine="regen", seed=1, **base), spp)
    b = _mean_image(cornell, RenderConfig(engine="fused", seed=0, **base), spp)
    floor = np.abs(a - a2).mean()
    assert abs(a.mean() - b.mean()) < 1.5
    assert np.abs(a - b).mean() < 1.15 * floor + 0.5


def test_fused_light_pixel_exact(cornell):
    """Direct light visibility: pixel on the light sums exactly 50*k."""
    import jax
    import jax.numpy as jnp

    from raytracer_tpu.ops.intersect import scene_precompute
    from raytracer_tpu.render.wavefront_fused import render_band_fused

    cfg = RenderConfig(width=608, height=456, rays_per_pass=1 << 12)
    pre = scene_precompute(cornell)
    sums, rays = render_band_fused(
        cornell, pre, cfg, jnp.int32(340), 1, 8, jax.random.key(2)
    )
    np.testing.assert_allclose(np.asarray(sums)[0, 300], 50.0 * 8, rtol=1e-4)
    assert int(rays) > 0


def test_fused_mis_falls_back_to_regen(cornell):
    """MIS + fused engine silently uses the regen path (no crash, unbiased)."""
    cfg = RenderConfig(width=40, height=30, rays_per_pass=1 << 12,
                       engine="fused", use_mis=True)
    img = Renderer(cornell, cfg).render_image(16)
    assert np.isfinite(img.astype(np.float64)).all() and img.mean() > 5


def test_bvh_scene_deterministic_given_seed():
    """The persistent coherence permutation (argsort + state gather +
    slot scatter) must preserve bit-reproducibility on BVH scenes."""
    import numpy as np

    from tests.test_server_mesh import chair_scene
    from raytracer_tpu.render.renderer import Renderer

    scene = chair_scene()
    cfg = RenderConfig(width=60, height=45, rays_per_pass=1 << 12,
                       mesh_rays_per_pass=1 << 12, seed=7)
    a = Renderer(scene, cfg).render_image(8)
    b = Renderer(scene, cfg).render_image(8)
    np.testing.assert_array_equal(a, b)
    assert a.max() == 255  # the light is visible (non-trivial image)


def test_tail_compaction_agrees_and_disabled_path_matches():
    """Tail compaction (staged half-width straggler loops) must agree with
    the uncompacted engine in distribution; both must be deterministic.
    The pre-compaction iterations consume identical RNG draws, so images
    differ only through post-compaction straggler paths (small mad)."""
    import dataclasses

    import numpy as np

    from tests.test_server_mesh import chair_scene
    from raytracer_tpu.render.renderer import Renderer

    scene = chair_scene()
    cfg = RenderConfig(width=60, height=45, rays_per_pass=1 << 12,
                       mesh_rays_per_pass=1 << 12, seed=7)
    on = Renderer(scene, cfg).render_image(8).astype(np.float64)
    off = Renderer(
        scene, dataclasses.replace(cfg, tail_compact=False)
    ).render_image(8).astype(np.float64)
    # Same-seed Monte-Carlo agreement: measured means 65.95 vs 65.92,
    # mad 0.55 at these shapes (CPU backend).
    assert abs(on.mean() - off.mean()) < 1.5
    assert np.abs(on - off).mean() < 3.0


def test_deferred_shadow_agrees_with_same_iteration():
    """RT_DEFER_SHADOW=1 (env-gated measured-negative experiment — see
    render/wavefront.py) must stay statistically correct: the deferral
    changes only WHICH iteration a direct-light term banks into acc, not
    the estimator's terms.  Same seed, same draws, so agreement is tight
    (the visibility comparison regroups one f32 subtraction)."""
    import importlib

    import numpy as np

    from tests.test_server_mesh import chair_scene
    from raytracer_tpu.render import wavefront
    from raytracer_tpu.render.renderer import Renderer

    scene = chair_scene()
    cfg = RenderConfig(width=60, height=45, rays_per_pass=1 << 12,
                       mesh_rays_per_pass=1 << 12, seed=7)
    from raytracer_tpu.render import renderer as _renderer

    base = Renderer(scene, cfg).render_image(8).astype(np.float64)
    old = os.environ.get("RT_DEFER_SHADOW")
    os.environ["RT_DEFER_SHADOW"] = "1"
    try:
        importlib.reload(wavefront)
        _renderer._streaming_jit.cache_clear()
        deferred = Renderer(scene, cfg).render_image(8).astype(np.float64)
    finally:
        if old is None:
            os.environ.pop("RT_DEFER_SHADOW", None)
        else:
            os.environ["RT_DEFER_SHADOW"] = old
        importlib.reload(wavefront)
        _renderer._streaming_jit.cache_clear()
    assert abs(base.mean() - deferred.mean()) < 1.5
    assert np.abs(base - deferred).mean() < 3.0
