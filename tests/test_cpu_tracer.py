"""Native C++ CPU tracer (native/cpu_tracer.cpp): statistical parity with
the TPU-path engines.  This tracer is bench.py's fair 1x denominator, so
its estimator must demonstrably match."""

import os

import numpy as np
import pytest

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models.loader import load_scene
from raytracer_tpu.render.renderer import Renderer, finalize
from raytracer_tpu.utils import native

SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")


def _require_tracer():
    lib = native._lib()
    if lib is None or not hasattr(lib, "rt_cpu_render_band"):
        pytest.skip("native cpu tracer not built")


def _gamma_u8(rgb01: np.ndarray) -> np.ndarray:
    v = np.clip(rgb01, 0.0, 1.0) ** (1.0 / 2.2) * 255.0 + 0.5
    return np.clip(np.floor(v), 0, 255)


def test_cornell_matches_engine_statistically():
    """Equal-spp cornell renders: native tracer vs the streaming engine.
    Identical estimators with independent RNG — image means must agree to
    MC-noise level, per-channel (the red/green wall structure)."""
    _require_tracer()
    scene = load_scene(os.path.join(SCENES, "cornell_box.toml"))
    w, h, spp = 120, 90, 32

    out = native.cpu_render_band(scene, w, h, 0, h, spp, seed=3)
    assert out is not None
    rgb, rays = out
    img_cpp = _gamma_u8(rgb)[::-1]  # render rows -> image orientation
    # sanity: ray accounting is the same scheme (camera+shadow+cont)
    assert rays > w * h * spp  # more than camera rays alone

    cfg = RenderConfig(width=w, height=h, rays_per_pass=1 << 15)
    img_eng = Renderer(scene, cfg).render_image(spp).astype(np.float64)

    diff = abs(img_cpp.mean() - img_eng.mean())
    assert diff < 1.5, f"u8 means differ: cpp {img_cpp.mean():.2f} vs engine {img_eng.mean():.2f}"
    for c in range(3):
        d = abs(img_cpp[..., c].mean() - img_eng[..., c].mean())
        assert d < 2.0, f"channel {c}: cpp {img_cpp[..., c].mean():.2f} vs {img_eng[..., c].mean():.2f}"
    # spatial structure: top (light/ceiling) brighter than bottom rows
    assert img_cpp[:20].mean() > img_cpp[-20:].mean()


def test_unicorn_bvh_matches_brute_force_exactly():
    """The native tracer's per-ray skip-link BVH vs a full linear triangle
    scan, SAME seed: identical estimator + identical RNG streams means the
    images must match exactly (nearest-hit BVH is not an approximation).
    This is the strong validity check for bench.py's mesh denominator."""
    _require_tracer()
    scene = load_scene(os.path.join(SCENES, "flying_unicorn.toml"))
    w, h, spp = 16, 12, 4  # brute force tests 37k tris per ray — keep tiny

    bvh = native.cpu_render_band(scene, w, h, 0, h, spp, seed=5)
    brute = native.cpu_render_band(scene, w, h, 0, h, spp, seed=5, brute_force=True)
    assert bvh is not None and brute is not None
    rgb_bvh, rays_bvh = bvh
    rgb_brute, rays_brute = brute
    np.testing.assert_allclose(rgb_bvh, rgb_brute, rtol=0, atol=1e-12)
    assert rays_bvh == rays_brute


def test_cpu_tracer_gating():
    """Phong scenes are IN scope since round 5 (crewmate_phong renders);
    mesh-light scenes remain out of scope -> None."""
    _require_tracer()
    scene = load_scene(os.path.join(SCENES, "crewmate_phong.toml"))
    out = native.cpu_render_band(scene, 32, 24, 0, 4, 4)
    assert out is not None
    rgb, rays = out
    assert rgb.shape == (4, 32, 3) and np.isfinite(rgb).all() and rays > 0

    from raytracer_tpu.models.loader import load_scene_dict
    mesh_light = {
        "camera": {"pos": [0.0, 0.0, 5.0], "dir": [0.0, 0.0, -1.0]},
        "objects": [
            {
                "brdf": {"type": "diffuse", "kd": [0, 0, 0]},
                "geometry": {
                    "type": "cube", "pos": [-0.5, 3.5, -0.5], "size": 1.0,
                },
                "emitted": [10.0, 10.0, 10.0],
            },
        ],
    }
    ml = load_scene_dict(mesh_light, name="ml")
    assert native.cpu_render_band(ml, 32, 24, 0, 4, 4) is None
