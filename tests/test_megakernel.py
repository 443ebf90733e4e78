"""Pallas bounce megakernel: statistical parity with the XLA streaming
engine (interpret mode on CPU), determinism, and engine gating."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models.loader import load_scene
from raytracer_tpu.ops.intersect import scene_precompute
from raytracer_tpu.ops.pallas.megakernel import (
    render_band_mega,
    supports_megakernel,
)
from raytracer_tpu.render.wavefront import render_band_regen

SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")


@pytest.fixture(scope="module")
def cornell():
    return load_scene(os.path.join(SCENES, "cornell_box.toml"))


def test_gating(cornell):
    cfg = RenderConfig()
    assert supports_megakernel(cornell, cfg)
    assert not supports_megakernel(cornell, RenderConfig(use_mis=True))
    unicorn = load_scene(os.path.join(SCENES, "flying_unicorn.toml"))
    assert not supports_megakernel(unicorn, cfg)
    phong = load_scene(os.path.join(SCENES, "crewmate_phong.toml"))
    assert not supports_megakernel(phong, cfg)
    # Small-triangle scenes (cubes: 24 unrolled prism tris, no BVH) are in
    # the register-resident subset since round 5.
    cubes = load_scene(os.path.join(SCENES, "cubes.toml"))
    assert cubes.n_triangles == 24 and not cubes.use_bvh
    assert supports_megakernel(cubes, cfg)


def test_mega_matches_regen_statistically(cornell):
    """Same estimator, independent RNG: band radiance means agree within
    MC noise; ray counts agree within a few percent (same RR schedule)."""
    cfg = RenderConfig(width=60, height=45)
    pre = scene_precompute(cornell)
    rows, ns = 5, 32
    sums_m, rays_m = render_band_mega(
        cornell, pre, cfg, jnp.int32(20), rows, jnp.int32(ns),
        jax.random.key(0), interpret=True,
    )
    sums_r, rays_r = render_band_regen(
        cornell, pre, cfg, jnp.int32(20), rows, jnp.int32(ns), jax.random.key(1)
    )
    m = np.asarray(sums_m) / ns
    r = np.asarray(sums_r) / ns
    assert m.shape == (rows, 60, 4, 3)
    # band mean within ~2% (MC noise at this sample count is ~1%)
    assert abs(m.mean() - r.mean()) / r.mean() < 0.05
    # per-channel structure agrees (red/green walls)
    np.testing.assert_allclose(
        m.mean(axis=(0, 1, 2)), r.mean(axis=(0, 1, 2)), rtol=0.08
    )
    # same estimator => same expected ray count per sample
    assert abs(int(rays_m) - int(rays_r)) / int(rays_r) < 0.05


def test_mega_cubes_matches_regen_statistically():
    """Triangle arm of the megakernel (cubes: 24 unrolled prism tris +
    planes + sphere light) agrees with the streaming engine within MC
    noise — same estimator, independent RNG streams."""
    cubes = load_scene(os.path.join(SCENES, "cubes.toml"))
    cfg = RenderConfig(width=60, height=45)
    pre = scene_precompute(cubes)
    rows, ns = 5, 32
    sums_m, rays_m = render_band_mega(
        cubes, pre, cfg, jnp.int32(20), rows, jnp.int32(ns),
        jax.random.key(0), interpret=True,
    )
    sums_r, rays_r = render_band_regen(
        cubes, pre, cfg, jnp.int32(20), rows, jnp.int32(ns), jax.random.key(1)
    )
    m = np.asarray(sums_m) / ns
    r = np.asarray(sums_r) / ns
    assert m.shape == (rows, 60, 4, 3)
    assert abs(m.mean() - r.mean()) / r.mean() < 0.05
    np.testing.assert_allclose(
        m.mean(axis=(0, 1, 2)), r.mean(axis=(0, 1, 2)), rtol=0.08
    )
    assert abs(int(rays_m) - int(rays_r)) / int(rays_r) < 0.05


def test_mega_deterministic(cornell):
    cfg = RenderConfig(width=32, height=24)
    pre = scene_precompute(cornell)
    a, ra = render_band_mega(
        cornell, pre, cfg, jnp.int32(0), 2, jnp.int32(8), jax.random.key(7),
        interpret=True,
    )
    b, rb = render_band_mega(
        cornell, pre, cfg, jnp.int32(0), 2, jnp.int32(8), jax.random.key(7),
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(ra) == int(rb)


def test_mega_engine_falls_back_on_cpu(cornell, monkeypatch):
    """cfg.engine='mega' renders via the regen fallback on the CPU backend
    (the megakernel itself needs real TPU vregs; interpret mode is for
    tests) — the public API keeps working everywhere.  Crucially the
    dispatch must go through the STREAMING path (render_band_streaming owns
    the mega gating); a previous gate routed engine='mega' to the lockstep
    engine, silently never running the megakernel even on TPU."""
    from raytracer_tpu.render import renderer as renderer_mod

    chosen = []
    real = renderer_mod._streaming_jit

    def spy(engine):
        chosen.append(engine)
        return real(engine)

    monkeypatch.setattr(renderer_mod, "_streaming_jit", spy)
    cfg = RenderConfig(width=32, height=24, engine="mega", rays_per_pass=1 << 12)
    img = renderer_mod.Renderer(cornell, cfg).render_image(8)
    assert img.shape == (24, 32, 3)
    assert img.max() > 0
    # Streaming dispatch was used, and the CPU backend fell back to regen.
    assert chosen and set(chosen) == {"regen"}
