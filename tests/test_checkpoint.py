"""Checkpoint / resume tests (a capability the reference lacks entirely)."""

import os

import numpy as np
import pytest

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models.loader import load_scene
from raytracer_tpu.render.checkpoint import RenderCheckpoint, render_with_checkpoint
from raytracer_tpu.render.renderer import Renderer

SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")


@pytest.fixture(scope="module")
def renderer():
    scene = load_scene(os.path.join(SCENES, "cornell_box.toml"))
    return Renderer(scene, RenderConfig(width=48, height=36, rays_per_pass=1 << 13))


def test_resume_accumulates_to_full_quality(renderer):
    # render 32 spp in one go vs 16 then resumed +16; both must agree
    # statistically and count the same samples.
    full = render_with_checkpoint(renderer, "cornell_box", 32)
    part = render_with_checkpoint(renderer, "cornell_box", 16)
    assert part.num_samples == 4
    resumed = render_with_checkpoint(renderer, "cornell_box", 32, checkpoint=part)
    assert resumed.num_samples == 8 == full.num_samples
    a = full.image().astype(np.float64)
    b = resumed.image().astype(np.float64)
    assert abs(a.mean() - b.mean()) < 3.0


def test_save_load_roundtrip(tmp_path, renderer):
    ck = render_with_checkpoint(renderer, "cornell_box", 8)
    p = str(tmp_path / "ck.npz")
    ck.save(p)
    back = RenderCheckpoint.load(p, "cornell_box", renderer.cfg)
    np.testing.assert_array_equal(back.sums, ck.sums)
    assert back.num_samples == ck.num_samples
    np.testing.assert_array_equal(back.image(), ck.image())


def test_load_rejects_config_mismatch(tmp_path, renderer):
    ck = render_with_checkpoint(renderer, "cornell_box", 8)
    p = str(tmp_path / "ck.npz")
    ck.save(p)
    other = RenderConfig(width=48, height=36, use_mis=True, rays_per_pass=1 << 13)
    with pytest.raises(ValueError):
        RenderCheckpoint.load(p, "cornell_box", other)
    with pytest.raises(ValueError):
        RenderCheckpoint.load(p, "cubes", renderer.cfg)


def test_cancel_preserves_progress(renderer):
    calls = {"n": 0}

    def cancelled():
        calls["n"] += 1
        return calls["n"] > 4  # aborts mid-render, after ~2 chunks

    # 256 spp = 64 samples = 4 chunks of 16 at this plan
    ck = render_with_checkpoint(renderer, "cornell_box", 256, cancelled=cancelled)
    assert 0 < ck.num_samples < 64
    # partial work is preserved and resumable to a smaller target
    done = render_with_checkpoint(renderer, "cornell_box", 256, checkpoint=ck)
    assert done.num_samples == 64


def test_mesh_scene_checkpoint_roundtrip(tmp_path):
    """BVH scene: save/load + resume works and rejects knob-independent
    batching changes correctly (fingerprint pops *rays_per_pass)."""
    from tests.test_server_mesh import chair_scene

    scene = chair_scene()
    cfg = RenderConfig(width=48, height=36, rays_per_pass=1 << 11,
                       mesh_rays_per_pass=1 << 11)
    r = Renderer(scene, cfg)
    part = render_with_checkpoint(r, "chair_test", 8)
    path = tmp_path / "chair.npz"
    part.save(path)
    # Resuming under a DIFFERENT mesh band budget is allowed (batching
    # doesn't change the estimate) and accumulates.
    cfg2 = RenderConfig(width=48, height=36, rays_per_pass=1 << 11,
                        mesh_rays_per_pass=1 << 12)
    loaded = RenderCheckpoint.load(path, "chair_test", cfg2)
    r2 = Renderer(scene, cfg2)
    resumed = render_with_checkpoint(r2, "chair_test", 16, checkpoint=loaded)
    assert resumed.num_samples == 4
    img = resumed.image()
    assert img.max() == 255
