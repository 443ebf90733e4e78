"""End-to-end coverage for material/light paths the shipped scenes miss:
Phong materials, mesh lights, and the config-from-TOML layer."""

import os

import numpy as np
import pytest

from raytracer_tpu.config import RenderConfig, config_from_toml
from raytracer_tpu.models.loader import load_scene_dict
from raytracer_tpu.models.scene import LIGHT_MESH
from raytracer_tpu.render.renderer import Renderer


def _box_scene(extra_objects, emitter):
    """A small closed box + caller-chosen emitter and extra objects."""
    walls = []
    for pos, n in [
        ([-5, 0, 0], [1, 0, 0]),
        ([5, 0, 0], [-1, 0, 0]),
        ([0, -5, 0], [0, 1, 0]),
        ([0, 5, 0], [0, -1, 0]),
        ([0, 0, -5], [0, 0, 1]),
        ([0, 0, 5], [0, 0, -1]),
    ]:
        walls.append(
            {
                "brdf": {"type": "diffuse", "kd": [0.7, 0.7, 0.7]},
                "geometry": {"type": "plane", "pos": pos, "n": n},
            }
        )
    return {
        "camera": {"pos": [0, 0, 4.5], "dir": [0, 0, -1]},
        "objects": walls + extra_objects + [emitter],
    }


SPHERE_LIGHT = {
    "emitted": [20, 20, 20],
    "brdf": {"type": "diffuse", "kd": [0, 0, 0]},
    "geometry": {"type": "sphere", "pos": [0, 4, 0], "r": 0.5},
}

CUBE_LIGHT = {
    "emitted": [20, 20, 20],
    "brdf": {"type": "diffuse", "kd": [0, 0, 0]},
    "geometry": {"type": "cube", "pos": [-0.5, 3.5, -0.5], "size": 1.0},
}

PHONG_SPHERE = {
    "brdf": {
        "type": "phong",
        "kd": 0.5,
        "ks": 0.4,
        "color_d": [0.8, 0.2, 0.2],
        "color_s": [1, 1, 1],
        "power": 20,
    },
    "geometry": {"type": "sphere", "pos": [0, -3, 0], "r": 2},
}


def _render(doc, spp=16, **cfg_kwargs):
    scene = load_scene_dict(doc, name="t")
    cfg = RenderConfig(width=48, height=36, rays_per_pass=1 << 13, **cfg_kwargs)
    return Renderer(scene, cfg).render_image(spp).astype(np.float64)


def test_phong_scene_renders_sanely():
    img = _render(_box_scene([PHONG_SPHERE], SPHERE_LIGHT))
    assert img.mean() > 5.0  # lit
    # the phong sphere occupies the lower-center; its red tint shows up
    lower = img[22:, 16:32]
    assert lower[..., 0].mean() > lower[..., 2].mean()


def test_phong_legacy_frame_flag_runs():
    # fix_phong_frame=False reproduces the reference's local-frame bug path;
    # it must still render without NaNs.
    img = _render(_box_scene([PHONG_SPHERE], SPHERE_LIGHT), fix_phong_frame=False)
    assert np.isfinite(img).all()


def test_mesh_light_scene():
    scene = load_scene_dict(_box_scene([], CUBE_LIGHT), name="ml")
    assert scene.light_type == LIGHT_MESH
    # cube surface area = 6 * 1 * 1
    np.testing.assert_allclose(float(scene.light_area), 6.0, rtol=1e-5)
    img = _render(_box_scene([], CUBE_LIGHT))
    assert img.mean() > 5.0
    assert np.isfinite(img).all()


def test_mesh_light_sampling_distribution():
    import jax

    from raytracer_tpu.render.integrator import sample_light

    scene = load_scene_dict(_box_scene([], CUBE_LIGHT), name="ml2")
    us = jax.random.uniform(jax.random.key(0), (3, 4096))
    y, ny, pdf = sample_light(scene, us[0], us[1], us[2])
    y = np.asarray(y)
    # every sample lies on the cube's surface
    lo, hi = np.asarray([-0.5, 3.5, -0.5]), np.asarray([0.5, 4.5, 0.5])
    inside = (y >= lo - 1e-4).all(axis=1) & (y <= hi + 1e-4).all(axis=1)
    on_face = (
        (np.abs(y - lo[None]) < 1e-4) | (np.abs(y - hi[None]) < 1e-4)
    ).any(axis=1)
    assert inside.all() and on_face.all()
    np.testing.assert_allclose(np.asarray(pdf), 1.0 / 6.0, rtol=1e-5)
    # normals are unit axis vectors
    np.testing.assert_allclose(np.abs(np.asarray(ny)).max(axis=1), 1.0, atol=1e-5)


def test_mis_matches_non_mis_on_phong_scene():
    doc = _box_scene([PHONG_SPHERE], SPHERE_LIGHT)
    a = _render(doc, spp=64, use_mis=False)
    b = _render(doc, spp=64, use_mis=True)
    assert abs(a.mean() - b.mean()) < 3.5


def test_config_from_toml(tmp_path):
    p = tmp_path / "c.toml"
    p.write_text(
        'width = 100\nheight = 50\nuse_mis = true\nmax_bounces = 3\n'
        'survival_probability = 0.8\nsamples_per_pixel = 4\n'
    )
    cfg = config_from_toml(str(p))
    assert cfg.width == 100 and cfg.height == 50
    assert cfg.use_mis and cfg.rr_start_depth == 3
    assert cfg.rr_survival == pytest.approx(0.8)


def test_config_from_toml_rejects_unknown(tmp_path):
    p = tmp_path / "c.toml"
    p.write_text("nonsense = 1\n")
    with pytest.raises(ValueError):
        config_from_toml(str(p))
