"""Camera ray generation tests (reference: src/server.rs:320-364)."""

import math

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.models.camera import camera_basis, camera_rays, tent_jitter
from raytracer_tpu.models.loader import load_scene_dict


def _scene():
    return load_scene_dict(
        {
            "camera": {"pos": [50, 52, 295.6], "dir": [0, -0.042612, -1]},
            "objects": [
                {
                    "emitted": [1, 1, 1],
                    "brdf": {"type": "diffuse", "kd": [0, 0, 0]},
                    "geometry": {"type": "sphere", "pos": [50, 70, 100], "r": 4},
                }
            ],
        },
        name="cam",
    )


def test_tent_jitter_range_and_shape():
    u = jnp.linspace(0.0, 0.999, 1001)
    d = np.asarray(tent_jitter(u))
    assert d.min() >= -1.0 and d.max() <= 1.0
    # u=0 -> -1; u=0.5 -> 0; u->1 -> +1 (src/server.rs:339-351)
    assert abs(d[0] + 1.0) < 1e-6
    assert abs(d[500]) < 2e-3
    assert d[-1] > 0.95
    # tent density: mean 0 by symmetry
    assert abs(d.mean()) < 1e-3


def test_camera_basis_matches_reference_constants():
    s = _scene()
    cx, cy = camera_basis(s, 600, 450, 0.5135)
    np.testing.assert_allclose(np.asarray(cx), [0.5135 * 600 / 450, 0, 0], rtol=1e-6)
    # cy = norm(cx x dir) * .5135 : unit-normalized then scaled
    assert abs(float(jnp.linalg.norm(cy)) - 0.5135) < 1e-6
    # cy is orthogonal to cx and to dir
    assert abs(float(cx @ cy)) < 1e-6
    assert abs(float(cy @ s.cam_dir)) < 1e-4


def test_center_pixel_ray_points_along_camera_dir():
    s = _scene()
    # center pixel, centered subpixel, jitter u=0.5 -> dx=0
    px = jnp.asarray([299.5], jnp.float32)
    py = jnp.asarray([224.5], jnp.float32)
    z = jnp.zeros(1)
    h = z + 0.5
    ro, rd = camera_rays(s, 600, 450, 0.5135, px, py, z, z, h, h)
    np.testing.assert_allclose(np.asarray(ro[0]), [50, 52, 295.6], rtol=1e-6)
    d_expect = np.asarray([0, -0.042612, -1.0])
    d_expect = d_expect / np.linalg.norm(d_expect)
    # fx = ((0+0.5+0)/2 + 299.5)/600 - 0.5 = -0.000417 -> tiny x offset
    assert abs(float(rd[0, 0])) < 1e-3
    np.testing.assert_allclose(np.asarray(rd[0]), d_expect, atol=1.5e-3)
    assert abs(float(jnp.linalg.norm(rd[0])) - 1.0) < 1e-6


def test_corner_rays_spread_by_fov():
    s = _scene()
    z = jnp.zeros(2)
    h = z + 0.5
    px = jnp.asarray([0.0, 599.0], jnp.float32)
    py = jnp.asarray([224.5, 224.5], jnp.float32)
    _, rd = camera_rays(s, 600, 450, 0.5135, px, py, z, z, h, h)
    # horizontal fan: left ray has -x, right ray +x, symmetric
    assert float(rd[0, 0]) < -0.3 and float(rd[1, 0]) > 0.3
    np.testing.assert_allclose(-np.asarray(rd[0, 0]), np.asarray(rd[1, 0]), atol=1e-3)
    # total horizontal angular span ~ 2*atan(0.5135*(600/450)/2/|dir|)
    full = 2 * math.atan(0.6847 / 2 / 1.0009)
    got = math.acos(float((rd[0] * rd[1]).sum()))
    assert abs(got - full) < 0.01
