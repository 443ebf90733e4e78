"""Unit tests for batched intersection ops vs hand-computed cases.

Reference semantics: sphere src/geometry.rs:514-550, plane :551-568,
triangle (Moller-Trumbore) :637-670.
"""

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.config import Epsilons
from raytracer_tpu.models.loader import load_scene_dict
from raytracer_tpu.ops import intersect as ix

EPS = Epsilons()
INF = 1e30


def _spheres(pos, r):
    pos = jnp.asarray(pos, jnp.float32)
    r = jnp.asarray(r, jnp.float32)
    valid = jnp.ones(r.shape[0], bool)
    return pos, r, valid


def test_sphere_near_root():
    pos, r, valid = _spheres([[0, 0, -10]], [2])
    ro = jnp.asarray([[0.0, 0.0, 0.0]])
    rd = jnp.asarray([[0.0, 0.0, -1.0]])
    t = ix.intersect_spheres(ro, rd, pos, r, valid, EPS)
    np.testing.assert_allclose(t[0, 0], 8.0, rtol=1e-5)


def test_sphere_far_root_from_inside():
    # origin inside the sphere: near root negative, far root returned
    pos, r, valid = _spheres([[0, 0, 0]], [2])
    ro = jnp.asarray([[0.0, 0.0, 0.0]])
    rd = jnp.asarray([[0.0, 0.0, -1.0]])
    t = ix.intersect_spheres(ro, rd, pos, r, valid, EPS)
    np.testing.assert_allclose(t[0, 0], 2.0, rtol=1e-5)


def test_sphere_miss_and_invalid():
    pos = jnp.asarray([[0, 5, -10], [0, 0, -10]], jnp.float32)
    r = jnp.asarray([1.0, 1.0], jnp.float32)
    valid = jnp.asarray([True, False])
    ro = jnp.zeros((1, 3))
    rd = jnp.asarray([[0.0, 0.0, -1.0]])
    t = ix.intersect_spheres(ro, rd, pos, r, valid, EPS)
    assert float(t[0, 0]) > INF / 10  # geometric miss
    assert float(t[1, 0]) > INF / 10  # padded slot masked out


def test_sphere_behind_ray_misses():
    pos, r, valid = _spheres([[0, 0, 10]], [2])
    ro = jnp.zeros((1, 3))
    rd = jnp.asarray([[0.0, 0.0, -1.0]])
    t = ix.intersect_spheres(ro, rd, pos, r, valid, EPS)
    assert float(t[0, 0]) > INF / 10


def test_plane_hit_t_and_parallel_cutoff():
    pos = jnp.asarray([[0, 0, -5], [0, 0, -5]], jnp.float32)
    n = jnp.asarray([[0, 0, 1], [0, 1, 0]], jnp.float32)
    valid = jnp.ones(2, bool)
    ro = jnp.zeros((1, 3))
    rd = jnp.asarray([[0.0, 0.0, -1.0]])
    t = ix.intersect_planes(ro, rd, pos, n, valid, EPS)
    np.testing.assert_allclose(t[0, 0], 5.0, rtol=1e-6)
    assert float(t[1, 0]) > INF / 10  # parallel -> miss (|d.n| < 1e-4)


def test_plane_accepts_t_zero():
    # reference accepts t >= 0 (src/geometry.rs:557)
    pos = jnp.asarray([[0, 0, 0]], jnp.float32)
    n = jnp.asarray([[0, 0, 1]], jnp.float32)
    ro = jnp.zeros((1, 3))
    rd = jnp.asarray([[0.0, 0.70710678, -0.70710678]])
    t = ix.intersect_planes(ro, rd, pos, n, jnp.ones(1, bool), EPS)
    np.testing.assert_allclose(t[0, 0], 0.0, atol=1e-6)


def _tri(a, b, c):
    pre = ix.tri_precompute(
        jnp.asarray([a], jnp.float32),
        jnp.asarray([b], jnp.float32),
        jnp.asarray([c], jnp.float32),
    )
    return pre


def test_triangle_hit_inside():
    pre = _tri([-1, -1, -5], [1, -1, -5], [0, 1, -5])
    ro = jnp.zeros((1, 3))
    rd = jnp.asarray([[0.0, 0.0, -1.0]])
    t = ix.intersect_triangles(ro, rd, pre, jnp.ones(1, bool), EPS)
    np.testing.assert_allclose(t[0, 0], 5.0, rtol=1e-5)


def test_triangle_miss_outside_barycentric():
    pre = _tri([-1, -1, -5], [1, -1, -5], [0, 1, -5])
    ro = jnp.asarray([[2.0, 0.0, 0.0]])
    rd = jnp.asarray([[0.0, 0.0, -1.0]])
    t = ix.intersect_triangles(ro, rd, pre, jnp.ones(1, bool), EPS)
    assert float(t[0, 0]) > INF / 10


def test_triangle_two_sided():
    pre = _tri([-1, -1, -5], [1, -1, -5], [0, 1, -5])
    ro = jnp.asarray([[0.0, 0.0, -10.0]])
    rd = jnp.asarray([[0.0, 0.0, 1.0]])  # hit from behind
    t = ix.intersect_triangles(ro, rd, pre, jnp.ones(1, bool), EPS)
    np.testing.assert_allclose(t[0, 0], 5.0, rtol=1e-5)


def _toy_scene():
    return load_scene_dict(
        {
            "camera": {"pos": [0, 0, 0], "dir": [0, 0, -1]},
            "objects": [
                {
                    "brdf": {"type": "diffuse", "kd": [0.5, 0.5, 0.5]},
                    "geometry": {"type": "sphere", "pos": [0, 0, -10], "r": 2},
                },
                {
                    "brdf": {"type": "diffuse", "kd": [0.5, 0.5, 0.5]},
                    "geometry": {"type": "plane", "pos": [0, 0, -20], "n": [0, 0, 1]},
                },
                {
                    "emitted": [10, 10, 10],
                    "brdf": {"type": "diffuse", "kd": [0, 0, 0]},
                    "geometry": {"type": "sphere", "pos": [0, 5, -10], "r": 1},
                },
            ],
        },
        name="toy",
    )


def test_trace_nearest_and_attributes():
    s = _toy_scene()
    pre = ix.scene_precompute(s)
    ro = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [3.0, 0.0, 0.0]], jnp.float32)
    rd = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 5 / 11.18034, -10 / 11.18034], [0.0, 0.0, -1.0]], jnp.float32)
    hit = ix.trace(s, pre, ro, rd, EPS)
    # ray 0: sphere at t=8 beats plane at t=20
    assert bool(hit.valid[0]) and int(hit.obj[0]) == 0
    np.testing.assert_allclose(hit.t[0], 8.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(hit.n[0]), [0, 0, 1], atol=1e-5)
    # ray 1: pointed at the light sphere
    assert int(hit.obj[1]) == 2
    # ray 2: misses both spheres, hits the plane; normal faces the ray
    assert int(hit.obj[2]) == 1
    np.testing.assert_allclose(hit.t[2], 20.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.n[2]), [0, 0, 1], atol=1e-6)
    # plane hit position is offset along the normal (reference +1e-5 n,
    # f32-retuned to eps.hit_offset)
    assert float(hit.pos[2, 2]) > -20.0


def test_trace_sphere_normal_flips_from_inside():
    s = _toy_scene()
    pre = ix.scene_precompute(s)
    ro = jnp.asarray([[0.0, 0.0, -10.0]], jnp.float32)  # center of sphere 0
    rd = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    hit = ix.trace(s, pre, ro, rd, EPS)
    assert int(hit.obj[0]) == 0
    # hit at z=-12, outward normal (0,0,-1), flipped toward -rd=(0,0,1)? no:
    # n.(-rd) = (0,0,-1).(0,0,1) = -1 < 0 -> flipped to (0,0,1)
    np.testing.assert_allclose(np.asarray(hit.n[0]), [0, 0, 1], atol=1e-5)
