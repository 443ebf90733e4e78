"""Unit tests for batched vec3 math (reference: src/geometry.rs:21-369)."""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.models import vecmath as vm


def V(*rows):
    return jnp.asarray(rows, jnp.float32)


def test_dot_cross():
    a = V([1, 2, 3], [0, 1, 0])
    b = V([4, 5, 6], [1, 0, 0])
    np.testing.assert_allclose(vm.dot(a, b), [32.0, 0.0])
    np.testing.assert_allclose(vm.cross(a, b)[0], [-3, 6, -3])
    np.testing.assert_allclose(vm.cross(a, b)[1], [0, 0, -1])


def test_normalize_matches_reference_norm():
    a = V([3, 4, 0])
    np.testing.assert_allclose(vm.normalize(a)[0], [0.6, 0.8, 0.0], rtol=1e-6)


def test_reflect_is_flip_across():
    # flip_across(v, axis) = 2 (v.axis) axis - v (src/geometry.rs:99-101)
    v = V([1, 1, 0])
    n = V([0, 1, 0])
    np.testing.assert_allclose(vm.reflect(v, n)[0], [-1, 1, 0], atol=1e-6)


def test_face_forward_two_sided():
    n = V([0, 0, 1], [0, 0, 1])
    toward = V([0, 0, 1], [0, 0, -1])
    out = vm.face_forward(n, toward)
    np.testing.assert_allclose(out[0], [0, 0, 1])
    np.testing.assert_allclose(out[1], [0, 0, -1])


@pytest.mark.parametrize("rot,axis_idx", [(vm.rotate_x, 0), (vm.rotate_y, 1), (vm.rotate_z, 2)])
def test_rotations_preserve_axis_and_norm(rot, axis_idx):
    axis = np.zeros(3, np.float32)
    axis[axis_idx] = 1.0
    a = V([1, 2, 3])
    out = rot(a, 0.7)
    # the rotation axis component is unchanged
    np.testing.assert_allclose(out[0, axis_idx], a[0, axis_idx], rtol=1e-6)
    np.testing.assert_allclose(vm.length(out), vm.length(a), rtol=1e-6)


def test_rotate_z_matches_reference_formula():
    # x' = x cos - y sin; y' = x sin + y cos (src/geometry.rs:127-133)
    a = V([1, 0, 5])
    out = vm.rotate_z(a, np.pi / 2)
    np.testing.assert_allclose(out[0], [0, 1, 5], atol=1e-6)


def test_local_frame_orthonormal_and_reference_helper_choice():
    for n in ([0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.6, 0.48, 0.64]):
        nn = V(n)
        u, v, w = vm.local_frame(nn)
        for a, b in [(u, v), (v, w), (u, w)]:
            assert abs(float(vm.dot(a, b)[0])) < 1e-6
        for a in (u, v, w):
            np.testing.assert_allclose(float(vm.length(a)[0]), 1.0, rtol=1e-5)
        # right-handedness: u x v == w
        np.testing.assert_allclose(np.asarray(vm.cross(u, v)[0]), np.asarray(w[0]), atol=1e-6)


def test_from_local_roundtrip():
    n = vm.normalize(V([0.3, -0.5, 0.8]))
    u, v, w = vm.local_frame(n)
    d_local = V([0.1, 0.2, 0.97])
    d = vm.from_local(u, v, w, d_local)
    # z component in the frame is d.n
    np.testing.assert_allclose(float(vm.dot(d, n)[0]), 0.97, rtol=1e-5)


def test_from_spherical():
    out = vm.from_spherical(jnp.asarray([0.0, np.pi / 2]), jnp.asarray([0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(out[0]), [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), [1, 0, 0], atol=1e-6)
    # always unit length
    a = vm.from_spherical(jnp.asarray([0.7]), jnp.asarray([2.1]))
    np.testing.assert_allclose(float(vm.length(a)[0]), 1.0, rtol=1e-6)
