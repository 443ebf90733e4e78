"""BRDF eval/sample/pdf tests (reference: src/scene.rs:17-99)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.models.scene import BRDF_DIFFUSE, BRDF_PHONG, BRDF_SPECULAR
from raytracer_tpu.ops import brdf
from raytracer_tpu.models import vecmath as vm


def mat_of(btype, c_d=(0, 0, 0), c_s=(0, 0, 0), k_d=0.0, k_s=0.0, power=0.0, n=1):
    def rep(x, dim):
        return jnp.broadcast_to(jnp.asarray(x, jnp.float32), (n, dim) if dim else (n,))

    return brdf.Mat(
        brdf_type=jnp.full((n,), btype, jnp.int32),
        c_d=rep(c_d, 3),
        c_s=rep(c_s, 3),
        k_d=rep(k_d, 0),
        k_s=rep(k_s, 0),
        power=rep(power, 0),
        emitted=rep((0, 0, 0), 3),
    )


Z = jnp.asarray([[0.0, 0.0, 1.0]])


def test_diffuse_eval_is_kd_over_pi():
    m = mat_of(BRDF_DIFFUSE, c_d=(0.75, 0.5, 0.25), k_d=1.0)
    i = vm.normalize(jnp.asarray([[0.3, 0.1, 0.9]]))
    f = brdf.eval_nonspecular(m, Z, Z, i)
    np.testing.assert_allclose(np.asarray(f[0]), np.asarray([0.75, 0.5, 0.25]) / math.pi, rtol=1e-6)


def test_specular_eval_zero_for_nee():
    m = mat_of(BRDF_SPECULAR, c_s=(0.9, 0.9, 0.9))
    f = brdf.eval_nonspecular(m, Z, Z, Z)
    np.testing.assert_allclose(np.asarray(f[0]), 0.0)


def test_phong_eval_formula():
    # f = kd*cd/pi + ks*cs*(p+2)/(2pi) * max(o.reflect(i,n),0)^p
    m = mat_of(BRDF_PHONG, c_d=(1, 0, 0), c_s=(1, 1, 1), k_d=0.5, k_s=0.4, power=8.0)
    n = Z
    o = vm.normalize(jnp.asarray([[0.0, 0.5, 1.0]]))
    i = vm.normalize(jnp.asarray([[0.0, -0.5, 1.0]]))
    f = np.asarray(brdf.eval_nonspecular(m, n, o, i)[0])
    refl = 2 * float(vm.dot(i, n)[0]) * np.asarray([0, 0, 1.0]) - np.asarray(i[0])
    cos_r = max(float(np.dot(np.asarray(o[0]), refl)), 0.0)
    expect = 0.5 * np.asarray([1, 0, 0]) / math.pi + 0.4 * np.ones(3) * 10 / (
        2 * math.pi
    ) * cos_r**8
    np.testing.assert_allclose(f, expect, rtol=1e-5)


def test_specular_sample_is_mirror():
    m = mat_of(BRDF_SPECULAR, c_s=(1, 1, 1))
    o = vm.normalize(jnp.asarray([[1.0, 0.0, 1.0]]))
    u = jnp.zeros(1)
    i, pdf = brdf.sample(m, Z, o, u, u, u)
    np.testing.assert_allclose(np.asarray(i[0]), np.asarray(vm.reflect(o, Z)[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pdf), 1.0)


def test_diffuse_sample_cosine_distribution():
    n_lanes = 20000
    m = mat_of(BRDF_DIFFUSE, c_d=(1, 1, 1), k_d=1.0, n=n_lanes)
    nrm = jnp.broadcast_to(Z, (n_lanes, 3))
    key = jax.random.key(0)
    us = jax.random.uniform(key, (3, n_lanes))
    i, pdf = brdf.sample(m, nrm, nrm, us[0], us[1], us[2])
    cos = np.asarray(vm.dot(nrm, i))
    assert (cos > -1e-6).all()  # upper hemisphere
    np.testing.assert_allclose(np.asarray(pdf), np.maximum(cos, 0) / math.pi, rtol=1e-4)
    # cosine-weighted: E[cos] = 2/3
    assert abs(cos.mean() - 2 / 3) < 0.01
    # unit vectors
    np.testing.assert_allclose(np.asarray(vm.length(i)), 1.0, atol=1e-5)


def test_diffuse_sample_rotated_frame():
    # sampling around a tilted normal stays in its hemisphere
    n_lanes = 2000
    m = mat_of(BRDF_DIFFUSE, c_d=(1, 1, 1), k_d=1.0, n=n_lanes)
    nrm = jnp.broadcast_to(vm.normalize(jnp.asarray([[1.0, 1.0, 0.0]])), (n_lanes, 3))
    us = jax.random.uniform(jax.random.key(1), (3, n_lanes))
    i, _ = brdf.sample(m, nrm, nrm, us[0], us[1], us[2])
    assert (np.asarray(vm.dot(nrm, i)) > -1e-5).all()


def test_phong_sample_three_way_split_and_dead():
    n_lanes = 30000
    m = mat_of(BRDF_PHONG, c_d=(1, 0, 0), c_s=(1, 1, 1), k_d=0.5, k_s=0.3, power=20.0, n=n_lanes)
    nrm = jnp.broadcast_to(Z, (n_lanes, 3))
    o = jnp.broadcast_to(vm.normalize(jnp.asarray([[0.3, 0.0, 1.0]])), (n_lanes, 3))
    us = jax.random.uniform(jax.random.key(2), (3, n_lanes))
    i, pdf = brdf.sample(m, nrm, o, us[0], us[1], us[2])
    dead = np.asarray(vm.length(i)) < 1e-6
    # dead fraction ~ 1 - kd - ks = 0.2, with pdf 1 (src/scene.rs:92-95)
    assert abs(dead.mean() - 0.2) < 0.02
    np.testing.assert_allclose(np.asarray(pdf)[dead], 1.0)
    # specular-pick lanes concentrate near the mirror direction
    mirror = np.asarray(vm.reflect(o, nrm))[0]
    pick_s = (np.asarray(us[0]) >= 0.5) & (np.asarray(us[0]) < 0.8)
    cos_m = np.asarray(vm.dot(i, jnp.asarray(mirror)[None, :]))[pick_s]
    assert np.median(cos_m) > 0.9  # power-20 lobe is tight


def test_pdf_matches_sampling_density_diffuse():
    m = mat_of(BRDF_DIFFUSE, c_d=(1, 1, 1), k_d=1.0)
    i = vm.normalize(jnp.asarray([[0.2, 0.3, 0.93]]))
    p = brdf.pdf(m, Z, Z, i)
    np.testing.assert_allclose(float(p[0]), float(vm.dot(Z, i)[0]) / math.pi, rtol=1e-5)


def test_pdf_specular_is_zero():
    m = mat_of(BRDF_SPECULAR, c_s=(1, 1, 1))
    assert float(brdf.pdf(m, Z, Z, Z)[0]) == 0.0


def test_phong_pdf_integrates_to_kd_plus_ks():
    # Monte-Carlo integral of pdf over the sphere should be ~ kd + ks
    # (the dead branch carries the remaining mass as a point mass at 0).
    rng = np.random.default_rng(0)
    n_dirs = 200000
    v = rng.normal(size=(n_dirs, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    m = mat_of(BRDF_PHONG, c_d=(1, 0, 0), c_s=(1, 1, 1), k_d=0.5, k_s=0.3, power=6.0, n=n_dirs)
    nrm = jnp.broadcast_to(Z, (n_dirs, 3))
    o = jnp.broadcast_to(vm.normalize(jnp.asarray([[0.4, 0.0, 1.0]])), (n_dirs, 3))
    p = np.asarray(brdf.pdf(m, nrm, o, jnp.asarray(v, jnp.float32)))
    integral = p.mean() * 4 * math.pi
    assert abs(integral - 0.8) < 0.02
