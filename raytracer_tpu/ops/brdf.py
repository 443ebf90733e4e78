"""BRDF evaluation, importance sampling and pdf — batched over wavefront lanes.

Reference: the BRDF enum with ``eval``/``sample_incoming``
(/root/reference/src/scene.rs:17-99).  Instead of an enum dispatch, every
lane gathers its object's material record and all three models are computed
with masks; ``jnp.where`` picks per-lane.  Conventions follow the reference:

- ``n``: shading normal (already facing the incoming ray)
- ``o``: unit direction toward the previous vertex ("outgoing")
- ``i``: unit direction of the next/light vertex ("incoming")

Divergences from the reference (both documented in SURVEY §5 as bugs):

- Phong ``sample_incoming`` returns directions in the LOCAL tangent frame
  without rotating into world space (src/scene.rs:74-95).  With
  ``fix_phong_frame=True`` (default) the cosine lobe is rotated around n
  and the specular lobe around the mirror direction, which is the standard
  physically-meaningful construction.  ``False`` reproduces the raw local
  frame exactly as the reference computes it.
- ``brdf_pdf`` (needed for MIS) does not exist in the reference — its dead
  MIS branch calls ``sample_incoming`` to get a pdf for a *different*
  direction (src/scene.rs:195).  Here it is the true density of
  ``brdf_sample`` at a given direction.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from raytracer_tpu.models import vecmath as vm
from raytracer_tpu.models.scene import BRDF_DIFFUSE, BRDF_PHONG, BRDF_SPECULAR

INV_PI = jnp.float32(1.0 / math.pi)
TWO_PI = jnp.float32(2.0 * math.pi)


class Mat(NamedTuple):
    """Per-lane gathered material record."""

    brdf_type: Array  # [N] i32
    c_d: Array  # [N,3]
    c_s: Array  # [N,3]
    k_d: Array  # [N]
    k_s: Array  # [N]
    power: Array  # [N] f32
    emitted: Array  # [N,3]


def take_obj_rows(table: Array, obj: Array) -> Array:
    """``table[obj]`` for a small per-object table ([O] or [O,3], O static).

    An unrolled select-sum: TPU row gathers cost ~1.3 ns/row regardless of
    width (~0.7 ms per [540k,3] gather, profiler round 3) while O fused
    vector selects are ~free.  Falls back to a real gather for big tables.
    """
    n_obj = table.shape[0]
    if n_obj > 32:
        return table[obj]
    out = jnp.broadcast_to(table[0], obj.shape + table.shape[1:])
    for o in range(1, n_obj):
        m = obj == o
        out = jnp.where(m[:, None] if table.ndim == 2 else m, table[o], out)
    return out


def gather_mat(scene, obj: Array) -> Mat:
    return Mat(
        brdf_type=take_obj_rows(scene.brdf_type, obj),
        c_d=take_obj_rows(scene.c_d, obj),
        c_s=take_obj_rows(scene.c_s, obj),
        k_d=take_obj_rows(scene.k_d, obj),
        k_s=take_obj_rows(scene.k_s, obj),
        power=take_obj_rows(scene.phong_power, obj),
        emitted=take_obj_rows(scene.obj_emitted, obj),
    )


def eval_nonspecular(mat: Mat, n: Array, o: Array, i: Array, has_phong: bool = True) -> Array:
    """BRDF::eval for diffuse/Phong lanes -> [N,3].

    Specular lanes return 0 (delta BRDF — never evaluated by NEE; the
    integrator folds the analytic mirror weight into the continuation).
    Reference arms: diffuse kd/pi (src/scene.rs:33), Phong
    kd*color_d/pi + ks*color_s*(p+2)/(2pi)*max(o.reflect(i,n),0)^p (:41-52).
    ``has_phong=False`` (static scene metadata) compiles the Phong lobe —
    a per-lane transcendental pow — away entirely.
    """
    diffuse = mat.c_d * (mat.k_d * INV_PI)[:, None]
    f = diffuse
    if has_phong:
        refl = vm.reflect(i, n)
        cos_r = jnp.maximum(vm.dot(o, refl), 0.0)
        # power==0 lanes (pure diffuse) must not contribute via cos_r**0 == 1.
        lobe = jnp.where(mat.power > 0.0, cos_r ** mat.power, 0.0)
        phong_spec = mat.c_s * (mat.k_s * (mat.power + 2.0) / TWO_PI * lobe)[:, None]
        f = diffuse + jnp.where((mat.brdf_type == BRDF_PHONG)[:, None], phong_spec, 0.0)
    return jnp.where((mat.brdf_type == BRDF_SPECULAR)[:, None], 0.0, f)


def _cosine_local(u1: Array, u2: Array) -> Array:
    """Cosine-weighted hemisphere sample in the local frame.

    Matches the reference's diffuse arm (src/scene.rs:58-66):
    z = sqrt(u1), r = sqrt(1-z^2), phi = 2 pi u2.
    """
    z = jnp.sqrt(u1)
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = TWO_PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def _phong_cosine_local(u1: Array, u2: Array) -> Array:
    """Reference's Phong diffuse arm (src/scene.rs:74-81):
    x = sqrt(1-u1) cos(2 pi u2), y = sqrt(1-u1) sin(2 pi u2), z = sqrt(u1)."""
    r = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    phi = TWO_PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), jnp.sqrt(u1)], axis=-1)


def _phong_lobe_local(u1: Array, u2: Array, power: Array) -> tuple[Array, Array]:
    """Reference's Phong specular arm (src/scene.rs:82-91): power-cosine lobe.

    Returns (local dir, pdf = (p+1)/(2 pi) z^p).
    """
    p = power
    z = u1 ** (1.0 / (p + 1.0))
    r = jnp.sqrt(jnp.maximum(1.0 - u1 ** (2.0 / (p + 1.0)), 0.0))
    phi = TWO_PI * u2
    d = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    pdf = (p + 1.0) / TWO_PI * z**p
    return d, pdf


def sample(
    mat: Mat,
    n: Array,
    o: Array,
    u1: Array,
    u2: Array,
    u3: Array,
    fix_phong_frame: bool = True,
    has_phong: bool = True,
) -> tuple[Array, Array]:
    """BRDF::sample_incoming for a wavefront -> (i[N,3], pdf[N]).

    u1/u2/u3 are uniform [0,1) lanes; diffuse uses (u1,u2); Phong uses u1
    for the lobe pick and (u2,u3) for the sample; specular uses none.
    Dead Phong samples (u1 >= kd+ks) return i=0, pdf=1 (src/scene.rs:92-95)
    so the integrator's weight f*cos = 0 kills the lane.
    ``has_phong=False`` compiles both Phong lobes away.
    """
    un, vn, wn = vm.local_frame(n)

    # Diffuse
    d_local = _cosine_local(u1, u2)
    i_diff = vm.from_local(un, vn, wn, d_local)
    pdf_diff = jnp.maximum(vm.dot(n, i_diff), 0.0) * INV_PI

    # Specular mirror
    i_spec = vm.reflect(o, n)

    is_spec = mat.brdf_type == BRDF_SPECULAR
    if not has_phong:
        i = jnp.where(is_spec[:, None], i_spec, i_diff)
        pdf = jnp.where(is_spec, 1.0, pdf_diff)
        return i, pdf

    # Phong: three-way split on u1
    pick_d = u1 < mat.k_d
    pick_s = (~pick_d) & (u1 < mat.k_d + mat.k_s)
    ph_d_local = _phong_cosine_local(u2, u3)
    ph_s_local, ph_s_pdf = _phong_lobe_local(u2, u3, mat.power)
    if fix_phong_frame:
        ph_d = vm.from_local(un, vn, wn, ph_d_local)
        ur, vr, wr = vm.local_frame(vm.normalize(i_spec, eps=1e-20))
        ph_s = vm.from_local(ur, vr, wr, ph_s_local)
    else:
        ph_d = ph_d_local
        ph_s = ph_s_local
    i_phong = jnp.where(pick_d[:, None], ph_d, jnp.where(pick_s[:, None], ph_s, 0.0))
    pdf_phong = jnp.where(
        pick_d,
        jnp.maximum(vm.dot(n, ph_d), 0.0) * INV_PI,
        jnp.where(pick_s, ph_s_pdf, 1.0),
    )

    is_phong = mat.brdf_type == BRDF_PHONG
    i = jnp.where(is_spec[:, None], i_spec, jnp.where(is_phong[:, None], i_phong, i_diff))
    pdf = jnp.where(is_spec, 1.0, jnp.where(is_phong, pdf_phong, pdf_diff))
    return i, pdf


def eval_nonspecular3(
    mat: Mat, n: vm.V3, o: vm.V3, i: vm.V3, has_phong: bool = True
) -> Array:
    """Component-tuple ``eval_nonspecular`` -> [N,3].

    Direction inputs are SoA triples so the Phong lobe's dot products run
    as [N] lane-dense FMAs instead of [N,3]->[N] reduce fusions (3/128 lane
    occupancy — the measured cost of the shading core's reductions,
    BENCHMARKS.md round-4 cornell trace).  The returned color stays [N,3]:
    it feeds only elementwise math, which XLA flattens densely."""
    diffuse = mat.c_d * (mat.k_d * INV_PI)[:, None]
    f = diffuse
    if has_phong:
        refl = vm.reflect3(i, n)
        cos_r = jnp.maximum(vm.dot3(o, refl), 0.0)
        lobe = jnp.where(mat.power > 0.0, cos_r ** mat.power, 0.0)
        phong_spec = mat.c_s * (mat.k_s * (mat.power + 2.0) / TWO_PI * lobe)[:, None]
        f = diffuse + jnp.where((mat.brdf_type == BRDF_PHONG)[:, None], phong_spec, 0.0)
    return jnp.where((mat.brdf_type == BRDF_SPECULAR)[:, None], 0.0, f)


def sample3(
    mat: Mat,
    n: vm.V3,
    o: vm.V3,
    u1: Array,
    u2: Array,
    u3: Array,
    fix_phong_frame: bool = True,
    has_phong: bool = True,
) -> tuple[vm.V3, Array]:
    """Component-tuple ``sample`` -> (i=(x,y,z) of [N], pdf[N]).

    Identical sampling distribution to ``sample`` (same draws, same
    formulas); only the vector layout changes — every frame rotation and
    dot runs on [N] lane-dense components."""
    un, vn, wn = vm.local_frame3(n)

    # Diffuse: cosine-weighted hemisphere (src/scene.rs:58-66).
    z = jnp.sqrt(u1)
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = TWO_PI * u2
    i_diff = vm.from_local3(un, vn, wn, r * jnp.cos(phi), r * jnp.sin(phi), z)
    pdf_diff = jnp.maximum(vm.dot3(n, i_diff), 0.0) * INV_PI

    i_spec = vm.reflect3(o, n)

    is_spec = mat.brdf_type == BRDF_SPECULAR
    if not has_phong:
        i = vm.where3(is_spec, i_spec, i_diff)
        pdf = jnp.where(is_spec, 1.0, pdf_diff)
        return i, pdf

    # Phong: three-way split on u1 (src/scene.rs:74-95).
    pick_d = u1 < mat.k_d
    pick_s = (~pick_d) & (u1 < mat.k_d + mat.k_s)
    rp = jnp.sqrt(jnp.maximum(1.0 - u2, 0.0))
    phip = TWO_PI * u3
    phd = (rp * jnp.cos(phip), rp * jnp.sin(phip), jnp.sqrt(u2))
    p = mat.power
    zs = u2 ** (1.0 / (p + 1.0))
    rs = jnp.sqrt(jnp.maximum(1.0 - u2 ** (2.0 / (p + 1.0)), 0.0))
    phs = (rs * jnp.cos(phip), rs * jnp.sin(phip), zs)
    ph_s_pdf = (p + 1.0) / TWO_PI * zs**p
    if fix_phong_frame:
        ph_d = vm.from_local3(un, vn, wn, *phd)
        ur, vr, wr = vm.local_frame3(vm.normalize3(i_spec, eps=1e-20))
        ph_s = vm.from_local3(ur, vr, wr, *phs)
    else:
        ph_d = phd
        ph_s = phs
    i_phong = vm.where3(pick_d, ph_d, vm.where3(pick_s, ph_s, 0.0))
    pdf_phong = jnp.where(
        pick_d,
        jnp.maximum(vm.dot3(n, ph_d), 0.0) * INV_PI,
        jnp.where(pick_s, ph_s_pdf, 1.0),
    )

    is_phong = mat.brdf_type == BRDF_PHONG
    i = vm.where3(is_spec, i_spec, vm.where3(is_phong, i_phong, i_diff))
    pdf = jnp.where(is_spec, 1.0, jnp.where(is_phong, pdf_phong, pdf_diff))
    return i, pdf


def pdf3(mat: Mat, n: vm.V3, o: vm.V3, i: vm.V3) -> Array:
    """Component-tuple ``pdf`` (MIS balance heuristic) -> [N]."""
    cos_n = jnp.maximum(vm.dot3(n, i), 0.0)
    p_diff = cos_n * INV_PI
    axis = vm.normalize3(vm.reflect3(o, n), eps=1e-20)
    cos_r = jnp.maximum(vm.dot3(axis, i), 0.0)
    p_lobe = (mat.power + 1.0) / TWO_PI * jnp.where(
        mat.power > 0.0, cos_r ** mat.power, 0.0
    )
    p_phong = mat.k_d * p_diff + mat.k_s * p_lobe
    return jnp.where(
        mat.brdf_type == BRDF_PHONG,
        p_phong,
        jnp.where(mat.brdf_type == BRDF_DIFFUSE, p_diff, 0.0),
    )


def pdf(mat: Mat, n: Array, o: Array, i: Array) -> Array:
    """Density of ``sample`` at direction i (solid angle) -> [N].

    Used by the MIS balance heuristic.  Specular is a delta: pdf 0.
    """
    cos_n = jnp.maximum(vm.dot(n, i), 0.0)
    p_diff = cos_n * INV_PI
    axis = vm.normalize(vm.reflect(o, n), eps=1e-20)
    cos_r = jnp.maximum(vm.dot(axis, i), 0.0)
    p_lobe = (mat.power + 1.0) / TWO_PI * jnp.where(
        mat.power > 0.0, cos_r ** mat.power, 0.0
    )
    p_phong = mat.k_d * p_diff + mat.k_s * p_lobe
    out = jnp.where(
        mat.brdf_type == BRDF_PHONG,
        p_phong,
        jnp.where(mat.brdf_type == BRDF_DIFFUSE, p_diff, 0.0),
    )
    return out
