"""Pallas BVH traversal kernel: parity with the XLA packet traversal
(interpret mode on CPU) and packing-layout invariants."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracer_tpu.config import Epsilons
from raytracer_tpu.ops import intersect as ix
from raytracer_tpu.ops.bvh import MAX_LEAF, build_bvh, bvh_intersect, pack_for_pallas
from raytracer_tpu.ops.pallas.bvh_kernel import bvh_intersect_pallas

from tests.test_bvh import _scene_with_mesh_bvh, random_tri_soup

EPS = Epsilons()


def test_pack_layout_roundtrip():
    # Large enough that the SAH build produces a real tree even at the
    # production MAX_LEAF (a small soup packs into a single root leaf).
    tris = random_tri_soup(600, seed=5)
    bvh, order = build_bvh(tris)
    lo, hi, skip, first, count = bvh
    assert lo.shape[0] > 1, "soup too small to build a tree"
    padded = np.where(order[:, None, None] >= 0, tris[np.maximum(order, 0)], 0.0)
    nodes, packed_tris = pack_for_pallas(bvh, padded)
    n_nodes = lo.shape[0]
    # node i fields live at [i//128, f, i%128]
    for i in (0, n_nodes // 2, n_nodes - 1):
        got = nodes[i // 128, :9, i % 128]
        np.testing.assert_allclose(got[:3], lo[i], rtol=1e-6)
        np.testing.assert_allclose(got[3:6], hi[i], rtol=1e-6)
        assert int(got[6]) == skip[i]
        assert int(got[7]) == first[i]
        assert int(got[8]) == count[i]
    # leaf alignment: every leaf's first is a multiple of MAX_LEAF
    leaves = count > 0
    assert (first[leaves] % MAX_LEAF == 0).all()
    assert len(order) % MAX_LEAF == 0


def test_bvh8_collapse_invariants():
    """Every binary leaf appears exactly once among the wide nodes' leaf
    slots; child/count encodings are well-formed."""
    from raytracer_tpu.ops.bvh import collapse_bvh8

    tris = random_tri_soup(500, seed=11)
    bvh, order = build_bvh(tris)
    lo, hi, skip, first, count = bvh
    w_lo, w_hi, w_child, w_count, max_stack = collapse_bvh8(bvh)
    # leaf slots reference each binary leaf's (first, count) exactly once
    leaf_slots = w_count > 0
    got = sorted(zip(w_child[leaf_slots].tolist(), w_count[leaf_slots].tolist()))
    want = sorted(zip(first[count > 0].tolist(), count[count > 0].tolist()))
    assert got == want
    # internal slots reference valid wide ids; no self-reference to root
    internal = w_count == -1
    assert (w_child[internal] > 0).all()
    assert (w_child[internal] < len(w_count)).all()
    # empty slots are fully zeroed
    empty = w_count == 0
    assert (w_child[empty] == 0).all()
    assert max_stack >= 8


@pytest.mark.parametrize("kernel", ["wide", "widemxu", "widesmem", "binary"])
def test_pallas_matches_xla_traversal_interpret(kernel, monkeypatch):
    monkeypatch.setenv("RT_BVH_KERNEL", kernel)
    tris = random_tri_soup(200, seed=6)
    s = _scene_with_mesh_bvh(tris)
    rng = np.random.default_rng(7)
    n = 300  # deliberately not a multiple of the packet size
    ro = jnp.asarray(rng.uniform(-12, 12, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)

    t_ref, i_ref = bvh_intersect(s, ro, rd, EPS)
    t_pl, i_pl = bvh_intersect_pallas(s, ro, rd, EPS, interpret=True)

    t_ref, t_pl = np.asarray(t_ref), np.asarray(t_pl)
    hit_ref = t_ref < 1e30
    hit_pl = t_pl < 1e30
    np.testing.assert_array_equal(hit_ref, hit_pl)
    np.testing.assert_allclose(t_pl[hit_pl], t_ref[hit_ref], rtol=3e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i_pl)[hit_pl], np.asarray(i_ref)[hit_ref])


@pytest.mark.parametrize("kernel", ["wide", "widemxu", "widesmem", "binary"])
def test_pallas_any_hit_parity_interpret(kernel, monkeypatch):
    """Shadow mode (t_init bound + any_hit + resolved0) agrees with the XLA
    traversal on WHICH lanes are occluded below their bound."""
    monkeypatch.setenv("RT_BVH_KERNEL", kernel)
    tris = random_tri_soup(150, seed=13)
    s = _scene_with_mesh_bvh(tris)
    rng = np.random.default_rng(14)
    n = 256
    ro = jnp.asarray(rng.uniform(-12, 12, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    bound = jnp.asarray(rng.uniform(1.0, 25.0, (n,)), jnp.float32)
    resolved = jnp.asarray(rng.random(n) < 0.3)

    t_x, _ = bvh_intersect(s, ro, rd, EPS, t_init=bound, any_hit=True,
                           resolved0=resolved)
    t_p, _ = bvh_intersect_pallas(s, ro, rd, EPS, t_init=bound, any_hit=True,
                                  resolved0=resolved.astype(jnp.float32),
                                  interpret=True)
    # any_hit may stop early with ANY sub-bound hit; only occlusion agrees.
    occ_x = np.asarray(t_x) < np.asarray(bound)
    occ_p = np.asarray(t_p) < np.asarray(bound)
    m = ~np.asarray(resolved)  # resolved lanes are don't-care
    np.testing.assert_array_equal(occ_x[m], occ_p[m])


@pytest.mark.parametrize("live_frac", [0.3, 0.9])
def test_pallas_shadow_compaction_interpret(live_frac, monkeypatch):
    """Sliced shadow dispatch (live lanes <= half the packets -> kernel on
    the first half of the sorted wavefront) agrees with the uncompacted
    path on occlusion, at both a compactable live fraction (0.3 takes the
    sliced branch) and an overfull one (0.9 exercises the cond fallback)."""
    monkeypatch.setenv("RT_BVH_KERNEL", "widesmem")
    tris = random_tri_soup(150, seed=23)
    s = _scene_with_mesh_bvh(tris)
    rng = np.random.default_rng(24)
    n = 2500  # > 2 packets so the compaction gate opens
    live = rng.random(n) < live_frac
    ro = np.where(
        live[:, None], rng.uniform(-12, 12, (n, 3)), 3.0e7
    ).astype(np.float32)
    d = np.where(live[:, None], rng.normal(size=(n, 3)), [1.0, 0.0, 0.0])
    rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    ro = jnp.asarray(ro)
    bound = jnp.asarray(
        np.where(live, rng.uniform(1.0, 25.0, n), 0.0), jnp.float32
    )
    resolved = jnp.asarray(~live)

    monkeypatch.setenv("RT_SHADOW_COMPACT", "0")
    t_u, _ = bvh_intersect_pallas(s, ro, rd, EPS, t_init=bound, any_hit=True,
                                  resolved0=resolved.astype(jnp.float32),
                                  interpret=True)
    monkeypatch.setenv("RT_SHADOW_COMPACT", "1")
    t_c, _ = bvh_intersect_pallas(s, ro, rd, EPS, t_init=bound, any_hit=True,
                                  resolved0=resolved.astype(jnp.float32),
                                  interpret=True)
    occ_u = np.asarray(t_u) < np.asarray(bound)
    occ_c = np.asarray(t_c) < np.asarray(bound)
    np.testing.assert_array_equal(occ_u[live], occ_c[live])
    # Dead lanes return their own t_init bound (0.0 here): never "occluded".
    assert not occ_c[~live].any()


def test_pallas_through_full_trace_interpret(monkeypatch):
    tris = random_tri_soup(80, seed=8)
    s = _scene_with_mesh_bvh(tris)
    pre = ix.scene_precompute(s)
    rng = np.random.default_rng(9)
    ro = jnp.asarray(rng.uniform(-12, 12, (64, 3)), jnp.float32)
    d = rng.normal(size=(64, 3))
    rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)

    hit_xla = ix.trace(s, pre, ro, rd, EPS)

    import raytracer_tpu.ops.pallas.bvh_kernel as bk

    orig = bk.bvh_intersect_pallas
    monkeypatch.setattr(
        bk, "bvh_intersect_pallas",
        lambda scene, ro, rd, eps, **kw: orig(scene, ro, rd, eps, interpret=True, **kw),
    )
    monkeypatch.setattr(ix, "use_pallas_bvh", lambda: True)
    hit_pl = ix.trace(s, pre, ro, rd, EPS)

    np.testing.assert_array_equal(np.asarray(hit_xla.valid), np.asarray(hit_pl.valid))
    m = np.asarray(hit_xla.valid)
    np.testing.assert_allclose(
        np.asarray(hit_pl.t)[m], np.asarray(hit_xla.t)[m], rtol=3e-4, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(hit_pl.obj)[m], np.asarray(hit_xla.obj)[m])


def test_key_kernel_bit_identical_interpret():
    """The Pallas coherence-key kernel reproduces _coherence_key EXACTLY
    (same slab arithmetic, tie rule, octant, Morton quantization)."""
    from raytracer_tpu.ops.bvh import _coherence_key
    from raytracer_tpu.ops.pallas.key_kernel import coherence_key_pallas

    tris = random_tri_soup(400, seed=21)
    s = _scene_with_mesh_bvh(tris)
    rng = np.random.default_rng(22)
    n = 1000  # not a multiple of the 256*128 block: exercises padding
    ro = jnp.asarray(rng.uniform(-15, 15, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    # A few axis-aligned directions (zero components -> the 1e-12 guard)
    d[:10] = np.eye(3)[np.arange(10) % 3]
    rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)

    k_xla = _coherence_key(s, ro, rd, EPS)
    k_pl = coherence_key_pallas(s, ro, rd, EPS, interpret=True)
    np.testing.assert_array_equal(np.asarray(k_xla), np.asarray(k_pl))
