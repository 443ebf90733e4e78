"""BVH build + traversal tests: nearest-hit parity with brute force."""

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.config import Epsilons
from raytracer_tpu.models.loader import load_scene_dict
from raytracer_tpu.ops import intersect as ix
from raytracer_tpu.ops.bvh import build_bvh, bvh_intersect

EPS = Epsilons()


def random_tri_soup(n_tris, seed=0, extent=10.0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-extent, extent, (n_tris, 1, 3))
    verts = centers + rng.uniform(-0.8, 0.8, (n_tris, 3, 3))
    return verts


def test_build_invariants():
    tris = random_tri_soup(500)
    (lo, hi, skip, first, count), order = build_bvh(tris)
    n = lo.shape[0]
    # order = permutation of input ids, padded to aligned leaf groups with -1
    real = [i for i in order.tolist() if i >= 0]
    assert sorted(real) == list(range(500))
    assert len(order) % 4 == 0
    assert (lo <= hi).all()
    assert (skip > np.arange(n)).all() and (skip <= n).all()
    # leaves cover all real triangles exactly once, at aligned offsets
    leaves = count > 0
    assert (first[leaves] % 4 == 0).all()
    covered = []
    for f, c in zip(first[leaves], count[leaves]):
        covered.extend(order[f : f + c].tolist())
    assert sorted(covered) == list(range(500))
    # root box encloses everything
    np.testing.assert_allclose(lo[0], tris.reshape(-1, 3).min(axis=0).astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(hi[0], tris.reshape(-1, 3).max(axis=0).astype(np.float32), rtol=1e-6)


def _scene_with_mesh_bvh(tris):
    """Build a SceneArrays whose triangle batch is BVH-accelerated."""
    from raytracer_tpu.models.scene import build_scene_arrays

    bvh, order = build_bvh(tris)
    tris = np.where(order[:, None, None] >= 0, tris[np.maximum(order, 0)], 0.0)
    triangles = [
        dict(a=t[0], b=t[1], c=t[2], obj=0, valid=bool(o >= 0))
        for t, o in zip(tris, order)
    ]
    mats = [
        dict(emitted=[0, 0, 0], brdf_type=0, c_d=[1, 1, 1], c_s=[0, 0, 0], k_d=1, k_s=0, power=0),
        dict(emitted=[1, 1, 1], brdf_type=0, c_d=[0, 0, 0], c_s=[0, 0, 0], k_d=1, k_s=0, power=0),
    ]
    spheres = [dict(pos=[0, 0, 100], r=1.0, obj=1)]  # a light far away
    return build_scene_arrays(
        "bvhtest", np.zeros(3), np.array([0, 0, -1.0]), spheres, [], triangles, mats,
        bvh=bvh, bvh_tri_start=0,
    )


def test_bvh_matches_brute_force_nearest():
    tris = random_tri_soup(300, seed=1)
    s = _scene_with_mesh_bvh(tris)
    pre = ix.scene_precompute(s)

    rng = np.random.default_rng(2)
    n_rays = 256
    ro = jnp.asarray(rng.uniform(-12, 12, (n_rays, 3)), jnp.float32)
    rd_np = rng.normal(size=(n_rays, 3))
    rd = jnp.asarray(rd_np / np.linalg.norm(rd_np, axis=1, keepdims=True), jnp.float32)

    t_bvh, idx_bvh = bvh_intersect(s, ro, rd, EPS)
    tt = ix.intersect_triangles(ro, rd, pre.tri, s.tri_valid, EPS)
    t_brute = np.asarray(tt.min(axis=0))
    t_bvh = np.asarray(t_bvh)

    hit_b = t_brute < 1e30
    hit_v = t_bvh < 1e30
    np.testing.assert_array_equal(hit_b, hit_v)
    np.testing.assert_allclose(t_bvh[hit_v], t_brute[hit_b], rtol=2e-4, atol=1e-4)


def test_bvh_through_full_trace():
    # load a scene dict with a real mesh (cube expressed as OBJ-ish
    # triangles via prism goes to the brute prefix, so build a synthetic
    # mesh scene through build_scene_arrays instead) and check trace()
    # routes through the BVH path and returns correct object ids.
    tris = random_tri_soup(100, seed=3)
    s = _scene_with_mesh_bvh(tris)
    assert s.use_bvh
    pre = ix.scene_precompute(s)
    rng = np.random.default_rng(4)
    ro = jnp.asarray(rng.uniform(-12, 12, (64, 3)), jnp.float32)
    rd_np = rng.normal(size=(64, 3))
    rd = jnp.asarray(rd_np / np.linalg.norm(rd_np, axis=1, keepdims=True), jnp.float32)
    hit = ix.trace(s, pre, ro, rd, EPS)
    # compare against brute force triangle result + sphere
    tt = np.asarray(ix.intersect_triangles(ro, rd, pre.tri, s.tri_valid, EPS).min(axis=0))
    ts = np.asarray(
        ix.intersect_spheres(ro, rd, s.sph_pos, s.sph_r, s.sph_valid, EPS).min(axis=0)
    )
    t_ref = np.minimum(tt, ts)
    valid_ref = t_ref < 1e30
    np.testing.assert_array_equal(np.asarray(hit.valid), valid_ref)
    np.testing.assert_allclose(np.asarray(hit.t)[valid_ref], t_ref[valid_ref], rtol=2e-4, atol=1e-4)
    # object id: triangle hits -> obj 0, sphere hits -> obj 1
    expect_obj = np.where(tt <= ts, 0, 1)
    np.testing.assert_array_equal(np.asarray(hit.obj)[valid_ref], expect_obj[valid_ref])


def test_any_hit_mode_detects_same_occlusions():
    """Any-hit + nearest traversals agree on occluded-vs-clear for shadow
    style queries (which t wins may differ)."""
    import jax.numpy as jnp

    tris = random_tri_soup(300, seed=11)
    s = _scene_with_mesh_bvh(tris)
    rng = np.random.default_rng(12)
    n = 512
    ro = jnp.asarray(rng.uniform(-12, 12, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    bound = jnp.asarray(rng.uniform(2.0, 25.0, (n,)), jnp.float32)

    t_near, _ = bvh_intersect(s, ro, rd, EPS, t_init=bound)
    t_any, _ = bvh_intersect(s, ro, rd, EPS, t_init=bound, any_hit=True)
    occ_near = np.asarray(t_near) < np.asarray(bound)
    occ_any = np.asarray(t_any) < np.asarray(bound)
    np.testing.assert_array_equal(occ_near, occ_any)


def test_any_hit_resolved0_lanes_dont_block():
    import jax.numpy as jnp

    tris = random_tri_soup(100, seed=13)
    s = _scene_with_mesh_bvh(tris)
    rng = np.random.default_rng(14)
    n = 256
    ro = jnp.asarray(rng.uniform(-12, 12, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    bound = jnp.full((n,), 20.0)
    resolved = jnp.asarray(rng.random(n) < 0.5)
    t1, _ = bvh_intersect(s, ro, rd, EPS, t_init=bound, any_hit=True)
    t2, _ = bvh_intersect(
        s, ro, rd, EPS, t_init=bound, any_hit=True, resolved0=resolved
    )
    # unresolved lanes still get correct occlusion answers
    m = ~np.asarray(resolved)
    np.testing.assert_array_equal(
        (np.asarray(t1) < 20.0)[m], (np.asarray(t2) < 20.0)[m]
    )
