"""Scene data model: structure-of-arrays scene representation.

The reference stores a scene as ``Vec<Object>`` of enum geometry
(/root/reference/src/scene.rs:101-107, src/geometry.rs:388-392) and
intersects by a per-object linear scan of virtual dispatch.  On TPU the
scene is instead a pytree of dense, padded arrays — one batch per primitive
kind — so a whole wavefront of rays is tested against all primitives with
vectorized ops, and the nearest hit is an argmin.

All arrays are f32 (TPU-native; the reference is f64) and padded to a lane
multiple with explicit validity masks so shapes are static under jit.
"""

from __future__ import annotations

from typing import Any

import os

import jax.numpy as jnp
import numpy as np
from flax import struct

# BRDF type tags (reference enum: src/scene.rs:17-28).
BRDF_DIFFUSE = 0
BRDF_SPECULAR = 1
BRDF_PHONG = 2

# Light geometry kinds (reference Geometry::sample: src/geometry.rs:573-596;
# plane lights are unimplemented!() there and unsupported here too).
LIGHT_SPHERE = 0
LIGHT_MESH = 1

PAD = 8  # pad primitive batches to a multiple of this


def _pad(a: np.ndarray, n: int, fill: float = 0.0) -> np.ndarray:
    if a.shape[0] == n:
        return a
    pad_width = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad_width, constant_values=fill)


def _round_up(n: int, m: int) -> int:
    return max(m, ((n + m - 1) // m) * m)


@struct.dataclass
class SceneArrays:
    """SoA scene: device arrays + static metadata.

    Per-primitive ``*_obj`` arrays map back to the object index so the
    integrator can gather per-hit material/emission data, mirroring how the
    reference tags hits with the object id (src/scene.rs:272-289).
    """

    # --- Spheres: (pos, r) per src/geometry.rs:394-398
    sph_pos: jnp.ndarray  # [S,3]
    sph_r: jnp.ndarray  # [S]
    sph_obj: jnp.ndarray  # [S] i32
    sph_valid: jnp.ndarray  # [S] bool

    # --- Planes: (pos, n) per src/geometry.rs:400-404
    pln_pos: jnp.ndarray  # [P,3]
    pln_n: jnp.ndarray  # [P,3]
    pln_obj: jnp.ndarray  # [P] i32
    pln_valid: jnp.ndarray  # [P] bool

    # --- Triangles: all meshes flattened into one batch
    tri_a: jnp.ndarray  # [T,3]
    tri_b: jnp.ndarray  # [T,3]
    tri_c: jnp.ndarray  # [T,3]
    tri_obj: jnp.ndarray  # [T] i32
    tri_valid: jnp.ndarray  # [T] bool

    # --- Per-object materials (reference Object: src/scene.rs:10-15)
    obj_emitted: jnp.ndarray  # [O,3]
    brdf_type: jnp.ndarray  # [O] i32
    c_d: jnp.ndarray  # [O,3] diffuse color (kd for Diffuse, color_d for Phong)
    c_s: jnp.ndarray  # [O,3] specular color (ks for Specular, color_s for Phong)
    k_d: jnp.ndarray  # [O] Phong diffuse weight (1.0 for pure Diffuse)
    k_s: jnp.ndarray  # [O] Phong specular weight
    phong_power: jnp.ndarray  # [O] f32

    # --- Light source (first emissive object, src/scene.rs:129-137)
    light_sph_pos: jnp.ndarray  # [3]
    light_sph_r: jnp.ndarray  # []
    light_tri_idx: jnp.ndarray  # [Lt] i32 indices into tri arrays
    light_tri_cdf: jnp.ndarray  # [Lt] f32 area-weighted CDF (ends at 1)
    light_area: jnp.ndarray  # [] total light surface area

    # --- Camera: pos + (possibly non-unit) dir, used exactly as loaded
    # (the reference never normalizes camera.dir: src/server.rs:353-357)
    cam_pos: jnp.ndarray  # [3]
    cam_dir: jnp.ndarray  # [3]

    # --- Optional BVH over the triangle batch (built for scenes with
    # loaded meshes; see ops/bvh.py).  Empty arrays when unused.
    bvh_lo: jnp.ndarray  # [Nn,3] node AABB min
    bvh_hi: jnp.ndarray  # [Nn,3] node AABB max
    bvh_skip: jnp.ndarray  # [Nn] i32 escape index (next node on miss)
    bvh_first: jnp.ndarray  # [Nn] i32 first triangle (leaves), -1 internal
    bvh_count: jnp.ndarray  # [Nn] i32 leaf triangle count (0 internal)
    # VMEM-packed forms for the Pallas traversal kernels (ops/pallas).
    bvh_nodes_packed: jnp.ndarray  # [NR,16,128] f32 (binary skip-link)
    bvh8_nodes_packed: jnp.ndarray  # [NR8,64,128] f32 (8-wide, stack walk)
    bvh8_nodes_flat: jnp.ndarray  # [Nw,64] f32 (SMEM scalar-load variant)
    bvh_tris_packed: jnp.ndarray  # [TR, 12*MAX_LEAF, 128] f32
    bvh_tris_mxu: jnp.ndarray  # [GL, 8, 6*MAX_LEAF] f32 (MXU leaf matrices)
    # Treetop cut (max_cut=32 subtree-root AABBs by default) for the
    # coherence sort key
    # (ops/bvh.treetop_cut).
    bvh_cut_lo: jnp.ndarray  # [C,3] f32
    bvh_cut_hi: jnp.ndarray  # [C,3] f32

    # --- Static metadata ---
    name: str = struct.field(pytree_node=False, default="")
    light_idx: int = struct.field(pytree_node=False, default=0)
    light_type: int = struct.field(pytree_node=False, default=LIGHT_SPHERE)
    n_objects: int = struct.field(pytree_node=False, default=0)
    n_spheres: int = struct.field(pytree_node=False, default=0)
    n_planes: int = struct.field(pytree_node=False, default=0)
    n_triangles: int = struct.field(pytree_node=False, default=0)
    # Scenes without Phong materials compile the Phong lobes away (the
    # cos^power transcendentals cost ~20% of a bounce otherwise).
    has_phong: bool = struct.field(pytree_node=False, default=True)
    use_bvh: bool = struct.field(pytree_node=False, default=False)
    # Triangles NOT covered by the BVH (from cube/prism objects) are brute
    # forced; BVH-covered triangles occupy [bvh_tri_start, n_triangles).
    bvh_tri_start: int = struct.field(pytree_node=False, default=0)
    # Static SMEM stack bound for the 8-wide Pallas traversal (pops 1 /
    # pushes <=7 net per visit along one root-to-leaf path).
    bvh8_max_stack: int = struct.field(pytree_node=False, default=1)
    # Whether bvh_tris_mxu holds real MXU leaf matrices (built only when
    # RT_BVH_KERNEL=widemxu is set at scene-build time) or a dummy.
    has_mxu_tris: bool = struct.field(pytree_node=False, default=False)


def build_scene_arrays(
    name: str,
    camera_pos: np.ndarray,
    camera_dir: np.ndarray,
    spheres: list[dict[str, Any]],
    planes: list[dict[str, Any]],
    triangles: list[dict[str, Any]],
    materials: list[dict[str, Any]],
    bvh: Any | None = None,
    bvh_tri_start: int = 0,
) -> SceneArrays:
    """Assemble padded device arrays from host-side lists.

    ``spheres``: [{pos, r, obj}], ``planes``: [{pos, n, obj}],
    ``triangles``: [{a, b, c, obj}], ``materials``: per-object dicts with
    keys emitted, brdf_type, c_d, c_s, k_d, k_s, power.
    """
    f = np.float32

    ns, np_, nt = len(spheres), len(planes), len(triangles)
    S, P, T = _round_up(ns, PAD), _round_up(np_, PAD), _round_up(nt, PAD)

    def stack(items, key, dim):
        if not items:
            return np.zeros((0, dim) if dim else (0,), f)
        return np.asarray([it[key] for it in items], f).reshape(len(items), dim) if dim else np.asarray(
            [it[key] for it in items], f
        )

    sph_pos = _pad(stack(spheres, "pos", 3), S)
    sph_r = _pad(stack(spheres, "r", 0), S)
    sph_obj = _pad(np.asarray([s["obj"] for s in spheres], np.int32), S)
    pln_pos = _pad(stack(planes, "pos", 3), P)
    pln_n = _pad(stack(planes, "n", 3), P)
    pln_obj = _pad(np.asarray([p["obj"] for p in planes], np.int32), P)
    tri_a = _pad(stack(triangles, "a", 3), T)
    tri_b = _pad(stack(triangles, "b", 3), T)
    tri_c = _pad(stack(triangles, "c", 3), T)
    tri_obj = _pad(np.asarray([t["obj"] for t in triangles], np.int32), T)

    def mask(n_real, n_pad):
        m = np.zeros(n_pad, bool)
        m[:n_real] = True
        return m

    tri_mask = mask(nt, T)
    # Leaf-alignment padding inside the batch (BVH leaves are padded to a
    # fixed group size with degenerate triangles, marked valid=False).
    tri_mask[:nt] &= np.asarray([t.get("valid", True) for t in triangles], bool)

    no = len(materials)
    obj_emitted = np.asarray([m["emitted"] for m in materials], f).reshape(no, 3)
    brdf_type = np.asarray([m["brdf_type"] for m in materials], np.int32)
    c_d = np.asarray([m["c_d"] for m in materials], f).reshape(no, 3)
    c_s = np.asarray([m["c_s"] for m in materials], f).reshape(no, 3)
    k_d = np.asarray([m["k_d"] for m in materials], f)
    k_s = np.asarray([m["k_s"] for m in materials], f)
    power = np.asarray([m["power"] for m in materials], f)

    # First emissive object is THE light (src/scene.rs:129-137; reference
    # panics when no emitter exists).
    emissive = [i for i in range(no) if np.any(np.abs(obj_emitted[i]) > 1e-5)]
    if not emissive:
        raise ValueError(f"scene {name!r} has no emissive object")
    light_idx = emissive[0]

    # Light geometry: sphere or area-weighted mesh triangles.
    light_sph = [s for s in spheres if s["obj"] == light_idx]
    light_tris = [(i, t) for i, t in enumerate(triangles) if t["obj"] == light_idx]
    if light_sph:
        light_type = LIGHT_SPHERE
        lpos = np.asarray(light_sph[0]["pos"], f)
        lr = f(light_sph[0]["r"])
        larea = f(4.0 * np.pi * lr * lr)
        lt_idx = np.zeros(PAD, np.int32)
        lt_cdf = np.ones(PAD, f)
    elif light_tris:
        light_type = LIGHT_MESH
        lpos = np.zeros(3, f)
        lr = f(0.0)
        areas = []
        for _, t in light_tris:
            ab = np.asarray(t["b"], np.float64) - np.asarray(t["a"], np.float64)
            ac = np.asarray(t["c"], np.float64) - np.asarray(t["a"], np.float64)
            areas.append(0.5 * np.linalg.norm(np.cross(ab, ac)))
        areas = np.asarray(areas)
        larea = f(areas.sum())
        cdf = np.cumsum(areas) / areas.sum()
        nl = _round_up(len(light_tris), PAD)
        lt_idx = _pad(np.asarray([i for i, _ in light_tris], np.int32), nl)
        lt_cdf = _pad(cdf.astype(f), nl, fill=2.0)  # pad > 1 so never selected
    else:
        raise ValueError(f"light object {light_idx} in {name!r} has unsupported geometry")

    if bvh is not None:
        from raytracer_tpu.ops.bvh import (
            collapse_bvh8,
            pack_bvh8_for_pallas,
            pack_for_pallas,
            pack_tris_mxu,
            treetop_cut,
        )

        bvh_lo, bvh_hi, bvh_skip, bvh_first, bvh_count = bvh
        # RT_MAX_CUT: measurement hook — treetop-cut size re-sweeps (the
        # 16/64/96 sweep that picked 32 predates the Pallas key kernel,
        # whose per-node cost is far below the XLA slab loop's).
        cut_ids = treetop_cut(bvh, max_cut=int(os.environ.get("RT_MAX_CUT", "32")))
        cut_lo, cut_hi = bvh_lo[cut_ids], bvh_hi[cut_ids]
        tail = triangles[bvh_tri_start:]
        tri_pts_ordered = np.stack(
            [
                np.stack([t["a"] for t in tail]),
                np.stack([t["b"] for t in tail]),
                np.stack([t["c"] for t in tail]),
            ],
            axis=1,
        )
        nodes_packed, tris_packed = pack_for_pallas(bvh, tri_pts_ordered)
        # The MXU leaf matrices serve ONLY the env-gated RT_BVH_KERNEL=
        # widemxu variant (a documented-negative result kept for
        # re-measurement); they cost O(T) packing plus ~7 MB HBM per mesh
        # scene, so build them only when that variant is selected at
        # scene-build time (the parity tests setenv before loading).
        import os as _os

        has_mxu = _os.environ.get("RT_BVH_KERNEL") == "widemxu"
        from raytracer_tpu.ops.bvh import MAX_LEAF as _ML

        tris_mxu = (
            pack_tris_mxu(tri_pts_ordered)
            if has_mxu
            else np.zeros((1, 8, 6 * _ML), f)
        )
        w_lo, w_hi, w_child, w_count, bvh8_max_stack = collapse_bvh8(bvh)
        nodes8_packed, nodes8_flat = pack_bvh8_for_pallas(
            w_lo, w_hi, w_child, w_count
        )
    else:
        # Minimal NON-zero dummies: zero-sized buffers trigger an XLA
        # argument-pruning bug under replicated (shard_map) CPU execution
        # ("Execution supplied 40 buffers but compiled program expected 44")
        # when a no-BVH scene compiles before a BVH one in the same process.
        from raytracer_tpu.ops.bvh import MAX_LEAF

        z3 = np.zeros((1, 3), f)
        zi = np.zeros((1,), np.int32)
        bvh_lo, bvh_hi, bvh_skip, bvh_first, bvh_count = z3, z3, zi, zi, zi
        nodes_packed = np.zeros((1, 16, 128), f)
        nodes8_packed = np.zeros((1, 64, 128), f)
        nodes8_flat = np.zeros((1, 64), f)
        tris_packed = np.zeros((1, 12 * MAX_LEAF, 128), f)
        tris_mxu = np.zeros((1, 8, 6 * MAX_LEAF), f)
        cut_lo, cut_hi = z3, z3
        bvh8_max_stack = 1
        has_mxu = False

    return SceneArrays(
        sph_pos=jnp.asarray(sph_pos),
        sph_r=jnp.asarray(sph_r),
        sph_obj=jnp.asarray(sph_obj),
        sph_valid=jnp.asarray(mask(ns, S)),
        pln_pos=jnp.asarray(pln_pos),
        pln_n=jnp.asarray(pln_n),
        pln_obj=jnp.asarray(pln_obj),
        pln_valid=jnp.asarray(mask(np_, P)),
        tri_a=jnp.asarray(tri_a),
        tri_b=jnp.asarray(tri_b),
        tri_c=jnp.asarray(tri_c),
        tri_obj=jnp.asarray(tri_obj),
        tri_valid=jnp.asarray(tri_mask),
        obj_emitted=jnp.asarray(obj_emitted),
        brdf_type=jnp.asarray(brdf_type),
        c_d=jnp.asarray(c_d),
        c_s=jnp.asarray(c_s),
        k_d=jnp.asarray(k_d),
        k_s=jnp.asarray(k_s),
        phong_power=jnp.asarray(power),
        light_sph_pos=jnp.asarray(lpos),
        light_sph_r=jnp.asarray(lr),
        light_tri_idx=jnp.asarray(lt_idx),
        light_tri_cdf=jnp.asarray(lt_cdf),
        light_area=jnp.asarray(larea),
        cam_pos=jnp.asarray(camera_pos, jnp.float32),
        cam_dir=jnp.asarray(camera_dir, jnp.float32),
        bvh_lo=jnp.asarray(bvh_lo),
        bvh_hi=jnp.asarray(bvh_hi),
        bvh_skip=jnp.asarray(bvh_skip),
        bvh_first=jnp.asarray(bvh_first),
        bvh_count=jnp.asarray(bvh_count),
        bvh_nodes_packed=jnp.asarray(nodes_packed),
        bvh8_nodes_packed=jnp.asarray(nodes8_packed),
        bvh8_nodes_flat=jnp.asarray(nodes8_flat),
        bvh_tris_packed=jnp.asarray(tris_packed),
        bvh_tris_mxu=jnp.asarray(tris_mxu),
        bvh_cut_lo=jnp.asarray(cut_lo),
        bvh_cut_hi=jnp.asarray(cut_hi),
        name=name,
        light_idx=light_idx,
        light_type=light_type,
        has_phong=bool((brdf_type == BRDF_PHONG).any()),
        n_objects=no,
        n_spheres=ns,
        n_planes=np_,
        n_triangles=nt,
        use_bvh=bvh is not None,
        bvh_tri_start=bvh_tri_start,
        bvh8_max_stack=int(bvh8_max_stack),
        has_mxu_tris=has_mxu,
    )
