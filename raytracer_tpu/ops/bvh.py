"""Flattened BVH: host-side build + stackless device traversal.

The reference accelerates meshes with a pointer-style octree
(src/geometry.rs:1133-1301) whose recursive traversal early-outs on the
first leaf hit (a known quirk; not provably nearest).  Pointer chasing and
recursion do not map to XLA, so the TPU design is:

- **Build (host, numpy):** median-split BVH over triangle centroids,
  flattened in DFS pre-order with *skip links*: ``skip[i]`` is the node
  index right after i's subtree.  Traversal then needs no stack at all:
  on AABB hit continue to ``i+1``, on miss jump to ``skip[i]``.  Leaves
  own a contiguous, reordered triangle range, so leaf tests are dense.

- **Traverse (device):** coherent ray *packets* share one node pointer and
  walk the skip-link tree in lockstep over packets (see ``bvh_intersect``),
  after a root-cull + octant/Morton coherence sort.  On real TPUs the
  traversal instead runs inside a single Pallas kernel with the whole tree
  in VMEM (ops/pallas/bvh_kernel.py; ``pack_for_pallas`` below builds its
  table layouts) — the XLA path remains the CPU/test oracle.

Nearest-hit semantics throughout (the octree's first-leaf early-out quirk
is deliberately NOT reproduced — SURVEY §5 classifies it as a bug to fix).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from raytracer_tpu.config import Epsilons

# Leaf size tuned on v5e.  Round-2 sweep (skip-link kernel, C_LEAF=12):
# 4->58s, 8->51s, 16->40s, 32->33s, 64->29s.  Round-3 re-sweep with the
# 8-wide stack kernel (flying_unicorn @16spp warm, C_LEAF in braces):
# 64{12}=7.13, 64{6}=6.83, 128{12}=6.77, 128{6}=6.52, 128{3}=**6.46**,
# 128{1.5}=6.48, 192{6}=6.71, 256{3}=6.74 — fat leaves won while a packet
# visit's FIXED cost (node fetch + per-step overhead) dwarfed the dense
# per-triangle VPU math.  Round-5 re-sweep on the current toolchain (the
# round-5 Mosaic bump shifted kernel cost toward the leaf ALU, making the
# kernel ~42% of unicorn wall): 64{3}=**3.42**, 64{6}=3.48, 32{6}=3.45,
# 128{3}=3.62 — the per-visit fixed cost shrank, so HALVING the dense
# leaf unroll now wins ~6% end-to-end (and halves the kernel's cold
# compile).  64 is the round-5 default; RT_MAX_LEAF re-sweeps.
MAX_LEAF = int(os.environ.get("RT_MAX_LEAF", "64"))
INF = jnp.float32(3.0e38)


SAH_BINS = 16
# Traversal cost model for split decisions.  BOTH traversal paths test all
# MAX_LEAF slots on every leaf visit (static loops in bvh_intersect and the
# Pallas kernel), so a leaf visit has FIXED cost regardless of how full the
# leaf is — the SAH leaf term is therefore per-GROUP (ceil(N/max_leaf)), not
# per-triangle, and packing leaves full is free.  Nominally the ratio of
# one leaf visit to one internal-node visit; the round-3 sweep above found
# the end-to-end optimum well BELOW the naive ratio (bigger leaves win
# until ~flat), so it is a tuned constant, not a measured ratio.
C_LEAF = float(os.environ.get("RT_C_LEAF", "3.0"))


def _half_area(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    d = np.maximum(hi - lo, 0.0)
    return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0]


def build_bvh(tri_pts: np.ndarray, max_leaf: int | None = None):
    """Build a flattened BVH with a binned surface-area heuristic.

    Split selection: 16 centroid bins per axis, greedy SAH with the
    fixed-cost-leaf model above (cost of a child = area-weighted expected
    node visits + C_LEAF * expected leaf-group visits).  A node becomes a
    leaf when it fits in one group and no split beats the leaf cost.
    Degenerate distributions (all centroids equal) fall back to a median
    split so termination is guaranteed.

    Args:
      tri_pts: [F,3,3] f64 triangle vertices (a,b,c).

    Returns:
      ((lo[Nn,3] f32, hi[Nn,3] f32, skip[Nn] i32, first[Nn] i32,
        count[Nn] i32), order[F'] i64)
      where ``order`` lists input-triangle ids in leaf-contiguous layout,
      padded with -1 so every leaf occupies exactly ``max_leaf`` aligned
      slots (the Pallas traversal fetches a whole leaf group with one
      dynamic read); ``first`` indexes into that padded layout.
    """
    if max_leaf is None:
        max_leaf = MAX_LEAF  # read at call time so sweeps can patch it
    n_tris = tri_pts.shape[0]
    centroids = tri_pts.mean(axis=1)
    # Per-triangle AABBs, reused by every binning pass.
    tri_lo = tri_pts.min(axis=1)
    tri_hi = tri_pts.max(axis=1)

    los: list[np.ndarray] = []
    his: list[np.ndarray] = []
    skips: list[int] = []
    firsts: list[int] = []
    counts: list[int] = []
    order: list[int] = []

    def alloc() -> int:
        los.append(None)  # type: ignore[arg-type]
        his.append(None)  # type: ignore[arg-type]
        skips.append(-1)
        firsts.append(-1)
        counts.append(0)
        return len(skips) - 1

    def subtree_cost(n: int) -> float:
        """Expected visit cost of a to-be-built subtree with n triangles,
        relative to one internal-node visit (used only to compare split
        candidates, so a rough model is fine)."""
        groups = -(-n // max_leaf)
        return C_LEAF * groups + max(2 * groups - 1, 1) - groups

    def sah_split(idx: np.ndarray) -> tuple[np.ndarray, np.ndarray] | None:
        """Best binned-SAH partition of idx -> (left, right), or None when
        no split improves on a single leaf (only possible if idx fits one)."""
        cen = centroids[idx]
        lo_t, hi_t = tri_lo[idx], tri_hi[idx]
        best_cost = np.inf
        best = None
        for axis in range(3):
            cmin = cen[:, axis].min()
            cmax = cen[:, axis].max()
            if cmax - cmin < 1e-12:
                continue
            b = np.minimum(
                ((cen[:, axis] - cmin) / (cmax - cmin) * SAH_BINS).astype(np.int64),
                SAH_BINS - 1,
            )
            n_b = np.bincount(b, minlength=SAH_BINS)
            bb_lo = np.full((SAH_BINS, 3), np.inf)
            bb_hi = np.full((SAH_BINS, 3), -np.inf)
            np.minimum.at(bb_lo, b, lo_t)
            np.maximum.at(bb_hi, b, hi_t)
            # Prefix (left) and suffix (right) counts/bounds over split planes.
            nl = np.cumsum(n_b)[:-1]
            nr = len(idx) - nl
            al = _half_area(
                np.minimum.accumulate(bb_lo, 0)[:-1],
                np.maximum.accumulate(bb_hi, 0)[:-1],
            )
            ar = _half_area(
                np.minimum.accumulate(bb_lo[::-1], 0)[::-1][1:],
                np.maximum.accumulate(bb_hi[::-1], 0)[::-1][1:],
            )
            valid = (nl > 0) & (nr > 0)
            cost = np.where(
                valid,
                al * [subtree_cost(n) for n in nl] + ar * [subtree_cost(n) for n in nr],
                np.inf,
            )
            i = int(np.argmin(cost))
            if cost[i] < best_cost:
                best_cost = cost[i]
                best = (axis, cmin, cmax, i)
        if best is None:
            # All centroids coincide on every axis: arbitrary median split
            # (must split when idx exceeds one leaf group).
            if len(idx) <= max_leaf:
                return None
            half = len(idx) // 2
            return idx[:half], idx[half:]
        if len(idx) <= max_leaf:
            # Leaf is allowed: take it unless the best split beats it under
            # the same cost model (leaf visit = C_LEAF, relative to parent
            # area = whole node).
            area = _half_area(lo_t.min(axis=0), hi_t.max(axis=0))
            if C_LEAF * area <= best_cost + area:  # +area: split adds a node visit
                return None
        axis, cmin, cmax, i = best
        b = np.minimum(
            ((cen[:, axis] - cmin) / (cmax - cmin) * SAH_BINS).astype(np.int64),
            SAH_BINS - 1,
        )
        return idx[b <= i], idx[b > i]

    import sys

    old_limit = sys.getrecursionlimit()

    def build(idx: np.ndarray) -> None:
        my = alloc()
        pts = tri_pts[idx].reshape(-1, 3)
        los[my] = pts.min(axis=0)
        his[my] = pts.max(axis=0)
        split = sah_split(idx) if len(idx) > 1 else None
        if split is None:
            firsts[my] = len(order)
            counts[my] = len(idx)
            order.extend(idx.tolist())
            order.extend([-1] * (-len(idx) % max_leaf))  # align leaf groups
        else:
            left, right = split
            build(left)
            build(right)
        # skip[i] = first node index past i's subtree; when this line runs the
        # whole subtree has been emitted, so that is exactly len(skips).
        skips[my] = len(skips)

    sys.setrecursionlimit(max(old_limit, 100000))
    try:
        build(np.arange(n_tris))
    finally:
        sys.setrecursionlimit(old_limit)

    bvh = (
        np.asarray(los, np.float32),
        np.asarray(his, np.float32),
        np.asarray(skips, np.int32),
        np.asarray(firsts, np.int32),
        np.asarray(counts, np.int32),
    )
    return bvh, np.asarray(order, np.int64)


def pack_for_pallas(
    bvh, tri_pts_ordered: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Pack BVH + leaf triangles into the Pallas kernel's VMEM layouts.

    Node i lives at nodes[i//128, :, i%128] with 9 f32 sublane fields
    [lo.xyz, hi.xyz, skip, first, count] (ints exact in f32 below 2^24).
    Leaf group g (triangles MAX_LEAF*g.. of the ordered+padded layout) lives
    at tris[g//128, :, g%128] with MAX_LEAF x 12 sublane fields per triangle:
    [n_unit.xyz, n_d, q1.xyz, q1_a, q2.xyz, q2_a] — the same
    barycentric-gradient precomputation as ops.intersect.tri_precompute.

    Args:
      bvh: (lo, hi, skip, first, count) from build_bvh.
      tri_pts_ordered: [F',3,3] f64 triangle vertices in the ordered+padded
        (leaf-aligned) layout; padding slots may be all-zero (degenerate).
    """
    lo, hi, skip, first, count = bvh
    n_nodes = lo.shape[0]
    nr = -(-n_nodes // 128)
    nodes = np.zeros((nr, 16, 128), np.float32)
    flat = np.concatenate(
        [lo, hi, skip[:, None].astype(np.float32), first[:, None].astype(np.float32),
         count[:, None].astype(np.float32)],
        axis=1,
    )  # [Nn, 9]
    pad_nodes = np.zeros((nr * 128, 9), np.float32)
    pad_nodes[:n_nodes] = flat
    nodes[:, :9, :] = pad_nodes.reshape(nr, 128, 9).transpose(0, 2, 1)

    a = tri_pts_ordered[:, 0].astype(np.float64)
    b = tri_pts_ordered[:, 1].astype(np.float64)
    c = tri_pts_ordered[:, 2].astype(np.float64)
    e1, e2 = b - a, c - a
    ng = np.cross(e1, e2)
    nn = np.maximum((ng * ng).sum(1), 1e-30)
    n_unit = ng / np.sqrt(nn)[:, None]
    q1 = np.cross(e2, ng) / nn[:, None]
    q2 = np.cross(ng, e1) / nn[:, None]
    fields = np.concatenate(
        [
            n_unit,
            (a * n_unit).sum(1)[:, None],
            q1,
            (a * q1).sum(1)[:, None],
            q2,
            (a * q2).sum(1)[:, None],
        ],
        axis=1,
    ).astype(np.float32)  # [F',12]
    n_groups = tri_pts_ordered.shape[0] // MAX_LEAF
    tr = -(-n_groups // 128)
    pad_tris = np.zeros((tr * 128 * MAX_LEAF, 12), np.float32)
    pad_tris[: fields.shape[0]] = fields
    # [TR*128 groups, MAX_LEAF tris, 12 fields] -> [TR, 12*MAX_LEAF, 128]
    tris = (
        pad_tris.reshape(tr, 128, MAX_LEAF * 12).transpose(0, 2, 1).astype(np.float32)
    )
    return nodes, tris


def pack_tris_mxu(tri_pts_ordered: np.ndarray) -> np.ndarray:
    """Pack leaf triangles as per-group MXU coefficient matrices [GL,8,384].

    The wide kernel's leaf phase was measured extract-bound: the lane-masked
    block reduction reads a [12*MAX_LEAF,128] tile (~96 vregs) per visit and
    then performs 12*MAX_LEAF scalar extracts to broadcast each coefficient.
    Instead, all six per-(ray, triangle) dot products of the barycentric-
    gradient test are ONE matmul: with R_c = [ro.xyz, rd.xyz, 1, *] the
    [8,128] field-major slab of a 128-ray chunk,

        out = T_g^T @ R_c    ([384,128], MXU, K=8)

    where T_g's column blocks of MAX_LEAF give, per triangle j:
      [0:64)    denom = n.rd          rows 3..5 =  n_unit
      [64:128)  numer = n_d - n.ro    rows 0..2 = -n_unit, row 6 = n_d
      [128:192) u0 = q1.ro - q1a      rows 0..2 =  q1,     row 6 = -q1a
      [192:256) u1 = q1.rd            rows 3..5 =  q1
      [256:320) v0 = q2.ro - q2a      rows 0..2 =  q2,     row 6 = -q2a
      [320:384) v1 = q2.rd            rows 3..5 =  q2
    so the VPU epilogue is just t = numer/denom, u = u0 + t*u1,
    v = v0 + t*v1 + compares, with triangles on SUBLANES (reduction over a
    leaf = 6-step sublane tree min) and rays on lanes.  Padded slots are
    all-zero columns -> denom = 0 -> t = inf/nan -> all compares False.
    """
    a = tri_pts_ordered[:, 0].astype(np.float64)
    b = tri_pts_ordered[:, 1].astype(np.float64)
    c = tri_pts_ordered[:, 2].astype(np.float64)
    e1, e2 = b - a, c - a
    ng = np.cross(e1, e2)
    nn = np.maximum((ng * ng).sum(1), 1e-30)
    n_unit = (ng / np.sqrt(nn)[:, None]).astype(np.float32)
    q1 = (np.cross(e2, ng) / nn[:, None]).astype(np.float32)
    q2 = (np.cross(ng, e1) / nn[:, None]).astype(np.float32)
    n_d = (a * n_unit).sum(1).astype(np.float32)
    q1a = (a * q1).sum(1).astype(np.float32)
    q2a = (a * q2).sum(1).astype(np.float32)
    # Degenerate padding tris (all-zero points): force ALL blocks zero so
    # denom == 0 kills them (n_unit of a zero cross is 0 already).
    n_tris = tri_pts_ordered.shape[0]
    gl = -(-n_tris // MAX_LEAF)
    ml = MAX_LEAF
    tbl = np.zeros((gl, 8, 6 * ml), np.float32)
    g = np.arange(n_tris) // ml
    j = np.arange(n_tris) % ml
    for k in range(3):
        tbl[g, 3 + k, 0 * ml + j] = n_unit[:, k]
        tbl[g, k, 1 * ml + j] = -n_unit[:, k]
        tbl[g, k, 2 * ml + j] = q1[:, k]
        tbl[g, 3 + k, 3 * ml + j] = q1[:, k]
        tbl[g, k, 4 * ml + j] = q2[:, k]
        tbl[g, 3 + k, 5 * ml + j] = q2[:, k]
    tbl[g, 6, 1 * ml + j] = n_d
    tbl[g, 6, 2 * ml + j] = -q1a
    tbl[g, 6, 4 * ml + j] = -q2a
    return tbl


BVH8_WIDTH = 8


def collapse_bvh8(bvh, width: int = BVH8_WIDTH):
    """Collapse the binary skip-link BVH into a WIDE (8-ary) node table.

    The Pallas traversal's per-step fixed cost (one dynamic VMEM block read
    + masked lane reduction + scalar extracts + loop overhead) dominates the
    dense slab math, so fetching ONE node that carries ``width`` child AABBs
    amortizes that fixed cost 8x; descent then uses a small SMEM stack
    (one program per packet) instead of skip links, visiting only children
    the packet actually hit.  (The reference's octree is also 8-ary,
    src/geometry.rs:1133-1301 — but by spatial octants with duplicated
    triangles; this is a collapsed SAH BVH with disjoint leaves.)

    Collapse rule: start from a binary node's two children and repeatedly
    expand the largest-surface-area internal member until ``width`` members
    (classic BVH8 construction).  Child slot encoding per wide node:
    count > 0 -> leaf (child = first triangle in the ordered+padded layout),
    count == -1 -> internal (child = wide node id), count == 0 -> empty.

    Returns (w_lo [Nw,8,3], w_hi, w_child [Nw,8] i32, w_count [Nw,8] i32,
    max_stack) where ``max_stack`` bounds the traversal stack depth
    (pops 1 / pushes <= width per visit, along one root-to-leaf path).
    """
    lo, hi, skip, first, count = bvh
    w_lo: list[np.ndarray] = []
    w_hi: list[np.ndarray] = []
    w_child: list[np.ndarray] = []
    w_count: list[np.ndarray] = []
    max_depth = 0

    def alloc() -> int:
        w_lo.append(np.zeros((width, 3), np.float32))
        w_hi.append(np.zeros((width, 3), np.float32))
        w_child.append(np.zeros(width, np.int32))
        w_count.append(np.zeros(width, np.int32))
        return len(w_count) - 1

    def kids(i: int) -> tuple[int, int]:
        # Binary children in DFS pre-order: i+1 and its skip target.
        return i + 1, int(skip[i + 1])

    def build(i: int, depth: int) -> int:
        nonlocal max_depth
        max_depth = max(max_depth, depth)
        my = alloc()
        if count[i] > 0:
            group = [i]  # degenerate: the whole (sub)tree is one leaf
        else:
            group = list(kids(i))
            while len(group) < width:
                best_j, best_area = -1, -1.0
                for j, c in enumerate(group):
                    if count[c] > 0:
                        continue
                    a = float(_half_area(lo[c], hi[c]))
                    if a > best_area:
                        best_j, best_area = j, a
                if best_j < 0:
                    break
                c = group.pop(best_j)
                a, b = kids(c)
                group[best_j:best_j] = [a, b]  # keep spatial discovery order
        for s, c in enumerate(group):
            w_lo[my][s] = lo[c]
            w_hi[my][s] = hi[c]
            if count[c] > 0:
                w_child[my][s] = first[c]
                w_count[my][s] = count[c]
            else:
                w_child[my][s] = build(c, depth + 1)
                w_count[my][s] = -1
        return my

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 100000))
    try:
        build(0, 1)
    finally:
        sys.setrecursionlimit(old_limit)
    max_stack = (width - 1) * max_depth + 1
    return (
        np.stack(w_lo),
        np.stack(w_hi),
        np.stack(w_child),
        np.stack(w_count),
        max_stack,
    )


def pack_bvh8_for_pallas(w_lo, w_hi, w_child, w_count):
    """Pack the wide-node table into the kernel's layouts.

    Returns (vmem [NR,64,128], smem [Nw,64]): the VMEM form puts node i at
    [i//128, :, i%128] with sublane field 8*s+k for child slot s =
    [lo.xyz, hi.xyz, child, count] (ints exact in f32 below 2^24); the
    SMEM form is the same 64 fields as a plain row per node, for the
    scalar-memory kernel variant (node fields become native scalar loads
    instead of a masked lane reduction + 64 vector extracts).

    (An aligned-tile-per-node VMEM layout — one [8,128] dynamic tile read
    instead of the masked lane reduction — was built and measured SLOWER
    on v5e: kernel 25.2 vs 21.3 ms/1M coherent rays.  Mosaic's lane-masked
    block reduce beats dynamic sublane tile reads, consistent with the
    round-2 leaf-fetch dead end.)"""
    n = w_lo.shape[0]
    width = w_lo.shape[1]
    assert width * 8 == 64
    if (np.abs(w_child) >= 2**24).any():
        raise ValueError("BVH8 child index exceeds f32-exact integer range")
    nr = -(-n // 128)
    flat = np.zeros((nr * 128, 64), np.float32)
    for s in range(width):
        flat[:n, 8 * s : 8 * s + 3] = w_lo[:, s]
        flat[:n, 8 * s + 3 : 8 * s + 6] = w_hi[:, s]
        flat[:n, 8 * s + 6] = w_child[:, s].astype(np.float32)
        flat[:n, 8 * s + 7] = w_count[:, s].astype(np.float32)
    return (
        flat.reshape(nr, 128, 64).transpose(0, 2, 1).copy(),
        flat[:n].copy(),
    )


def treetop_cut(bvh, max_cut: int = 32) -> np.ndarray:
    """Treetop cut: node ids of ~``max_cut`` disjoint subtrees covering the
    tree, chosen by greedily expanding the largest-surface-area internal
    node (max_cut=32 by default: it beat 16/64/96 in the v5e sweep; the
    sort key's entry field accommodates up to 8191 cut nodes).  The coherence sort uses the cut as its primary key: rays that
    enter the same cut subtree first share (most of) their traversal, so
    packets sorted by it descend with almost no union waste — measured 7x
    kernel time on coherent wavefronts and 2x on pathological incoherent
    ones vs an origin-Morton key alone (v5e, flying_unicorn).
    """
    # The coherence key packs the cut index into a 13-bit field (entry<<17,
    # _coherence_key); a bigger cut would silently clobber the miss bit.
    if max_cut > 8191:
        raise ValueError(f"max_cut {max_cut} exceeds the sort key's 13-bit field")
    lo, hi, skip, first, count = bvh
    cut = [0]
    while len(cut) < max_cut:
        best_j, best_area = -1, -1.0
        for j, i in enumerate(cut):
            if count[i] > 0:  # leaf
                continue
            area = _half_area(lo[i], hi[i])
            if area > best_area:
                best_j, best_area = j, float(area)
        if best_j < 0:
            break
        i = cut.pop(best_j)
        c1 = i + 1  # children of i in DFS pre-order: i+1 and its skip target
        cut.extend([c1, int(skip[c1])])
    return np.array(sorted(cut), np.int32)


BLOCK = 128  # rays per packet (one full vreg lane row)


def _morton12(p3, lo: Array, hi: Array) -> Array:
    """12-bit Morton code (4 bits/axis) of points p=(x,y,z) in box [lo,hi]."""

    def spread(v):  # 4 bits -> every 3rd bit
        v = (v | (v << 4)) & 0x0C3
        v = (v | (v << 2)) & 0x249
        return v

    q = [
        jnp.clip(
            (p3[k] - lo[k]) / jnp.maximum(hi[k] - lo[k], 1e-6) * 15.0, 0.0, 15.0
        ).astype(jnp.int32)
        for k in range(3)
    ]
    return spread(q[0]) | (spread(q[1]) << 1) | (spread(q[2]) << 2)


def _cut_entry(scene, ro: Array, rd: Array, eps: Epsilons):
    """(entry[N] i32, hit_any[N] bool): the treetop-cut subtree each ray
    ENTERS FIRST (nearest slab entry among the cut nodes).

    Written as a static loop over the ~32 cut nodes with [N]-shaped
    running bests: the one-shot [C,N,3] formulation materializes ~400 MB
    of slab intermediates through HBM per 1M rays and measured ~7 ms.
    The slab math runs per COMPONENT on [N] vectors — [N,3] intermediates
    put the 3-axis on the 128-wide lane dimension (3/128 vreg occupancy)
    and measured 9.1 ms for the whole key at 540k rays; the component form
    keeps every op lane-dense.  Ties resolve to the lowest cut index in
    both forms (strict <).
    """
    from raytracer_tpu.models import vecmath as vm

    clo, chi = scene.bvh_cut_lo, scene.bvh_cut_hi  # [C,3]
    o = vm.as3(ro)
    rd3 = vm.as3(rd)
    n = o[0].shape[0]
    inv = [
        1.0 / jnp.where(jnp.abs(rd3[k]) < 1e-12, jnp.float32(1e-12), rd3[k])
        for k in range(3)
    ]
    best_t = jnp.full((n,), jnp.inf)
    best_i = jnp.zeros((n,), jnp.int32)
    for c in range(clo.shape[0]):
        tnear = jnp.float32(-jnp.inf)
        tfar = jnp.float32(jnp.inf)
        for k in range(3):
            t0 = (clo[c, k] - o[k]) * inv[k]  # [N]
            t1 = (chi[c, k] - o[k]) * inv[k]
            tnear = jnp.maximum(tnear, jnp.minimum(t0, t1))
            tfar = jnp.minimum(tfar, jnp.maximum(t0, t1))
        hit = (tnear <= tfar) & (tfar > eps.tri_tmin)
        tn = jnp.where(hit, tnear, jnp.inf)
        take = tn < best_t
        best_t = jnp.where(take, tn, best_t)
        best_i = jnp.where(take, c, best_i)
    return best_i, best_t < jnp.inf


def _coherence_key(scene, ro: Array, rd: Array, eps: Epsilons) -> Array:
    """Traversal-coherence sort key [N] i32 (smaller sorts first).

    Primary: the treetop-cut subtree the ray ENTERS FIRST (nearest slab
    entry among the cut nodes — max_cut=32 by default, see ``treetop_cut``)
    — rays in a packet
    then genuinely share their descent, instead of merely being near each
    other in origin space.  Missing rays sort last (their packets terminate
    after one root test).  Secondary: direction octant; tertiary: 12-bit
    Morton code of the origin (ties within a subtree).

    On real TPUs the key is produced by a one-pass Pallas kernel
    (ops/pallas/key_kernel.py, bit-identical output): XLA compiles the
    static 32-node slab loop below into ~32 separate fusions that re-read
    the ray columns from HBM each time — measured ~5 ms/iteration of the
    streaming bounce loop at 540k lanes, the largest non-kernel cost.
    """
    import os

    from raytracer_tpu.models import vecmath as vm

    if (
        jax.default_backend() == "tpu"
        and not os.environ.get("RT_NO_PALLAS")
        and os.environ.get("RT_KEY_KERNEL", "1") == "1"
    ):
        from raytracer_tpu.ops.pallas.key_kernel import coherence_key_pallas

        return coherence_key_pallas(scene, ro, rd, eps)

    ro, rd = vm.as3(ro), vm.as3(rd)
    root_lo, root_hi = scene.bvh_lo[0], scene.bvh_hi[0]
    entry, hit_any = _cut_entry(scene, ro, rd, eps)
    miss = (~hit_any).astype(jnp.int32)
    octant = (
        (rd[0] < 0).astype(jnp.int32)
        + 2 * (rd[1] < 0).astype(jnp.int32)
        + 4 * (rd[2] < 0).astype(jnp.int32)
    )
    # Key order matters: origin Morton directly after the octant beats a
    # finer direction quantization (measured: inserting a 6-bit direction
    # Morton between them cost 30% on flying_unicorn — rays from the same
    # surface patch share traversal prefixes regardless of direction).
    return (miss << 30) | (entry << 17) | (octant << 13) | _morton12(
        ro, root_lo, root_hi
    )


def _coherence_order(scene, ro: Array, rd: Array, eps: Epsilons):
    """(order, inverse-order) permutations from ``_coherence_key``.

    (A stable counting-sort alternative keyed on the cut-entry bucket —
    ``RT_BUCKET_SORT`` / ``_bucket_order`` — lost its re-measurement twice
    and lives in git history only; see BENCHMARKS.md round-3 dead ends.)"""
    order = jnp.argsort(_coherence_key(scene, ro, rd, eps))
    # inverse[order[i]] = i via a SECOND argsort: a 1M-element argsort is
    # ~0.2ms on v5e while the equivalent unique-index scatter is ~14ms
    # (measured round 3 — scatters serialize; sort is the fast primitive).
    inverse = jnp.argsort(order).astype(jnp.int32)
    return order, inverse


def bvh_intersect(
    scene,
    ro: Array,
    rd: Array,
    eps: Epsilons,
    t_init: Array | None = None,
    any_hit: bool = False,
    resolved0: Array | None = None,
    presorted: bool = False,
):
    """Nearest BVH-triangle hit per ray via *packet traversal*.

    ``t_init`` (optional, [N]) upper-bounds the search per ray: nodes and
    triangles beyond it are pruned.  Callers seed it with the nearest
    sphere/plane hit (main rays) or the light distance (shadow rays) —
    hits at or beyond t_init may be dropped, which those callers don't
    care about.

    ``any_hit=True`` (shadow/visibility mode): a packet stops traversing
    once EVERY lane is *resolved* — it found some hit below its bound, or
    was already known occluded (``resolved0``) — which t wins no longer
    matters, only occluded-or-not.

    TPU-shaped control flow: rays are grouped into packets of BLOCK lanes;
    each packet shares ONE node pointer and walks the skip-link tree in
    lockstep over packets.  Per iteration a packet gathers its node's data
    (a handful of scalars — not per-lane gathers), slab-tests all BLOCK
    rays densely, and descends if ANY ray hit the box (union traversal),
    else jumps the skip link.  Leaf triangles are tested densely against
    the whole packet.

    Why this shape: a per-lane-pointer traversal makes every memory access
    a gather and costs max-over-all-lanes iterations; packets make the hot
    math dense [G, BLOCK] VPU work with per-packet scalar gathers, and
    camera/shadow wavefronts are spatially coherent (consecutive lanes =
    consecutive pixels) so packet unions stay small.  (The reference's
    octree instead early-outs on the first leaf hit per ray,
    src/geometry.rs:1237-1295 — a quirk, not reproduced: nearest wins.)

    Returns (t[N] f32 — INF on miss, tri_idx[N] i32 — GLOBAL triangle index
    into scene.tri_* arrays).
    """
    from raytracer_tpu.models import vecmath as vm

    if isinstance(ro, (tuple, list)):  # SoA callers; this XLA path wants
        ro, rd = vm.stack3(ro), vm.stack3(rd)  # [N,3] (CPU/oracle — cold)
    lo, hi = scene.bvh_lo, scene.bvh_hi
    skip, first, count = scene.bvh_skip, scene.bvh_first, scene.bvh_count
    n_nodes = lo.shape[0]
    base = scene.bvh_tri_start
    tri_a, tri_b, tri_c = scene.tri_a, scene.tri_b, scene.tri_c
    t_max = tri_a.shape[0] - 1

    n = ro.shape[0]
    if t_init is None:
        t_init = jnp.full((n,), INF)
    if resolved0 is None:
        resolved0 = jnp.zeros((n,), bool)
    # Coherence sort: root-box cull + (cut-subtree, octant, origin-Morton)
    # clustering keeps packet unions small for incoherent bounce wavefronts.
    # ``presorted`` callers (the streaming engine permutes its whole lane
    # state by the same key each iteration) skip the sort AND the unsort.
    if not presorted:
        order, _ = _coherence_order(scene, ro, rd, eps)
        ro = ro[order]
        rd = rd[order]
        t_init = t_init[order]
        resolved0 = resolved0[order]

    g = -(-n // BLOCK)
    pad = g * BLOCK - n
    if pad:
        # Padded lanes get degenerate rays (d=0 -> inv huge -> slab miss);
        # they count as resolved so they never hold a packet open.
        ro = jnp.concatenate([ro, jnp.zeros((pad, 3))], axis=0)
        rd = jnp.concatenate([rd, jnp.zeros((pad, 3))], axis=0)
        t_init = jnp.concatenate([t_init, jnp.zeros((pad,))], axis=0)
        resolved0 = jnp.concatenate([resolved0, jnp.ones((pad,), bool)], axis=0)
    rog = ro.reshape(g, BLOCK, 3)
    rdg = rd.reshape(g, BLOCK, 3)
    t_init_g = t_init.reshape(g, BLOCK)
    resolved0_g = resolved0.reshape(g, BLOCK)
    safe_d = jnp.where(jnp.abs(rdg) < 1e-12, jnp.float32(1e-12), rdg)
    inv_d = 1.0 / safe_d

    def cond(st):
        node, _, _ = st
        return jnp.any(node < n_nodes)

    def body(st):
        node, t_best, i_best = st
        live = node < n_nodes  # [G]
        nc = jnp.minimum(node, n_nodes - 1)

        # Per-packet node AABB (scalar per packet, broadcast over lanes).
        lo_g = lo[nc][:, None, :]  # [G,1,3]
        hi_g = hi[nc][:, None, :]
        t0 = (lo_g - rog) * inv_d  # [G,B,3]
        t1 = (hi_g - rog) * inv_d
        tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)  # [G,B]
        tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
        ray_hit = (tnear <= tfar) & (tfar > eps.tri_tmin) & (tnear < t_best)
        box_any = live & jnp.any(ray_hit, axis=-1)  # [G]

        # Leaf: test MAX_LEAF triangles densely against the whole packet.
        # Internal nodes have first=-1/count=0, so `j < count` masks all.
        leaf_first = first[nc]
        leaf_count = count[nc]
        for j in range(MAX_LEAF):
            idx = jnp.clip(base + leaf_first + j, 0, t_max)  # [G]
            t = _tri_hit_packet(
                rog, rdg, tri_a[idx], tri_b[idx], tri_c[idx], eps
            )  # [G,B]
            take = (box_any & (j < leaf_count))[:, None] & (t < t_best)
            t_best = jnp.where(take, t, t_best)
            i_best = jnp.where(take, idx[:, None], i_best)

        node = jnp.where(live, jnp.where(box_any, node + 1, skip[nc]), node)
        if any_hit:
            resolved = jnp.all(resolved0_g | (t_best < t_init_g), axis=-1)  # [G]
            node = jnp.where(resolved, n_nodes, node)
        return node, t_best, i_best

    _, t_best, i_best = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.zeros(g, jnp.int32),
            t_init_g,
            jnp.zeros((g, BLOCK), jnp.int32),
        ),
    )
    # Undo the coherence sort.  Lanes still at t_init found no closer hit.
    t_best = t_best.reshape(-1)[:n]
    i_best = i_best.reshape(-1)[:n]
    if presorted:
        return t_best, i_best
    # Unsort by sorting on the forward permutation (out[order[i]] = x[i]);
    # ~5x cheaper than a 1-D gather on v5e and needs no inverse.  Separate
    # sorts so XLA drops the i_best one when the caller discards it.
    _, t_best = jax.lax.sort((order, t_best), num_keys=1)
    _, i_best = jax.lax.sort((order, i_best), num_keys=1)
    return t_best, i_best


def _tri_hit_packet(ro, rd, a, b, c, eps: Epsilons):
    """Moller-Trumbore t [G,B]: per-packet triangle (a,b,c [G,3]) against
    per-packet ray blocks (ro, rd [G,B,3])."""

    def dot_bb(u, v):  # [G,B,3].[G,B,3] -> [G,B]
        return jnp.sum(u * v, axis=-1)

    a = a[:, None, :]
    e1 = b[:, None, :] - a
    e2 = c[:, None, :] - a
    ng = jnp.cross(e1, e2)  # [G,1,3]
    nn = jnp.maximum(jnp.sum(ng * ng, axis=-1), 1e-30)  # [G,1]
    n_unit = ng / jnp.sqrt(nn)[..., None]
    denom = dot_bb(rd, n_unit)  # [G,B]
    t = dot_bb(a - ro, n_unit) / denom
    p = ro + t[..., None] * rd
    u = dot_bb(p - a, jnp.cross(e2, ng)) / nn
    v = dot_bb(p - a, jnp.cross(ng, e1)) / nn
    ok = (
        (jnp.abs(denom) >= eps.tri_parallel)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > eps.tri_tmin)
    )
    return jnp.where(ok, t, INF)
