"""ctypes bindings to the C++ host-side helpers (native/librt_native.so).

The reference's runtime is native (Rust) end to end; on TPU the compute
path is XLA/Pallas, but the hot *host-side* loops — OBJ parsing and wire
packing for multi-megapixel progressive streams — are C++ here
(native/rt_native.cpp), loaded via ctypes (no pybind11 in this image).

All entry points return None when the shared library is unavailable so
pure-Python fallbacks keep everything working (e.g. in fresh checkouts
before ``make -C native``).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "..", "native", "librt_native.so")
    try:
        lib = ctypes.CDLL(os.path.abspath(path))
    except OSError:
        return None
    # int rt_parse_obj(const char* text, long n, double* verts, double* norms,
    #                  long* faces, long* counts)  -- two-pass: counts first
    lib.rt_obj_counts.restype = ctypes.c_int
    lib.rt_obj_counts.argtypes = [ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_long)]
    lib.rt_obj_parse.restype = ctypes.c_int
    lib.rt_obj_parse.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_long),
        ctypes.c_long,  # n_verts, for face-index bounds checking
    ]
    # long rt_pack_rows(const uint8_t* rgb, int n_rows, int width,
    #                   const int* y_labels, int pixels_per_msg, uint8_t* out)
    lib.rt_pack_rows.restype = ctypes.c_long
    lib.rt_pack_rows.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    if hasattr(lib, "rt_cpu_render_band"):  # older .so builds lack it
        d = ctypes.POINTER(ctypes.c_double)
        f = ctypes.POINTER(ctypes.c_float)
        i = ctypes.POINTER(ctypes.c_int)
        lib.rt_cpu_render_band.restype = ctypes.c_longlong
        lib.rt_cpu_render_band.argtypes = [
            d, ctypes.c_int,  # spheres
            d, ctypes.c_int,  # planes
            d, ctypes.c_int,  # triangles
            f, f, i, i, i, ctypes.c_int, ctypes.c_int,  # bvh
            d, ctypes.c_int,  # materials
            d,  # camera
            d, ctypes.c_int,  # light
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_ulonglong, ctypes.c_int,
            d,  # out
        ]
    _LIB = lib
    return _LIB


def parse_obj_file(path: str):
    """C++ OBJ parse -> (verts f64[V,3], normals f64[Vn,3], faces i64[F,3]) or None."""
    lib = _lib()
    if lib is None:
        return None
    with open(path, "rb") as fh:
        data = fh.read()
    counts = (ctypes.c_long * 3)()
    if lib.rt_obj_counts(data, len(data), counts) != 0:
        return None
    nv, nn, nf = counts[0], counts[1], counts[2]
    verts = np.empty((nv, 3), np.float64)
    norms = np.empty((nn, 3), np.float64)
    faces = np.empty((nf, 3), np.int64)
    rc = lib.rt_obj_parse(
        data,
        len(data),
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        norms.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        nv,
    )
    if rc != 0:
        from raytracer_tpu.models.obj import MeshLoadError

        raise MeshLoadError(f"native OBJ parse failed (code {rc}) for {path}")
    return verts, norms, faces


def pack_rows_blob(rgb: np.ndarray, y_labels: np.ndarray, pixels_per_msg: int = 60):
    """Pack rows [R,W,3] u8 into one concatenated wire blob (bytes) or None.

    Messages are emitted row-major, 60 pixels per message, with the 6-byte
    header (type, n, x u16le, y u16le) per message.
    """
    lib = _lib()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, np.uint8)
    n_rows, width, _ = rgb.shape
    y_labels = np.ascontiguousarray(y_labels, np.int32)
    msgs_per_row = (width + pixels_per_msg - 1) // pixels_per_msg
    out_size = n_rows * (msgs_per_row * 6 + width * 3)
    out = np.empty(out_size, np.uint8)
    n = lib.rt_pack_rows(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_rows,
        width,
        y_labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        pixels_per_msg,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if n < 0:
        return None
    return out[:n].tobytes()


def cpu_render_band(
    scene,
    width: int,
    height: int,
    y0: int,
    rows: int,
    spp: int,
    seed: int = 0,
    n_threads: int = 0,
    brute_force: bool = False,
):
    """Reference-style native CPU render of a row band (native/cpu_tracer.cpp).

    ``brute_force=True`` disables the BVH and linear-scans every triangle
    (slow; used by tests to validate the native BVH: same seed + same
    estimator must give the identical image).

    Same estimator as the TPU engines, implemented like the reference:
    scalar f64 per-pixel recursion, skip-link BVH per ray, one thread per
    row stripe.  Serves as the FAIR 1x baseline for bench.py's speedups —
    the reference IS multithreaded native CPU code.

    Returns (pixel RGB f64 [rows, width, 3] pre-gamma in [0,1], rays
    traced) or None when the shared library is unavailable.  All three
    BRDFs (diffuse / specular / Phong) are supported; mesh lights are not
    (no shipped scene has one).
    """
    lib = _lib()
    if lib is None or not hasattr(lib, "rt_cpu_render_band"):
        return None
    if scene.light_type != 0:
        return None
    import ctypes as ct

    sn = np.asarray

    def dptr(a):
        return np.ascontiguousarray(a, np.float64).ctypes.data_as(
            ct.POINTER(ct.c_double)
        )

    ns, npl = scene.n_spheres, scene.n_planes
    sph = np.concatenate(
        [sn(scene.sph_pos)[:ns], sn(scene.sph_r)[:ns, None],
         sn(scene.sph_obj)[:ns, None].astype(np.float64)], axis=1,
    ) if ns else np.zeros((0, 5))
    pln = np.concatenate(
        [sn(scene.pln_pos)[:npl], sn(scene.pln_n)[:npl],
         sn(scene.pln_obj)[:npl, None].astype(np.float64)], axis=1,
    ) if npl else np.zeros((0, 7))
    tri = np.concatenate(
        [sn(scene.tri_a), sn(scene.tri_b), sn(scene.tri_c),
         sn(scene.tri_obj)[:, None].astype(np.float64)], axis=1,
    )
    mats = np.concatenate(
        [sn(scene.brdf_type)[:, None].astype(np.float64), sn(scene.c_d),
         sn(scene.c_s), sn(scene.k_d)[:, None], sn(scene.k_s)[:, None],
         sn(scene.phong_power)[:, None], sn(scene.obj_emitted)], axis=1,
    )
    cam = np.concatenate([sn(scene.cam_pos), sn(scene.cam_dir)]).astype(np.float64)
    light = np.concatenate(
        [sn(scene.light_sph_pos), sn(scene.light_sph_r)[None]]
    ).astype(np.float64)
    bvh_lo = np.ascontiguousarray(sn(scene.bvh_lo), np.float32)
    bvh_hi = np.ascontiguousarray(sn(scene.bvh_hi), np.float32)
    bvh_skip = np.ascontiguousarray(sn(scene.bvh_skip), np.int32)
    bvh_first = np.ascontiguousarray(sn(scene.bvh_first), np.int32)
    bvh_count = np.ascontiguousarray(sn(scene.bvh_count), np.int32)
    n_nodes = bvh_lo.shape[0] if scene.use_bvh else 0
    tri_start = scene.bvh_tri_start
    if brute_force:
        n_nodes = 0
        tri_start = tri.shape[0]  # scan every triangle

    # keep the marshalled arrays alive for the duration of the call
    sph_c, pln_c, tri_c, mats_c = (
        np.ascontiguousarray(a, np.float64) for a in (sph, pln, tri, mats)
    )
    out = np.zeros((rows, width, 3), np.float64)

    def iptr(a):
        return a.ctypes.data_as(ct.POINTER(ct.c_int))

    def fptr(a):
        return a.ctypes.data_as(ct.POINTER(ct.c_float))

    rays = lib.rt_cpu_render_band(
        dptr(sph_c), ns, dptr(pln_c), npl, dptr(tri_c), tri_c.shape[0],
        fptr(bvh_lo), fptr(bvh_hi), iptr(bvh_skip), iptr(bvh_first),
        iptr(bvh_count), n_nodes, tri_start,
        dptr(mats_c), scene.n_objects, dptr(cam), dptr(light),
        scene.light_idx, width, height, y0, rows, spp, seed, n_threads,
        out.ctypes.data_as(ct.POINTER(ct.c_double)),
    )
    return out, int(rays)


def pack_row(y: int, rgb_row: np.ndarray, pixels_per_msg: int = 60):
    """Split one row into per-message byte strings, or None without the lib."""
    blob = pack_rows_blob(rgb_row[None, :, :], np.asarray([y]), pixels_per_msg)
    if blob is None:
        return None
    out = []
    off = 0
    while off < len(blob):
        n = blob[off + 1]
        end = off + 6 + 3 * n
        out.append(blob[off:end])
        off = end
    return out
