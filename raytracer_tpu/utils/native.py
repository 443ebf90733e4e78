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
