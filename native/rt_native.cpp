// Host-side native helpers for raytracer_tpu.
//
// The reference implements its whole runtime natively (Rust); here the TPU
// compute path is XLA/Pallas and these C++ routines cover the host-side hot
// loops:
//   - rt_obj_counts / rt_obj_parse: Wavefront OBJ parsing (reference
//     semantics: v/vn/f lines, first index of each face token, 1-based;
//     src/geometry.rs:777-833).  ~10x faster than the Python parser on the
//     37k-face unicorn.
//   - rt_pack_rows: RenderedPixels wire-message packing (6-byte header +
//     RGB, 60 px/message; src/server.rs:173-190), used by the progressive
//     1080p streaming path where Python-level per-message packing is the
//     bottleneck.
//
// Build: make -C native   (produces librt_native.so; loaded via ctypes)

#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

struct Cursor {
  const char* p;
  const char* end;
};

inline void skip_ws(Cursor& c) {
  while (c.p < c.end && (*c.p == ' ' || *c.p == '\t' || *c.p == '\r')) ++c.p;
}

inline void skip_line(Cursor& c) {
  while (c.p < c.end && *c.p != '\n') ++c.p;
  if (c.p < c.end) ++c.p;
}

// Parse a double token; returns false if none present.
inline bool take_double(Cursor& c, double* out) {
  skip_ws(c);
  if (c.p >= c.end || *c.p == '\n') return false;
  char* next = nullptr;
  *out = std::strtod(c.p, &next);
  if (next == c.p) return false;
  c.p = next;
  return true;
}

// Parse the leading integer of a face token ("a/b/c" -> a), skip the rest.
inline bool take_face_index(Cursor& c, long* out) {
  skip_ws(c);
  if (c.p >= c.end || *c.p == '\n') return false;
  char* next = nullptr;
  *out = std::strtol(c.p, &next, 10);
  if (next == c.p) return false;
  c.p = next;
  // skip the /b/c remainder of the token
  while (c.p < c.end && *c.p != ' ' && *c.p != '\t' && *c.p != '\n' && *c.p != '\r') ++c.p;
  return true;
}

inline bool line_is(Cursor& c, const char* tag, int len) {
  if (c.end - c.p < len + 1) return false;
  if (std::memcmp(c.p, tag, len) != 0) return false;
  char after = c.p[len];
  return after == ' ' || after == '\t';
}

}  // namespace

extern "C" {

// First pass: count v / vn / f lines.  counts = {n_verts, n_normals, n_faces}.
// Leading whitespace on a line is tolerated (the reference tokenizes with
// split_whitespace, so "  v 1 2 3" is a vertex line).
int rt_obj_counts(const char* text, long n, long* counts) {
  Cursor c{text, text + n};
  long nv = 0, nn = 0, nf = 0;
  while (c.p < c.end) {
    skip_ws(c);
    if (line_is(c, "vn", 2)) {
      ++nn;
    } else if (line_is(c, "v", 1)) {
      ++nv;
    } else if (line_is(c, "f", 1)) {
      ++nf;
    }
    skip_line(c);
  }
  counts[0] = nv;
  counts[1] = nn;
  counts[2] = nf;
  return 0;
}

// Second pass: fill preallocated arrays.  Returns 0 on success, negative on
// a malformed line (the reference errors on truncated v/vn/f lines).
// n_verts = total vertex count from the counts pass; face indices are
// validated against it (forward references are legal OBJ), matching the
// Python parser's MeshLoadError("face index out of range").
int rt_obj_parse(const char* text, long n, double* verts, double* norms, long* faces,
                 long n_verts) {
  Cursor c{text, text + n};
  long iv = 0, in = 0, if_ = 0;
  while (c.p < c.end) {
    skip_ws(c);
    if (line_is(c, "vn", 2)) {
      c.p += 2;
      for (int k = 0; k < 3; ++k)
        if (!take_double(c, &norms[in * 3 + k])) return -2;
      ++in;
    } else if (line_is(c, "v", 1)) {
      c.p += 1;
      for (int k = 0; k < 3; ++k)
        if (!take_double(c, &verts[iv * 3 + k])) return -1;
      ++iv;
    } else if (line_is(c, "f", 1)) {
      c.p += 1;
      for (int k = 0; k < 3; ++k) {
        long idx;
        if (!take_face_index(c, &idx)) return -3;
        if (idx < 1 || idx > n_verts) return -4;  // out-of-range face index
        faces[if_ * 3 + k] = idx - 1;  // 1-based -> 0-based
      }
      ++if_;
    }
    skip_line(c);
  }
  return 0;
}

// Pack R rows of RGB u8 into concatenated RenderedPixels messages:
//   [0]=0 [1]=n [2..4]=x u16le [4..6]=y u16le [6..6+3n)=RGB
// Returns total bytes written, or -1 on error.
long rt_pack_rows(const uint8_t* rgb, int n_rows, int width, const int* y_labels,
                  int pixels_per_msg, uint8_t* out) {
  if (pixels_per_msg <= 0 || pixels_per_msg > 255) return -1;
  long o = 0;
  for (int r = 0; r < n_rows; ++r) {
    const uint8_t* row = rgb + static_cast<long>(r) * width * 3;
    int y = y_labels[r];
    for (int x = 0; x < width; x += pixels_per_msg) {
      int npx = width - x < pixels_per_msg ? width - x : pixels_per_msg;
      out[o++] = 0;  // MSG_RENDERED_PIXELS
      out[o++] = static_cast<uint8_t>(npx);
      out[o++] = static_cast<uint8_t>(x & 0xff);
      out[o++] = static_cast<uint8_t>((x >> 8) & 0xff);
      out[o++] = static_cast<uint8_t>(y & 0xff);
      out[o++] = static_cast<uint8_t>((y >> 8) & 0xff);
      std::memcpy(out + o, row + static_cast<long>(x) * 3, static_cast<size_t>(npx) * 3);
      o += static_cast<long>(npx) * 3;
    }
  }
  return o;
}

}  // extern "C"
