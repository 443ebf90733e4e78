// Fair-1x CPU baseline: a multithreaded scalar path tracer implementing the
// SAME estimator as the TPU engines (NEE + Russian roulette, reference
// semantics per /root/reference/src/scene.rs:161-244 with the documented
// divergences of raytracer_tpu/render/integrator.py), in the reference's
// implementation style: native code, f64 geometry, per-pixel recursion,
// one thread per row band (src/server.rs:165-168).
//
// Purpose: an honest CPU Mrays/s denominator for bench.py's speedup claims
// — our earlier CPU fallback compiled the TPU-shaped packet traversal to
// one XLA CPU core, which is pathological and overstates the TPU speedup
// on mesh scenes (flagged in round 2's review).  This tracer traverses the
// same flattened skip-link BVH per ray with t-pruning, which is the
// scalar-CPU-appropriate algorithm (like the reference's per-ray octree,
// src/geometry.rs:1237-1295, minus its first-hit early-out quirk).
//
// Exposed via ctypes (raytracer_tpu/utils/native.py: cpu_render_band).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct V3 {
  double x, y, z;
};
static inline V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 operator*(V3 a, double s) { return {a.x * s, a.y * s, a.z * s}; }
static inline V3 mul(V3 a, V3 b) { return {a.x * b.x, a.y * b.y, a.z * b.z}; }
static inline double dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline V3 norm(V3 a) { return a * (1.0 / std::sqrt(dot(a, a))); }

// xorshift128+ per-thread RNG (counter-seeded; determinism is not part of
// the baseline contract — the reference uses unseeded thread_rng).
struct Rng {
  uint64_t s0, s1;
  explicit Rng(uint64_t seed) {
    s0 = seed ^ 0x9E3779B97F4A7C15ull;
    s1 = (seed << 1) | 1;
    for (int i = 0; i < 8; i++) next();
  }
  uint64_t next() {
    uint64_t a = s0, b = s1;
    s0 = b;
    a ^= a << 23;
    s1 = a ^ b ^ (a >> 18) ^ (b >> 5);
    return s1 + b;
  }
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
};

struct Scene {
  const double* sph;  // [S][5] pos3, r, obj
  int n_sph;
  const double* pln;  // [P][7] pos3, n3, obj
  int n_pln;
  const double* tri;  // [T][10] a3, b3, c3, obj
  int n_tri;
  // flattened skip-link BVH over tri[tri_start..] (f32 boxes from the scene)
  const float* bvh_lo;
  const float* bvh_hi;
  const int* bvh_skip;
  const int* bvh_first;
  const int* bvh_count;
  int n_nodes;
  int tri_start;
  const double* mats;  // [O][13] type, cd3, cs3, kd, ks, power, em3
  int n_obj;
  V3 cam_pos, cam_dir;
  V3 light_pos;
  double light_r;
  int light_obj;
};

constexpr double kInf = 1e30;

struct Hit {
  double t = kInf;
  V3 pos{}, n{};
  int obj = -1;
};

static bool sphere_t(const double* s, V3 ro, V3 rd, double* t_out) {
  V3 c{s[0], s[1], s[2]};
  double r = s[3];
  V3 op = c - ro;
  double b = dot(op, rd);
  double det = b * b - dot(op, op) + r * r;
  if (det < 0) return false;
  double sq = std::sqrt(det);
  double t = b - sq;
  if (t <= 1e-4) {
    t = b + sq;
    if (t <= 1e-4) return false;
  }
  *t_out = t;
  return true;
}

static bool tri_t(const double* tr, V3 ro, V3 rd, double* t_out) {
  V3 a{tr[0], tr[1], tr[2]}, b{tr[3], tr[4], tr[5]}, c{tr[6], tr[7], tr[8]};
  V3 e1 = b - a, e2 = c - a;
  V3 ng = cross(e1, e2);
  double nn = dot(ng, ng);
  if (nn < 1e-30) return false;
  V3 nu = ng * (1.0 / std::sqrt(nn));
  double dn = dot(rd, nu);
  if (std::fabs(dn) < 1e-4) return false;
  double t = dot(a - ro, nu) / dn;
  if (t <= 1e-4) return false;
  V3 p = ro + rd * t;
  double u = dot(p - a, cross(e2, ng)) / nn;
  double v = dot(p - a, cross(ng, e1)) / nn;
  if (u < 0 || u > 1 || v < 0 || u + v > 1) return false;
  *t_out = t;
  return true;
}

// Nearest hit below t_max (t_max=kInf for the full search).
static Hit trace(const Scene& sc, V3 ro, V3 rd, double t_max = kInf) {
  Hit h;
  h.t = t_max;
  bool found = false;
  for (int i = 0; i < sc.n_sph; i++) {
    double t;
    if (sphere_t(sc.sph + 5 * i, ro, rd, &t) && t < h.t) {
      h.t = t;
      h.obj = (int)sc.sph[5 * i + 4];
      V3 c{sc.sph[5 * i], sc.sph[5 * i + 1], sc.sph[5 * i + 2]};
      h.pos = ro + rd * t;
      h.n = norm(h.pos - c);
      if (dot(h.n, rd) > 0) h.n = h.n * -1.0;
      found = true;
    }
  }
  for (int i = 0; i < sc.n_pln; i++) {
    const double* p = sc.pln + 7 * i;
    V3 pp{p[0], p[1], p[2]}, pn{p[3], p[4], p[5]};
    double dn = dot(rd, pn);
    if (std::fabs(dn) < 1e-4) continue;
    double t = dot(pp - ro, pn) / dn;
    if (t < 0 || t >= h.t) continue;
    h.t = t;
    h.obj = (int)p[6];
    h.n = dn <= 0 ? pn : pn * -1.0;
    h.pos = ro + rd * t + h.n * 1e-5;
    found = true;
  }
  // brute-force triangles outside the BVH (cube/prism objects)
  for (int i = 0; i < sc.tri_start; i++) {
    double t;
    if (tri_t(sc.tri + 10 * i, ro, rd, &t) && t < h.t) {
      h.t = t;
      h.obj = (int)sc.tri[10 * i + 9];
      const double* tr = sc.tri + 10 * i;
      V3 a{tr[0], tr[1], tr[2]}, b{tr[3], tr[4], tr[5]}, c{tr[6], tr[7], tr[8]};
      V3 nu = norm(cross(b - a, c - a));
      h.n = dot(rd, nu) <= 0 ? nu : nu * -1.0;
      h.pos = ro + rd * t + h.n * 1e-5;
      found = true;
    }
  }
  // skip-link BVH over the mesh tail: per-ray traversal with t-pruning
  if (sc.n_nodes > 1) {
    V3 inv{1.0 / (std::fabs(rd.x) < 1e-12 ? 1e-12 : rd.x),
           1.0 / (std::fabs(rd.y) < 1e-12 ? 1e-12 : rd.y),
           1.0 / (std::fabs(rd.z) < 1e-12 ? 1e-12 : rd.z)};
    int node = 0;
    while (node < sc.n_nodes) {
      const float* lo = sc.bvh_lo + 3 * node;
      const float* hi = sc.bvh_hi + 3 * node;
      double t0x = (lo[0] - ro.x) * inv.x, t1x = (hi[0] - ro.x) * inv.x;
      double t0y = (lo[1] - ro.y) * inv.y, t1y = (hi[1] - ro.y) * inv.y;
      double t0z = (lo[2] - ro.z) * inv.z, t1z = (hi[2] - ro.z) * inv.z;
      double tn = std::fmax(std::fmax(std::fmin(t0x, t1x), std::fmin(t0y, t1y)),
                            std::fmin(t0z, t1z));
      double tf = std::fmin(std::fmin(std::fmax(t0x, t1x), std::fmax(t0y, t1y)),
                            std::fmax(t0z, t1z));
      bool box_hit = tn <= tf && tf > 1e-4 && tn < h.t;
      if (box_hit && sc.bvh_count[node] > 0) {
        int first = sc.tri_start + sc.bvh_first[node];
        for (int j = 0; j < sc.bvh_count[node]; j++) {
          double t;
          const double* tr = sc.tri + 10 * (first + j);
          if (tri_t(tr, ro, rd, &t) && t < h.t) {
            h.t = t;
            h.obj = (int)tr[9];
            V3 a{tr[0], tr[1], tr[2]}, b{tr[3], tr[4], tr[5]},
                c{tr[6], tr[7], tr[8]};
            V3 nu = norm(cross(b - a, c - a));
            h.n = dot(rd, nu) <= 0 ? nu : nu * -1.0;
            h.pos = ro + rd * t + h.n * 1e-5;
            found = true;
          }
        }
      }
      node = box_hit ? node + 1 : sc.bvh_skip[node];
    }
  }
  if (!found) h.obj = -1;
  return h;
}

static bool visible(const Scene& sc, V3 x, V3 y, uint64_t* rays) {
  V3 d = y - x;
  double dist = std::sqrt(dot(d, d));
  (*rays)++;
  Hit h = trace(sc, x, d * (1.0 / dist));
  return h.obj < 0 || h.t + 1e-3 >= dist;
}

static V3 sample_light(const Scene& sc, Rng& rng, V3* ny, double* pdf) {
  double z = 2.0 * rng.uniform() - 1.0;
  double r = std::sqrt(std::fmax(1.0 - z * z, 0.0));
  double phi = 2.0 * M_PI * rng.uniform();
  *ny = {r * std::cos(phi), r * std::sin(phi), z};
  *pdf = 1.0 / (4.0 * M_PI * sc.light_r * sc.light_r);
  return sc.light_pos + *ny * sc.light_r;
}

constexpr int kMaxDepth = 24;  // RenderConfig.max_depth

// Orthonormal tangent frame around w (reference create_local_coord,
// src/scene.rs:112-123: helper axis Y if |w.x|>0.1 else X).
static void frame(V3 w, V3* u, V3* v) {
  V3 a = std::fabs(w.x) > 0.1 ? V3{0, 1, 0} : V3{1, 0, 0};
  *u = norm(cross(a, w));
  *v = cross(w, *u);
}

// BRDF::eval for non-specular lanes (src/scene.rs:33,:41-52): diffuse
// kd*cd/pi; Phong adds ks*cs*(p+2)/(2pi)*max(o.reflect(i,n),0)^p.
static V3 eval_nonspec(const double* m, V3 n, V3 o, V3 i) {
  V3 cd{m[1], m[2], m[3]};
  V3 f = cd * (m[7] / M_PI);
  if ((int)m[0] == 2) {
    V3 refl = n * (2.0 * dot(i, n)) - i;
    double cr = std::fmax(dot(o, refl), 0.0);
    double p = m[9];
    double lobe = p > 0.0 ? std::pow(cr, p) : 0.0;
    V3 cs{m[4], m[5], m[6]};
    f = f + cs * (m[8] * (p + 2.0) / (2.0 * M_PI) * lobe);
  }
  return f;
}

// BRDF::sample_incoming for diffuse/Phong (src/scene.rs:56-95, with the
// frame bug fixed like the TPU default fix_phong_frame=True: the Phong
// cosine lobe rotates around n, the power lobe around the mirror axis).
// Returns false on a dead Phong sample (u >= kd+ks, src/scene.rs:92-95).
static bool sample_bsdf(const double* m, V3 n, V3 o, Rng& rng, V3* i_out,
                        double* pdf_out) {
  if ((int)m[0] == 2) {
    double u1 = rng.uniform();
    double kd = m[7], ks = m[8], p = m[9];
    if (u1 < kd) {
      double u2 = rng.uniform(), u3 = rng.uniform();
      double z = std::sqrt(u2);
      double r = std::sqrt(std::fmax(1.0 - u2, 0.0));
      double phi = 2.0 * M_PI * u3;
      V3 u, v;
      frame(n, &u, &v);
      V3 i = u * (r * std::cos(phi)) + v * (r * std::sin(phi)) + n * z;
      *i_out = i;
      *pdf_out = std::fmax(dot(n, i), 0.0) / M_PI;
      return true;
    }
    if (u1 < kd + ks) {
      double u2 = rng.uniform(), u3 = rng.uniform();
      double z = std::pow(u2, 1.0 / (p + 1.0));
      double r = std::sqrt(std::fmax(1.0 - std::pow(u2, 2.0 / (p + 1.0)), 0.0));
      double phi = 2.0 * M_PI * u3;
      V3 axis = norm(n * (2.0 * dot(o, n)) - o);
      V3 u, v;
      frame(axis, &u, &v);
      *i_out = u * (r * std::cos(phi)) + v * (r * std::sin(phi)) + axis * z;
      *pdf_out = (p + 1.0) / (2.0 * M_PI) * std::pow(z, p);
      return true;
    }
    return false;  // dead sample: i=0, weight 0 kills the path
  }
  // diffuse: cosine-weighted hemisphere (create_local_coord form)
  double z = std::sqrt(rng.uniform());
  double rr = std::sqrt(std::fmax(1.0 - z * z, 0.0));
  double phi = 2.0 * M_PI * rng.uniform();
  V3 u, v;
  frame(n, &u, &v);
  V3 i = norm(u * (rr * std::cos(phi)) + v * (rr * std::sin(phi)) + n * z);
  *i_out = i;
  *pdf_out = dot(n, i) / M_PI;
  return true;
}

static V3 reflected(const Scene& sc, V3 x, V3 n, V3 o, int obj, int depth,
                    Rng& rng, uint64_t* rays) {
  if (depth > kMaxDepth) return {0, 0, 0};
  const double* m = sc.mats + 13 * obj;
  double p = depth <= 5 ? 1.0 : 0.9;
  int type = (int)m[0];
  if (type == 1) {  // specular mirror
    if (rng.uniform() >= p) return {0, 0, 0};
    V3 i = n * (2.0 * dot(o, n)) - o;
    (*rays)++;
    Hit h = trace(sc, x, i);
    if (h.obj < 0) return {0, 0, 0};
    const double* hm = sc.mats + 13 * h.obj;
    V3 em{hm[10], hm[11], hm[12]};
    V3 ks{m[4], m[5], m[6]};
    V3 nxt = reflected(sc, h.pos, h.n, i * -1.0, h.obj, depth + 1, rng, rays);
    return (em + mul(nxt, ks)) * (1.0 / p);
  }
  // non-specular (diffuse type 0 / Phong type 2): NEE + BSDF continuation.
  V3 ny;
  double pdf;
  V3 y = sample_light(sc, rng, &ny, &pdf);
  V3 toy = y - x;
  double r2 = dot(toy, toy);
  double dist = std::sqrt(r2);
  V3 wi = toy * (1.0 / dist);
  const double* lm = sc.mats + 13 * sc.light_obj;
  V3 le{lm[10], lm[11], lm[12]};
  double vis = visible(sc, x, y, rays) ? 1.0 : 0.0;
  V3 f_d = eval_nonspec(m, n, o, wi);
  V3 rad = mul(le, f_d) * (vis * dot(n, wi) * dot(ny, wi * -1.0) / (r2 * pdf));
  if (rng.uniform() < p) {
    V3 i;
    double pdf_b;
    if (sample_bsdf(m, n, o, rng, &i, &pdf_b) && pdf_b > 1e-12) {
      (*rays)++;
      Hit h = trace(sc, x, i);
      if (h.obj >= 0) {
        V3 nxt =
            reflected(sc, h.pos, h.n, i * -1.0, h.obj, depth + 1, rng, rays);
        rad = rad + mul(nxt, eval_nonspec(m, n, o, i)) * (dot(n, i) / (pdf_b * p));
      }
    }
  }
  return rad;
}

static V3 received(const Scene& sc, V3 ro, V3 rd, Rng& rng, uint64_t* rays) {
  (*rays)++;
  Hit h = trace(sc, ro, rd);
  if (h.obj < 0) return {0, 0, 0};
  const double* m = sc.mats + 13 * h.obj;
  V3 em{m[10], m[11], m[12]};
  return em + reflected(sc, h.pos, h.n, rd * -1.0, h.obj, 1, rng, rays);
}

static double tent(double u) {
  double r = 2.0 * u;
  return r < 1.0 ? std::sqrt(r) - 1.0 : 1.0 - std::sqrt(std::fmax(2.0 - r, 0.0));
}

}  // namespace

extern "C" {

// Render rows [y0, y0+rows) of a width x height frame at `spp` samples per
// pixel (reference pipeline: 2x2 subpixels, spp/4 each, tent jitter,
// per-subpixel clamp + x0.25 average).  Writes per-pixel RGB (pre-gamma,
// [0,1]) to out[rows*width*3] in render-space row order.  Returns the
// number of rays traced (camera + shadow + continuation).
long long rt_cpu_render_band(
    const double* sph, int n_sph, const double* pln, int n_pln,
    const double* tri, int n_tri, const float* bvh_lo, const float* bvh_hi,
    const int* bvh_skip, const int* bvh_first, const int* bvh_count,
    int n_nodes, int tri_start, const double* mats, int n_obj,
    const double* cam, const double* light, int light_obj, int width,
    int height, int y0, int rows, int spp, unsigned long long seed,
    int n_threads, double* out) {
  Scene sc;
  sc.sph = sph; sc.n_sph = n_sph;
  sc.pln = pln; sc.n_pln = n_pln;
  sc.tri = tri; sc.n_tri = n_tri;
  sc.bvh_lo = bvh_lo; sc.bvh_hi = bvh_hi; sc.bvh_skip = bvh_skip;
  sc.bvh_first = bvh_first; sc.bvh_count = bvh_count;
  sc.n_nodes = n_nodes; sc.tri_start = tri_start;
  sc.mats = mats; sc.n_obj = n_obj;
  sc.cam_pos = {cam[0], cam[1], cam[2]};
  sc.cam_dir = {cam[3], cam[4], cam[5]};
  sc.light_pos = {light[0], light[1], light[2]};
  sc.light_r = light[3];
  sc.light_obj = light_obj;

  double w = width, h = height;
  V3 cx{0.5135 * w / h, 0.0, 0.0};
  V3 cy = norm(cross(cx, sc.cam_dir)) * 0.5135;
  int num = spp / 4;

  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads <= 0) n_threads = 1;
  std::atomic<long long> total_rays{0};

  auto work = [&](int t) {
    uint64_t rays = 0;
    for (int ry = t; ry < rows; ry += n_threads) {
      double py = y0 + ry;
      for (int px = 0; px < width; px++) {
        Rng rng(seed ^ (uint64_t)(y0 + ry) * 600000007ull ^ (uint64_t)px * 97ull);
        V3 pixel{0, 0, 0};
        for (int s = 0; s < 4; s++) {
          int sx = s % 2, sy = s / 2;
          V3 acc{0, 0, 0};
          for (int k = 0; k < num; k++) {
            double dx = tent(rng.uniform());
            double dy = tent(rng.uniform());
            V3 d = cx * (((sx + 0.5 + dx) / 2.0 + px) / w - 0.5) +
                   cy * (((sy + 0.5 + dy) / 2.0 + py) / h - 0.5) + sc.cam_dir;
            acc = acc + received(sc, sc.cam_pos, norm(d), rng, &rays);
          }
          double inv = num > 0 ? 1.0 / num : 0.0;
          pixel.x += std::fmin(std::fmax(acc.x * inv, 0.0), 1.0);
          pixel.y += std::fmin(std::fmax(acc.y * inv, 0.0), 1.0);
          pixel.z += std::fmin(std::fmax(acc.z * inv, 0.0), 1.0);
        }
        double* o = out + 3 * ((size_t)ry * width + px);
        o[0] = pixel.x * 0.25;
        o[1] = pixel.y * 0.25;
        o[2] = pixel.z * 0.25;
      }
    }
    total_rays += (long long)rays;
  };

  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; t++) threads.emplace_back(work, t);
  for (auto& th : threads) th.join();
  return total_rays.load();
}

}  // extern "C"
