// Host-side HEM Gaussian-mixture clustering, C ABI.
//
// Native counterpart of ops/hem.py (the TPU path): same one-level semantics
// as the reference extension (/root/reference/src/cpp_ext/src/mixture.cpp),
// built from scratch as a flat-array C API so Python binds via ctypes (no
// pybind11 in this image) with zero-copy numpy buffers — unlike the
// reference, which marshals full SoA through Python lists both ways
// (SURVEY.md §5.8 calls that out as a perf sin).
//
// Design differences from the reference implementation:
//   * SoA float buffers in/out, no per-component objects;
//   * spatial index: flat uniform grid with bucket vectors (single pass),
//     keyed by floored cell coords over the AABB;
//   * parent flags are an *input* (callers own the RNG; deterministic tests);
//   * exact unbounded radius search (the TPU path uses fixed-K candidates,
//     so this also serves as the oracle for truncation effects);
//   * OpenMP over parents for child selection AND accumulation.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC hem.cpp -o libgsrhem.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

// libgomp's barriers/team docking are futex-based and invisible to TSan, so
// a TSan build reports false races between a worker's writes inside a
// `parallel for` and the main thread's reads after the implicit barrier.
// These annotations restate exactly the OpenMP happens-before edges (region
// entry: main -> every worker; region exit: every worker -> main) and
// nothing more — races BETWEEN iterations remain fully detectable.
// (scripts/native_sanitize.sh runs this file under -fsanitize=thread.)
#if defined(__SANITIZE_THREAD__)
#include <sanitizer/tsan_interface.h>
namespace {
char gsr_tsan_fence;
}
#define GSR_TSAN_RELEASE() __tsan_release(&gsr_tsan_fence)
#define GSR_TSAN_ACQUIRE() __tsan_acquire(&gsr_tsan_fence)
#else
#define GSR_TSAN_RELEASE() ((void)0)
#define GSR_TSAN_ACQUIRE() ((void)0)
#endif

namespace {

struct V3 {
  float x, y, z;
};

inline V3 sub(const V3& a, const V3& b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline float dot(const V3& a, const V3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline float norm(const V3& a) { return std::sqrt(dot(a, a)); }

// Packed symmetric 3x3: [xx, xy, xz, yy, yz, zz].
struct S6 {
  float a, b, c, d, e, f;
};

inline float det6(const S6& m) {
  return m.a * (m.d * m.f - m.e * m.e) - m.b * (m.b * m.f - m.c * m.e) +
         m.c * (m.b * m.e - m.c * m.d);
}

inline S6 inv6(const S6& m) {
  float det = det6(m);
  if (std::fabs(det) < 1e-30f) det = (det < 0 ? -1e-30f : 1e-30f);
  float id = 1.0f / det;
  return {(m.d * m.f - m.e * m.e) * id, (m.c * m.e - m.b * m.f) * id,
          (m.b * m.e - m.c * m.d) * id, (m.a * m.f - m.c * m.c) * id,
          (m.b * m.c - m.a * m.e) * id, (m.a * m.d - m.b * m.b) * id};
}

inline float mahalanobis(const V3& d, const S6& inv) {
  return inv.a * d.x * d.x + inv.d * d.y * d.y + inv.f * d.z * d.z +
         2.0f * (inv.b * d.x * d.y + inv.c * d.x * d.z + inv.e * d.y * d.z);
}

inline float trace_prod(const S6& p, const S6& c) {
  return p.a * c.a + p.d * c.d + p.f * c.f +
         2.0f * (p.b * c.b + p.c * c.c + p.e * c.e);
}

// Largest eigenvalue of a packed symmetric 3x3 via the trigonometric cubic.
float max_eigenvalue(const S6& m) {
  float p1 = m.b * m.b + m.c * m.c + m.e * m.e;
  float q = (m.a + m.d + m.f) / 3.0f;
  if (p1 < 1e-20f) return std::fmax(std::fmax(m.a, m.d), m.f);
  float aa = m.a - q, dd = m.d - q, ff = m.f - q;
  float p2 = aa * aa + dd * dd + ff * ff + 2.0f * p1;
  float p = std::sqrt(p2 / 6.0f);
  float ip = 1.0f / p;
  // B = (M - qI) / p ; r = det(B)/2
  S6 B = {aa * ip, m.b * ip, m.c * ip, dd * ip, m.e * ip, ff * ip};
  float r = det6(B) * 0.5f;
  r = std::fmin(1.0f, std::fmax(-1.0f, r));
  float phi = std::acos(r) / 3.0f;
  return q + 2.0f * p * std::cos(phi);
}

struct Grid {
  float cell;
  float ox, oy, oz;
  int nx, ny, nz;
  std::vector<std::vector<int>> buckets;

  int cell_of(float x, float y, float z) const {
    int ix = std::min(std::max(int((x - ox) / cell), 0), nx - 1);
    int iy = std::min(std::max(int((y - oy) / cell), 0), ny - 1);
    int iz = std::min(std::max(int((z - oz) / cell), 0), nz - 1);
    return (ix * ny + iy) * nz + iz;
  }

  void build(const float* mean, int n, float max_radius) {
    float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
    for (int i = 0; i < n; ++i) {
      for (int k = 0; k < 3; ++k) {
        lo[k] = std::fmin(lo[k], mean[3 * i + k]);
        hi[k] = std::fmax(hi[k], mean[3 * i + k]);
      }
    }
    cell = std::fmax(max_radius, 1e-6f);
    ox = lo[0]; oy = lo[1]; oz = lo[2];
    nx = std::max(1, int((hi[0] - lo[0]) / cell) + 1);
    ny = std::max(1, int((hi[1] - lo[1]) / cell) + 1);
    nz = std::max(1, int((hi[2] - lo[2]) / cell) + 1);
    // Cap the grid to bound memory on degenerate inputs.
    const long max_cells = 1 << 24;
    while (long(nx) * ny * nz > max_cells) {
      cell *= 2.0f;
      nx = std::max(1, (nx + 1) / 2);
      ny = std::max(1, (ny + 1) / 2);
      nz = std::max(1, (nz + 1) / 2);
    }
    buckets.assign(size_t(nx) * ny * nz, {});
    for (int i = 0; i < n; ++i)
      buckets[cell_of(mean[3 * i], mean[3 * i + 1], mean[3 * i + 2])].push_back(i);
  }

  template <typename F>
  void for_neighbors(const V3& p, float radius, F&& fn) const {
    int ix0 = std::max(int((p.x - radius - ox) / cell), 0);
    int iy0 = std::max(int((p.y - radius - oy) / cell), 0);
    int iz0 = std::max(int((p.z - radius - oz) / cell), 0);
    int ix1 = std::min(int((p.x + radius - ox) / cell), nx - 1);
    int iy1 = std::min(int((p.y + radius - oy) / cell), ny - 1);
    int iz1 = std::min(int((p.z + radius - oz) / cell), nz - 1);
    float r2 = radius * radius;
    for (int ix = ix0; ix <= ix1; ++ix)
      for (int iy = iy0; iy <= iy1; ++iy)
        for (int iz = iz0; iz <= iz1; ++iz)
          for (int j : buckets[(size_t(ix) * ny + iy) * nz + iz]) fn(j, r2);
  }
};

}  // namespace

extern "C" {

// One HEM clustering round. Returns the number of output components written
// (merged parents first, then orphans), or -1 on error. All output buffers
// must have capacity n.
int gsr_hem_cluster_level(
    int n, int feature_dim,
    const float* mean, const float* color, const float* cov6,
    const float* opacity, const float* weight, const float* features,
    const float* nvar, const uint8_t* is_parent,
    float distance_delta, float color_delta, float decay_rate,
    float* out_mean, float* out_color, float* out_cov6, float* out_opacity,
    float* out_weight, float* out_features, float* out_nvar) {
  if (n <= 0) return 0;

  const float kld_max = distance_delta * distance_delta * 0.5f;
  const float color_max = color_delta * color_delta * 0.5f;
  const float inv_decay2 = 1.0f / (decay_rate * decay_rate);
  const float kMinL = 1.175494e-38f, kMaxL = 1e8f;

  std::vector<int> parents;
  parents.reserve(n);
  std::vector<float> radius(n, 0.0f);
  float max_radius = 1e-6f;
  for (int i = 0; i < n; ++i) {
    if (!is_parent[i]) continue;
    parents.push_back(i);
    S6 cv;
    std::memcpy(&cv, cov6 + 6 * i, sizeof(S6));
    float r = distance_delta * std::sqrt(std::fmax(max_eigenvalue(cv), 0.0f));
    radius[i] = r;
    max_radius = std::fmax(max_radius, r);
  }
  const int n_par = int(parents.size());

  Grid grid;
  grid.build(mean, n, max_radius);

  // Child candidate selection per parent (parallel, disjoint writes).
  std::vector<std::vector<int>> children(n_par);
  std::vector<std::vector<float>> wl(n_par);
  GSR_TSAN_RELEASE();
#pragma omp parallel
  {
    GSR_TSAN_ACQUIRE();
#pragma omp for schedule(dynamic, 16) nowait
  for (int s_ = 0; s_ < n_par; ++s_) {
    int s = parents[s_];
    V3 pm = {mean[3 * s], mean[3 * s + 1], mean[3 * s + 2]};
    V3 pc = {color[3 * s], color[3 * s + 1], color[3 * s + 2]};
    S6 pcov;
    std::memcpy(&pcov, cov6 + 6 * s, sizeof(S6));
    S6 pinv = inv6(pcov);
    float pdet = std::fmax(det6(pcov), 1e-30f);
    grid.for_neighbors(pm, radius[s], [&](int i, float r2) {
      V3 im = {mean[3 * i], mean[3 * i + 1], mean[3 * i + 2]};
      V3 d = sub(im, pm);
      float d2 = dot(d, d);
      if (d2 > r2) return;
      if (is_parent[i] && i != s) return;
      V3 ic = {color[3 * i], color[3 * i + 1], color[3 * i + 2]};
      V3 dc = sub(ic, pc);
      float cdist = norm(dc);
      if (cdist > color_max) return;
      S6 icov;
      std::memcpy(&icov, cov6 + 6 * i, sizeof(S6));
      float idet = std::fmax(det6(icov), 1e-30f);
      float kld = 0.5f * (mahalanobis(d, pinv) + trace_prod(pinv, icov) - 3.0f -
                          std::log(idet / pdet));
      if (kld > kld_max) return;
      // hemLikelihoodOpacity semantics.
      float lw = std::exp(-d2 * inv_decay2);
      float lc = std::exp(-cdist * cdist * inv_decay2);
      float L = lw * opacity[i] * lc * std::sqrt(std::fmax(idet, 0.0f));
      L = std::fmin(std::fmax(L, kMinL), kMaxL);
      children[s_].push_back(i);
      wl[s_].push_back(weight[s] * L);
    });
  }
    GSR_TSAN_RELEASE();
  }
  GSR_TSAN_ACQUIRE();

  // Responsibility denominators.
  std::vector<float> sum_lw(n, 0.0f);
  for (int s_ = 0; s_ < n_par; ++s_)
    for (size_t k = 0; k < children[s_].size(); ++k)
      sum_lw[children[s_][k]] += wl[s_][k];

  // Accumulate merged components into parent slots (parallel, disjoint).
  std::vector<uint8_t> merged_ok(n_par, 0);
  GSR_TSAN_RELEASE();
#pragma omp parallel
  {
    GSR_TSAN_ACQUIRE();
#pragma omp for schedule(dynamic, 16) nowait
  for (int s_ = 0; s_ < n_par; ++s_) {
    int s = parents[s_];
    V3 pm = {mean[3 * s], mean[3 * s + 1], mean[3 * s + 2]};
    V3 pnv = {nvar[3 * s], nvar[3 * s + 1], nvar[3 * s + 2]};
    float w_s = 0, sum_op = 0, nvar_sum = 0;
    double sm[3] = {0, 0, 0}, sc[3] = {0, 0, 0}, scov[6] = {0, 0, 0, 0, 0, 0};
    double res[3] = {0, 0, 0};
    std::vector<double> sfeat(feature_dim, 0.0);

    for (size_t k = 0; k < children[s_].size(); ++k) {
      int i = children[s_][k];
      if (sum_lw[i] == 0.0f) continue;
      float r_is = wl[s_][k] / sum_lw[i];
      float w = r_is * weight[i];
      V3 im = {mean[3 * i], mean[3 * i + 1], mean[3 * i + 2]};
      V3 rel = sub(im, pm);
      w_s += w;
      for (int c = 0; c < 3; ++c) {
        sm[c] += double(w) * (&im.x)[c];
        sc[c] += double(w) * color[3 * i + c];
      }
      // cov + outer(rel) accumulated relative to the parent mean.
      scov[0] += double(w) * (cov6[6 * i + 0] + rel.x * rel.x);
      scov[1] += double(w) * (cov6[6 * i + 1] + rel.x * rel.y);
      scov[2] += double(w) * (cov6[6 * i + 2] + rel.x * rel.z);
      scov[3] += double(w) * (cov6[6 * i + 3] + rel.y * rel.y);
      scov[4] += double(w) * (cov6[6 * i + 4] + rel.y * rel.z);
      scov[5] += double(w) * (cov6[6 * i + 5] + rel.z * rel.z);
      sum_op += w * opacity[i];
      for (int c = 0; c < feature_dim; ++c)
        sfeat[c] += double(w) * features[size_t(i) * feature_dim + c];
      // wrapped-normal statistics with flip toward the parent normal
      V3 inv = {nvar[3 * i], nvar[3 * i + 1], nvar[3 * i + 2]};
      float ilen = std::fmax(norm(inv), 1e-30f);
      V3 inrm = {inv.x / ilen, inv.y / ilen, inv.z / ilen};
      if (dot(inrm, pnv) < 0.0f) { inrm.x = -inrm.x; inrm.y = -inrm.y; inrm.z = -inrm.z; }
      res[0] += double(w) * inrm.x;
      res[1] += double(w) * inrm.y;
      res[2] += double(w) * inrm.z;
      nvar_sum += w * ilen;
    }
    if (w_s <= 0.0f) continue;
    float inv_w = 1.0f / w_s;
    V3 ms = {float(sm[0] * inv_w), float(sm[1] * inv_w), float(sm[2] * inv_w)};
    V3 mrel = sub(ms, pm);
    float cov_out[6] = {
        float(scov[0] * inv_w - mrel.x * mrel.x), float(scov[1] * inv_w - mrel.x * mrel.y),
        float(scov[2] * inv_w - mrel.x * mrel.z), float(scov[3] * inv_w - mrel.y * mrel.y),
        float(scov[4] * inv_w - mrel.y * mrel.z), float(scov[5] * inv_w - mrel.z * mrel.z)};
    S6 cs;
    std::memcpy(&cs, cov_out, sizeof(S6));
    float dets = det6(cs);
    bool finite = std::isfinite(ms.x) && std::isfinite(ms.y) && std::isfinite(ms.z) &&
                  std::isfinite(dets);
    if (!finite || dets <= 0.0f) continue;  // cull NaN / non-PSD

    merged_ok[s_] = 1;
    std::memcpy(out_mean + 3 * size_t(s_), &ms, 12);
    for (int c = 0; c < 3; ++c) out_color[3 * s_ + c] = float(sc[c] * inv_w);
    std::memcpy(out_cov6 + 6 * size_t(s_), cov_out, 24);
    out_opacity[s_] = sum_op * inv_w;
    out_weight[s_] = w_s;
    for (int c = 0; c < feature_dim; ++c)
      out_features[size_t(s_) * feature_dim + c] = float(sfeat[c] * inv_w);
    double R = std::sqrt(res[0] * res[0] + res[1] * res[1] + res[2] * res[2]);
    R = std::fmax(R, 1e-30);
    float var1 = nvar_sum * inv_w;
    float rmean = std::fmin(std::fmax(float(R) * inv_w, 1e-6f), 1.0f);
    float var2 = -2.0f * std::log(rmean);
    for (int c = 0; c < 3; ++c)
      out_nvar[3 * s_ + c] = float(res[c] / R) * (var1 + var2);
  }
    GSR_TSAN_RELEASE();
  }
  GSR_TSAN_ACQUIRE();

  // Compact: merged parents first, then orphans (sum_lw == 0).
  int out = 0;
  for (int s_ = 0; s_ < n_par; ++s_) {
    if (!merged_ok[s_]) continue;
    if (out != s_) {
      std::memmove(out_mean + 3 * size_t(out), out_mean + 3 * size_t(s_), 12);
      std::memmove(out_color + 3 * size_t(out), out_color + 3 * size_t(s_), 12);
      std::memmove(out_cov6 + 6 * size_t(out), out_cov6 + 6 * size_t(s_), 24);
      out_opacity[out] = out_opacity[s_];
      out_weight[out] = out_weight[s_];
      if (feature_dim > 0)  // null out_features ptr at feature_dim=0 is UB
        std::memmove(out_features + size_t(out) * feature_dim,
                     out_features + size_t(s_) * feature_dim,
                     4 * size_t(feature_dim));
      std::memmove(out_nvar + 3 * size_t(out), out_nvar + 3 * size_t(s_), 12);
    }
    ++out;
  }
  for (int i = 0; i < n; ++i) {
    if (sum_lw[i] != 0.0f) continue;
    std::memcpy(out_mean + 3 * size_t(out), mean + 3 * size_t(i), 12);
    std::memcpy(out_color + 3 * size_t(out), color + 3 * size_t(i), 12);
    std::memcpy(out_cov6 + 6 * size_t(out), cov6 + 6 * size_t(i), 24);
    out_opacity[out] = opacity[i];
    out_weight[out] = weight[i];
    if (feature_dim > 0)  // memcpy from a null features ptr is UB even at n=0
      std::memcpy(out_features + size_t(out) * feature_dim,
                  features + size_t(i) * feature_dim, 4 * size_t(feature_dim));
    std::memcpy(out_nvar + 3 * size_t(out), nvar + 3 * size_t(i), 12);
    ++out;
  }
  return out;
}

int gsr_hem_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
