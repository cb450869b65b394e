// Standalone sanitizer driver for the HEM clustering library (SURVEY §5.2).
//
// The reference's OpenMP extension (`/root/reference/src/cpp_ext/src/
// mixture.cpp`) ships with no race/memory checking at all; here the C ABI
// entry point is exercised under -fsanitize=address,undefined and
// -fsanitize=thread (see scripts/native_sanitize.sh) on randomized inputs —
// including the degenerate shapes that historically break parallel
// clustering code (n=1, all-parents, no-parents, zero-radius covariances).
//
// Exit code 0 = no sanitizer report. Any data race across the
// `#pragma omp parallel for` regions or heap error aborts the process.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

extern "C" int gsr_hem_cluster_level(
    int n, int feature_dim, const float* mean, const float* color,
    const float* cov6, const float* opacity, const float* weight,
    const float* features, const float* nvar, const uint8_t* is_parent,
    float distance_delta, float color_delta, float decay_rate, float* out_mean,
    float* out_color, float* out_cov6, float* out_opacity, float* out_weight,
    float* out_features, float* out_nvar);

extern "C" int gsr_hem_num_threads();

namespace {

int run_case(int n, int feature_dim, double parent_frac, unsigned seed,
             float scale) {
  std::mt19937 rng(seed);
  std::uniform_real_distribution<float> uni(-1.0f, 1.0f);
  std::uniform_real_distribution<float> pos(0.01f, 1.0f);
  std::bernoulli_distribution par(parent_frac);

  std::vector<float> mean(3 * n), color(3 * n), cov6(6 * n), opacity(n),
      weight(n), features(size_t(feature_dim) * n), nvar(3 * n);
  std::vector<uint8_t> is_parent(n);
  for (int i = 0; i < n; ++i) {
    for (int c = 0; c < 3; ++c) {
      mean[3 * i + c] = uni(rng) * scale;
      color[3 * i + c] = 0.5f + 0.5f * uni(rng);
    }
    // Random SPD covariance: diag(d) + small symmetric jitter kept PSD by
    // dominance.
    float d0 = pos(rng) * 0.01f, d1 = pos(rng) * 0.01f, d2 = pos(rng) * 0.01f;
    float o01 = uni(rng) * 0.001f, o02 = uni(rng) * 0.001f,
          o12 = uni(rng) * 0.001f;
    cov6[6 * i + 0] = d0;
    cov6[6 * i + 1] = o01;
    cov6[6 * i + 2] = o02;
    cov6[6 * i + 3] = d1;
    cov6[6 * i + 4] = o12;
    cov6[6 * i + 5] = d2;
    opacity[i] = 0.5f + 0.5f * pos(rng);
    weight[i] = pos(rng);
    // nvar is [N, 3]: unit-ish normal scaled by a small variance.
    for (int c = 0; c < 3; ++c) nvar[3 * i + c] = uni(rng) * 0.1f;
    is_parent[i] = par(rng) ? 1 : 0;
    for (int f = 0; f < feature_dim; ++f)
      features[size_t(feature_dim) * i + f] = uni(rng);
  }

  std::vector<float> out_mean(3 * n), out_color(3 * n), out_cov6(6 * n),
      out_opacity(n), out_weight(n), out_features(size_t(feature_dim) * n),
      out_nvar(3 * n);

  int m = gsr_hem_cluster_level(
      n, feature_dim, mean.data(), color.data(), cov6.data(), opacity.data(),
      weight.data(), features.data(), nvar.data(), is_parent.data(), 3.0f,
      2.5f, 1.0f, out_mean.data(), out_color.data(), out_cov6.data(),
      out_opacity.data(), out_weight.data(), out_features.data(),
      out_nvar.data());
  if (m < 0 || m > n) {
    std::fprintf(stderr, "case n=%d: bad output count %d\n", n, m);
    return 1;
  }
  for (int i = 0; i < 3 * m; ++i) {
    if (!(out_mean[i] == out_mean[i])) {  // NaN check
      std::fprintf(stderr, "case n=%d: NaN in output mean\n", n);
      return 1;
    }
  }
  std::printf("case n=%-6d feat=%d parent_frac=%.2f -> %d clusters\n", n,
              feature_dim, parent_frac, m);
  return 0;
}

}  // namespace

int main() {
  std::printf("omp threads: %d\n", gsr_hem_num_threads());
  int rc = 0;
  // Degenerate shapes first, then sizes large enough that the OpenMP loops
  // actually go parallel with overlapping neighbor reads.
  rc |= run_case(1, 0, 1.0, 1, 1.0f);
  rc |= run_case(2, 0, 0.0, 2, 1.0f);    // no parents: orphan passthrough
  rc |= run_case(64, 4, 1.0, 3, 0.01f);  // everything overlaps everything
  rc |= run_case(5000, 0, 0.33, 4, 1.0f);
  rc |= run_case(20000, 8, 0.33, 5, 1.0f);
  rc |= run_case(20000, 0, 0.9, 6, 0.05f);  // dense: heavy shared reads
  if (rc == 0) std::printf("SANITIZE DRIVER OK\n");
  return rc;
}
