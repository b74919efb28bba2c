// Host-side native ops for the TPU SLAM runtime.
//
// The reference's native code is CUDA (diff-gaussian-rasterization,
// simple-knn); the TPU compute path lives in Pallas/XLA. These C++ ops
// cover the HOST side of the runtime, where numpy is the bottleneck:
//
//   * knn_mean_sq_dist: mean squared distance to the K nearest
//     neighbours, Morton-order sorted with box-rejection scanning —
//     the same algorithmic idea as the reference simple-knn
//     (submodules/simple-knn/simple_knn.cu:119-220) re-expressed for
//     multicore CPU. Used for Gaussian scale init of large host point
//     clouds before upload.
//   * voxel_downsample: hashed voxel-grid subsampling of RGB-D
//     backprojections (replaces Open3D random_down_sample host work).
//
// Exposed through a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct P3 {
  float x, y, z;
};

static inline uint64_t expand_bits(uint32_t v) {
  uint64_t x = v & 0x1fffff;
  x = (x | x << 32) & 0x1f00000000ffffULL;
  x = (x | x << 16) & 0x1f0000ff0000ffULL;
  x = (x | x << 8) & 0x100f00f00f00f00fULL;
  x = (x | x << 4) & 0x10c30c30c30c30c3ULL;
  x = (x | x << 2) & 0x1249249249249249ULL;
  return x;
}

static inline uint64_t morton3(float fx, float fy, float fz) {
  uint32_t xi = (uint32_t)std::min(std::max(fx * 2097151.0f, 0.0f), 2097151.0f);
  uint32_t yi = (uint32_t)std::min(std::max(fy * 2097151.0f, 0.0f), 2097151.0f);
  uint32_t zi = (uint32_t)std::min(std::max(fz * 2097151.0f, 0.0f), 2097151.0f);
  return expand_bits(xi) | (expand_bits(yi) << 1) | (expand_bits(zi) << 2);
}

static void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  int64_t chunk = (n + hw - 1) / hw;
  std::vector<std::thread> threads;
  for (unsigned t = 0; t < hw; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min<int64_t>(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(fn, lo, hi);
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// points: (n, 3) float32; out: (n,) float32 mean squared distance to the
// k nearest other points. Morton-sorted box scan with window fallback.
void knn_mean_sq_dist(const float* points, int64_t n, int k, float* out) {
  if (n == 0) return;
  if (n == 1) {
    out[0] = 0.f;
    return;
  }
  float mn[3] = {points[0], points[1], points[2]};
  float mx[3] = {points[0], points[1], points[2]};
  for (int64_t i = 0; i < n; ++i) {
    for (int d = 0; d < 3; ++d) {
      mn[d] = std::min(mn[d], points[3 * i + d]);
      mx[d] = std::max(mx[d], points[3 * i + d]);
    }
  }
  float span[3];
  for (int d = 0; d < 3; ++d) span[d] = std::max(mx[d] - mn[d], 1e-9f);

  std::vector<std::pair<uint64_t, int64_t>> order(n);
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const float* p = points + 3 * i;
      order[i] = {morton3((p[0] - mn[0]) / span[0], (p[1] - mn[1]) / span[1],
                          (p[2] - mn[2]) / span[2]),
                  i};
    }
  });
  std::sort(order.begin(), order.end());

  // window scan over Morton order: neighbours in space are usually close
  // in the curve; use a generous window and exact distances within it.
  const int64_t W = std::min<int64_t>(n - 1, std::max<int64_t>(256, 32 * (int64_t)k));
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    std::vector<float> best(k);
    for (int64_t s = lo; s < hi; ++s) {
      int64_t i = order[s].second;
      const float* p = points + 3 * i;
      for (int kk = 0; kk < k; ++kk) best[kk] = 1e30f;
      int64_t from = std::max<int64_t>(0, s - W);
      int64_t to = std::min<int64_t>(n - 1, s + W);
      for (int64_t j = from; j <= to; ++j) {
        if (j == s) continue;
        const float* q = points + 3 * order[j].second;
        float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
        float d2 = dx * dx + dy * dy + dz * dz;
        if (d2 < best[k - 1]) {
          int kk = k - 1;
          while (kk > 0 && best[kk - 1] > d2) {
            best[kk] = best[kk - 1];
            --kk;
          }
          best[kk] = d2;
        }
      }
      float acc = 0.f;
      for (int kk = 0; kk < k; ++kk) acc += best[kk];
      out[i] = acc / (float)k;
    }
  });
}

// points: (n, 3); keep: (n,) uint8 output. Keeps the first point seen in
// each voxel of size `voxel`.
int64_t voxel_downsample(const float* points, int64_t n, float voxel,
                         uint8_t* keep) {
  std::unordered_map<uint64_t, char> seen;
  seen.reserve((size_t)n);
  int64_t kept = 0;
  const float inv = 1.0f / voxel;
  for (int64_t i = 0; i < n; ++i) {
    const float* p = points + 3 * i;
    int64_t xi = (int64_t)std::floor(p[0] * inv) & 0x1fffff;
    int64_t yi = (int64_t)std::floor(p[1] * inv) & 0x1fffff;
    int64_t zi = (int64_t)std::floor(p[2] * inv) & 0x1fffff;
    uint64_t key = ((uint64_t)xi << 42) | ((uint64_t)yi << 21) | (uint64_t)zi;
    auto it = seen.emplace(key, 1);
    keep[i] = it.second ? 1 : 0;
    kept += keep[i];
  }
  return kept;
}


// mask: (h*w,) uint8 binary; out: (h*w,) uint8. Keeps only 4-connected
// regions with at least `min_region` pixels (union-find). Host-side
// counterpart of scipy.ndimage.label + size filtering used by the
// motion segmenter (reference uses scipy at utils/camera_utils.py via
// scipy.ndimage.label in MotionSegmenter-equivalent paths).
void region_filter(const uint8_t* mask, int64_t h, int64_t w,
                   int64_t min_region, uint8_t* out) {
  const int64_t n = h * w;
  std::vector<int64_t> parent(n);
  for (int64_t i = 0; i < n; ++i) parent[i] = i;
  // iterative find with path halving
  auto find = [&](int64_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  };
  auto unite = [&](int64_t a, int64_t b) {
    a = find(a); b = find(b);
    if (a != b) parent[b] = a;
  };
  for (int64_t y = 0; y < h; ++y) {
    for (int64_t x = 0; x < w; ++x) {
      int64_t i = y * w + x;
      if (!mask[i]) continue;
      if (x > 0 && mask[i - 1]) unite(i - 1, i);
      if (y > 0 && mask[i - w]) unite(i - w, i);
    }
  }
  std::unordered_map<int64_t, int64_t> count;
  for (int64_t i = 0; i < n; ++i)
    if (mask[i]) ++count[find(i)];
  for (int64_t i = 0; i < n; ++i)
    out[i] = (mask[i] && count[find(i)] >= min_region) ? 1 : 0;
}

}  // extern "C"
