// tileio — native host-side tile geometry ops for nind-denoise-tpu.
//
// The device engine does padding/gather/stitch on the TPU; these native
// implementations serve the host paths (legacy stitch fallback, dataset
// tooling, very large images where a single padded host copy is unwanted)
// without Python-loop overhead and without materializing intermediate
// copies: gather reads tiles straight out of the *unpadded* source using
// symmetric-reflection index maps, and scatter_add applies the feather
// weights inline.
//
// Layout conventions match core/tiles.py: HWC row-major float32.
// Built as a shared library (see CMakeLists.txt / build.sh); loaded via
// ctypes in nind_denoise_tpu/core/native.py with a numpy fallback.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

// symmetric (edge-duplicating) reflection of coordinate x into [0, n)
inline int64_t reflect_sym(int64_t x, int64_t n) {
  // period of the symmetric extension is 2n: 0..n-1, n-1..0
  int64_t m = x % (2 * n);
  if (m < 0) m += 2 * n;
  return m < n ? m : 2 * n - 1 - m;
}

struct ThreadPool {
  // simple parallel-for over [0, n) with T threads (host has few cores; the
  // pool exists so big gathers overlap with the GIL released)
  static void parallel_for(int64_t n, int threads,
                           const std::function<void(int64_t, int64_t)>& fn) {
    if (threads <= 1 || n < 2) {
      fn(0, n);
      return;
    }
    std::vector<std::thread> ts;
    int64_t chunk = (n + threads - 1) / threads;
    for (int t = 0; t < threads; ++t) {
      int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
      if (lo >= hi) break;
      ts.emplace_back([&fn, lo, hi] { fn(lo, hi); });
    }
    for (auto& t : ts) t.join();
  }
};

}  // namespace

extern "C" {

// Symmetric-pad src (H, W, C) into dst (H+pt+pb, W+pl+pr, C).
void tileio_symmetric_pad_f32(const float* src, int64_t H, int64_t W,
                              int64_t C, int64_t pt, int64_t pb, int64_t pl,
                              int64_t pr, float* dst, int threads) {
  const int64_t Wp = W + pl + pr;
  const int64_t Hp = H + pt + pb;
  ThreadPool::parallel_for(Hp, threads, [&](int64_t lo, int64_t hi) {
    for (int64_t y = lo; y < hi; ++y) {
      const int64_t sy = reflect_sym(y - pt, H);
      const float* srow = src + sy * W * C;
      float* drow = dst + y * Wp * C;
      // left pad
      for (int64_t x = 0; x < pl; ++x) {
        const int64_t sx = reflect_sym(x - pl, W);
        std::memcpy(drow + x * C, srow + sx * C, C * sizeof(float));
      }
      // center
      std::memcpy(drow + pl * C, srow, W * C * sizeof(float));
      // right pad
      for (int64_t x = 0; x < pr; ++x) {
        const int64_t sx = reflect_sym(W + x, W);
        std::memcpy(drow + (pl + W + x) * C, srow + sx * C, C * sizeof(float));
      }
    }
  });
}

// Gather n tiles of (cs, cs, C) from the UNPADDED src (H, W, C) with
// symmetric boundary handling. coords = n x 2 int32 [y0, x0] of each tile's
// top-left in PADDED frame with pad offset `pad` (i.e. source coord =
// coord - pad), matching TilePlan.spec abs origins.
void tileio_gather_tiles_f32(const float* src, int64_t H, int64_t W,
                             int64_t C, const int32_t* coords, int64_t n,
                             int64_t cs, int64_t pad, float* dst,
                             int threads) {
  ThreadPool::parallel_for(n, threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const int64_t y0 = (int64_t)coords[2 * i] - pad;
      const int64_t x0 = (int64_t)coords[2 * i + 1] - pad;
      float* tile = dst + i * cs * cs * C;
      for (int64_t ty = 0; ty < cs; ++ty) {
        const int64_t sy = reflect_sym(y0 + ty, H);
        const float* srow = src + sy * W * C;
        float* drow = tile + ty * cs * C;
        int64_t tx = 0;
        // fast path: fully interior row span
        const int64_t xs = x0, xe = x0 + cs;
        if (xs >= 0 && xe <= W) {
          std::memcpy(drow, srow + xs * C, cs * C * sizeof(float));
          continue;
        }
        for (; tx < cs; ++tx) {
          const int64_t sx = reflect_sym(x0 + tx, W);
          std::memcpy(drow + tx * C, srow + sx * C, C * sizeof(float));
        }
      }
    }
  });
}

// Weighted scatter-add of n tiles' useful slabs into canvas (Hc, Wc, C).
// tiles: n x cs x cs x C (network outputs); slab = tiles[:, pad:pad+ucs,
// pad:pad+ucs, :]. specs: n x 6 int32 [useful_h, useful_w, left, top,
// right, bottom] (feather semantics of core/tiles.weight_mask); coords:
// n x 2 int32 [y0, x0] canvas origins; ol = feather overlap.
void tileio_scatter_add_f32(float* canvas, int64_t Hc, int64_t Wc, int64_t C,
                            const float* tiles, int64_t n, int64_t cs,
                            int64_t pad, int64_t ucs, const int32_t* coords,
                            const int32_t* specs, int64_t ol) {
  for (int64_t i = 0; i < n; ++i) {
    const int64_t y0 = coords[2 * i], x0 = coords[2 * i + 1];
    const int64_t uh = specs[6 * i], uw = specs[6 * i + 1];
    const bool left = specs[6 * i + 2], top = specs[6 * i + 3];
    const bool right = specs[6 * i + 4], bottom = specs[6 * i + 5];
    const float* tile = tiles + i * cs * cs * C;
    for (int64_t r = 0; r < uh; ++r) {
      float wr = 1.0f;
      if (top && r < ol) wr *= 0.5f;
      if (bottom && r >= uh - ol) wr *= 0.5f;
      const float* srow = tile + (pad + r) * cs * C + pad * C;
      float* drow = canvas + (y0 + r) * Wc * C + x0 * C;
      for (int64_t c = 0; c < uw; ++c) {
        float w = wr;
        if (left && c < ol) w *= 0.5f;
        if (right && c >= uw - ol) w *= 0.5f;
        const float* sp = srow + c * C;
        float* dp = drow + c * C;
        for (int64_t k = 0; k < C; ++k) dp[k] += w * sp[k];
      }
    }
  }
}

int tileio_version() { return 1; }

}  // extern "C"
