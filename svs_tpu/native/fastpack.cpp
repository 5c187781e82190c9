// fastpack: native host-side kernels for the svs_tpu packing pipeline.
//
// The TPU owns the query hot path; these C++ kernels own the *host* hot
// paths around it, where single-threaded NumPy/Python would otherwise
// bottleneck cold starts on large corpora:
//
//   - f32 -> bf16 conversion (round-to-nearest-even), multithreaded:
//     used when packing a host matrix for device transfer / sidecar write.
//   - per-row symmetric int8 quantization, multithreaded.
//   - exact top-k selection over a score vector (nth_element + sort):
//     the CPU fallback mirroring the device kernel for environments
//     without an accelerator.
//   - row L2-normalization, multithreaded.
//
// Exposed with plain C linkage and driven from Python via ctypes
// (svs_tpu/native/__init__.py); every entry point has a NumPy fallback so
// the framework works without a compiler present.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <thread>
#include <vector>

namespace {

// Round-to-nearest-even f32 -> bf16, matching XLA/ml_dtypes semantics.
inline uint16_t f32_to_bf16_rne(float value) {
    uint32_t bits;
    std::memcpy(&bits, &value, sizeof(bits));
    if ((bits & 0x7fffffffu) > 0x7f800000u) {  // NaN: quiet, keep payload bit
        return static_cast<uint16_t>((bits >> 16) | 0x0040u);
    }
    const uint32_t lsb = (bits >> 16) & 1u;
    const uint32_t rounding_bias = 0x7fffu + lsb;
    return static_cast<uint16_t>((bits + rounding_bias) >> 16);
}

void parallel_for(size_t total, int n_threads, void (*)(void) = nullptr);

template <typename Fn>
void run_parallel(size_t n_items, int n_threads, Fn&& fn) {
    if (n_threads <= 1 || n_items < (1u << 16)) {
        fn(0, n_items);
        return;
    }
    const size_t chunk = (n_items + n_threads - 1) / n_threads;
    std::vector<std::thread> workers;
    workers.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) {
        const size_t begin = static_cast<size_t>(t) * chunk;
        if (begin >= n_items) break;
        const size_t end = std::min(n_items, begin + chunk);
        workers.emplace_back([&fn, begin, end] { fn(begin, end); });
    }
    for (auto& w : workers) w.join();
}

}  // namespace

extern "C" {

// dst[i] = bf16(src[i]) for i in [0, n)
void fastpack_f32_to_bf16(const float* src, uint16_t* dst, size_t n,
                          int n_threads) {
    run_parallel(n, n_threads, [&](size_t begin, size_t end) {
        for (size_t i = begin; i < end; ++i) dst[i] = f32_to_bf16_rne(src[i]);
    });
}

// Per-row symmetric int8 quantization: q = round(x * 127 / max|row|).
void fastpack_quantize_int8(const float* src, int8_t* dst, float* scales,
                            size_t rows, size_t cols, int n_threads) {
    run_parallel(rows, n_threads, [&](size_t begin, size_t end) {
        for (size_t r = begin; r < end; ++r) {
            const float* row = src + r * cols;
            float absmax = 0.0f;
            for (size_t c = 0; c < cols; ++c)
                absmax = std::max(absmax, std::fabs(row[c]));
            const float scale = std::max(absmax, 1e-30f) / 127.0f;
            scales[r] = scale;
            int8_t* out = dst + r * cols;
            for (size_t c = 0; c < cols; ++c) {
                // divide (not multiply-by-reciprocal) to match the device
                // and NumPy quantizers bit-for-bit
                float q = std::nearbyint(row[c] / scale);
                q = std::min(127.0f, std::max(-127.0f, q));
                out[c] = static_cast<int8_t>(q);
            }
        }
    });
}

// L2-normalize each row in place (rows with ~zero norm are left unchanged).
void fastpack_normalize_rows(float* data, size_t rows, size_t cols,
                             int n_threads) {
    run_parallel(rows, n_threads, [&](size_t begin, size_t end) {
        for (size_t r = begin; r < end; ++r) {
            float* row = data + r * cols;
            double sq = 0.0;
            for (size_t c = 0; c < cols; ++c)
                sq += static_cast<double>(row[c]) * row[c];
            if (sq <= 1e-30) continue;
            const float inv = static_cast<float>(1.0 / std::sqrt(sq));
            for (size_t c = 0; c < cols; ++c) row[c] *= inv;
        }
    });
}

// Exact top-k: writes k (value, index) pairs sorted by value descending,
// ties broken by larger index first (matching the Python oracle).
void fastpack_topk_f32(const float* scores, size_t n, int k, float* out_vals,
                       int32_t* out_idx) {
    const int kk = static_cast<int>(std::min<size_t>(k, n));
    std::vector<int32_t> order(n);
    std::iota(order.begin(), order.end(), 0);
    auto better = [scores](int32_t a, int32_t b) {
        if (scores[a] != scores[b]) return scores[a] > scores[b];
        return a > b;  // tie: larger index first
    };
    std::nth_element(order.begin(), order.begin() + kk, order.end(), better);
    std::sort(order.begin(), order.begin() + kk, better);
    for (int i = 0; i < kk; ++i) {
        out_vals[i] = scores[order[i]];
        out_idx[i] = order[i];
    }
}

int fastpack_abi_version() { return 1; }

}  // extern "C"
