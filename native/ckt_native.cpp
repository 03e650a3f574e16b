// ckt_native — native host runtime for composable_kernel_tpu.
//
// The TPU analog of CK's native host layer (HostTensor utilities,
// library/include/ck/library/utility/host_tensor.hpp with its
// ParallelTensorFunctor thread pool, and the host-side quant preprocessing
// in example/64_fpAintB_gemm/common.hpp:57-80): the checkpoint-load hot
// path — dtype conversion, symmetric quantization, and int4 packing — runs
// here, multithreaded over columns, instead of through the Python
// interpreter. Exposed via a C ABI consumed with ctypes (no pybind11 in
// this image).
//
// Layout contracts match composable_kernel_tpu.dtypes:
//   - int4 pack: split-halves per block ("blocks" segments along K; byte
//     holds row k in the low nibble, row k + seg/2 in the high nibble).
//   - group quant: scales[K/g, N], symmetric, qmax = 7 (int4) / 127 (int8).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread ckt_native.cpp -o ...

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

inline float bf16_to_f32(uint16_t v) {
  uint32_t u = static_cast<uint32_t>(v) << 16;
  float f;
  std::memcpy(&f, &u, 4);
  return f;
}

inline uint16_t f32_to_bf16(float f) {
  uint32_t u;
  std::memcpy(&u, &f, 4);
  // round-to-nearest-even on the truncated mantissa
  uint32_t rounding = 0x7fff + ((u >> 16) & 1);
  return static_cast<uint16_t>((u + rounding) >> 16);
}

inline float f16_to_f32(uint16_t h) {
  uint32_t sign = (h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1f;
  uint32_t man = h & 0x3ff;
  uint32_t u;
  if (exp == 0) {
    if (man == 0) {
      u = sign;
    } else {  // subnormal
      int e = -1;
      do {
        ++e;
        man <<= 1;
      } while (!(man & 0x400));
      u = sign | ((127 - 15 - e) << 23) | ((man & 0x3ff) << 13);
    }
  } else if (exp == 31) {
    u = sign | 0x7f800000u | (man << 13);
  } else {
    u = sign | ((exp - 15 + 127) << 23) | (man << 13);
  }
  float f;
  std::memcpy(&f, &u, 4);
  return f;
}

void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  int64_t n_threads = std::min<int64_t>(hw, n);
  if (n_threads <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back([&, lo, hi] { fn(lo, hi); });
  }
  for (auto& th : ts) th.join();
}

}  // namespace

extern "C" {

// ---- dtype conversion (checkpoint bf16/fp16 -> f32 working buffer) ------

void ckt_bf16_to_f32(const uint16_t* in, float* out, int64_t n) {
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) out[i] = bf16_to_f32(in[i]);
  });
}

void ckt_f16_to_f32(const uint16_t* in, float* out, int64_t n) {
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) out[i] = f16_to_f32(in[i]);
  });
}

void ckt_f32_to_bf16(const float* in, uint16_t* out, int64_t n) {
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) out[i] = f32_to_bf16(in[i]);
  });
}

// ---- symmetric group-wise int4 quantize + split-halves pack -------------
//
// w:      [K, N] f32 row-major
// packed: [K/2, N] int8 out (blocks segments, split-halves within each)
// scales: [K/g, N] f32 out
// Parallel over N columns (each thread owns full columns: no sharing).

void ckt_quantize_group_int4_pack(const float* w, int64_t K, int64_t N,
                                  int64_t group, int64_t blocks,
                                  int8_t* packed, float* scales) {
  const int64_t G = K / group;
  const int64_t seg = K / blocks;      // rows per pack segment
  const int64_t half = seg / 2;        // packed rows per segment
  parallel_for(N, [&](int64_t lo, int64_t hi) {
    std::vector<int8_t> q(K);
    for (int64_t n = lo; n < hi; ++n) {
      // quantize per group
      for (int64_t g = 0; g < G; ++g) {
        float amax = 0.f;
        for (int64_t r = g * group; r < (g + 1) * group; ++r)
          amax = std::max(amax, std::fabs(w[r * N + n]));
        float s = std::max(amax / 7.0f, 1e-8f);
        scales[g * N + n] = s;
        // divide (not multiply-by-reciprocal): must round bit-identically
        // to the jnp reference quantizer
        for (int64_t r = g * group; r < (g + 1) * group; ++r) {
          float v = std::nearbyint(w[r * N + n] / s);
          q[r] = static_cast<int8_t>(std::min(7.0f, std::max(-8.0f, v)));
        }
      }
      // pack split-halves per segment
      for (int64_t b = 0; b < blocks; ++b) {
        const int64_t base = b * seg;
        for (int64_t r = 0; r < half; ++r) {
          int8_t lo4 = q[base + r] & 0x0F;
          int8_t hi4 = q[base + half + r];
          packed[(b * half + r) * N + n] =
              static_cast<int8_t>((lo4 & 0x0F) | (hi4 << 4));
        }
      }
    }
  });
}

// ---- symmetric per-channel int8 quantize --------------------------------

void ckt_quantize_per_channel_int8(const float* w, int64_t K, int64_t N,
                                   int8_t* out, float* scales) {
  parallel_for(N, [&](int64_t lo, int64_t hi) {
    for (int64_t n = lo; n < hi; ++n) {
      float amax = 0.f;
      for (int64_t r = 0; r < K; ++r)
        amax = std::max(amax, std::fabs(w[r * N + n]));
      float s = std::max(amax / 127.0f, 1e-8f);
      scales[n] = s;
      for (int64_t r = 0; r < K; ++r) {
        float v = std::nearbyint(w[r * N + n] / s);
        out[r * N + n] =
            static_cast<int8_t>(std::min(127.0f, std::max(-128.0f, v)));
      }
    }
  });
}

// ---- transpose (checkpoints store [out, in]; kernels want [K, N]) -------

void ckt_transpose_f32(const float* in, float* out, int64_t rows,
                       int64_t cols) {
  const int64_t TB = 64;
  int64_t rb = (rows + TB - 1) / TB;
  parallel_for(rb, [&](int64_t lo, int64_t hi) {
    for (int64_t bi = lo; bi < hi; ++bi) {
      int64_t r0 = bi * TB, r1 = std::min(rows, r0 + TB);
      for (int64_t c0 = 0; c0 < cols; c0 += TB) {
        int64_t c1 = std::min(cols, c0 + TB);
        for (int64_t r = r0; r < r1; ++r)
          for (int64_t c = c0; c < c1; ++c) out[c * rows + r] = in[r * cols + c];
      }
    }
  });
}

int ckt_version() { return 1; }

}  // extern "C"
