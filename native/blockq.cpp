// jlama-tpu native runtime: threaded block-quantization kernels.
//
// C++ counterpart of jlama_tpu/quant/blockq.py — the offline-quantizer hot
// path (an 8B checkpoint is ~30 GB of f32 to scan). Bit-exact with the
// Python implementation and with the reference's Java semantics
// (/root/reference/jlama-core/.../tensor/Q4ByteBufferTensor.java:66-120,
// Q8ByteBufferTensor.java:67-90): f32 arithmetic, first-max selection,
// trunc(v*iscale + 8.5) nibble rounding, round-half-up int8.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread blockq.cpp -o libjlamaq.so

#include <cstdint>
#include <cmath>
#include <thread>
#include <vector>
#include <algorithm>

namespace {
constexpr int kBlock = 32;
constexpr int kHalf = 16;

inline int n_threads_for(int64_t nblocks) {
    unsigned hw = std::thread::hardware_concurrency();
    if (hw == 0) hw = 1;
    int64_t per = 4096;  // blocks per thread minimum
    int64_t want = (nblocks + per - 1) / per;
    return static_cast<int>(std::min<int64_t>(hw, std::max<int64_t>(1, want)));
}

template <typename F>
void parallel_blocks(int64_t nblocks, F&& fn) {
    int nt = n_threads_for(nblocks);
    if (nt <= 1) {
        fn(0, nblocks);
        return;
    }
    std::vector<std::thread> ts;
    int64_t chunk = (nblocks + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        int64_t lo = t * chunk;
        int64_t hi = std::min<int64_t>(nblocks, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back([&fn, lo, hi] { fn(lo, hi); });
    }
    for (auto& t : ts) t.join();
}
}  // namespace

extern "C" {

// x: [nblocks * 32] f32  ->  packed: [nblocks * 16] u8, scales: [nblocks] f32
void jq4_quantize(const float* x, uint8_t* packed, float* scales,
                  int64_t nblocks) {
    parallel_blocks(nblocks, [&](int64_t lo, int64_t hi) {
        for (int64_t b = lo; b < hi; ++b) {
            const float* blk = x + b * kBlock;
            float maxv = 0.0f, amax = 0.0f;
            bool first = true;
            for (int i = 0; i < kBlock; ++i) {
                float v = blk[i];
                float av = v < 0 ? -v : v;
                if (first || av > amax) {
                    amax = av;
                    maxv = v;
                    first = false;
                }
            }
            float scale = maxv / -8.0f;
            float iscale = (scale != 0.0f) ? 1.0f / scale : 0.0f;
            scales[b] = scale;
            uint8_t* out = packed + b * kHalf;
            for (int j = 0; j < kHalf; ++j) {
                float f0 = blk[j] * iscale + 8.5f;
                float f1 = blk[j + kHalf] * iscale + 8.5f;
                int q0 = std::min(15, (int)f0);  // trunc toward zero (f0 >= 0)
                int q1 = std::min(15, (int)f1);
                out[j] = (uint8_t)((q0 & 0xF) | ((q1 & 0xF) << 4));
            }
        }
    });
}

// packed: [nblocks * 16] u8, scales: [nblocks] f32 -> x: [nblocks * 32] f32
void jq4_dequantize(const uint8_t* packed, const float* scales, float* x,
                    int64_t nblocks) {
    parallel_blocks(nblocks, [&](int64_t lo, int64_t hi) {
        for (int64_t b = lo; b < hi; ++b) {
            const uint8_t* in = packed + b * kHalf;
            float s = scales[b];
            float* out = x + b * kBlock;
            for (int j = 0; j < kHalf; ++j) {
                out[j] = (float)((in[j] & 0x0F) - 8) * s;
                out[j + kHalf] = (float)(((in[j] >> 4) & 0x0F) - 8) * s;
            }
        }
    });
}

// x: [nblocks * 32] f32 -> q: [nblocks * 32] i8, scales: [nblocks] f32
void jq8_quantize(const float* x, int8_t* q, float* scales, int64_t nblocks) {
    parallel_blocks(nblocks, [&](int64_t lo, int64_t hi) {
        for (int64_t b = lo; b < hi; ++b) {
            const float* blk = x + b * kBlock;
            float amax = 0.0f;
            for (int i = 0; i < kBlock; ++i) {
                float av = blk[i] < 0 ? -blk[i] : blk[i];
                if (av > amax) amax = av;
            }
            float iscale = amax > 0 ? 127.0f / amax : 0.0f;
            scales[b] = amax > 0 ? 1.0f / iscale : 0.0f;
            int8_t* out = q + b * kBlock;
            for (int i = 0; i < kBlock; ++i) {
                float v = blk[i] * iscale + 0.5f;
                int r = (int)std::floor(v);  // Java Math.round == floor(x+0.5)
                out[i] = (int8_t)std::max(-127, std::min(127, r));
            }
        }
    });
}

// kernel-layout column permutation for q4k (cf. ops/pallas_q4.py):
// rows of `packed` [rows, k/2] are permuted so new col c = old (c%nb)*16+c/nb
void jq4_to_kernel_layout(const uint8_t* packed, uint8_t* out, int64_t rows,
                          int64_t half_k) {
    int64_t nb = half_k / kHalf;
    parallel_blocks(rows, [&](int64_t lo, int64_t hi) {
        for (int64_t r = lo; r < hi; ++r) {
            const uint8_t* src = packed + r * half_k;
            uint8_t* dst = out + r * half_k;
            for (int64_t c = 0; c < half_k; ++c) {
                dst[c] = src[(c % nb) * kHalf + c / nb];
            }
        }
    });
}

}  // extern "C"
