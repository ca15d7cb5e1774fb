// Native host-side batch assembly for the MO-VAE TPU data pipeline.
//
// The reference framework feeds the GPU from torch DataLoader worker
// processes (reference main.py:1140-1157). This framework's host pipeline is
// in-process; on few-core TPU hosts the Python/numpy per-batch work
// (fancy-index gather -> float32 convert -> random horizontal flip ->
// normalize) becomes the bottleneck for small models. This library fuses all
// four into one cache-friendly pass over the batch, called via ctypes
// (movae_tpu/data/native.py). A pure-numpy fallback keeps behavior identical
// when the shared object is unavailable.
//
// Build: cc -O3 -march=native -shared -fPIC -o libbatch_ops.so batch_ops.cpp
// (see native/build.sh; no external dependencies).

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Worker-thread cap, settable at runtime (MOVAE_BATCH_THREADS or the
// set_num_threads entry point below). 0 = use hardware_concurrency. This is
// the analog of the reference DataLoader's num_workers knob
// (reference benchmark_workers.py sweeps it; main.py:1144).
int g_max_threads = -1;  // -1: not yet read from the environment

int max_threads() {
  if (g_max_threads < 0) {
    const char* env = std::getenv("MOVAE_BATCH_THREADS");
    g_max_threads = env ? std::max(0, std::atoi(env)) : 0;
  }
  return g_max_threads;
}

// Run fn(b) for b in [0, batch) across hardware threads. Each index writes
// a disjoint output row, so the split is deterministic and race-free.
template <typename Fn>
void parallel_rows(int64_t batch, Fn fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t cap = max_threads();
  if (cap == 0) cap = hw ? hw : 1;
  int64_t nthreads = std::min<int64_t>(cap, batch);
  if (nthreads <= 1 || batch < 16) {
    for (int64_t b = 0; b < batch; ++b) fn(b);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(nthreads);
  int64_t chunk = (batch + nthreads - 1) / nthreads;
  for (int64_t t = 0; t < nthreads; ++t) {
    int64_t lo = t * chunk, hi = std::min(batch, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([=] {
      for (int64_t b = lo; b < hi; ++b) fn(b);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Gather rows of a uint8 image archive into a float32 batch, optionally
// h-flipping selected samples and normalizing to [-1, 1].
//
//   images : (N, H, W, C) uint8, C-contiguous
//   idx    : (B,) int64 row indices
//   flip   : (B,) uint8 flags (1 = horizontal flip) or nullptr
//   out    : (B, H, W, C) float32, C-contiguous (written)
//   normalize: 0 -> [0,1], 1 -> (x-0.5)/0.5 in [-1,1]
void assemble_batch_u8(const uint8_t* images, const int64_t* idx,
                       const uint8_t* flip, float* out, int64_t batch,
                       int64_t height, int64_t width, int64_t channels,
                       int normalize) {
  const int64_t row_elems = width * channels;
  const int64_t img_elems = height * row_elems;
  const float scale = normalize ? (1.0f / 127.5f) : (1.0f / 255.0f);
  const float bias = normalize ? -1.0f : 0.0f;

  parallel_rows(batch, [=](int64_t b) {
    const uint8_t* src = images + idx[b] * img_elems;
    float* dst = out + b * img_elems;
    const bool do_flip = flip != nullptr && flip[b];
    if (!do_flip) {
      for (int64_t i = 0; i < img_elems; ++i) {
        dst[i] = static_cast<float>(src[i]) * scale + bias;
      }
    } else {
      for (int64_t h = 0; h < height; ++h) {
        const uint8_t* srow = src + h * row_elems;
        float* drow = dst + h * row_elems;
        for (int64_t w = 0; w < width; ++w) {
          const uint8_t* sp = srow + (width - 1 - w) * channels;
          float* dp = drow + w * channels;
          for (int64_t c = 0; c < channels; ++c) {
            dp[c] = static_cast<float>(sp[c]) * scale + bias;
          }
        }
      }
    }
  });
}

// Raw-uint8 variant of assemble_batch_u8: gather + optional h-flip, NO
// float conversion — the cast/normalize runs on-device inside the jitted
// step. Shipping uint8 keeps the host->device transfer 4x smaller, which
// matters both on PCIe and (especially) on tunneled TPU targets.
//   images : (N, H, W, C) uint8; idx : (B,) int64
//   flip   : (B,) uint8 flags or nullptr
//   out    : (B, H, W, C) uint8 (written)
void assemble_batch_u8_raw(const uint8_t* images, const int64_t* idx,
                           const uint8_t* flip, uint8_t* out, int64_t batch,
                           int64_t height, int64_t width, int64_t channels) {
  const int64_t row_elems = width * channels;
  const int64_t img_elems = height * row_elems;
  parallel_rows(batch, [=](int64_t b) {
    const uint8_t* src = images + idx[b] * img_elems;
    uint8_t* dst = out + b * img_elems;
    const bool do_flip = flip != nullptr && flip[b];
    if (!do_flip) {
      std::memcpy(dst, src, img_elems);
    } else {
      for (int64_t h = 0; h < height; ++h) {
        const uint8_t* srow = src + h * row_elems;
        uint8_t* drow = dst + h * row_elems;
        for (int64_t w = 0; w < width; ++w) {
          std::memcpy(drow + w * channels,
                      srow + (width - 1 - w) * channels, channels);
        }
      }
    }
  });
}

// Gather rows of an int32 code archive (prior training batches) — rows may
// page-fault in from a memory-mapped store, so spread them across threads.
//   codes : (N, H, W) int32; idx : (B,) int64; out : (B, H, W) int32
void gather_codes_i32(const int32_t* codes, const int64_t* idx, int32_t* out,
                      int64_t batch, int64_t elems_per_sample) {
  parallel_rows(batch, [=](int64_t b) {
    std::memcpy(out + b * elems_per_sample,
                codes + idx[b] * elems_per_sample,
                sizeof(int32_t) * elems_per_sample);
  });
}

// Cap the worker-thread count (0 = hardware_concurrency). Exposed so the
// benchmark harness can sweep worker counts like the reference's
// DataLoader num_workers sweep (reference benchmark_workers.py:14-165).
void set_num_threads(int n) { g_max_threads = n < 0 ? 0 : n; }

int batch_ops_version() { return 4; }

}  // extern "C"
