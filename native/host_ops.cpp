// Native host-side data-pipeline kernels.
//
// The hot host path of v1 training is per-sample image preparation:
// decoded uint8 HWC -> resized float32 [-1, 1] tensor (the reference's
// ToTensor+Resize+Normalize transform chain, executed per item in torch
// DataLoader workers). This library fuses resize + dtype conversion +
// normalization into one pass over the output, with a std::thread
// parallel-for for batch collation straight into the pinned staging
// buffer that feeds jax.device_put.
//
// Exposed C ABI (loaded from Python via ctypes, see
// imagegenerator_tpu/data/native.py):
//   resize_normalize_u8_to_f32(...)        one image
//   batch_resize_normalize_u8_to_f32(...)  N images -> one batch buffer

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Bilinear resize of an HWC uint8 image into an HWC float32 buffer,
// mapping [0,255] -> [-1,1] in the same pass (scale = 2/255, bias = -1).
void resize_normalize_one(const uint8_t* src, int sh, int sw, int channels,
                          float* dst, int th, int tw) {
  // torch/PIL-style half-pixel centers (align_corners=false).
  const float y_ratio = static_cast<float>(sh) / th;
  const float x_ratio = static_cast<float>(sw) / tw;
  constexpr float kScale = 2.0f / 255.0f;

  for (int ty = 0; ty < th; ++ty) {
    float fy = (ty + 0.5f) * y_ratio - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(sh - 1)));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, sh - 1);
    const float wy = fy - y0;

    float* out_row = dst + static_cast<int64_t>(ty) * tw * channels;
    const uint8_t* row0 = src + static_cast<int64_t>(y0) * sw * channels;
    const uint8_t* row1 = src + static_cast<int64_t>(y1) * sw * channels;

    for (int tx = 0; tx < tw; ++tx) {
      float fx = (tx + 0.5f) * x_ratio - 0.5f;
      fx = std::max(0.0f, std::min(fx, static_cast<float>(sw - 1)));
      const int x0 = static_cast<int>(fx);
      const int x1 = std::min(x0 + 1, sw - 1);
      const float wx = fx - x0;

      const float w00 = (1 - wy) * (1 - wx);
      const float w01 = (1 - wy) * wx;
      const float w10 = wy * (1 - wx);
      const float w11 = wy * wx;

      const uint8_t* p00 = row0 + x0 * channels;
      const uint8_t* p01 = row0 + x1 * channels;
      const uint8_t* p10 = row1 + x0 * channels;
      const uint8_t* p11 = row1 + x1 * channels;
      float* out = out_row + tx * channels;

      for (int c = 0; c < channels; ++c) {
        const float v =
            w00 * p00[c] + w01 * p01[c] + w10 * p10[c] + w11 * p11[c];
        out[c] = v * kScale - 1.0f;
      }
    }
  }
}

}  // namespace

extern "C" {

void resize_normalize_u8_to_f32(const uint8_t* src, int sh, int sw,
                                int channels, float* dst, int th, int tw) {
  resize_normalize_one(src, sh, sw, channels, dst, th, tw);
}

// srcs: array of N pointers to HWC uint8 images with per-image shapes
// (shs[i], sws[i], channels); dst: one contiguous (N, th, tw, channels)
// float32 batch buffer.
void batch_resize_normalize_u8_to_f32(const uint8_t* const* srcs,
                                      const int* shs, const int* sws,
                                      int channels, int n, float* dst, int th,
                                      int tw, int num_threads) {
  const int64_t per_image = static_cast<int64_t>(th) * tw * channels;
  num_threads = std::max(1, std::min(num_threads, n));
  std::atomic<int> counter{0};
  std::vector<std::thread> workers;
  workers.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) {
    workers.emplace_back([&] {
      while (true) {
        const int i = counter.fetch_add(1);
        if (i >= n) return;
        resize_normalize_one(srcs[i], shs[i], sws[i], channels,
                             dst + i * per_image, th, tw);
      }
    });
  }
  for (auto& w : workers) w.join();
}

}  // extern "C"
