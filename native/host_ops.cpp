// Native host-side data-pipeline kernels.
//
// The hot host path of v1 training is per-sample image preparation:
// JPEG bytes -> decoded uint8 HWC -> resized float32 [-1, 1] tensor (the
// reference's per-item PIL decode + ToTensor+Resize+Normalize transform
// chain, /root/reference/data_loader.py:41-44 + train.py:40-54). This
// library fuses the whole chain in C++ (called through ctypes, which
// releases the GIL, so Python worker threads scale across cores):
//
//   * decode_jpeg_resize_normalize: libjpeg decode -> antialiased
//     triangle (PIL "BILINEAR") resample -> [-1,1] float32, one pass.
//     Optional DCT-domain scaling (fast_dct) decodes directly at 1/2,
//     1/4... resolution when the target is much smaller than the source
//     — a large decode-time win for COCO's ~640px -> 64/256px.
//   * resample_normalize_u8_to_f32: the same antialiased resample for
//     already-decoded images (PNG etc.). This replaces round 1's plain
//     2-tap bilinear lookup, which diverged from PIL's area-averaging
//     filter on large downscales (ADVICE.md round-1 finding) — both the
//     native and PIL paths now implement the same triangle filter.
//   * batch_resample_normalize_u8_to_f32: N images -> one batch buffer
//     with a std::thread parallel-for.
//
// Exposed C ABI is loaded from Python via ctypes
// (imagegenerator_tpu/data/native.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#ifndef HOST_OPS_NO_JPEG
#include <jpeglib.h>
#endif

namespace {

// ---------------------------------------------------------------------
// Antialiased separable resample with a triangle (linear) filter —
// PIL's Image.BILINEAR semantics (support scales with the downscale
// factor, so minification averages over the full source footprint
// instead of point-sampling 2 taps).
struct ResampleCoeffs {
  std::vector<int> bounds;      // (out, 2): first source index, count
  std::vector<float> weights;   // (out, kmax)
  int kmax = 0;
};

ResampleCoeffs triangle_coeffs(int in_size, int out_size) {
  ResampleCoeffs rc;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 1.0 * filterscale;  // triangle filter support
  rc.kmax = static_cast<int>(std::ceil(support)) * 2 + 1;
  rc.bounds.resize(out_size * 2);
  rc.weights.assign(static_cast<size_t>(out_size) * rc.kmax, 0.0f);
  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    double total = 0.0;
    float* w = rc.weights.data() + static_cast<size_t>(xx) * rc.kmax;
    for (int x = xmin; x < xmax; ++x) {
      const double t = std::abs((x - center + 0.5) / filterscale);
      const double v = t < 1.0 ? 1.0 - t : 0.0;
      w[x - xmin] = static_cast<float>(v);
      total += v;
    }
    if (total > 0.0) {
      for (int x = 0; x < xmax - xmin; ++x)
        w[x] = static_cast<float>(w[x] / total);
    }
    rc.bounds[xx * 2] = xmin;
    rc.bounds[xx * 2 + 1] = xmax - xmin;
  }
  return rc;
}

// Output writers for the vertical pass: f32 fuses the [-1, 1]
// normalize; u8 rounds back to bytes with PIL's u8-output convention —
// (int)(v + 0.5), clamped. Transferring u8 to the device and
// normalizing there is 4x fewer H2D bytes; the <=0.5-level rounding is
// a deliberate trade (the reference resamples float tensors —
// ToTensor before Resize — and never re-quantizes).
struct WriteNormalizedF32 {
  static void write(const float* acc, float* dst, int n) {
    constexpr float kScale = 2.0f / 255.0f;
    for (int i = 0; i < n; ++i) dst[i] = acc[i] * kScale - 1.0f;
  }
};

struct WriteRoundedU8 {
  static void write(const float* acc, uint8_t* dst, int n) {
    for (int i = 0; i < n; ++i) {
      const float v = acc[i] + 0.5f;
      dst[i] = static_cast<uint8_t>(
          v <= 0.0f ? 0 : (v >= 255.0f ? 255 : static_cast<int>(v)));
    }
  }
};

// HWC uint8 -> HWC resampled output (triangle filter, PIL BILINEAR
// semantics); OutT/Writer select f32-normalized or u8-rounded output.
template <typename OutT, typename Writer>
void resample_one(const uint8_t* src, int sh, int sw, int channels,
                  OutT* dst, int th, int tw) {
  const ResampleCoeffs cx = triangle_coeffs(sw, tw);
  const ResampleCoeffs cy = triangle_coeffs(sh, th);

  // horizontal pass: (sh, sw, c) u8 -> (sh, tw, c) f32
  std::vector<float> tmp(static_cast<size_t>(sh) * tw * channels);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + static_cast<int64_t>(y) * sw * channels;
    float* out_row = tmp.data() + static_cast<int64_t>(y) * tw * channels;
    for (int x = 0; x < tw; ++x) {
      const int xmin = cx.bounds[x * 2];
      const int cnt = cx.bounds[x * 2 + 1];
      const float* w = cx.weights.data() + static_cast<size_t>(x) * cx.kmax;
      for (int c = 0; c < channels; ++c) {
        float acc = 0.0f;
        const uint8_t* p = row + static_cast<int64_t>(xmin) * channels + c;
        for (int k = 0; k < cnt; ++k) acc += w[k] * p[k * channels];
        out_row[x * channels + c] = acc;
      }
    }
  }
  // vertical pass: (sh, tw, c) f32 -> (th, tw, c) OutT
  const int row_elems = tw * channels;
  std::vector<float> acc_row(row_elems);
  for (int y = 0; y < th; ++y) {
    const int ymin = cy.bounds[y * 2];
    const int cnt = cy.bounds[y * 2 + 1];
    const float* w = cy.weights.data() + static_cast<size_t>(y) * cy.kmax;
    std::memset(acc_row.data(), 0, sizeof(float) * row_elems);
    for (int k = 0; k < cnt; ++k) {
      const float wk = w[k];
      const float* in_row =
          tmp.data() + static_cast<int64_t>(ymin + k) * row_elems;
      for (int i = 0; i < row_elems; ++i) acc_row[i] += wk * in_row[i];
    }
    Writer::write(acc_row.data(), dst + static_cast<int64_t>(y) * row_elems,
                  row_elems);
  }
}

void resample_normalize_one(const uint8_t* src, int sh, int sw, int channels,
                            float* dst, int th, int tw) {
  resample_one<float, WriteNormalizedF32>(src, sh, sw, channels, dst, th, tw);
}

void resample_u8_one(const uint8_t* src, int sh, int sw, int channels,
                     uint8_t* dst, int th, int tw) {
  resample_one<uint8_t, WriteRoundedU8>(src, sh, sw, channels, dst, th, tw);
}

// ---------------------------------------------------------------------
// libjpeg decode with error-trap (no exit() on corrupt input).
#ifndef HOST_OPS_NO_JPEG
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

// Decode JPEG bytes, optionally with DCT-domain scaling so the decoded
// image is the smallest 1/1..1/8 scale still >= (th, tw) on both axes,
// then triangle-resample into dst (f32 normalized or u8 rounded,
// selected by OutT/Writer). Returns 0 on success.
template <typename OutT, typename Writer>
int decode_jpeg_impl(const uint8_t* data, int64_t len, OutT* dst, int th,
                     int tw, int channels, int fast_dct) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = channels == 1 ? JCS_GRAYSCALE : JCS_RGB;
  if (fast_dct) {
    // pick denom d in {1..8} (scale 8/d... libjpeg uses num/denom with
    // denom 8): largest reduction keeping decoded >= target
    const int full_w = cinfo.image_width, full_h = cinfo.image_height;
    int num = 8;
    while (num > 1 && (full_w * (num - 1)) / 8 >= tw &&
           (full_h * (num - 1)) / 8 >= th) {
      --num;
    }
    cinfo.scale_num = num;
    cinfo.scale_denom = 8;
    cinfo.dct_method = JDCT_IFAST;
    cinfo.do_fancy_upsampling = FALSE;
  }
  jpeg_start_decompress(&cinfo);
  const int dw = cinfo.output_width, dh = cinfo.output_height;
  const int dc = cinfo.output_components;
  std::vector<uint8_t> buf(static_cast<size_t>(dw) * dh * dc);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* rowp = buf.data() +
                    static_cast<size_t>(cinfo.output_scanline) * dw * dc;
    jpeg_read_scanlines(&cinfo, &rowp, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  if (dc != channels) return 3;
  resample_one<OutT, Writer>(buf.data(), dh, dw, channels, dst, th, tw);
  return 0;
}
#else
template <typename OutT, typename Writer>
int decode_jpeg_impl(const uint8_t*, int64_t, OutT*, int, int, int, int) {
  return -1;  // built without libjpeg
}
#endif  // HOST_OPS_NO_JPEG

}  // namespace

extern "C" {

// Antialiased resample + normalize (PIL BILINEAR semantics).
void resample_normalize_u8_to_f32(const uint8_t* src, int sh, int sw,
                                  int channels, float* dst, int th, int tw) {
  resample_normalize_one(src, sh, sw, channels, dst, th, tw);
}

// Back-compat alias (round-1 name); now antialiased like the PIL path.
void resize_normalize_u8_to_f32(const uint8_t* src, int sh, int sw,
                                int channels, float* dst, int th, int tw) {
  resample_normalize_one(src, sh, sw, channels, dst, th, tw);
}

// JPEG bytes -> (th, tw, channels) float32 in [-1, 1].
// fast_dct != 0 enables DCT-domain scaled decode (decodes at the
// smallest 1/8-granular scale still >= target — ~3-4x faster for COCO
// 640px -> 256px, at slightly different (but still antialiased) pixel
// values; keep 0 for bit-parity with the PIL decode path).
// Returns 0 on success, nonzero on decode failure (caller falls back).
int decode_jpeg_resize_normalize(const uint8_t* data, int64_t len,
                                 float* dst, int th, int tw, int channels,
                                 int fast_dct) {
  return decode_jpeg_impl<float, WriteNormalizedF32>(data, len, dst, th, tw,
                                                     channels, fast_dct);
}

// JPEG bytes -> (th, tw, channels) uint8 (resampled, NOT normalized):
// the device-normalize transfer path — 4x fewer host->device bytes at
// <=0.5 levels of post-resample rounding (see WriteRoundedU8 note).
int decode_jpeg_resize_u8(const uint8_t* data, int64_t len, uint8_t* dst,
                          int th, int tw, int channels, int fast_dct) {
  return decode_jpeg_impl<uint8_t, WriteRoundedU8>(data, len, dst, th, tw,
                                                   channels, fast_dct);
}

// uint8 HWC -> resampled uint8 (th, tw, channels) (PIL BILINEAR + PIL
// u8 rounding), for the non-JPEG decode-on-host / resample-native path.
void resample_u8_to_u8(const uint8_t* src, int sh, int sw, int channels,
                       uint8_t* dst, int th, int tw) {
  resample_u8_one(src, sh, sw, channels, dst, th, tw);
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
        resample_normalize_one(srcs[i], shs[i], sws[i], channels,
                               dst + i * per_image, th, tw);
      }
    });
  }
  for (auto& w : workers) w.join();
}

}  // extern "C"
