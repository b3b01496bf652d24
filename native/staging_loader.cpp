// Native staging loader: JPEG decode + antialiased resize to a fixed frame.
//
// The reference's input pipeline is torch DataLoader workers running
// PIL decode + torchvision transforms (datasets/CustomDataset.py,
// augmentations.py). In the TPU build the stochastic transform runs on
// device (data/device_augment.py); what remains on host is decode+resize —
// this file makes that step native and GIL-free:
//
//   * libjpeg DCT-domain scaling (scale 1/1..1/8) so large photos are
//     decoded near the target size instead of at full resolution;
//   * separable triangle-filter resize with support scaling (PIL BILINEAR
//     semantics, antialiased on downscale);
//   * plain C ABI so Python calls it through ctypes from ordinary threads
//     (ctypes releases the GIL around the call).
//
// Build: make -C native   (g++ -O3 -shared -fPIC, links -ljpeg)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Triangle-filter tap table (PIL-style: the filter support scales with the
// downscale ratio -> antialiased).
struct Taps {
  std::vector<int> starts;
  std::vector<std::vector<float>> weights;
};

Taps make_taps(int in_len, int out_len) {
  Taps t;
  t.starts.resize(out_len);
  t.weights.resize(out_len);
  const double scale = static_cast<double>(in_len) / out_len;
  const double support = std::max(1.0, scale);
  for (int o = 0; o < out_len; ++o) {
    const double center = (o + 0.5) * scale;
    int lo = std::max(0, static_cast<int>(std::floor(center - support)));
    int hi = std::min(in_len, static_cast<int>(std::ceil(center + support)));
    t.starts[o] = lo;
    double total = 0.0;
    std::vector<float> w(hi - lo);
    for (int i = lo; i < hi; ++i) {
      double x = (i + 0.5 - center) / support;
      double v = std::max(0.0, 1.0 - std::fabs(x));
      w[i - lo] = static_cast<float>(v);
      total += v;
    }
    if (total > 0)
      for (auto& v : w) v = static_cast<float>(v / total);
    t.weights[o] = std::move(w);
  }
  return t;
}

// Horizontal: per input row, gather taps along the row (stride 3).
void resample_rows(const float* in, int w0, int h0, int out_w, float* out) {
  const Taps t = make_taps(w0, out_w);
  for (int y = 0; y < h0; ++y) {
    const float* src = in + static_cast<size_t>(y) * w0 * 3;
    float* dst = out + static_cast<size_t>(y) * out_w * 3;
    for (int o = 0; o < out_w; ++o) {
      const auto& w = t.weights[o];
      const float* s = src + t.starts[o] * 3;
      float r = 0.f, g = 0.f, b = 0.f;
      for (size_t k = 0; k < w.size(); ++k) {
        r += w[k] * s[k * 3 + 0];
        g += w[k] * s[k * 3 + 1];
        b += w[k] * s[k * 3 + 2];
      }
      dst[o * 3 + 0] = r;
      dst[o * 3 + 1] = g;
      dst[o * 3 + 2] = b;
    }
  }
}

// Vertical: per output row, accumulate whole contiguous input rows
// (cache-friendly, auto-vectorizes).
void resample_cols(const float* in, int w, int h0, int out_h, float* out) {
  const Taps t = make_taps(h0, out_h);
  const int line = w * 3;
  for (int o = 0; o < out_h; ++o) {
    float* dst = out + static_cast<size_t>(o) * line;
    std::memset(dst, 0, sizeof(float) * line);
    const auto& wts = t.weights[o];
    for (size_t k = 0; k < wts.size(); ++k) {
      const float wk = wts[k];
      const float* src = in + static_cast<size_t>(t.starts[o] + k) * line;
      for (int i = 0; i < line; ++i) dst[i] += wk * src[i];
    }
  }
}

}  // namespace

extern "C" {

// Decode a JPEG byte buffer and resize to (out_h, out_w, 3) uint8 RGB.
// Returns 0 on success, nonzero on failure (caller falls back to PIL).
int stage_jpeg(const unsigned char* data, unsigned long size, int out_h,
               int out_w, unsigned char* out) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data), size);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_RGB;  // converts YCbCr and grayscale
  // DCT-domain downscale: largest denom in {1,2,4,8} keeping >= target
  cinfo.scale_num = 1;
  cinfo.scale_denom = 1;
  for (int denom = 8; denom >= 1; denom >>= 1) {
    if (static_cast<int>(cinfo.image_width) / denom >= out_w &&
        static_cast<int>(cinfo.image_height) / denom >= out_h) {
      cinfo.scale_denom = denom;
      break;
    }
  }
  jpeg_start_decompress(&cinfo);
  if (cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 3;  // CMYK etc. -> PIL fallback
  }
  const int w0 = cinfo.output_width;
  const int h0 = cinfo.output_height;
  std::vector<float> pixels(static_cast<size_t>(h0) * w0 * 3);
  std::vector<uint8_t> row(static_cast<size_t>(w0) * 3);
  JSAMPROW rows[1] = {row.data()};
  while (cinfo.output_scanline < cinfo.output_height) {
    const int y = cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, rows, 1);
    float* dst = pixels.data() + static_cast<size_t>(y) * w0 * 3;
    for (int i = 0; i < w0 * 3; ++i) dst[i] = row[i];
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  // horizontal pass (per input row), then vertical pass (per output row)
  std::vector<float> tmp(static_cast<size_t>(h0) * out_w * 3);
  resample_rows(pixels.data(), w0, h0, out_w, tmp.data());
  std::vector<float> res(static_cast<size_t>(out_h) * out_w * 3);
  resample_cols(tmp.data(), out_w, h0, out_h, res.data());

  for (size_t i = 0; i < res.size(); ++i) {
    float v = res[i];
    out[i] = static_cast<unsigned char>(v < 0.f ? 0.f : (v > 255.f ? 255.f : v + 0.5f));
  }
  return 0;
}

}  // extern "C"
