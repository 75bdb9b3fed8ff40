// Native image preprocessing for the LW-DETR-TPU data loader.
//
// The reference delegates decode/resize to PIL inside torch DataLoader
// worker processes (/root/reference/datasets/coco.py:27-41, transforms.py).
// This library is the native-runtime equivalent: JPEG decode (libjpeg),
// PIL-compatible antialiased bilinear resize (triangle filter with support
// scaled by the downsampling ratio, separable horizontal/vertical passes),
// and fused ImageNet normalization to float32 — one C call per image,
// no Python in the hot path.
//
// Exposed via a plain C ABI consumed through ctypes (lwdetr_tpu/data/native.py).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <vector>

#include <jpeglib.h>

extern "C" {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

static void error_exit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG byte buffer to RGB8. Returns 0 on success.
// Caller provides out buffer of size >= max_bytes; actual dims written to w/h.
int decode_jpeg(const uint8_t* data, long len, uint8_t* out, long max_bytes,
                int* out_w, int* out_h) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width, h = cinfo.output_height;
  if (static_cast<long>(w) * h * 3 > max_bytes) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  *out_w = w;
  *out_h = h;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int jpeg_dims(const uint8_t* data, long len, int* out_w, int* out_h) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  *out_w = cinfo.image_width;
  *out_h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

namespace {

// PIL-style antialiased triangle (bilinear) resampling coefficients:
// support = 1.0 * max(in/out, 1); weights normalized to sum 1.
struct Coeffs {
  std::vector<int> bounds;   // first source index per output pixel
  std::vector<int> counts;   // number of taps per output pixel
  std::vector<float> weights;  // taps, k_max per pixel stride
  int kmax;
};

Coeffs make_coeffs(int in_size, int out_size) {
  Coeffs c;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * filterscale;  // triangle filter support
  const int kmax = static_cast<int>(std::ceil(support)) * 2 + 1;
  c.kmax = kmax;
  c.bounds.resize(out_size);
  c.counts.resize(out_size);
  c.weights.assign(static_cast<size_t>(out_size) * kmax, 0.f);
  for (int i = 0; i < out_size; ++i) {
    const double center = (i + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    double total = 0.0;
    std::vector<double> ww(xmax - xmin);
    for (int x = xmin; x < xmax; ++x) {
      double t = (x + 0.5 - center) / filterscale;
      double wgt = (t < 0 ? -t : t) < 1.0 ? 1.0 - std::fabs(t) : 0.0;
      ww[x - xmin] = wgt;
      total += wgt;
    }
    if (total <= 0.0) total = 1.0;
    c.bounds[i] = xmin;
    c.counts[i] = xmax - xmin;
    for (int k = 0; k < xmax - xmin; ++k)
      c.weights[static_cast<size_t>(i) * kmax + k] =
          static_cast<float>(ww[k] / total);
  }
  return c;
}

}  // namespace

// Antialiased bilinear resize of an RGB8 HWC image to float32 HWC in [0,255].
void resize_bilinear_f32(const uint8_t* src, int sh, int sw, float* dst,
                         int dh, int dw) {
  Coeffs cx = make_coeffs(sw, dw);
  Coeffs cy = make_coeffs(sh, dh);
  // horizontal pass: (sh, sw, 3) u8 -> (sh, dw, 3) f32
  std::vector<float> tmp(static_cast<size_t>(sh) * dw * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* srow = src + static_cast<size_t>(y) * sw * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const int x0 = cx.bounds[x], n = cx.counts[x];
      const float* wgt = &cx.weights[static_cast<size_t>(x) * cx.kmax];
      float r = 0, g = 0, b = 0;
      for (int k = 0; k < n; ++k) {
        const uint8_t* p = srow + static_cast<size_t>(x0 + k) * 3;
        const float wk = wgt[k];
        r += wk * p[0];
        g += wk * p[1];
        b += wk * p[2];
      }
      trow[x * 3 + 0] = r;
      trow[x * 3 + 1] = g;
      trow[x * 3 + 2] = b;
    }
  }
  // vertical pass: (sh, dw, 3) -> (dh, dw, 3)
  for (int y = 0; y < dh; ++y) {
    const int y0 = cy.bounds[y], n = cy.counts[y];
    const float* wgt = &cy.weights[static_cast<size_t>(y) * cy.kmax];
    float* drow = dst + static_cast<size_t>(y) * dw * 3;
    std::memset(drow, 0, sizeof(float) * dw * 3);
    for (int k = 0; k < n; ++k) {
      const float wk = wgt[k];
      const float* trow = tmp.data() + static_cast<size_t>(y0 + k) * dw * 3;
      for (int i = 0; i < dw * 3; ++i) drow[i] += wk * trow[i];
    }
  }
}

// Fused: JPEG bytes -> square-resized, ImageNet-normalized float32 HWC.
// Returns 0 on success; orig dims written to out_w/out_h.
int decode_resize_normalize(const uint8_t* data, long len, int size,
                            float* out, int* out_w, int* out_h,
                            const float* mean, const float* stdv) {
  int w = 0, h = 0;
  if (jpeg_dims(data, len, &w, &h)) return 1;
  std::vector<uint8_t> rgb(static_cast<size_t>(w) * h * 3);
  int w2, h2;
  if (decode_jpeg(data, len, rgb.data(), static_cast<long>(rgb.size()), &w2, &h2))
    return 1;
  std::vector<float> resized(static_cast<size_t>(size) * size * 3);
  resize_bilinear_f32(rgb.data(), h2, w2, resized.data(), size, size);
  const float inv255 = 1.0f / 255.0f;
  const float m0 = mean[0], m1 = mean[1], m2 = mean[2];
  const float i0 = inv255 / stdv[0], i1 = inv255 / stdv[1], i2 = inv255 / stdv[2];
  const float o0 = m0 / stdv[0], o1 = m1 / stdv[1], o2 = m2 / stdv[2];
  const size_t n = static_cast<size_t>(size) * size;
  for (size_t i = 0; i < n; ++i) {
    out[i * 3 + 0] = resized[i * 3 + 0] * i0 - o0;
    out[i * 3 + 1] = resized[i * 3 + 1] * i1 - o1;
    out[i * 3 + 2] = resized[i * 3 + 2] * i2 - o2;
  }
  *out_w = w2;
  *out_h = h2;
  return 0;
}

}  // extern "C"
