// s4_native — native (C++) data-path runtime for s4former_tpu.
//
// The reference's input pipeline rides on native code it gets for free
// from its dependencies: torch DataLoader worker processes + PIL/cv2
// (libjpeg/libpng/SIMD) for decode and resampling (reference:
// mmseg/datasets/builder.py:116-211, pipelines/loading.py:24,104,
// pipelines/transforms.py:171). This module is the TPU-framework
// equivalent: image decode and PIL-semantics resampling implemented
// directly against libjpeg/libpng with the GIL released, so the loader's
// host-side thread pool (data/loader.py) scales across cores instead of
// serializing on Python.
//
// Exact-parity contract (tests/test_native/):
//   - decode_rgb   == np.asarray(PIL.Image.open(...).convert('RGB'))
//   - decode_label == np.asarray(PIL.Image.open(...)) for palette/gray
//                     label PNGs (raw palette indices, NOT expanded)
//   - resize_bilinear / resize_nearest == PIL Image.resize semantics
//     (the antialiased triangle filter with PIL's fixed-point rounding),
//     because augmentation resampling moves mIoU (SURVEY.md §7 "hard
//     parts": align-corners / resize semantics).
//
// No numpy C API: functions return (bytearray, shape) and the thin
// Python wrapper in s4former_tpu/native/__init__.py wraps them
// zero-copy with np.frombuffer.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

// ---------------------------------------------------------------------
// JPEG decode (libjpeg, JCS_RGB, default ISLOW DCT like PIL)
// ---------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg_rgb(const uint8_t* data, size_t len,
                     std::vector<uint8_t>& out, int& h, int& w,
                     std::string& err) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    err = "libjpeg: decode failed";
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  w = static_cast<int>(cinfo.output_width);
  h = static_cast<int>(cinfo.output_height);
  out.resize(static_cast<size_t>(h) * w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out.data() +
        static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------------------------------------------------------------
// PNG decode (libpng, from-memory read)
// ---------------------------------------------------------------------

struct PngSrc {
  const uint8_t* data;
  size_t len;
  size_t off;
};

void png_read_cb(png_structp p, png_bytep dst, png_size_t n) {
  PngSrc* s = static_cast<PngSrc*>(png_get_io_ptr(p));
  if (s->off + n > s->len) png_error(p, "unexpected EOF");
  memcpy(dst, s->data + s->off, n);
  s->off += n;
}

// rgb=true  -> expand to 3-channel RGB (PIL convert('RGB'): palette
//              expanded, gray replicated, alpha DROPPED, 16-bit stripped).
// rgb=false -> label mode: palette stays as raw indices, gray stays gray,
//              RGB(A) reduced to channel 0 (matching the loader's
//              `seg[..., 0]`). Output is 1 channel.
bool decode_png(const uint8_t* data, size_t len, bool rgb,
                std::vector<uint8_t>& out, int& h, int& w, int& c,
                std::string& err) {
  png_structp p =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr,
                             nullptr);
  if (!p) { err = "libpng: alloc failed"; return false; }
  png_infop info = png_create_info_struct(p);
  if (!info) {
    png_destroy_read_struct(&p, nullptr, nullptr);
    err = "libpng: alloc failed";
    return false;
  }
  if (setjmp(png_jmpbuf(p))) {
    png_destroy_read_struct(&p, &info, nullptr);
    err = "libpng: decode failed";
    return false;
  }
  PngSrc src{data, len, 0};
  png_set_read_fn(p, &src, png_read_cb);
  png_read_info(p, info);

  png_byte color_type = png_get_color_type(p, info);
  png_byte bit_depth = png_get_bit_depth(p, info);

  if (bit_depth == 16) png_set_strip_16(p);
  if (rgb) {
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(p);
    if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
      png_set_expand_gray_1_2_4_to_8(p);
    if (color_type == PNG_COLOR_TYPE_GRAY ||
        color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
      png_set_gray_to_rgb(p);
    png_set_strip_alpha(p);
  } else {
    // Label mode: keep palette indices. Sub-byte packed pixels (palette
    // or gray) are unpacked to one byte each without scaling.
    if (color_type == PNG_COLOR_TYPE_PALETTE && bit_depth < 8)
      png_set_packing(p);
    if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
      png_set_expand_gray_1_2_4_to_8(p);
    png_set_strip_alpha(p);
  }
  png_read_update_info(p, info);

  w = static_cast<int>(png_get_image_width(p, info));
  h = static_cast<int>(png_get_image_height(p, info));
  int channels = static_cast<int>(png_get_channels(p, info));
  size_t rowbytes = png_get_rowbytes(p, info);

  std::vector<uint8_t> raw(static_cast<size_t>(h) * rowbytes);
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; y++) rows[y] = raw.data() + (size_t)y * rowbytes;
  png_read_image(p, rows.data());
  png_destroy_read_struct(&p, &info, nullptr);

  if (rgb) {
    if (channels != 3) { err = "png: expected 3 channels"; return false; }
    c = 3;
    out = std::move(raw);
  } else {
    c = 1;
    out.resize(static_cast<size_t>(h) * w);
    if (channels == 1 && rowbytes == static_cast<size_t>(w)) {
      out = std::move(raw);
    } else {
      for (int y = 0; y < h; y++) {
        const uint8_t* r = raw.data() + (size_t)y * rowbytes;
        uint8_t* o = out.data() + (size_t)y * w;
        for (int x = 0; x < w; x++) o[x] = r[(size_t)x * channels];
      }
    }
  }
  return true;
}

bool is_png(const uint8_t* d, size_t n) {
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', 0x0d, 0x0a,
                                 0x1a, 0x0a};
  return n >= 8 && memcmp(d, sig, 8) == 0;
}

bool is_jpeg(const uint8_t* d, size_t n) {
  return n >= 3 && d[0] == 0xff && d[1] == 0xd8 && d[2] == 0xff;
}

// ---------------------------------------------------------------------
// PIL-semantics resampling, 8 bits/channel fixed-point path.
//
// Triangle (bilinear) filter with antialias support scaling on
// downsample, coefficients quantized to 1<<PRECISION_BITS with
// round-half-away, accumulators seeded with the rounding constant, and
// a horizontal-then-vertical pass order on uint8 intermediates — the
// documented PIL resampling algorithm, reimplemented.
// ---------------------------------------------------------------------

constexpr int PRECISION_BITS = 32 - 8 - 2;

inline uint8_t clip8(int in) {
  if (in >= (255 << PRECISION_BITS)) return 255;
  if (in <= 0) return 0;
  return static_cast<uint8_t>(in >> PRECISION_BITS);
}

inline double triangle_filter(double x) {
  if (x < 0.0) x = -x;
  return x < 1.0 ? 1.0 - x : 0.0;
}

// Per-output-pixel integer coefficient table for one axis.
void precompute_coeffs(int in_size, int out_size,
                       std::vector<int>& bounds, std::vector<int>& kk,
                       int& ksize) {
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = filterscale;  // triangle filter support = 1.0
  ksize = static_cast<int>(ceil(support)) * 2 + 1;
  double ss = 1.0 / filterscale;

  bounds.resize(static_cast<size_t>(out_size) * 2);
  std::vector<double> kd(static_cast<size_t>(out_size) * ksize, 0.0);
  for (int xx = 0; xx < out_size; xx++) {
    double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* k = kd.data() + static_cast<size_t>(xx) * ksize;
    double wsum = 0.0;
    for (int x = 0; x < xmax; x++) {
      double wv = triangle_filter((x + xmin - center + 0.5) * ss);
      k[x] = wv;
      wsum += wv;
    }
    if (wsum != 0.0)
      for (int x = 0; x < xmax; x++) k[x] /= wsum;
    bounds[xx * 2] = xmin;
    bounds[xx * 2 + 1] = xmax;
  }
  kk.resize(kd.size());
  for (size_t i = 0; i < kd.size(); i++) {
    double v = kd[i] * (1 << PRECISION_BITS);
    kk[i] = static_cast<int>(v < 0 ? v - 0.5 : v + 0.5);
  }
}

// Horizontal pass: [h, in_w, c] u8 -> [h, out_w, c] u8.
void resample_horizontal(const uint8_t* in, uint8_t* out, int h,
                         int in_w, int out_w, int c,
                         const std::vector<int>& bounds,
                         const std::vector<int>& kk, int ksize) {
  for (int yy = 0; yy < h; yy++) {
    const uint8_t* irow = in + static_cast<size_t>(yy) * in_w * c;
    uint8_t* orow = out + static_cast<size_t>(yy) * out_w * c;
    for (int xx = 0; xx < out_w; xx++) {
      int xmin = bounds[xx * 2], xmax = bounds[xx * 2 + 1];
      const int* k = kk.data() + static_cast<size_t>(xx) * ksize;
      for (int ch = 0; ch < c; ch++) {
        int ss = 1 << (PRECISION_BITS - 1);
        const uint8_t* ip = irow + static_cast<size_t>(xmin) * c + ch;
        for (int x = 0; x < xmax; x++) ss += ip[(size_t)x * c] * k[x];
        orow[static_cast<size_t>(xx) * c + ch] = clip8(ss);
      }
    }
  }
}

// Vertical pass: [in_h, w, c] u8 -> [out_h, w, c] u8.
void resample_vertical(const uint8_t* in, uint8_t* out, int in_h,
                       int out_h, int w, int c,
                       const std::vector<int>& bounds,
                       const std::vector<int>& kk, int ksize) {
  size_t row = static_cast<size_t>(w) * c;
  for (int yy = 0; yy < out_h; yy++) {
    int ymin = bounds[yy * 2], ymax = bounds[yy * 2 + 1];
    const int* k = kk.data() + static_cast<size_t>(yy) * ksize;
    uint8_t* orow = out + static_cast<size_t>(yy) * row;
    for (size_t i = 0; i < row; i++) {
      int ss = 1 << (PRECISION_BITS - 1);
      const uint8_t* ip = in + static_cast<size_t>(ymin) * row + i;
      for (int y = 0; y < ymax; y++) ss += ip[(size_t)y * row] * k[y];
      orow[i] = clip8(ss);
    }
  }
}

void resize_bilinear_u8(const uint8_t* in, int in_h, int in_w, int c,
                        int out_h, int out_w, std::vector<uint8_t>& out) {
  std::vector<int> xb, xk, yb, yk;
  int xks, yks;
  precompute_coeffs(in_w, out_w, xb, xk, xks);
  precompute_coeffs(in_h, out_h, yb, yk, yks);
  // horizontal first on the full-height image, then vertical —
  // matching PIL's pass order (the uint8 rounding between passes is
  // order-sensitive).
  std::vector<uint8_t> tmp(static_cast<size_t>(in_h) * out_w * c);
  resample_horizontal(in, tmp.data(), in_h, in_w, out_w, c, xb, xk, xks);
  out.resize(static_cast<size_t>(out_h) * out_w * c);
  resample_vertical(tmp.data(), out.data(), in_h, out_h, out_w, c, yb,
                    yk, yks);
}

// PIL NEAREST: scale-affine sampling at pixel centers with INCREMENTAL
// coordinate accumulation (xo starts at scale*0.5 and steps by scale per
// pixel, truncated) — the accumulation order matters for bit-parity with
// PIL on downscales, so it is replicated rather than computed as
// (x+0.5)*scale per pixel.
void resize_nearest_u8(const uint8_t* in, int in_h, int in_w, int c,
                       int out_h, int out_w, std::vector<uint8_t>& out) {
  out.resize(static_cast<size_t>(out_h) * out_w * c);
  double sx = static_cast<double>(in_w) / out_w;
  double sy = static_cast<double>(in_h) / out_h;
  std::vector<int> xmap(out_w);
  double xo = sx * 0.5;
  for (int x = 0; x < out_w; x++) {
    int xi = static_cast<int>(xo);
    xmap[x] = xi < in_w ? xi : in_w - 1;
    xo += sx;
  }
  double yo = sy * 0.5;
  for (int y = 0; y < out_h; y++) {
    int yi = static_cast<int>(yo);
    yo += sy;
    if (yi >= in_h) yi = in_h - 1;
    const uint8_t* irow = in + static_cast<size_t>(yi) * in_w * c;
    uint8_t* orow = out.data() + static_cast<size_t>(y) * out_w * c;
    if (c == 1) {
      for (int x = 0; x < out_w; x++) orow[x] = irow[xmap[x]];
    } else if (c == 3) {
      for (int x = 0; x < out_w; x++) {
        const uint8_t* s = irow + static_cast<size_t>(xmap[x]) * 3;
        uint8_t* d = orow + static_cast<size_t>(x) * 3;
        d[0] = s[0]; d[1] = s[1]; d[2] = s[2];
      }
    } else {
      for (int x = 0; x < out_w; x++)
        memcpy(orow + static_cast<size_t>(x) * c,
               irow + static_cast<size_t>(xmap[x]) * c, c);
    }
  }
}

// ---------------------------------------------------------------------
// PhotoMetricDistortion primitives (cv2-convention HSV), single pass per
// pixel with no intermediate arrays. Bit-exact contracts with the numpy
// reference implementations in data/pipelines/transforms.py:270-307
// (same f32 arithmetic order, np.round = round-half-even = nearbyintf,
// the uint8 casts in _convert TRUNCATE). These three ops were 74% of the
// per-sample pipeline cost in numpy (66.6 of 89.6 ms).
// ---------------------------------------------------------------------

inline uint8_t trunc_clip_u8(float v) {
  if (v < 0.0f) return 0;
  if (v > 255.0f) return 255;
  return static_cast<uint8_t>(v);  // truncation, matching astype(np.uint8)
}

// uint8 RGB -> cv2-style quantized HSV ints (H in [0,180), S/V in
// [0,255]) — transforms.py:_rgb_to_hsv_cv semantics.
inline void px_rgb_to_hsv(uint8_t r8, uint8_t g8, uint8_t b8, int& hh,
                          int& ss, int& vv) {
  float r = r8 / 255.0f, g = g8 / 255.0f, b = b8 / 255.0f;
  float mx = r > g ? (r > b ? r : b) : (g > b ? g : b);
  float mn = r < g ? (r < b ? r : b) : (g < b ? g : b);
  float diff = mx - mn;
  float h = 0.0f;
  if (diff > 0.0f) {
    if (mx == r) {
      // 60*(g-b)/diff is in (-60, 60): the mod-360 reduces to one branch
      h = 60.0f * (g - b) / diff;
      if (h < 0.0f) h += 360.0f;
    } else if (mx == g) {
      h = 60.0f * (b - r) / diff + 120.0f;
    } else {
      h = 60.0f * (r - g) / diff + 240.0f;
    }
  }
  float s = mx > 0.0f ? diff / mx : 0.0f;
  hh = static_cast<int>(nearbyintf(h / 2.0f)) % 180;  // round-half-even
  float ssf = nearbyintf(s * 255.0f);
  ss = ssf < 0 ? 0 : (ssf > 255 ? 255 : static_cast<int>(ssf));
  float vvf = nearbyintf(mx * 255.0f);
  vv = vvf < 0 ? 0 : (vvf > 255 ? 255 : static_cast<int>(vvf));
}

// quantized HSV ints -> uint8 RGB — transforms.py:_hsv_to_rgb_cv.
inline void px_hsv_to_rgb(int hh, int ss, int vv, uint8_t& r8,
                          uint8_t& g8, uint8_t& b8) {
  float h = hh * 2.0f;
  float s = ss / 255.0f;
  float v = vv / 255.0f;
  float c = v * s;
  float hp = h / 60.0f;  // in [0, 6)
  int ip = static_cast<int>(hp);
  // fmodf(hp, 2) == hp - 2*trunc(hp/2), exact in f32 for hp in [0, 6)
  float x = c * (1.0f - fabsf(hp - 2.0f * (ip / 2) - 1.0f));
  int idx = ip % 6;
  float rf = 0, gf = 0, bf = 0;
  switch (idx) {
    case 0: rf = c; gf = x; break;
    case 1: rf = x; gf = c; break;
    case 2: gf = c; bf = x; break;
    case 3: gf = x; bf = c; break;
    case 4: rf = x; bf = c; break;
    default: rf = c; bf = x; break;
  }
  float m = v - c;
  auto q = [](float f) {
    float r = nearbyintf(f * 255.0f);
    return static_cast<uint8_t>(r < 0 ? 0 : (r > 255 ? 255 : r));
  };
  r8 = q(rf + m);
  g8 = q(gf + m);
  b8 = q(bf + m);
}

// img * alpha + beta, truncated-clipped to u8 (PMD._convert).
void convert_u8(const uint8_t* in, size_t n, float alpha, float beta,
                uint8_t* out) {
  for (size_t i = 0; i < n; i++)
    out[i] = trunc_clip_u8(in[i] * alpha + beta);
}

// saturation jitter: RGB -> HSV, S *= alpha (truncate-clip), -> RGB.
void saturation_u8(const uint8_t* in, size_t npx, float alpha,
                   uint8_t* out) {
  for (size_t i = 0; i < npx; i++) {
    int hh, ss, vv;
    px_rgb_to_hsv(in[i * 3], in[i * 3 + 1], in[i * 3 + 2], hh, ss, vv);
    ss = trunc_clip_u8(ss * alpha);
    px_hsv_to_rgb(hh, ss, vv, out[i * 3], out[i * 3 + 1], out[i * 3 + 2]);
  }
}

// hue jitter: RGB -> HSV, H = (H + dh) mod 180, -> RGB.
void hue_u8(const uint8_t* in, size_t npx, int dh, uint8_t* out) {
  for (size_t i = 0; i < npx; i++) {
    int hh, ss, vv;
    px_rgb_to_hsv(in[i * 3], in[i * 3 + 1], in[i * 3 + 2], hh, ss, vv);
    hh = ((hh + dh) % 180 + 180) % 180;
    px_hsv_to_rgb(hh, ss, vv, out[i * 3], out[i * 3 + 1], out[i * 3 + 2]);
  }
}

// (img - mean) / std on u8 RGB -> f32 (Normalize fast path).
void normalize_f32(const uint8_t* in, size_t npx, const float mean[3],
                   const float std3[3], float* out) {
  // true division (not reciprocal-multiply) for bit parity with numpy
  for (size_t i = 0; i < npx; i++)
    for (int c = 0; c < 3; c++)
      out[i * 3 + c] = (in[i * 3 + c] - mean[c]) / std3[c];
}

// ---------------------------------------------------------------------
// Python bindings (no numpy C API: bytearray + shape tuples)
// ---------------------------------------------------------------------

PyObject* make_result(std::vector<uint8_t>& buf, int h, int w, int c) {
  PyObject* ba = PyByteArray_FromStringAndSize(
      reinterpret_cast<const char*>(buf.data()),
      static_cast<Py_ssize_t>(buf.size()));
  if (!ba) return nullptr;
  PyObject* res = Py_BuildValue("(Oiii)", ba, h, w, c);
  Py_DECREF(ba);
  return res;
}

PyObject* py_decode(PyObject*, PyObject* args, bool rgb) {
  Py_buffer view;
  if (!PyArg_ParseTuple(args, "y*", &view)) return nullptr;
  const uint8_t* data = static_cast<const uint8_t*>(view.buf);
  size_t len = static_cast<size_t>(view.len);

  std::vector<uint8_t> out;
  int h = 0, w = 0, c = 0;
  std::string err;
  bool ok = false;
  Py_BEGIN_ALLOW_THREADS
  if (is_jpeg(data, len)) {
    if (rgb) {
      ok = decode_jpeg_rgb(data, len, out, h, w, err);
      c = 3;
    } else {
      err = "labels must be PNG";
    }
  } else if (is_png(data, len)) {
    ok = decode_png(data, len, rgb, out, h, w, c, err);
  } else {
    err = "unsupported image format (not JPEG/PNG)";
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  if (!ok) {
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }
  return make_result(out, h, w, c);
}

PyObject* py_decode_rgb(PyObject* self, PyObject* args) {
  return py_decode(self, args, true);
}

PyObject* py_decode_label(PyObject* self, PyObject* args) {
  return py_decode(self, args, false);
}

PyObject* py_resize(PyObject*, PyObject* args, bool bilinear) {
  Py_buffer view;
  int in_h, in_w, c, out_h, out_w;
  if (!PyArg_ParseTuple(args, "y*iiiii", &view, &in_h, &in_w, &c, &out_h,
                        &out_w))
    return nullptr;
  if (view.len !=
      static_cast<Py_ssize_t>(static_cast<size_t>(in_h) * in_w * c)) {
    PyBuffer_Release(&view);
    PyErr_SetString(PyExc_ValueError, "buffer/shape mismatch");
    return nullptr;
  }
  if (in_h <= 0 || in_w <= 0 || out_h <= 0 || out_w <= 0 || c <= 0 ||
      c > 16) {
    PyBuffer_Release(&view);
    PyErr_SetString(PyExc_ValueError, "bad dimensions");
    return nullptr;
  }
  const uint8_t* in = static_cast<const uint8_t*>(view.buf);
  std::vector<uint8_t> out;
  Py_BEGIN_ALLOW_THREADS
  if (bilinear)
    resize_bilinear_u8(in, in_h, in_w, c, out_h, out_w, out);
  else
    resize_nearest_u8(in, in_h, in_w, c, out_h, out_w, out);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  return make_result(out, out_h, out_w, c);
}

PyObject* py_resize_bilinear(PyObject* self, PyObject* args) {
  return py_resize(self, args, true);
}

PyObject* py_resize_nearest(PyObject* self, PyObject* args) {
  return py_resize(self, args, false);
}

PyObject* py_convert_u8(PyObject*, PyObject* args) {
  Py_buffer view;
  float alpha, beta;
  if (!PyArg_ParseTuple(args, "y*ff", &view, &alpha, &beta))
    return nullptr;
  std::vector<uint8_t> out(static_cast<size_t>(view.len));
  const uint8_t* in = static_cast<const uint8_t*>(view.buf);
  Py_BEGIN_ALLOW_THREADS
  convert_u8(in, out.size(), alpha, beta, out.data());
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  return PyByteArray_FromStringAndSize(
      reinterpret_cast<const char*>(out.data()),
      static_cast<Py_ssize_t>(out.size()));
}

PyObject* py_sat_or_hue(PyObject* args, bool sat) {
  Py_buffer view;
  float alpha = 1.0f;
  int dh = 0;
  bool ok = sat ? PyArg_ParseTuple(args, "y*f", &view, &alpha)
                : PyArg_ParseTuple(args, "y*i", &view, &dh);
  if (!ok) return nullptr;
  if (view.len % 3 != 0) {
    PyBuffer_Release(&view);
    PyErr_SetString(PyExc_ValueError, "expected RGB buffer");
    return nullptr;
  }
  size_t npx = static_cast<size_t>(view.len) / 3;
  std::vector<uint8_t> out(static_cast<size_t>(view.len));
  const uint8_t* in = static_cast<const uint8_t*>(view.buf);
  Py_BEGIN_ALLOW_THREADS
  if (sat)
    saturation_u8(in, npx, alpha, out.data());
  else
    hue_u8(in, npx, dh, out.data());
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  return PyByteArray_FromStringAndSize(
      reinterpret_cast<const char*>(out.data()),
      static_cast<Py_ssize_t>(out.size()));
}

PyObject* py_saturation_u8(PyObject*, PyObject* args) {
  return py_sat_or_hue(args, true);
}

PyObject* py_hue_u8(PyObject*, PyObject* args) {
  return py_sat_or_hue(args, false);
}

PyObject* py_normalize(PyObject*, PyObject* args) {
  Py_buffer view;
  float m0, m1, m2, s0, s1, s2;
  if (!PyArg_ParseTuple(args, "y*ffffff", &view, &m0, &m1, &m2, &s0, &s1,
                        &s2))
    return nullptr;
  if (view.len % 3 != 0) {
    PyBuffer_Release(&view);
    PyErr_SetString(PyExc_ValueError, "expected RGB buffer");
    return nullptr;
  }
  size_t npx = static_cast<size_t>(view.len) / 3;
  std::vector<float> out(npx * 3);
  const uint8_t* in = static_cast<const uint8_t*>(view.buf);
  float mean[3] = {m0, m1, m2}, std3[3] = {s0, s1, s2};
  Py_BEGIN_ALLOW_THREADS
  normalize_f32(in, npx, mean, std3, out.data());
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  return PyByteArray_FromStringAndSize(
      reinterpret_cast<const char*>(out.data()),
      static_cast<Py_ssize_t>(out.size() * sizeof(float)));
}

PyMethodDef methods[] = {
    {"convert_u8", py_convert_u8, METH_VARARGS,
     "convert_u8(buf, alpha, beta) -> bytearray; u8 = clip(u8*a+b)"},
    {"saturation_u8", py_saturation_u8, METH_VARARGS,
     "saturation_u8(rgb_buf, alpha) -> bytearray; HSV S-channel scale"},
    {"hue_u8", py_hue_u8, METH_VARARGS,
     "hue_u8(rgb_buf, dh) -> bytearray; HSV H-channel shift (cv2 conv)"},
    {"normalize_f32", py_normalize, METH_VARARGS,
     "normalize_f32(rgb_u8, m0,m1,m2, s0,s1,s2) -> f32 bytearray"},
    {"decode_rgb", py_decode_rgb, METH_VARARGS,
     "decode_rgb(bytes) -> (bytearray, h, w, 3); JPEG/PNG to RGB u8"},
    {"decode_label", py_decode_label, METH_VARARGS,
     "decode_label(bytes) -> (bytearray, h, w, 1); label PNG raw indices"},
    {"resize_bilinear", py_resize_bilinear, METH_VARARGS,
     "resize_bilinear(buf, h, w, c, oh, ow) -> (bytearray, oh, ow, c)"},
    {"resize_nearest", py_resize_nearest, METH_VARARGS,
     "resize_nearest(buf, h, w, c, oh, ow) -> (bytearray, oh, ow, c)"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_s4_native",
                         "native data-path runtime", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__s4_native(void) {
  return PyModule_Create(&moduledef);
}
