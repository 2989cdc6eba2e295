// Native host-side image loader for tgsr_tpu.
//
// Role: the reference does all host preprocessing in Python DataLoader
// workers with PIL (datasets.py:112-278). On a TPU host feeding thousands
// of images/sec, Python-side decode becomes the bottleneck; this library
// provides multi-threaded JPEG/PNG decode + antialiased separable
// triangle-filter resize (PIL.Image.BILINEAR-equivalent) behind a plain C
// ABI consumed via ctypes (tgsr_tpu/native/__init__.py).
//
// Build: g++ -O3 -march=native -shared -fPIC loader.cpp -o libtgsr_loader.so
//        -ljpeg -lpng -lz -lpthread

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<uint8_t> data;  // RGB8, row-major
  int h = 0, w = 0;
  bool ok = false;
};

// ---------------------------------------------------------------- JPEG ----
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

Image decode_jpeg(const uint8_t* buf, size_t len) {
  Image im;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return im;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  im.w = cinfo.output_width;
  im.h = cinfo.output_height;
  im.data.resize(size_t(im.w) * im.h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = im.data.data() + size_t(cinfo.output_scanline) * im.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  im.ok = true;
  return im;
}

// ----------------------------------------------------------------- PNG ----
struct PngReadState {
  const uint8_t* buf;
  size_t len;
  size_t pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  PngReadState* s = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (s->pos + n > s->len) {
    png_error(png, "read past end");
  }
  std::memcpy(out, s->buf + s->pos, n);
  s->pos += n;
}

Image decode_png(const uint8_t* buf, size_t len) {
  Image im;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return im;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return im;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return im;
  }
  PngReadState state{buf, len, 0};
  png_set_read_fn(png, &state, png_read_fn);
  png_read_info(png, info);

  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_read_update_info(png, info);

  im.w = png_get_image_width(png, info);
  im.h = png_get_image_height(png, info);
  im.data.resize(size_t(im.w) * im.h * 3);
  std::vector<png_bytep> rows(im.h);
  size_t rowbytes = png_get_rowbytes(png, info);
  std::vector<uint8_t> tmp;
  bool direct = rowbytes == size_t(im.w) * 3;
  if (!direct) tmp.resize(rowbytes * im.h);
  for (int y = 0; y < im.h; ++y) {
    rows[y] = direct ? im.data.data() + size_t(y) * im.w * 3
                     : tmp.data() + size_t(y) * rowbytes;
  }
  png_read_image(png, rows.data());
  if (!direct) {
    for (int y = 0; y < im.h; ++y)
      std::memcpy(im.data.data() + size_t(y) * im.w * 3,
                  tmp.data() + size_t(y) * rowbytes, size_t(im.w) * 3);
  }
  png_destroy_read_struct(&png, &info, nullptr);
  im.ok = true;
  return im;
}

Image decode_any(const uint8_t* buf, size_t len) {
  if (len > 3 && buf[0] == 0xFF && buf[1] == 0xD8) return decode_jpeg(buf, len);
  if (len > 8 && buf[0] == 0x89 && buf[1] == 'P') return decode_png(buf, len);
  return Image{};
}

Image load_file(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return Image{};
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(n > 0 ? size_t(n) : 0);
  size_t got = buf.empty() ? 0 : std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  if (got != buf.size()) return Image{};
  return decode_any(buf.data(), buf.size());
}

// ------------------------------------------------- triangle-filter resize --
// Separable antialiased bilinear (PIL.Image.BILINEAR semantics: triangle
// filter with support scaled by the downsampling factor).
struct FilterWeights {
  std::vector<int> start;       // first source index per output pixel
  std::vector<int> size;        // taps per output pixel
  std::vector<float> weights;   // taps, row-major [out, max_taps]
  int max_taps = 0;
};

FilterWeights triangle_weights(int in_size, int out_size) {
  FilterWeights fw;
  double scale = double(in_size) / out_size;
  double support = std::max(1.0, scale);
  fw.max_taps = int(std::ceil(support * 2)) + 2;
  fw.start.resize(out_size);
  fw.size.resize(out_size);
  fw.weights.assign(size_t(out_size) * fw.max_taps, 0.f);
  for (int i = 0; i < out_size; ++i) {
    double center = (i + 0.5) * scale;
    int lo = std::max(0, int(std::floor(center - support)));
    int hi = std::min(in_size, int(std::ceil(center + support)));
    double total = 0;
    std::vector<double> w(hi - lo);
    for (int j = lo; j < hi; ++j) {
      double x = (j + 0.5 - center) / std::max(1.0, scale);
      double v = std::max(0.0, 1.0 - std::fabs(x));
      w[j - lo] = v;
      total += v;
    }
    fw.start[i] = lo;
    fw.size[i] = hi - lo;
    for (int j = 0; j < hi - lo; ++j)
      fw.weights[size_t(i) * fw.max_taps + j] = float(w[j] / total);
  }
  return fw;
}

void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                     int dw) {
  FilterWeights fx = triangle_weights(sw, dw);
  FilterWeights fy = triangle_weights(sh, dh);
  // horizontal pass into float buffer [sh, dw, 3]
  std::vector<float> mid(size_t(sh) * dw * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + size_t(y) * sw * 3;
    float* orow = mid.data() + size_t(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      float r = 0, g = 0, b = 0;
      int s0 = fx.start[x], n = fx.size[x];
      const float* w = fx.weights.data() + size_t(x) * fx.max_taps;
      for (int k = 0; k < n; ++k) {
        const uint8_t* p = row + size_t(s0 + k) * 3;
        r += w[k] * p[0];
        g += w[k] * p[1];
        b += w[k] * p[2];
      }
      orow[x * 3 + 0] = r;
      orow[x * 3 + 1] = g;
      orow[x * 3 + 2] = b;
    }
  }
  // vertical pass
  for (int y = 0; y < dh; ++y) {
    int s0 = fy.start[y], n = fy.size[y];
    const float* w = fy.weights.data() + size_t(y) * fy.max_taps;
    uint8_t* orow = dst + size_t(y) * dw * 3;
    for (int x = 0; x < dw * 3; ++x) {
      float acc = 0;
      for (int k = 0; k < n; ++k)
        acc += w[k] * mid[size_t(s0 + k) * dw * 3 + x];
      int v = int(acc + 0.5f);
      orow[x] = uint8_t(std::clamp(v, 0, 255));
    }
  }
}

// center-crop-resize: resize shorter side to target*enlarge, center crop
void load_resize_one(const char* path, int target, float enlarge,
                     uint8_t* out, int* ok) {
  Image im = load_file(path);
  if (!im.ok || im.w <= 0 || im.h <= 0) {
    *ok = 0;
    return;
  }
  // Clamp so the center-crop window always fits: enlarge < 1.0 would make
  // pre < target and the crop offsets negative (out-of-bounds memcpy).
  int pre = std::max(int(target * enlarge), target);
  // torchvision Resize(int) semantics: the long side TRUNCATES
  // (int(size*long/short)); rounding instead shifts the center-crop
  // window by one pixel on some aspect ratios (must match the PIL path
  // in data/datasets.py::_center_crop_resize)
  int rw, rh;
  if (im.w <= im.h) {
    rw = pre;
    rh = std::max(pre, int(double(pre) * im.h / im.w));
  } else {
    rh = pre;
    rw = std::max(pre, int(double(pre) * im.w / im.h));
  }
  std::vector<uint8_t> resized(size_t(rw) * rh * 3);
  resize_bilinear(im.data.data(), im.h, im.w, resized.data(), rh, rw);
  int left = (rw - target) / 2, top = (rh - target) / 2;
  for (int y = 0; y < target; ++y)
    std::memcpy(out + size_t(y) * target * 3,
                resized.data() + (size_t(top + y) * rw + left) * 3,
                size_t(target) * 3);
  *ok = 1;
}

}  // namespace

extern "C" {

// Decode one image, center-crop-resize to [target, target, 3] uint8.
// Returns 1 on success.
int tgsr_load_image(const char* path, int target, float enlarge,
                    uint8_t* out) {
  int ok = 0;
  load_resize_one(path, target, enlarge, out, &ok);
  return ok;
}

// Batched threaded loader: paths is n null-terminated strings concatenated;
// offsets[n] gives each string's start. out is [n, target, target, 3].
// Returns number of successfully loaded images; failures are zero-filled.
int tgsr_load_batch(const char* paths, const int64_t* offsets, int n,
                    int target, float enlarge, int threads, uint8_t* out) {
  std::atomic<int> next{0}, good{0};
  auto worker = [&] {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      uint8_t* dst = out + size_t(i) * target * target * 3;
      int ok = 0;
      load_resize_one(paths + offsets[i], target, enlarge, dst, &ok);
      if (ok) {
        good.fetch_add(1);
      } else {
        std::memset(dst, 0, size_t(target) * target * 3);
      }
    }
  };
  int t = std::max(1, std::min(threads, n));
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return good.load();
}

// Plain decode-to-RGB (no resize); out must hold h*w*3 from tgsr_probe.
int tgsr_probe(const char* path, int* h, int* w) {
  Image im = load_file(path);
  if (!im.ok) return 0;
  *h = im.h;
  *w = im.w;
  return 1;
}

int tgsr_decode(const char* path, uint8_t* out, int64_t capacity) {
  Image im = load_file(path);
  if (!im.ok) return 0;
  int64_t need = int64_t(im.h) * im.w * 3;
  if (need > capacity) return 0;
  std::memcpy(out, im.data.data(), size_t(need));
  return 1;
}

}  // extern "C"
