// Native video IO: multithreaded JPEG/PNG decode + Lanczos-3 resize.
//
// The reference loads frames one-by-one through PIL (data/data_utils.py:79-104
// load_video — LANCZOS resize, [0,1] float, T×3×H×W); at benchmark scale the
// host-side decode/resize is a startup bottleneck for every pipeline stage.
// This library decodes a batch of frames across threads and resamples with
// PIL's exact Lanczos-3 kernel (sinc windowed, per-pixel normalized weights,
// separable horizontal-then-vertical passes in float32).
//
// Exposed C ABI (ctypes-bound in dino_tracker_tpu/utils/native_io.py):
//   int decode_resize_batch(const char** paths, int n_frames,
//                           int out_h, int out_w, float* out_chw,
//                           int n_threads);
// Returns 0 on success; out buffer is n_frames×3×out_h×out_w float32 in [0,1].

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  int w = 0, h = 0, channels = 0;
  std::vector<uint8_t> data;  // HWC row-major
};

// ---------------------------------------------------------------------------
// decoding
// ---------------------------------------------------------------------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->channels = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(FILE* f, Image* out) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_expand(png);          // palette/gray->8bit, tRNS->alpha
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->channels = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->data.data() + size_t(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
  } else if (got >= 8 && !png_sig_cmp(magic, 0, 8)) {
    ok = decode_png(f, out);
  }
  fclose(f);
  return ok;
}

// ---------------------------------------------------------------------------
// Lanczos-3 resampling (PIL semantics: float accumulation, normalized
// per-output-pixel weights, filterscale = max(in/out, 1))
// ---------------------------------------------------------------------------

double lanczos3(double x) {
  auto sinc = [](double v) {
    if (v == 0.0) return 1.0;
    const double p = v * M_PI;
    return std::sin(p) / p;
  };
  if (x <= -3.0 || x >= 3.0) return 0.0;
  return sinc(x) * sinc(x / 3.0);
}

struct ResampleWeights {
  std::vector<int> xmin, xmax;          // per output pixel: window bounds
  std::vector<std::vector<double>> k;   // per output pixel: weights
};

ResampleWeights precompute(int in_size, int out_size) {
  ResampleWeights rw;
  rw.xmin.resize(out_size);
  rw.xmax.resize(out_size);
  rw.k.resize(out_size);
  const double scale = double(in_size) / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 3.0 * filterscale;
  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = int(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = int(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    std::vector<double> k(xmax - xmin);
    double sum = 0.0;
    for (int x = xmin; x < xmax; ++x) {
      const double w = lanczos3((x - center + 0.5) / filterscale);
      k[x - xmin] = w;
      sum += w;
    }
    if (sum != 0.0)
      for (double& w : k) w /= sum;
    rw.xmin[xx] = xmin;
    rw.xmax[xx] = xmax;
    rw.k[xx] = std::move(k);
  }
  return rw;
}

inline uint8_t clip8(double v) {
  const double r = std::round(v);
  if (r <= 0.0) return 0;
  if (r >= 255.0) return 255;
  return uint8_t(r);
}

// uint8 HWC -> float32 CHW resized to (out_h, out_w), values in [0, 1].
// Like PIL, the intermediate of the separable pass is clipped/rounded to
// uint8 (ImagingResampleHorizontal_8bpc), so Lanczos ringing clips per pass.
void resize_lanczos(const Image& img, int out_h, int out_w, float* out_chw) {
  const ResampleWeights wx = precompute(img.w, out_w);
  const ResampleWeights wy = precompute(img.h, out_h);

  // horizontal pass: img.h × out_w × 3, uint8 like PIL's intermediate
  std::vector<uint8_t> tmp(size_t(img.h) * out_w * 3);
  for (int y = 0; y < img.h; ++y) {
    const uint8_t* row = img.data.data() + size_t(y) * img.w * 3;
    uint8_t* trow = tmp.data() + size_t(y) * out_w * 3;
    for (int xx = 0; xx < out_w; ++xx) {
      const auto& k = wx.k[xx];
      const int xmin = wx.xmin[xx];
      double acc[3] = {0, 0, 0};
      for (size_t j = 0; j < k.size(); ++j) {
        const uint8_t* px = row + size_t(xmin + j) * 3;
        acc[0] += k[j] * px[0];
        acc[1] += k[j] * px[1];
        acc[2] += k[j] * px[2];
      }
      trow[xx * 3 + 0] = clip8(acc[0]);
      trow[xx * 3 + 1] = clip8(acc[1]);
      trow[xx * 3 + 2] = clip8(acc[2]);
    }
  }

  // vertical pass -> uint8 (PIL) -> CHW float [0, 1]
  const size_t plane = size_t(out_h) * out_w;
  for (int yy = 0; yy < out_h; ++yy) {
    const auto& k = wy.k[yy];
    const int ymin = wy.xmin[yy];
    for (int xx = 0; xx < out_w; ++xx) {
      double acc[3] = {0, 0, 0};
      for (size_t j = 0; j < k.size(); ++j) {
        const uint8_t* px = tmp.data() + (size_t(ymin + j) * out_w + xx) * 3;
        acc[0] += k[j] * px[0];
        acc[1] += k[j] * px[1];
        acc[2] += k[j] * px[2];
      }
      for (int c = 0; c < 3; ++c) {
        out_chw[c * plane + size_t(yy) * out_w + xx] =
            float(clip8(acc[c])) / 255.0f;
      }
    }
  }
}

}  // namespace

extern "C" {

int decode_resize_batch(const char** paths, int n_frames, int out_h, int out_w,
                        float* out_chw, int n_threads) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  std::atomic<int> next(0);
  std::atomic<int> failed(-1);
  const size_t frame_stride = size_t(3) * out_h * out_w;

  auto worker = [&]() {
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n_frames || failed.load() >= 0) return;
      Image img;
      if (!decode_file(paths[i], &img)) {
        failed.store(i);
        return;
      }
      resize_lanczos(img, out_h, out_w, out_chw + size_t(i) * frame_stride);
    }
  };

  std::vector<std::thread> threads;
  const int nt = std::min(n_threads, n_frames > 0 ? n_frames : 1);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load() >= 0 ? failed.load() + 1 : 0;
}

}  // extern "C"
