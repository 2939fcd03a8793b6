// Native frame pump: threaded image decode + prefetch ring for the SLAM
// engine's input side.
//
// TPU-native analog of the reference's host runtime input machinery: the
// Console app's OpenCV VideoCapture + grayscale + resize golden path
// (Apps/Console/console.cpp:291-341), the ImageFactory pooled per-frame
// buffers (Core Image/ImageFactory.h:21-60), and the Arcana background
// dispatcher that pumps the analysis queue (arcana/threading/
// dispatcher.h:17-50).  Decoding/resizing is pure host-side byte work —
// exactly what the reference keeps in C++ — so it lives here, overlapping
// disk + decode with device compute, with a bounded queue providing the
// same backpressure semantics as the reference's OneAtATime gate.
//
// Formats: PNG (libpng, any bit depth/channels -> gray), PGM/PPM (P5/P6),
// JPEG (libjpeg).  Output: float32 grayscale in [0, 255], bilinearly
// resized to the requested tracking resolution (console.cpp:70 resizes to
// width 320).
//
// C API (ctypes-friendly), see mageslam_tpu/io/native_loader.py.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<float> gray;  // w*h, [0,255]
};

// ---------------------------------------------------------------- PGM/PPM
bool load_pnm(FILE* f, Image* out) {
  char magic[3] = {0};
  if (fscanf(f, "%2s", magic) != 1) return false;
  bool ppm = strcmp(magic, "P6") == 0;
  if (!ppm && strcmp(magic, "P5") != 0) return false;
  auto skip_ws = [&]() {
    int c;
    while ((c = fgetc(f)) != EOF) {
      if (c == '#') {
        while ((c = fgetc(f)) != EOF && c != '\n') {
        }
      } else if (!isspace(c)) {
        ungetc(c, f);
        return;
      }
    }
  };
  int w, h, maxv;
  skip_ws();
  if (fscanf(f, "%d", &w) != 1) return false;
  skip_ws();
  if (fscanf(f, "%d", &h) != 1) return false;
  skip_ws();
  if (fscanf(f, "%d", &maxv) != 1) return false;
  fgetc(f);  // single whitespace
  int ch = ppm ? 3 : 1;
  std::vector<uint8_t> buf((size_t)w * h * ch);
  if (fread(buf.data(), 1, buf.size(), f) != buf.size()) return false;
  out->w = w;
  out->h = h;
  out->gray.resize((size_t)w * h);
  for (size_t i = 0; i < (size_t)w * h; ++i) {
    if (ppm) {
      out->gray[i] = 0.299f * buf[i * 3 + 0] + 0.587f * buf[i * 3 + 1] +
                     0.114f * buf[i * 3 + 2];
    } else {
      out->gray[i] = buf[i];
    }
  }
  return true;
}

// -------------------------------------------------------------------- PNG
bool load_png(FILE* f, Image* out) {
  uint8_t sig[8];
  if (fread(sig, 1, 8, f) != 8 || png_sig_cmp(sig, 0, 8)) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
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
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);
  // normalize to 8-bit gray
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_expand(png);
  int color = png_get_color_type(png, info);
  if (color & PNG_COLOR_MASK_COLOR) {
    png_set_rgb_to_gray(png, PNG_ERROR_ACTION_NONE, -1, -1);
  }
  png_read_update_info(png, info);
  int w = png_get_image_width(png, info);
  int h = png_get_image_height(png, info);
  std::vector<uint8_t> row(png_get_rowbytes(png, info));
  out->w = w;
  out->h = h;
  out->gray.resize((size_t)w * h);
  for (int y = 0; y < h; ++y) {
    png_read_row(png, row.data(), nullptr);
    for (int x = 0; x < w; ++x) out->gray[(size_t)y * w + x] = row[x];
  }
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// ------------------------------------------------------------------- JPEG
bool load_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height;
  out->w = w;
  out->h = h;
  out->gray.resize((size_t)w * h);
  std::vector<uint8_t> row(w);
  JSAMPROW rp = row.data();
  for (int y = 0; y < h; ++y) {
    jpeg_read_scanlines(&cinfo, &rp, 1);
    for (int x = 0; x < w; ++x) out->gray[(size_t)y * w + x] = row[x];
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool load_image(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t head[8] = {0};
  size_t n = fread(head, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (n >= 8 && !png_sig_cmp(head, 0, 8)) {
    ok = load_png(f, out);
  } else if (n >= 2 && head[0] == 'P' && (head[1] == '5' || head[1] == '6')) {
    ok = load_pnm(f, out);
  } else if (n >= 2 && head[0] == 0xFF && head[1] == 0xD8) {
    ok = load_jpeg(f, out);
  }
  fclose(f);
  return ok;
}

void resize_bilinear(const Image& src, int w, int h, float* out) {
  if (src.w == w && src.h == h) {
    memcpy(out, src.gray.data(), sizeof(float) * (size_t)w * h);
    return;
  }
  const float sx = (float)src.w / w, sy = (float)src.h / h;
  for (int y = 0; y < h; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)fy;
    if (y0 < 0) y0 = 0;
    int y1 = y0 + 1 < src.h ? y0 + 1 : src.h - 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < w; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)fx;
      if (x0 < 0) x0 = 0;
      int x1 = x0 + 1 < src.w ? x0 + 1 : src.w - 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      const float* s = src.gray.data();
      float a = s[(size_t)y0 * src.w + x0] * (1 - wx) +
                s[(size_t)y0 * src.w + x1] * wx;
      float b = s[(size_t)y1 * src.w + x0] * (1 - wx) +
                s[(size_t)y1 * src.w + x1] * wx;
      out[(size_t)y * w + x] = a * (1 - wy) + b * wy;
    }
  }
}

// -------------------------------------------------------------- frame pump
struct Frame {
  int index = -1;
  std::vector<float> data;
};

struct Pump {
  std::vector<std::string> paths;
  int width, height, capacity;
  std::deque<Frame> queue;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::atomic<int> next_decode{0};
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;
  std::atomic<int> decode_errors{0};
  std::atomic<int> done_workers{0};

  void worker() {
    while (!stop.load()) {
      int idx = next_decode.fetch_add(1);
      if (idx >= (int)paths.size()) break;
      Image img;
      Frame fr;
      fr.index = idx;
      fr.data.resize((size_t)width * height, 0.0f);
      if (load_image(paths[idx].c_str(), &img)) {
        resize_bilinear(img, width, height, fr.data.data());
      } else {
        decode_errors.fetch_add(1);
        fr.index = -(idx + 1);  // decode failure marker
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_push.wait(lk, [&] {
        return stop.load() || (int)queue.size() < capacity;
      });
      if (stop.load()) break;
      queue.push_back(std::move(fr));
      cv_pop.notify_one();
    }
    done_workers.fetch_add(1);
    cv_pop.notify_all();
  }
};

}  // namespace

extern "C" {

void* pump_create(const char** paths, int n_paths, int width, int height,
                  int capacity, int n_threads) {
  auto* p = new Pump();
  p->paths.assign(paths, paths + n_paths);
  p->width = width;
  p->height = height;
  p->capacity = capacity > 0 ? capacity : 8;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; ++i) {
    p->workers.emplace_back([p] { p->worker(); });
  }
  return p;
}

// Blocks until a frame is ready.  Returns the frame index (>= 0), or
// -(idx+1) for a decode failure of that index, or -1000000 at end of
// stream.  NOTE: frames may arrive out of order with n_threads > 1; the
// python wrapper reorders.
int pump_next(void* pump, float* out) {
  auto* p = (Pump*)pump;
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_pop.wait(lk, [&] {
    return !p->queue.empty() ||
           p->done_workers.load() == (int)p->workers.size();
  });
  if (p->queue.empty()) return -1000000;
  Frame fr = std::move(p->queue.front());
  p->queue.pop_front();
  p->cv_push.notify_one();
  lk.unlock();
  memcpy(out, fr.data.data(), sizeof(float) * (size_t)p->width * p->height);
  return fr.index;
}

void pump_destroy(void* pump) {
  auto* p = (Pump*)pump;
  p->stop.store(true);
  p->cv_push.notify_all();
  p->cv_pop.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

int pump_decode_errors(void* pump) {
  return ((Pump*)pump)->decode_errors.load();
}

// Standalone single-image read (decode + resize to width x height).
int read_image_gray(const char* path, float* out, int width, int height) {
  Image img;
  if (!load_image(path, &img)) return -1;
  resize_bilinear(img, width, height, out);
  return 0;
}

int image_size(const char* path, int* w, int* h) {
  Image img;
  if (!load_image(path, &img)) return -1;
  *w = img.w;
  *h = img.h;
  return 0;
}

}  // extern "C"
