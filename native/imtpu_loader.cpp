// Native host-side image pipeline for imagenet_models_tpu.
//
// The reference's input throughput comes from torchvision/PIL's C JPEG decode
// inside torch DataLoader worker processes (SURVEY §2.2). This library is the
// TPU-stack equivalent: fused JPEG decode + random-resized-crop + resize +
// flip per image, with an internal std::thread pool for batch decoding, called
// from Python via ctypes (the GIL is released for the duration of the call).
//
// Decode uses libjpeg with DCT scaling (scale_denom) so large JPEGs are
// decoded directly to ~target resolution instead of full size.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libimtpu_loader.so \
//        imtpu_loader.cpp -ljpeg -lpthread

#include <cstdio>  // must precede jpeglib.h (it needs FILE)

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <random>
#include <thread>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

struct Image {
  std::vector<uint8_t> data;  // RGB, HWC
  int w = 0, h = 0;
};

// Decode a JPEG file to RGB. min_side: if >0, use DCT scaling so the decoded
// shorter side stays >= min_side (but as small as possible).
bool decode_jpeg(const char* path, int min_side, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  if (min_side > 0) {
    int shorter = std::min<int>(cinfo.image_width, cinfo.image_height);
    // scale_num/8: pick the largest denominator keeping shorter*num/8 >= min_side
    for (int num = 1; num <= 8; ++num) {
      if (shorter * num / 8 >= min_side || num == 8) {
        cinfo.scale_num = num;
        cinfo.scale_denom = 8;
        break;
      }
    }
  }
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->data.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Bilinear resize of an RGB crop region (half-pixel centers) into dst.
void resize_crop_bilinear(const Image& src, int cx, int cy, int cw, int ch,
                          uint8_t* dst, int size, bool hflip) {
  const float sx = float(cw) / size, sy = float(ch) / size;
  for (int oy = 0; oy < size; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f + cy;
    int y0 = int(floorf(fy));
    float wy = fy - y0;
    int y1 = std::min(y0 + 1, src.h - 1);
    y0 = std::max(0, std::min(y0, src.h - 1));
    for (int ox = 0; ox < size; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f + cx;
      int x0 = int(floorf(fx));
      float wx = fx - x0;
      int x1 = std::min(x0 + 1, src.w - 1);
      x0 = std::max(0, std::min(x0, src.w - 1));
      const uint8_t* p00 = &src.data[(size_t(y0) * src.w + x0) * 3];
      const uint8_t* p01 = &src.data[(size_t(y0) * src.w + x1) * 3];
      const uint8_t* p10 = &src.data[(size_t(y1) * src.w + x0) * 3];
      const uint8_t* p11 = &src.data[(size_t(y1) * src.w + x1) * 3];
      int out_x = hflip ? (size - 1 - ox) : ox;
      uint8_t* d = dst + (size_t(oy) * size + out_x) * 3;
      for (int c = 0; c < 3; ++c) {
        float v = (1 - wy) * ((1 - wx) * p00[c] + wx * p01[c]) +
                  wy * ((1 - wx) * p10[c] + wx * p11[c]);
        d[c] = uint8_t(std::min(255.f, std::max(0.f, v + 0.5f)));
      }
    }
  }
}

// timm-style RandomResizedCrop rect: scale (0.08,1), ratio (3/4,4/3), 10 tries.
void rrc_rect(int w, int h, uint64_t seed, int* cx, int* cy, int* cw, int* ch) {
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<float> uni(0.f, 1.f);
  const float area = float(w) * h;
  const float log_rmin = logf(3.f / 4.f), log_rmax = logf(4.f / 3.f);
  for (int i = 0; i < 10; ++i) {
    float target = area * (0.08f + uni(rng) * (1.0f - 0.08f));
    float aspect = expf(log_rmin + uni(rng) * (log_rmax - log_rmin));
    int tw = int(roundf(sqrtf(target * aspect)));
    int th = int(roundf(sqrtf(target / aspect)));
    if (tw > 0 && tw <= w && th > 0 && th <= h) {
      *cx = int(uni(rng) * (w - tw + 1));
      *cy = int(uni(rng) * (h - th + 1));
      *cw = tw;
      *ch = th;
      return;
    }
  }
  // center-crop fallback
  float in_ratio = float(w) / h;
  int tw = w, th = h;
  if (in_ratio < 3.f / 4.f) th = int(roundf(w / (3.f / 4.f)));
  else if (in_ratio > 4.f / 3.f) tw = int(roundf(h * (4.f / 3.f)));
  *cx = (w - tw) / 2;
  *cy = (h - th) / 2;
  *cw = tw;
  *ch = th;
}

}  // namespace

extern "C" {

// Train-mode: decode + RandomResizedCrop + bilinear resize + optional hflip.
// out: size*size*3 uint8. Returns 0 on success.
int imtpu_decode_rrc(const char* path, uint64_t seed, int size, int hflip,
                     uint8_t* out) {
  Image img;
  if (!decode_jpeg(path, /*min_side=*/0, &img) || img.w <= 0 || img.h <= 0)
    return 1;
  int cx, cy, cw, ch;
  rrc_rect(img.w, img.h, seed, &cx, &cy, &cw, &ch);
  bool flip = false;
  if (hflip) {
    std::mt19937_64 rng(seed ^ 0x9e3779b97f4a7c15ull);
    flip = (rng() & 1) != 0;
  }
  resize_crop_bilinear(img, cx, cy, cw, ch, out, size, flip);
  return 0;
}

// Eval-mode: decode (DCT-scaled) + resize shorter side to size/crop_pct +
// center crop. Returns 0 on success.
int imtpu_decode_center(const char* path, int size, float crop_pct,
                        uint8_t* out) {
  int scale_size = int(floorf(size / crop_pct));
  Image img;
  if (!decode_jpeg(path, scale_size, &img) || img.w <= 0 || img.h <= 0)
    return 1;
  // resize shorter side to scale_size (aspect preserved), crop center size^2.
  float ratio = float(scale_size) / std::min(img.w, img.h);
  int rw = int(roundf(img.w * ratio)), rh = int(roundf(img.h * ratio));
  // express center crop directly in source coords
  float inv = 1.0f / ratio;
  int crop_src = int(roundf(size * inv));
  int cx = std::max(0, (img.w - crop_src) / 2);
  int cy = std::max(0, (img.h - crop_src) / 2);
  (void)rw;
  (void)rh;
  resize_crop_bilinear(img, cx, cy, std::min(crop_src, img.w),
                       std::min(crop_src, img.h), out, size, false);
  return 0;
}

// Batch decode with an internal thread pool. mode 0=train(rrc) 1=eval.
// paths: array of n C strings; seeds: n seeds; out: n*size*size*3 uint8.
// Returns number of failures.
int imtpu_decode_batch(const char** paths, const uint64_t* seeds, int n,
                       int size, int mode, int hflip, float crop_pct,
                       int num_threads, uint8_t* out) {
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      uint8_t* dst = out + size_t(i) * size * size * 3;
      int rc = mode == 0 ? imtpu_decode_rrc(paths[i], seeds[i], size, hflip, dst)
                         : imtpu_decode_center(paths[i], size, crop_pct, dst);
      if (rc) {
        memset(dst, 128, size_t(size) * size * 3);  // grey on decode failure
        failures.fetch_add(1);
      }
    }
  };
  int nt = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

}  // extern "C"
