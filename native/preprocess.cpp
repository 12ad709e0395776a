// Host-side image preprocessing for the input pipeline.
//
// The framework's data layer spends its host CPU time in image resizing
// (the reference leans on OpenCV for this, datasets/*.py).  This native
// library implements the hot path - aspect-crop + bilinear resize + pad -
// with a multithreaded, cache-friendly row loop so the input pipeline can
// keep a TPU chip fed without OpenCV in the inner loop.
//
// Exposed C ABI (ctypes, see pats_tpu/data/native.py):
//   resize_bilinear_u8(src, h, w, c, dst, oh, ow, num_threads)
//   crop_resize_pad_u8(src, h, w, c, crop_top, crop_left, crop_h, crop_w,
//                      dst, rh, rw, oh, ow, num_threads)
//
// Bilinear sampling uses half-pixel centers (align_corners=false), the
// same convention as cv2.resize(INTER_LINEAR) in float arithmetic.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

inline float clampf(float v, float lo, float hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// Resize rows [row0, row1) of the (oh x ow) output sampled from src
// (h x w x c).  Row oy is written to dst_base + (oy - row0) * dst_stride.
void resize_rows(const uint8_t* src, int h, int w, int c, uint8_t* dst_base,
                 size_t dst_stride, int oh, int ow, int row0, int row1) {
  const float sy = static_cast<float>(h) / oh;
  const float sx = static_cast<float>(w) / ow;
  std::vector<int> x0(ow), x1(ow);
  std::vector<float> wx(ow);
  for (int ox = 0; ox < ow; ++ox) {
    float fx = clampf((ox + 0.5f) * sx - 0.5f, 0.0f, w - 1.0f);
    x0[ox] = static_cast<int>(fx);
    x1[ox] = std::min(x0[ox] + 1, w - 1);
    wx[ox] = fx - x0[ox];
  }
  for (int oy = row0; oy < row1; ++oy) {
    float fy = clampf((oy + 0.5f) * sy - 0.5f, 0.0f, h - 1.0f);
    int y0 = static_cast<int>(fy);
    int y1 = std::min(y0 + 1, h - 1);
    float wy = fy - y0;
    const uint8_t* r0 = src + static_cast<size_t>(y0) * w * c;
    const uint8_t* r1 = src + static_cast<size_t>(y1) * w * c;
    uint8_t* out = dst_base + static_cast<size_t>(oy - row0) * dst_stride;
    for (int ox = 0; ox < ow; ++ox) {
      const uint8_t* p00 = r0 + static_cast<size_t>(x0[ox]) * c;
      const uint8_t* p01 = r0 + static_cast<size_t>(x1[ox]) * c;
      const uint8_t* p10 = r1 + static_cast<size_t>(x0[ox]) * c;
      const uint8_t* p11 = r1 + static_cast<size_t>(x1[ox]) * c;
      float fx1 = wx[ox], fx0 = 1.0f - fx1;
      float fy1 = wy, fy0 = 1.0f - fy1;
      for (int ch = 0; ch < c; ++ch) {
        float top = p00[ch] * fx0 + p01[ch] * fx1;
        float bot = p10[ch] * fx0 + p11[ch] * fx1;
        float v = top * fy0 + bot * fy1;
        out[static_cast<size_t>(ox) * c + ch] =
            static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

void parallel_rows(int oh, int num_threads,
                   const std::function<void(int, int)>& fn) {
  num_threads = std::max(1, std::min(num_threads, oh));
  if (num_threads == 1) {
    fn(0, oh);
    return;
  }
  std::vector<std::thread> threads;
  int chunk = (oh + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    int r0 = t * chunk;
    int r1 = std::min(oh, r0 + chunk);
    if (r0 >= r1) break;
    threads.emplace_back(fn, r0, r1);
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

void resize_bilinear_u8(const uint8_t* src, int h, int w, int c,
                        uint8_t* dst, int oh, int ow, int num_threads) {
  const size_t stride = static_cast<size_t>(ow) * c;
  parallel_rows(oh, num_threads, [&](int r0, int r1) {
    resize_rows(src, h, w, c, dst + static_cast<size_t>(r0) * stride,
                stride, oh, ow, r0, r1);
  });
}

// crop src[crop_top:crop_top+crop_h, crop_left:crop_left+crop_w], resize
// to (rh, rw), zero-pad bottom/right into dst (oh x ow x c)
void crop_resize_pad_u8(const uint8_t* src, int h, int w, int c,
                        int crop_top, int crop_left, int crop_h, int crop_w,
                        uint8_t* dst, int rh, int rw, int oh, int ow,
                        int num_threads) {
  std::memset(dst, 0, static_cast<size_t>(oh) * ow * c);
  // gather the crop into a contiguous buffer once (rows are contiguous)
  std::vector<uint8_t> crop(static_cast<size_t>(crop_h) * crop_w * c);
  for (int y = 0; y < crop_h; ++y) {
    std::memcpy(crop.data() + static_cast<size_t>(y) * crop_w * c,
                src + (static_cast<size_t>(crop_top + y) * w + crop_left) * c,
                static_cast<size_t>(crop_w) * c);
  }
  const size_t dst_stride = static_cast<size_t>(ow) * c;
  parallel_rows(rh, num_threads, [&](int r0, int r1) {
    // resize directly into the padded destination (row stride ow * c)
    resize_rows(crop.data(), crop_h, crop_w, c,
                dst + static_cast<size_t>(r0) * dst_stride, dst_stride,
                rh, rw, r0, r1);
  });
}

}  // extern "C"
