// Fused host-side preprocessing for the stereo input pipeline.
//
// The reference does decode -> /255 -> crop -> transpose -> normalize as
// separate Python/numpy passes (reference: dataloader/dataloader.py:61-92).
// These kernels fuse crop + /255 + ImageNet-normalize into one pass over the
// cropped region only (never touching pixels outside the crop), writing HWC
// float32 ready for the device.

#include <cstddef>
#include <cstdint>
#include <cstring>

extern "C" {

// Crop an 8-bit image (any channel count >= 3 -> first 3 channels used) and
// ImageNet-normalize to float32 HWC(3).
//   src: H x W x C uint8; crop starts at (y0, x0), size (ch, cw).
void lws_crop_normalize_u8(const uint8_t* src, int height, int width,
                           int channels, int y0, int x0, int ch, int cw,
                           const float* mean, const float* std_dev,
                           float* out) {
  (void)height;
  float inv255_std[3], shifted_mean[3];
  for (int c = 0; c < 3; ++c) {
    inv255_std[c] = 1.0f / (255.0f * std_dev[c]);
    shifted_mean[c] = mean[c] / std_dev[c];
  }
  for (int y = 0; y < ch; ++y) {
    const uint8_t* row = src + (size_t(y0 + y) * width + x0) * channels;
    float* orow = out + size_t(y) * cw * 3;
    for (int x = 0; x < cw; ++x) {
      for (int c = 0; c < 3; ++c) {
        orow[x * 3 + c] =
            float(row[x * channels + c]) * inv255_std[c] - shifted_mean[c];
      }
    }
  }
}

// Crop a 16-bit disparity PNG payload and scale by 1/256
// (reference: dataloader/dataloader.py:54-56).
void lws_crop_disparity_u16(const uint16_t* src, int height, int width,
                            int y0, int x0, int ch, int cw, float* out) {
  (void)height;
  constexpr float kScale = 1.0f / 256.0f;
  for (int y = 0; y < ch; ++y) {
    const uint16_t* row = src + size_t(y0 + y) * width + x0;
    float* orow = out + size_t(y) * cw;
    for (int x = 0; x < cw; ++x) orow[x] = float(row[x]) * kScale;
  }
}

// Crop a float32 map (SceneFlow PFM disparity).
void lws_crop_f32(const float* src, int height, int width, int y0, int x0,
                  int ch, int cw, float* out) {
  (void)height;
  for (int y = 0; y < ch; ++y) {
    std::memcpy(out + size_t(y) * cw, src + size_t(y0 + y) * width + x0,
                sizeof(float) * cw);
  }
}

}  // extern "C"
