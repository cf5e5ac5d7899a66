// Minimal PNG decoder for the stereo data path.
//
// The reference's data layer decodes KITTI/SceneFlow images with PIL in
// Python worker processes (reference: dataloader/dataloader.py:18-25). This
// native decoder covers exactly the formats those corpora use — 8-bit
// RGB/RGBA/gray PNGs (camera images) and 16-bit grayscale PNGs (KITTI
// disparity maps, decoded as uint16 big-endian per the PNG spec) — with
// zlib inflate + per-scanline unfiltering. Interlaced and palette images are
// rejected (not present in these datasets).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <zlib.h>

namespace {

constexpr uint8_t kPngMagic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

struct PngInfo {
  uint32_t width = 0, height = 0;
  int bit_depth = 0;
  int color_type = 0;
  int channels = 0;
};

// Parse chunks, collecting the concatenated IDAT stream.
bool parse_png(const uint8_t* data, size_t size, PngInfo* info,
               std::vector<uint8_t>* idat) {
  if (size < 8 || std::memcmp(data, kPngMagic, 8) != 0) return false;
  size_t pos = 8;
  bool saw_ihdr = false;
  while (pos + 8 <= size) {
    uint32_t len = be32(data + pos);
    const uint8_t* type = data + pos + 4;
    const uint8_t* payload = data + pos + 8;
    if (pos + 12 + size_t(len) > size) return false;
    if (std::memcmp(type, "IHDR", 4) == 0) {
      if (len < 13) return false;
      info->width = be32(payload);
      info->height = be32(payload + 4);
      info->bit_depth = payload[8];
      info->color_type = payload[9];
      int interlace = payload[12];
      if (interlace != 0) return false;  // Adam7 unsupported
      switch (info->color_type) {
        case 0: info->channels = 1; break;  // gray
        case 2: info->channels = 3; break;  // RGB
        case 4: info->channels = 2; break;  // gray+alpha
        case 6: info->channels = 4; break;  // RGBA
        default: return false;              // palette unsupported
      }
      if (info->bit_depth != 8 && info->bit_depth != 16) return false;
      saw_ihdr = true;
    } else if (std::memcmp(type, "IDAT", 4) == 0) {
      idat->insert(idat->end(), payload, payload + len);
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  return saw_ihdr && !idat->empty();
}

bool inflate_all(const std::vector<uint8_t>& in, std::vector<uint8_t>* out) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return false;
  zs.next_in = const_cast<uint8_t*>(in.data());
  zs.avail_in = static_cast<uInt>(in.size());
  zs.next_out = out->data();
  zs.avail_out = static_cast<uInt>(out->size());
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return rc == Z_STREAM_END && zs.avail_out == 0;
}

// Undo per-scanline filters in place; raw holds height*(1+stride) bytes.
bool unfilter(std::vector<uint8_t>& raw, uint8_t* dst, uint32_t height,
              size_t stride, int bpp) {
  const uint8_t* prev = nullptr;
  for (uint32_t y = 0; y < height; ++y) {
    const uint8_t* src = raw.data() + y * (stride + 1);
    int filter = src[0];
    ++src;
    uint8_t* row = dst + y * stride;
    switch (filter) {
      case 0:
        std::memcpy(row, src, stride);
        break;
      case 1:  // Sub
        for (size_t i = 0; i < stride; ++i)
          row[i] = src[i] + (i >= size_t(bpp) ? row[i - bpp] : 0);
        break;
      case 2:  // Up
        for (size_t i = 0; i < stride; ++i)
          row[i] = src[i] + (prev ? prev[i] : 0);
        break;
      case 3:  // Average
        for (size_t i = 0; i < stride; ++i) {
          int a = i >= size_t(bpp) ? row[i - bpp] : 0;
          int b = prev ? prev[i] : 0;
          row[i] = src[i] + uint8_t((a + b) >> 1);
        }
        break;
      case 4:  // Paeth
        for (size_t i = 0; i < stride; ++i) {
          int a = i >= size_t(bpp) ? row[i - bpp] : 0;
          int b = prev ? prev[i] : 0;
          int c = (prev && i >= size_t(bpp)) ? prev[i - bpp] : 0;
          row[i] = src[i] + uint8_t(paeth(a, b, c));
        }
        break;
      default:
        return false;
    }
    prev = row;
  }
  return true;
}

}  // namespace

extern "C" {

// Probe dimensions: returns 0 on success, fills width/height/channels/depth.
int lws_png_info(const uint8_t* data, size_t size, int* width, int* height,
                 int* channels, int* bit_depth) {
  PngInfo info;
  std::vector<uint8_t> idat;
  if (!parse_png(data, size, &info, &idat)) return -1;
  *width = int(info.width);
  *height = int(info.height);
  *channels = info.channels;
  *bit_depth = info.bit_depth;
  return 0;
}

// Decode into caller-allocated buffer of height*width*channels samples
// (uint8 for depth 8; uint16 native-endian for depth 16).
int lws_png_decode(const uint8_t* data, size_t size, void* out) {
  PngInfo info;
  std::vector<uint8_t> idat;
  if (!parse_png(data, size, &info, &idat)) return -1;

  int bytes_per_sample = info.bit_depth / 8;
  int bpp = info.channels * bytes_per_sample;  // filter unit
  size_t stride = size_t(info.width) * bpp;
  std::vector<uint8_t> raw(size_t(info.height) * (stride + 1));
  if (!inflate_all(idat, &raw)) return -2;

  uint8_t* dst = static_cast<uint8_t*>(out);
  if (!unfilter(raw, dst, info.height, stride, bpp)) return -3;

  if (info.bit_depth == 16) {
    // PNG stores 16-bit samples big-endian; convert to native.
    size_t n = size_t(info.height) * info.width * info.channels;
    for (size_t i = 0; i < n; ++i) {
      uint8_t hi = dst[2 * i], lo = dst[2 * i + 1];
      reinterpret_cast<uint16_t*>(dst)[i] = (uint16_t(hi) << 8) | lo;
    }
  }
  return 0;
}

}  // extern "C"
