// Native host-side data path for aswstereomatch_tpu.
//
// The reference (ZhangYY12345/aswStereoMatch) is a C++/OpenCV program whose
// L0 layer is cv::imread/imwrite + 8-bit conversions (SURVEY.md section 1).
// The TPU compute path needs none of that on-device, but the host data path
// (decode, quantize, batch-assemble, evaluate at sweep scale) benefits from
// native code: this is a zero-dependency C++17 implementation of the PNM
// (PGM/P5, PPM/P6) and PFM formats used by Middlebury, plus the bad-delta
// evaluator, exposed with a C ABI for ctypes
// (aswstereomatch_tpu/utils/native.py).  All decoders emit float32 on the
// pinned [0,255] 8-bit grid (config.py numeric conventions).
//
// Build: make -C native   (g++ -O3 -shared; no external dependencies)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cctype>
#include <cmath>
#include <memory>
#include <vector>

#include <zlib.h>

namespace {

struct Buffer {
  std::vector<unsigned char> data;
};

bool read_file(const char* path, std::vector<unsigned char>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  if (n < 0) { std::fclose(f); return false; }
  std::fseek(f, 0, SEEK_SET);
  out.resize(static_cast<size_t>(n));
  size_t got = n ? std::fread(out.data(), 1, static_cast<size_t>(n), f) : 0;
  std::fclose(f);
  return got == static_cast<size_t>(n);
}

// Skip whitespace and '#' comments; parse a non-negative integer token.
bool next_int(const std::vector<unsigned char>& b, size_t& pos, long& value) {
  while (pos < b.size()) {
    if (std::isspace(b[pos])) { ++pos; }
    else if (b[pos] == '#') { while (pos < b.size() && b[pos] != '\n') ++pos; }
    else break;
  }
  if (pos >= b.size() || !std::isdigit(b[pos])) return false;
  value = 0;
  while (pos < b.size() && std::isdigit(b[pos])) {
    value = value * 10 + (b[pos] - '0');
    ++pos;
  }
  return true;
}

bool parse_pnm_header(const std::vector<unsigned char>& b, size_t& pos,
                      long& w, long& h, long& maxval, int& channels) {
  if (b.size() < 2 || b[0] != 'P') return false;
  if (b[1] == '5') channels = 1;
  else if (b[1] == '6') channels = 3;
  else return false;
  pos = 2;
  if (!next_int(b, pos, w) || !next_int(b, pos, h) || !next_int(b, pos, maxval))
    return false;
  ++pos;  // single whitespace byte after maxval
  return w > 0 && h > 0 && maxval > 0;
}

}  // namespace

extern "C" {

// ---- PNM ------------------------------------------------------------------

// Fills h/w/c; returns 0 on success.
int sio_pnm_header(const char* path, int* h, int* w, int* c) {
  std::vector<unsigned char> b;
  if (!read_file(path, b)) return 1;
  size_t pos;
  long lw, lh, maxval;
  int ch;
  if (!parse_pnm_header(b, pos, lw, lh, maxval, ch)) return 2;
  *h = static_cast<int>(lh);
  *w = static_cast<int>(lw);
  *c = ch;
  return 0;
}

// out must hold h*w*c float32; emits [0,255] (16-bit samples are scaled).
int sio_read_pnm(const char* path, float* out) {
  std::vector<unsigned char> b;
  if (!read_file(path, b)) return 1;
  size_t pos;
  long w, h, maxval;
  int c;
  if (!parse_pnm_header(b, pos, w, h, maxval, c)) return 2;
  size_t n = static_cast<size_t>(w) * h * c;
  if (maxval < 256) {
    if (b.size() - pos < n) return 3;
    const unsigned char* src = b.data() + pos;
    for (size_t i = 0; i < n; ++i) out[i] = static_cast<float>(src[i]);
  } else {
    // 16-bit samples stay raw (big-endian per PNM): callers apply dataset
    // scale conventions (matches utils/io.py read_pnm).
    if (b.size() - pos < 2 * n) return 3;
    const unsigned char* src = b.data() + pos;
    for (size_t i = 0; i < n; ++i) {
      uint16_t v = static_cast<uint16_t>((src[2 * i] << 8) | src[2 * i + 1]);
      out[i] = static_cast<float>(v);
    }
  }
  return 0;
}

int sio_write_pgm(const char* path, const float* img, int h, int w) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return 1;
  std::fprintf(f, "P5\n%d %d\n255\n", w, h);
  std::vector<unsigned char> row(static_cast<size_t>(w));
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      float v = std::nearbyint(img[static_cast<size_t>(y) * w + x]);
      row[x] = static_cast<unsigned char>(v < 0 ? 0 : (v > 255 ? 255 : v));
    }
    std::fwrite(row.data(), 1, row.size(), f);
  }
  std::fclose(f);
  return 0;
}

// ---- PFM ------------------------------------------------------------------

int sio_pfm_header(const char* path, int* h, int* w, int* c) {
  std::vector<unsigned char> b;
  if (!read_file(path, b)) return 1;
  if (b.size() < 2 || b[0] != 'P' || (b[1] != 'f' && b[1] != 'F')) return 2;
  *c = (b[1] == 'F') ? 3 : 1;
  size_t pos = 2;
  long lw, lh;
  if (!next_int(b, pos, lw) || !next_int(b, pos, lh)) return 2;
  *h = static_cast<int>(lh);
  *w = static_cast<int>(lw);
  return 0;
}

// out: h*w*c float32, top row first (PFM stores bottom-up).
int sio_read_pfm(const char* path, float* out) {
  std::vector<unsigned char> b;
  if (!read_file(path, b)) return 1;
  if (b.size() < 2 || b[0] != 'P' || (b[1] != 'f' && b[1] != 'F')) return 2;
  int c = (b[1] == 'F') ? 3 : 1;
  size_t pos = 2;
  long w, h;
  if (!next_int(b, pos, w) || !next_int(b, pos, h)) return 2;
  // scale line (may be negative float => little endian)
  while (pos < b.size() && std::isspace(b[pos])) ++pos;
  size_t sc_start = pos;
  while (pos < b.size() && !std::isspace(b[pos])) ++pos;
  float scale = std::strtof(
      reinterpret_cast<const char*>(b.data() + sc_start), nullptr);
  ++pos;  // newline
  bool little = scale < 0.0f;
  size_t n = static_cast<size_t>(w) * h * c;
  if (b.size() - pos < 4 * n) return 3;
  const unsigned char* src = b.data() + pos;
  for (long y = 0; y < h; ++y) {
    const unsigned char* srow = src + static_cast<size_t>(h - 1 - y) * w * c * 4;
    float* drow = out + static_cast<size_t>(y) * w * c;
    for (long i = 0; i < w * c; ++i) {
      uint32_t v;
      if (little) {
        v = static_cast<uint32_t>(srow[4 * i]) |
            (static_cast<uint32_t>(srow[4 * i + 1]) << 8) |
            (static_cast<uint32_t>(srow[4 * i + 2]) << 16) |
            (static_cast<uint32_t>(srow[4 * i + 3]) << 24);
      } else {
        v = (static_cast<uint32_t>(srow[4 * i]) << 24) |
            (static_cast<uint32_t>(srow[4 * i + 1]) << 16) |
            (static_cast<uint32_t>(srow[4 * i + 2]) << 8) |
            static_cast<uint32_t>(srow[4 * i + 3]);
      }
      std::memcpy(&drow[i], &v, 4);
    }
  }
  return 0;
}

// ---- evaluation -----------------------------------------------------------

// Fraction of valid pixels with |a-b| > delta; valid may be null (all valid).
double sio_bad_delta(const float* a, const float* b, const uint8_t* valid,
                     long n, float delta) {
  long total = 0, bad = 0;
  for (long i = 0; i < n; ++i) {
    if (valid && !valid[i]) continue;
    ++total;
    float d = a[i] - b[i];
    if (d < 0) d = -d;
    if (d > delta) ++bad;
  }
  return total ? static_cast<double>(bad) / total : -1.0;
}

// Mean absolute error over valid pixels (end-point error).
double sio_epe(const float* a, const float* b, const uint8_t* valid, long n) {
  long total = 0;
  double acc = 0.0;
  for (long i = 0; i < n; ++i) {
    if (valid && !valid[i]) continue;
    ++total;
    float d = a[i] - b[i];
    acc += (d < 0) ? -d : d;
  }
  return total ? acc / total : -1.0;
}

// ---- PNG ------------------------------------------------------------------
//
// Zero-OpenCV PNG codec (SURVEY.md section 2.1 "Image I/O": KITTI ground
// truth is uint16 PNG; this removes the last cv2 dependency outside test
// goldens).  Decode: bit depth 8/16, color types gray / RGB / gray+alpha /
// RGBA (alpha dropped), filters 0-4, non-interlaced.  Encode: 8-bit gray /
// RGB and 16-bit gray, filter 0, zlib via the system library.

namespace {

const unsigned char kPngSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};

uint32_t be32(const unsigned char* p) {
  return (static_cast<uint32_t>(p[0]) << 24) | (static_cast<uint32_t>(p[1]) << 16) |
         (static_cast<uint32_t>(p[2]) << 8) | static_cast<uint32_t>(p[3]);
}

struct PngInfo {
  long w = 0, h = 0;
  int bit_depth = 0, color_type = 0, channels = 0, interlace = 0;
};

// Parses IHDR and concatenates IDAT payloads. Returns 0 on success.
int parse_png(const std::vector<unsigned char>& b, PngInfo& info,
              std::vector<unsigned char>* idat) {
  if (b.size() < 8 + 25 || std::memcmp(b.data(), kPngSig, 8) != 0) return 2;
  size_t pos = 8;
  bool saw_ihdr = false;
  while (pos + 8 <= b.size()) {
    uint32_t len = be32(&b[pos]);
    if (pos + 12 + len > b.size()) return 3;
    const unsigned char* type = &b[pos + 4];
    const unsigned char* data = &b[pos + 8];
    if (std::memcmp(type, "IHDR", 4) == 0) {
      if (len != 13) return 3;
      info.w = be32(data);
      info.h = be32(data + 4);
      info.bit_depth = data[8];
      info.color_type = data[9];
      info.interlace = data[12];
      switch (info.color_type) {
        case 0: info.channels = 1; break;  // gray
        case 2: info.channels = 3; break;  // rgb
        case 4: info.channels = 2; break;  // gray+alpha
        case 6: info.channels = 4; break;  // rgba
        default: return 4;                 // palette unsupported
      }
      if (info.bit_depth != 8 && info.bit_depth != 16) return 4;
      if (info.interlace != 0) return 4;  // Adam7 unsupported
      if (info.w <= 0 || info.h <= 0) return 3;
      saw_ihdr = true;
    } else if (std::memcmp(type, "IDAT", 4) == 0) {
      if (idat) idat->insert(idat->end(), data, data + len);
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  return saw_ihdr ? 0 : 3;
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  return (pb <= pc) ? b : c;
}

// Undo per-scanline filtering in place on the raw inflated stream.
// raw layout: h rows of [filter_byte, w * channels * bytes_per_sample].
int unfilter(std::vector<unsigned char>& raw, const PngInfo& info) {
  size_t bpp = static_cast<size_t>(info.channels) * (info.bit_depth / 8);
  size_t stride = static_cast<size_t>(info.w) * bpp;
  if (raw.size() < static_cast<size_t>(info.h) * (stride + 1)) return 5;
  std::vector<unsigned char> prev(stride, 0);
  for (long y = 0; y < info.h; ++y) {
    unsigned char* row = raw.data() + static_cast<size_t>(y) * (stride + 1);
    int filter = row[0];
    unsigned char* cur = row + 1;
    switch (filter) {
      case 0:
        break;
      case 1:  // Sub
        for (size_t i = bpp; i < stride; ++i) cur[i] += cur[i - bpp];
        break;
      case 2:  // Up
        for (size_t i = 0; i < stride; ++i) cur[i] += prev[i];
        break;
      case 3:  // Average
        for (size_t i = 0; i < bpp; ++i) cur[i] += prev[i] / 2;
        for (size_t i = bpp; i < stride; ++i)
          cur[i] += static_cast<unsigned char>((cur[i - bpp] + prev[i]) / 2);
        break;
      case 4:  // Paeth
        for (size_t i = 0; i < bpp; ++i)
          cur[i] += static_cast<unsigned char>(paeth(0, prev[i], 0));
        for (size_t i = bpp; i < stride; ++i)
          cur[i] += static_cast<unsigned char>(
              paeth(cur[i - bpp], prev[i], prev[i - bpp]));
        break;
      default:
        return 5;
    }
    std::memcpy(prev.data(), cur, stride);
  }
  return 0;
}

void put_be32(std::vector<unsigned char>& out, uint32_t v) {
  out.push_back(static_cast<unsigned char>(v >> 24));
  out.push_back(static_cast<unsigned char>(v >> 16));
  out.push_back(static_cast<unsigned char>(v >> 8));
  out.push_back(static_cast<unsigned char>(v));
}

void put_chunk(std::vector<unsigned char>& out, const char* type,
               const unsigned char* data, size_t len) {
  put_be32(out, static_cast<uint32_t>(len));
  size_t start = out.size();
  out.insert(out.end(), type, type + 4);
  if (len) out.insert(out.end(), data, data + len);
  uint32_t crc = crc32(0L, out.data() + start, static_cast<uInt>(4 + len));
  put_be32(out, crc);
}

int write_png(const char* path, const unsigned char* samples, long h, long w,
              int channels, int bit_depth) {
  size_t bpp = static_cast<size_t>(channels) * (bit_depth / 8);
  size_t stride = static_cast<size_t>(w) * bpp;
  std::vector<unsigned char> filtered(static_cast<size_t>(h) * (stride + 1));
  for (long y = 0; y < h; ++y) {
    unsigned char* row = filtered.data() + static_cast<size_t>(y) * (stride + 1);
    row[0] = 0;  // filter: none
    std::memcpy(row + 1, samples + static_cast<size_t>(y) * stride, stride);
  }
  uLongf zcap = compressBound(static_cast<uLong>(filtered.size()));
  std::vector<unsigned char> z(zcap);
  if (compress2(z.data(), &zcap, filtered.data(),
                static_cast<uLong>(filtered.size()), 6) != Z_OK)
    return 6;
  z.resize(zcap);

  std::vector<unsigned char> out;
  out.insert(out.end(), kPngSig, kPngSig + 8);
  unsigned char ihdr[13];
  ihdr[0] = static_cast<unsigned char>(w >> 24);
  ihdr[1] = static_cast<unsigned char>(w >> 16);
  ihdr[2] = static_cast<unsigned char>(w >> 8);
  ihdr[3] = static_cast<unsigned char>(w);
  ihdr[4] = static_cast<unsigned char>(h >> 24);
  ihdr[5] = static_cast<unsigned char>(h >> 16);
  ihdr[6] = static_cast<unsigned char>(h >> 8);
  ihdr[7] = static_cast<unsigned char>(h);
  ihdr[8] = static_cast<unsigned char>(bit_depth);
  ihdr[9] = (channels == 3) ? 2 : 0;  // color type
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  put_chunk(out, "IHDR", ihdr, 13);
  put_chunk(out, "IDAT", z.data(), z.size());
  put_chunk(out, "IEND", nullptr, 0);

  FILE* f = std::fopen(path, "wb");
  if (!f) return 1;
  size_t wrote = std::fwrite(out.data(), 1, out.size(), f);
  std::fclose(f);
  return wrote == out.size() ? 0 : 1;
}

}  // namespace

// Fills h/w/c (alpha channel excluded) and bit depth; returns 0 on success.
int sio_png_header(const char* path, int* h, int* w, int* c, int* bit_depth) {
  std::vector<unsigned char> b;
  if (!read_file(path, b)) return 1;
  PngInfo info;
  int rc = parse_png(b, info, nullptr);
  if (rc) return rc;
  *h = static_cast<int>(info.h);
  *w = static_cast<int>(info.w);
  *c = (info.channels >= 3) ? 3 : 1;
  *bit_depth = info.bit_depth;
  return 0;
}

// out must hold h*w*c float32 with c from sio_png_header (alpha dropped).
// 8-bit samples emit [0,255]; 16-bit emit raw [0,65535] (dataset scale
// conventions, e.g. KITTI /256, are applied by the caller — same contract
// as sio_read_pnm).
int sio_read_png(const char* path, float* out) {
  std::vector<unsigned char> b;
  if (!read_file(path, b)) return 1;
  PngInfo info;
  std::vector<unsigned char> idat;
  int rc = parse_png(b, info, &idat);
  if (rc) return rc;

  size_t bpp = static_cast<size_t>(info.channels) * (info.bit_depth / 8);
  size_t stride = static_cast<size_t>(info.w) * bpp;
  uLongf raw_len = static_cast<uLongf>((stride + 1) * info.h);
  std::vector<unsigned char> raw(raw_len);
  if (uncompress(raw.data(), &raw_len, idat.data(),
                 static_cast<uLong>(idat.size())) != Z_OK ||
      raw_len != (stride + 1) * static_cast<size_t>(info.h))
    return 5;
  rc = unfilter(raw, info);
  if (rc) return rc;

  int out_c = (info.channels >= 3) ? 3 : 1;
  for (long y = 0; y < info.h; ++y) {
    const unsigned char* cur =
        raw.data() + static_cast<size_t>(y) * (stride + 1) + 1;
    float* drow = out + static_cast<size_t>(y) * info.w * out_c;
    for (long x = 0; x < info.w; ++x) {
      for (int k = 0; k < out_c; ++k) {
        size_t s = (static_cast<size_t>(x) * info.channels + k) *
                   (info.bit_depth / 8);
        if (info.bit_depth == 8) {
          drow[x * out_c + k] = static_cast<float>(cur[s]);
        } else {
          uint16_t v = static_cast<uint16_t>((cur[s] << 8) | cur[s + 1]);
          drow[x * out_c + k] = static_cast<float>(v);
        }
      }
    }
  }
  return 0;
}

// img: h*w floats on [0,255]; rounds and clamps to 8-bit gray.
int sio_write_png_gray8(const char* path, const float* img, int h, int w) {
  std::vector<unsigned char> s(static_cast<size_t>(h) * w);
  for (size_t i = 0; i < s.size(); ++i) {
    float v = std::nearbyint(img[i]);
    s[i] = static_cast<unsigned char>(v < 0 ? 0 : (v > 255 ? 255 : v));
  }
  return write_png(path, s.data(), h, w, 1, 8);
}

// img: h*w*3 floats on [0,255] (RGB order, matching sio_read_png).
int sio_write_png_rgb8(const char* path, const float* img, int h, int w) {
  std::vector<unsigned char> s(static_cast<size_t>(h) * w * 3);
  for (size_t i = 0; i < s.size(); ++i) {
    float v = std::nearbyint(img[i]);
    s[i] = static_cast<unsigned char>(v < 0 ? 0 : (v > 255 ? 255 : v));
  }
  return write_png(path, s.data(), h, w, 3, 8);
}

// img: h*w floats on [0,65535] raw sample values (e.g. disparity*256 for
// KITTI-convention ground truth).
int sio_write_png_gray16(const char* path, const float* img, int h, int w) {
  std::vector<unsigned char> s(static_cast<size_t>(h) * w * 2);
  for (size_t i = 0; i < static_cast<size_t>(h) * w; ++i) {
    float v = std::nearbyint(img[i]);
    uint16_t q = static_cast<uint16_t>(v < 0 ? 0 : (v > 65535 ? 65535 : v));
    s[2 * i] = static_cast<unsigned char>(q >> 8);
    s[2 * i + 1] = static_cast<unsigned char>(q & 0xff);
  }
  return write_png(path, s.data(), h, w, 1, 16);
}

// ---- batch assembly -------------------------------------------------------

// Gather n images (each h*w*c float32, pointers in imgs) into one contiguous
// (n, h, w, c) batch.
int sio_assemble_batch(const float** imgs, int n, long elems_per_img,
                       float* out) {
  for (int i = 0; i < n; ++i) {
    std::memcpy(out + static_cast<size_t>(i) * elems_per_img, imgs[i],
                static_cast<size_t>(elems_per_img) * 4);
  }
  return 0;
}

}  // extern "C"
