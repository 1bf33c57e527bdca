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
