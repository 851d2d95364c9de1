// fisr_tpu native data-path runtime.
//
// The reference fed the TPU-equivalent (GPU) from single-threaded Python:
// PIL PNG decodes (FISRnet.py:803-816), numpy fancy-indexed batch gathers
// per step (FISRnet.py:630-635), and per-pixel numpy color conversion
// (utils.py:106-115). This library provides the threaded native equivalents,
// exposed to Python via ctypes (no pybind11 in the image):
//   * png decode (libpng) — batch of YUV-container frames,
//   * batch gather — assemble shuffled training batches with parallel memcpy,
//   * MATLAB-constant YUV<->RGB on uint8 frames,
//   * halo patch extraction for tiled inference.
//
// Build: see fisr_tpu/native/build.py (g++ -O3 -shared -fopenmp -lpng).

#include <png.h>

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

int hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 4;
}

// run fn(i) for i in [0, n) over a thread pool
template <typename F>
void parallel_for(int64_t n, F fn, int max_threads = 0) {
  int nt = max_threads > 0 ? max_threads : hw_threads();
  if (nt > n) nt = static_cast<int>(n);
  if (nt <= 1) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int64_t> next(0);
  std::vector<std::thread> pool;
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    pool.emplace_back([&] {
      for (;;) {
        int64_t i = next.fetch_add(1);
        if (i >= n) return;
        fn(i);
      }
    });
  }
  for (auto& th : pool) th.join();
}

uint32_t crc32c_tbl[8][256];
std::once_flag crc32c_once;

void init_crc32c() {
  for (int i = 0; i < 256; i++) {
    uint32_t c = static_cast<uint32_t>(i);
    for (int k = 0; k < 8; k++) c = (c & 1) ? (c >> 1) ^ 0x82F63B78u : c >> 1;
    crc32c_tbl[0][i] = c;
  }
  for (int t = 1; t < 8; t++)
    for (int i = 0; i < 256; i++)
      crc32c_tbl[t][i] = (crc32c_tbl[t - 1][i] >> 8)
                         ^ crc32c_tbl[0][crc32c_tbl[t - 1][i] & 0xFF];
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// CRC32C (Castagnoli 0x82F63B78) — slice-by-8, ~0.5 GB/s single-threaded.
// Backs the TensorBundle checkpoint checksums and the TFRecord/TensorBoard
// masked crcs (convert/tensor_bundle.py, utils/tb_writer.py); the pure-
// Python table loop they fall back to runs ~10 MB/s. Little-endian reads
// (the byte-at-a-time tail is endian-neutral; this image is x86-64).
// ---------------------------------------------------------------------------

uint32_t fisr_crc32c(const uint8_t* p, int64_t n, uint32_t crc) {
  std::call_once(crc32c_once, init_crc32c);
  crc ^= 0xFFFFFFFFu;
  while (n >= 8) {
    uint64_t v;
    std::memcpy(&v, p, 8);
    v ^= crc;  // zero-extended: xors the low 4 bytes
    crc = crc32c_tbl[7][v & 0xFF] ^ crc32c_tbl[6][(v >> 8) & 0xFF]
          ^ crc32c_tbl[5][(v >> 16) & 0xFF] ^ crc32c_tbl[4][(v >> 24) & 0xFF]
          ^ crc32c_tbl[3][(v >> 32) & 0xFF] ^ crc32c_tbl[2][(v >> 40) & 0xFF]
          ^ crc32c_tbl[1][(v >> 48) & 0xFF] ^ crc32c_tbl[0][(v >> 56) & 0xFF];
    p += 8;
    n -= 8;
  }
  while (n-- > 0) crc = (crc >> 8) ^ crc32c_tbl[0][(crc ^ *p++) & 0xFF];
  return crc ^ 0xFFFFFFFFu;
}

// ---------------------------------------------------------------------------
// PNG decode
// ---------------------------------------------------------------------------

// Decode one 8-bit RGB(A)/gray PNG into out[h*w*3] (uint8). Returns 0 on
// success; fills *out_h/*out_w. If h/w hints are nonzero the decode fails
// unless dimensions match.
int fisr_decode_png(const char* path, uint8_t* out, int64_t cap,
                    int32_t* out_h, int32_t* out_w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    fclose(fp);
    return 2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  if (static_cast<int64_t>(h) * w * 3 > cap) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 3;
  }
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = out + (int64_t)y * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  *out_h = static_cast<int32_t>(h);
  *out_w = static_cast<int32_t>(w);
  return 0;
}

// Decode n same-sized PNGs in parallel into out[n, h, w, 3]. paths is a
// packed array of NUL-terminated strings with fixed stride. Returns 0 iff
// every decode succeeded with the expected dimensions.
int fisr_decode_png_batch(const char* paths, int64_t path_stride, int64_t n,
                          uint8_t* out, int32_t h, int32_t w) {
  std::atomic<int> status(0);
  const int64_t frame = static_cast<int64_t>(h) * w * 3;
  parallel_for(n, [&](int64_t i) {
    int32_t gh = 0, gw = 0;
    int rc = fisr_decode_png(paths + i * path_stride, out + i * frame, frame,
                             &gh, &gw);
    if (rc != 0 || gh != h || gw != w) status.store(rc ? rc : 4);
  });
  return status.load();
}

// ---------------------------------------------------------------------------
// Write one 8-bit RGB PNG. Returns 0 on success.
// ---------------------------------------------------------------------------
int fisr_encode_png(const char* path, const uint8_t* img, int32_t h,
                    int32_t w) {
  FILE* fp = fopen(path, "wb");
  if (!fp) return 1;
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_write_struct(&png, info ? &info : nullptr);
    fclose(fp);
    return 2;
  }
  png_init_io(png, fp);
  png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_RGB, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  std::vector<png_bytep> rows(h);
  for (int32_t y = 0; y < h; ++y)
    rows[y] = const_cast<png_bytep>(img + (int64_t)y * w * 3);
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  fclose(fp);
  return 0;
}

// ---------------------------------------------------------------------------
// Threaded batch gather: out[i] = src[idx[i]] for row-major [N, row_elems]
// float32 arrays — the shuffled-minibatch assembly of the train loop.
// ---------------------------------------------------------------------------
void fisr_gather_rows_f32(const float* src, int64_t row_elems,
                          const int64_t* idx, int64_t n, float* out) {
  const int64_t bytes = row_elems * static_cast<int64_t>(sizeof(float));
  parallel_for(n, [&](int64_t i) {
    std::memcpy(out + i * row_elems, src + idx[i] * row_elems, bytes);
  });
}

// ---------------------------------------------------------------------------
// MATLAB-constant color transforms on uint8 YUV/RGB frames (utils.py:106-115
// and the warp script's RGB2YUV), threaded over rows.
// ---------------------------------------------------------------------------
static const double kYuv2Rgb[3][3] = {
    {0.00456621 * 255, 0.0, 0.00625893 * 255},
    {0.00456621 * 255, -0.00153632 * 255, -0.00318811 * 255},
    {0.00456621 * 255, 0.00791071 * 255, 0.0}};
static const double kYuvOff[3] = {16.0, 128.0, 128.0};

void fisr_yuv2rgb_matlab_u8(const uint8_t* yuv, uint8_t* rgb, int64_t n_px) {
  double boff[3];
  for (int p = 0; p < 3; ++p)
    boff[p] = kYuv2Rgb[p][0] * kYuvOff[0] + kYuv2Rgb[p][1] * kYuvOff[1] +
              kYuv2Rgb[p][2] * kYuvOff[2];
  const int64_t chunk = 1 << 16;
  const int64_t n_chunks = (n_px + chunk - 1) / chunk;
  parallel_for(n_chunks, [&](int64_t ci) {
    int64_t lo = ci * chunk, hi = std::min(lo + chunk, n_px);
    for (int64_t i = lo; i < hi; ++i) {
      const double y = yuv[i * 3], u = yuv[i * 3 + 1], v = yuv[i * 3 + 2];
      for (int p = 0; p < 3; ++p) {
        double val =
            kYuv2Rgb[p][0] * y + kYuv2Rgb[p][1] * u + kYuv2Rgb[p][2] * v -
            boff[p];
        val = val < 0 ? 0 : (val > 255 ? 255 : val);
        rgb[i * 3 + p] = static_cast<uint8_t>(val);  // trunc — parity
      }
    }
  });
}

static const double kRgb2Yuv[3][3] = {
    {65.481 / 255, 128.553 / 255, 24.966 / 255},
    {-37.797 / 255, -74.203 / 255, 112.0 / 255},
    {112.0 / 255, -93.786 / 255, -18.214 / 255}};

void fisr_rgb2yuv_matlab_u8(const uint8_t* rgb, uint8_t* yuv, int64_t n_px) {
  const int64_t chunk = 1 << 16;
  const int64_t n_chunks = (n_px + chunk - 1) / chunk;
  parallel_for(n_chunks, [&](int64_t ci) {
    int64_t lo = ci * chunk, hi = std::min(lo + chunk, n_px);
    for (int64_t i = lo; i < hi; ++i) {
      const double r = rgb[i * 3], g = rgb[i * 3 + 1], b = rgb[i * 3 + 2];
      for (int p = 0; p < 3; ++p) {
        double val = kRgb2Yuv[p][0] * r + kRgb2Yuv[p][1] * g +
                     kRgb2Yuv[p][2] * b + kYuvOff[p];
        val = val < 0 ? 0 : (val > 255 ? 255 : val);
        yuv[i * 3 + p] = static_cast<uint8_t>(val);
      }
    }
  });
}

// ---------------------------------------------------------------------------
// Halo patch extraction (utils.py:118-135 geometry) into a uniform batch:
// the caller passes per-patch source rectangles; rows copy in parallel.
// src: [H, W, C] f32; out: [n_patches, ph, pw, C] f32.
// ---------------------------------------------------------------------------
void fisr_extract_patches_f32(const float* src, int64_t H, int64_t W,
                              int64_t C, const int64_t* y0s,
                              const int64_t* x0s, int64_t n, int64_t ph,
                              int64_t pw, float* out) {
  parallel_for(n * ph, [&](int64_t job) {
    const int64_t p = job / ph;
    const int64_t r = job % ph;
    const float* s = src + ((y0s[p] + r) * W + x0s[p]) * C;
    float* d = out + ((p * ph + r) * pw) * C;
    std::memcpy(d, s, static_cast<size_t>(pw * C * sizeof(float)));
  });
}

}  // extern "C"
