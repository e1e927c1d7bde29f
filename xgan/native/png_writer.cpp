// Native artifact writer: threaded PNG encode/decode for the sampler and
// the decode-once image store.
//
// Role: the reference writes synthetic PNGs one-by-one through
// torchvision.utils.save_image (generate_synthetic.py:54) and decodes the
// dataset per-epoch through PIL in DataLoader workers. Here the TPU emits
// uint8 image batches at device rate and the host-side PNG codec becomes
// the pipeline bottleneck; this C++ unit encodes batches with a thread
// pool (zlib, tunable compression) and decodes folders into the uint8
// store. Exposed to Python via ctypes (no pybind11 in this image).
//
// Build: python -m xgan.native.build   (g++ -O3 -shared -fPIC ... -lpng -lz)

#include <png.h>
#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------- encode
// Cleanup discipline (both codec functions): buffers are declared BEFORE
// setjmp and libpng structs/FILE* are freed at exactly ONE point after a
// do/while(0) body, so neither a libpng longjmp (which skips destructors
// of objects it jumps back over) nor a C++ exception (bad_alloc while
// the structs are alive) can leak the fd, the structs, or the buffers.
bool write_png(const char* path, const uint8_t* rgb, int h, int w,
               int compress_level) {
  FILE* fp = std::fopen(path, "wb");
  if (!fp) return false;
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr,
                              nullptr);
  if (!png) { std::fclose(fp); return false; }
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_write_struct(&png, nullptr); std::fclose(fp);
               return false; }
  std::vector<png_bytep> rows;
  bool ok = false;
  try {
    do {
      if (setjmp(png_jmpbuf(png))) break;
      png_init_io(png, fp);
      png_set_compression_level(png, compress_level);
      png_set_filter(png, 0, PNG_FILTER_NONE);  // fastest; images are noisy
      png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_RGB,
                   PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
                   PNG_FILTER_TYPE_DEFAULT);
      png_write_info(png, info);
      rows.resize(h);
      for (int y = 0; y < h; ++y)
        rows[y] =
            const_cast<png_bytep>(rgb + static_cast<size_t>(y) * w * 3);
      png_write_image(png, rows.data());
      png_write_end(png, nullptr);
      ok = true;
    } while (false);
  } catch (...) {
  }
  png_destroy_write_struct(&png, &info);
  std::fclose(fp);
  return ok;
}

// ---------------------------------------------------------------- decode
// Decode a PNG to RGB8 and bilinear-resize to (size, size). Returns false
// on any failure (caller substitutes a black image, matching the
// reference data layer's behavior).
bool read_png_resized(const char* path, uint8_t* out, int size) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr,
                             nullptr);
  if (!png) { std::fclose(fp); return false; }
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr);
               std::fclose(fp); return false; }
  std::vector<uint8_t> buf;       // before setjmp: see write_png's note
  std::vector<png_bytep> rows;
  png_uint_32 w = 0, h = 0;
  bool ok = false;
  try {
    do {
      if (setjmp(png_jmpbuf(png))) break;
      png_init_io(png, fp);
      png_read_info(png, info);
      w = png_get_image_width(png, info);
      h = png_get_image_height(png, info);
      // Dimension sanity bounds: a crafted/corrupt header claiming huge
      // dimensions (up to libpng's 1M-pixel-side default limit) would
      // make the buffers below multi-GB. The per-side cap (2^14 = 16384,
      // far above the 1024^2 RSNA originals) also bounds the h-scaled
      // resize intermediate, which the pixel-product cap alone would not
      // (a 64 x 1M image passes w*h <= 2^26 but needs an h*size*3 float
      // buffer). Beyond either bound we fail the decode like any other
      // corrupt file (black substitute).
      if (w == 0 || h == 0 || w > (1u << 14) || h > (1u << 14) ||
          static_cast<uint64_t>(w) * h > (1ull << 26))
        break;
      int color = png_get_color_type(png, info);
      int depth = png_get_bit_depth(png, info);
      if (depth == 16) png_set_strip_16(png);
      if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
      if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
      if (png_get_valid(png, info, PNG_INFO_tRNS))
        png_set_tRNS_to_alpha(png);
      if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
      png_set_strip_alpha(png);
      png_read_update_info(png, info);

      buf.resize(static_cast<size_t>(w) * h * 3);
      rows.resize(h);
      for (png_uint_32 y = 0; y < h; ++y)
        rows[y] = buf.data() + static_cast<size_t>(y) * w * 3;
      png_read_image(png, rows.data());
      ok = true;
    } while (false);
  } catch (...) {
  }
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  if (!ok) return false;

  if (w == static_cast<png_uint_32>(size) &&
      h == static_cast<png_uint_32>(size)) {
    std::memcpy(out, buf.data(), static_cast<size_t>(size) * size * 3);
    return true;
  }
  // Antialiased separable triangle-filter resampling matching the
  // convention of PIL's Image.BILINEAR (support widened by the downscale
  // ratio), so the decode-once store built natively is interchangeable
  // with a PIL-built one.
  struct Taps {
    std::vector<int> first;     // first source index per output index
    std::vector<int> count;     // taps per output index
    std::vector<float> weight;  // flattened weights (max_taps stride)
    int max_taps;
  };
  auto make_taps = [](int in_size, int out_size) {
    Taps t;
    double scale = static_cast<double>(in_size) / out_size;
    double fscale = scale < 1.0 ? 1.0 : scale;
    double support = 1.0 * fscale;
    t.max_taps = static_cast<int>(support * 2.0 + 3.0);
    t.first.resize(out_size);
    t.count.resize(out_size);
    t.weight.assign(static_cast<size_t>(out_size) * t.max_taps, 0.f);
    for (int i = 0; i < out_size; ++i) {
      double center = (i + 0.5) * scale;
      int lo = static_cast<int>(center - support + 0.5);
      if (lo < 0) lo = 0;
      int hi = static_cast<int>(center + support + 0.5);
      if (hi > in_size) hi = in_size;
      double total = 0.0;
      int n = hi - lo;
      std::vector<double> ws(n);
      for (int k = 0; k < n; ++k) {
        double x = (lo + k + 0.5 - center) / fscale;
        double v = x < 0 ? -x : x;
        ws[k] = v < 1.0 ? 1.0 - v : 0.0;
        total += ws[k];
      }
      t.first[i] = lo;
      t.count[i] = n;
      for (int k = 0; k < n; ++k)
        t.weight[static_cast<size_t>(i) * t.max_taps + k] =
            total > 0 ? static_cast<float>(ws[k] / total) : 0.f;
    }
    return t;
  };

  Taps tx = make_taps(static_cast<int>(w), size);
  Taps ty = make_taps(static_cast<int>(h), size);

  // Horizontal pass: (h, w, 3) -> (h, size, 3) in float.
  std::vector<float> tmp(static_cast<size_t>(h) * size * 3);
  for (png_uint_32 y = 0; y < h; ++y) {
    const uint8_t* row = buf.data() + static_cast<size_t>(y) * w * 3;
    float* dst = tmp.data() + static_cast<size_t>(y) * size * 3;
    for (int ox = 0; ox < size; ++ox) {
      float acc[3] = {0, 0, 0};
      int lo = tx.first[ox], n = tx.count[ox];
      const float* wt =
          tx.weight.data() + static_cast<size_t>(ox) * tx.max_taps;
      for (int k = 0; k < n; ++k) {
        const uint8_t* px = row + static_cast<size_t>(lo + k) * 3;
        acc[0] += wt[k] * px[0];
        acc[1] += wt[k] * px[1];
        acc[2] += wt[k] * px[2];
      }
      dst[ox * 3 + 0] = acc[0];
      dst[ox * 3 + 1] = acc[1];
      dst[ox * 3 + 2] = acc[2];
    }
  }
  // Vertical pass: (h, size, 3) -> (size, size, 3) in uint8.
  for (int oy = 0; oy < size; ++oy) {
    int lo = ty.first[oy], n = ty.count[oy];
    const float* wt =
        ty.weight.data() + static_cast<size_t>(oy) * ty.max_taps;
    uint8_t* dst = out + static_cast<size_t>(oy) * size * 3;
    for (int x = 0; x < size * 3; ++x) {
      float acc = 0;
      for (int k = 0; k < n; ++k)
        acc += wt[k] * tmp[static_cast<size_t>(lo + k) * size * 3 + x];
      int v = static_cast<int>(acc + 0.5f);
      dst[x] = v < 0 ? 0 : (v > 255 ? 255 : static_cast<uint8_t>(v));
    }
  }
  return true;
}

void parallel_for(int n, int n_threads, void (*body)(int, void*),
                  void* ctx) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1))
      body(i, ctx);
  };
  std::vector<std::thread> threads;
  for (int t = 1; t < n_threads; ++t) threads.emplace_back(worker);
  worker();
  for (auto& th : threads) th.join();
}

struct EncodeCtx {
  const uint8_t* images;
  const char* const* paths;
  int h, w, level;
  std::atomic<int>* failures;
};

struct DecodeCtx {
  const char* const* paths;
  uint8_t* out;
  int size;
  std::atomic<int>* failures;
};

// Both workers catch EVERYTHING at the thread boundary: an exception
// (e.g. bad_alloc from a pathological-but-in-bounds input) escaping into
// the std::thread started by parallel_for would std::terminate the whole
// process. A failed item is a failure count + (for decode) a black
// substitute, never a crash.
void encode_one(int i, void* p) {
  auto* c = static_cast<EncodeCtx*>(p);
  const uint8_t* img =
      c->images + static_cast<size_t>(i) * c->h * c->w * 3;
  bool ok = false;
  try {
    ok = write_png(c->paths[i], img, c->h, c->w, c->level);
  } catch (...) {
  }
  if (!ok) c->failures->fetch_add(1);
}

void decode_one(int i, void* p) {
  auto* c = static_cast<DecodeCtx*>(p);
  uint8_t* dst = c->out + static_cast<size_t>(i) * c->size * c->size * 3;
  bool ok = false;
  try {
    ok = read_png_resized(c->paths[i], dst, c->size);
  } catch (...) {
  }
  if (!ok) {
    std::memset(dst, 0, static_cast<size_t>(c->size) * c->size * 3);
    c->failures->fetch_add(1);
  }
}

}  // namespace

extern "C" {

// images: (n, h, w, 3) uint8 contiguous; paths: n C strings.
// Returns the number of failed writes.
int xgan_encode_png_batch(const uint8_t* images, int n, int h, int w,
                          const char* const* paths, int compress_level,
                          int n_threads) {
  std::atomic<int> failures(0);
  EncodeCtx ctx{images, paths, h, w, compress_level, &failures};
  parallel_for(n, n_threads, encode_one, &ctx);
  return failures.load();
}

// out: (n, size, size, 3) uint8 buffer. Failed decodes become black
// images (reference data_loader.py:108-110 behavior). Returns #failures.
int xgan_decode_png_batch(const char* const* paths, int n, int size,
                          uint8_t* out, int n_threads) {
  std::atomic<int> failures(0);
  DecodeCtx ctx{paths, out, size, &failures};
  parallel_for(n, n_threads, decode_one, &ctx);
  return failures.load();
}

}  // extern "C"
