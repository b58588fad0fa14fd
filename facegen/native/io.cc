// facegen native IO runtime.
//
// The reference delegates its host-side data path to Torch's C codecs
// (`image.load`/`image.scale`, dataset.lua:90-95) and does per-image
// Lua-loop assembly of every batch (adversarial.lua:244-257). This
// library is the TPU framework's native equivalent: the host-side hot
// paths — epoch-pool gathering from the packed store, random index
// generation, and JPEG decode+crop+resize for the dataset builder —
// implemented in C++ with a thread pool, exposed to Python via ctypes
// (facegen/native/__init__.py).
//
// Build: g++ -O3 -shared -fPIC io.cc -o libfacegen_io.so -ljpeg -lpthread
// (done automatically on first import; see __init__.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

#include <csetjmp>
#include <cstdio>
extern "C" {
#include <jpeglib.h>
}

namespace {

// splitmix64: tiny, high-quality, seedable — index generation for
// random batch/pool sampling (replaces math.random draws,
// adversarial.lua:245).
inline uint64_t splitmix64(uint64_t& state) {
  uint64_t z = (state += 0x9E3779B97F4A7C15ULL);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

void parallel_for(int64_t n, int n_threads, const std::function<void(int64_t, int64_t)>& fn) {
  if (n_threads <= 1 || n < 2) {
    fn(0, n);
    return;
  }
  int t = std::min<int64_t>(n_threads, n);
  std::vector<std::thread> threads;
  int64_t chunk = (n + t - 1) / t;
  for (int i = 0; i < t; ++i) {
    int64_t lo = i * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([=, &fn] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG to RGB u8. Returns 0 on success.
int decode_rgb(const unsigned char* data, int64_t size, std::vector<unsigned char>& out,
               int& h, int& w) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data), static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  h = cinfo.output_height;
  w = cinfo.output_width;
  out.resize(static_cast<size_t>(h) * w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Separable triangle-filter (antialiased bilinear) resize, matching
// PIL's BILINEAR resampling — the resizer generate_dataset.py:62 uses
// through scipy.misc.imresize. For downscaling the filter support
// widens by the scale factor (proper antialiasing); for upscaling it
// degenerates to classic bilinear.
struct FilterWeights {
  std::vector<int> xmin, xsize;
  std::vector<float> weights;  // flattened, max_size per output pixel
  int max_size = 0;
};

FilterWeights triangle_weights(int in_size, int out_size) {
  FilterWeights fw;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 1.0 * filterscale;  // BILINEAR support = 1
  fw.max_size = static_cast<int>(std::ceil(support) * 2 + 1);
  fw.xmin.resize(out_size);
  fw.xsize.resize(out_size);
  fw.weights.assign(static_cast<size_t>(out_size) * fw.max_size, 0.f);
  for (int x = 0; x < out_size; ++x) {
    double center = (x + 0.5) * scale;
    int lo = std::max(0, static_cast<int>(center - support + 0.5));
    int hi = std::min(in_size, static_cast<int>(center + support + 0.5));
    double total = 0.0;
    std::vector<double> wv(hi - lo);
    for (int k = lo; k < hi; ++k) {
      double t = std::abs((k + 0.5 - center) / filterscale);
      double v = t < 1.0 ? 1.0 - t : 0.0;
      wv[k - lo] = v;
      total += v;
    }
    fw.xmin[x] = lo;
    fw.xsize[x] = hi - lo;
    for (int k = 0; k < hi - lo; ++k) {
      fw.weights[static_cast<size_t>(x) * fw.max_size + k] =
          total > 0 ? static_cast<float>(wv[k] / total) : 0.f;
    }
  }
  return fw;
}

void resize_bilinear(const unsigned char* src, int h, int w, unsigned char* dst, int oh,
                     int ow) {
  FilterWeights fh = triangle_weights(w, ow);
  FilterWeights fv = triangle_weights(h, oh);
  // horizontal pass -> float intermediate (h x ow x 3)
  std::vector<float> tmp(static_cast<size_t>(h) * ow * 3);
  for (int y = 0; y < h; ++y) {
    const unsigned char* row = src + static_cast<size_t>(y) * w * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * ow * 3;
    for (int x = 0; x < ow; ++x) {
      const float* wts = fh.weights.data() + static_cast<size_t>(x) * fh.max_size;
      float acc[3] = {0.f, 0.f, 0.f};
      for (int k = 0; k < fh.xsize[x]; ++k) {
        const unsigned char* px = row + (static_cast<size_t>(fh.xmin[x]) + k) * 3;
        acc[0] += wts[k] * px[0];
        acc[1] += wts[k] * px[1];
        acc[2] += wts[k] * px[2];
      }
      trow[x * 3 + 0] = acc[0];
      trow[x * 3 + 1] = acc[1];
      trow[x * 3 + 2] = acc[2];
    }
  }
  // vertical pass -> u8 out
  for (int y = 0; y < oh; ++y) {
    const float* wts = fv.weights.data() + static_cast<size_t>(y) * fv.max_size;
    unsigned char* drow = dst + static_cast<size_t>(y) * ow * 3;
    for (int x = 0; x < ow; ++x) {
      float acc[3] = {0.f, 0.f, 0.f};
      for (int k = 0; k < fv.xsize[y]; ++k) {
        const float* px =
            tmp.data() + ((static_cast<size_t>(fv.xmin[y]) + k) * ow + x) * 3;
        acc[0] += wts[k] * px[0];
        acc[1] += wts[k] * px[1];
        acc[2] += wts[k] * px[2];
      }
      for (int c = 0; c < 3; ++c) {
        float v = acc[c] + 0.5f;
        drow[x * 3 + c] =
            static_cast<unsigned char>(v < 0.f ? 0.f : (v > 255.f ? 255.f : v));
      }
    }
  }
}

}  // namespace

extern "C" {

// Parallel row gather: out[i] = store[indices[i]], rows of row_bytes.
// The epoch-pool sampling hot path (replaces the per-image Lua loop
// dataset.lua:80-117 / numpy fancy-indexing on a memmap).
void fg_gather_rows(const unsigned char* store, int64_t row_bytes, const int64_t* indices,
                    int64_t n_idx, unsigned char* out, int n_threads) {
  parallel_for(n_idx, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      std::memcpy(out + i * row_bytes, store + indices[i] * row_bytes,
                  static_cast<size_t>(row_bytes));
    }
  });
}

// n random int64 indices in [lo, hi), deterministic in seed.
void fg_random_indices(int64_t lo, int64_t hi, int64_t n, uint64_t seed, int64_t* out) {
  uint64_t state = seed;
  const uint64_t range = static_cast<uint64_t>(hi - lo);
  for (int64_t i = 0; i < n; ++i) {
    out[i] = lo + static_cast<int64_t>(splitmix64(state) % range);
  }
}

// In-place Fisher-Yates shuffle of int64 array, deterministic in seed.
void fg_shuffle(int64_t* data, int64_t n, uint64_t seed) {
  uint64_t state = seed;
  for (int64_t i = n - 1; i > 0; --i) {
    int64_t j = static_cast<int64_t>(splitmix64(state) % static_cast<uint64_t>(i + 1));
    std::swap(data[i], data[j]);
  }
}

// Threaded batch JPEG decode + fixed crop + bilinear resize to out_size.
// blob: concatenated file bytes; offsets/sizes: per-file spans.
// crop box [cy0, cy1] x [cx0, cx1] inclusive (generate_dataset.py:20-23,
// 52-55) applied only when the decoded image covers it; output rows are
// out_size*out_size*3 u8 RGB. Returns the number of failed decodes
// (their rows are zeroed).
int64_t fg_decode_crop_resize_batch(const unsigned char* blob, const int64_t* offsets,
                                    const int64_t* sizes, int64_t n, int cy0, int cy1,
                                    int cx0, int cx1, int out_size, unsigned char* out,
                                    int n_threads) {
  std::atomic<int64_t> failures{0};
  const int64_t row = static_cast<int64_t>(out_size) * out_size * 3;
  parallel_for(n, n_threads, [&](int64_t lo, int64_t hi) {
    std::vector<unsigned char> rgb;
    std::vector<unsigned char> cropped;
    for (int64_t i = lo; i < hi; ++i) {
      int h = 0, w = 0;
      if (decode_rgb(blob + offsets[i], sizes[i], rgb, h, w) != 0) {
        std::memset(out + i * row, 0, static_cast<size_t>(row));
        failures.fetch_add(1, std::memory_order_relaxed);
        continue;
      }
      const unsigned char* src = rgb.data();
      int sh = h, sw = w;
      if (h > cy1 && w > cx1) {
        sh = cy1 - cy0 + 1;
        sw = cx1 - cx0 + 1;
        cropped.resize(static_cast<size_t>(sh) * sw * 3);
        for (int y = 0; y < sh; ++y) {
          std::memcpy(cropped.data() + static_cast<size_t>(y) * sw * 3,
                      rgb.data() + ((static_cast<size_t>(y) + cy0) * w + cx0) * 3,
                      static_cast<size_t>(sw) * 3);
        }
        src = cropped.data();
      }
      if (sh == out_size && sw == out_size) {
        std::memcpy(out + i * row, src, static_cast<size_t>(row));
      } else {
        resize_bilinear(src, sh, sw, out + i * row, out_size, out_size);
      }
    }
  });
  return failures.load();
}

}  // extern "C"
