// qie_native: native host-side helpers for the checkpoint pipeline.
//
// TPU-native counterpart of the reference engine's C++ weight machinery
// (reference: layers/src/tensor_parser.cpp — safetensors header indexing;
// layers/src/iengine.cu:117-223 — chunked streaming of weights.bin). Our
// loader keeps the *device* side in JAX (device_put sharded tensors), but
// the host-side hot loops live here:
//   * parallel blocked 2-D transpose (HF [out,in] -> matmul-ready [in,out])
//   * parallel file-range reads (saturate page cache / NVMe on 30+ GB
//     checkpoints instead of single-threaded fread)
//   * bf16 -> f32 widening (reference: model_files/read_weights.py's
//     (u16<<16).view trick, vectorized and threaded)
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#if defined(__unix__) || defined(__APPLE__)
#include <fcntl.h>
#include <unistd.h>
#endif

namespace {

inline int clamp_threads(int nthreads, int64_t work_items) {
  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 4;
  if (nthreads <= 0) nthreads = static_cast<int>(hw);
  if (static_cast<int64_t>(nthreads) > work_items) nthreads = static_cast<int>(work_items);
  return nthreads < 1 ? 1 : nthreads;
}

template <typename F>
void parallel_for(int64_t n, int nthreads, F&& fn) {
  nthreads = clamp_threads(nthreads, n);
  if (nthreads == 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> ts;
  ts.reserve(nthreads);
  int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    ts.emplace_back([lo, hi, &fn] { fn(lo, hi); });
  }
  for (auto& t : ts) t.join();
}

// Cache-blocked transpose of one element-size-T matrix.
template <typename T>
void transpose_block(const T* src, T* dst, int64_t rows, int64_t cols,
                     int64_t r0, int64_t r1) {
  constexpr int64_t B = 64;
  for (int64_t rb = r0; rb < r1; rb += B) {
    int64_t re = rb + B < r1 ? rb + B : r1;
    for (int64_t cb = 0; cb < cols; cb += B) {
      int64_t ce = cb + B < cols ? cb + B : cols;
      for (int64_t r = rb; r < re; ++r)
        for (int64_t c = cb; c < ce; ++c)
          dst[c * rows + r] = src[r * cols + c];
    }
  }
}

}  // namespace

extern "C" {

// dst[c, r] = src[r, c]; elem_size in {1, 2, 4, 8}. Returns 0 on success.
int qie_transpose_2d(const void* src, void* dst, int64_t rows, int64_t cols,
                     int elem_size, int nthreads) {
  switch (elem_size) {
    case 1:
      parallel_for(rows, nthreads, [&](int64_t lo, int64_t hi) {
        transpose_block(static_cast<const uint8_t*>(src),
                        static_cast<uint8_t*>(dst), rows, cols, lo, hi);
      });
      return 0;
    case 2:
      parallel_for(rows, nthreads, [&](int64_t lo, int64_t hi) {
        transpose_block(static_cast<const uint16_t*>(src),
                        static_cast<uint16_t*>(dst), rows, cols, lo, hi);
      });
      return 0;
    case 4:
      parallel_for(rows, nthreads, [&](int64_t lo, int64_t hi) {
        transpose_block(static_cast<const uint32_t*>(src),
                        static_cast<uint32_t*>(dst), rows, cols, lo, hi);
      });
      return 0;
    case 8:
      parallel_for(rows, nthreads, [&](int64_t lo, int64_t hi) {
        transpose_block(static_cast<const uint64_t*>(src),
                        static_cast<uint64_t*>(dst), rows, cols, lo, hi);
      });
      return 0;
    default:
      return -1;
  }
}

// Parallel positional read of [offset, offset+size) into dst.
// Returns bytes read, or -1 on error.
int64_t qie_read_file_range(const char* path, uint64_t offset, uint64_t size,
                            void* dst, int nthreads) {
#if defined(__unix__) || defined(__APPLE__)
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -1;
  std::atomic<int64_t> total{0};
  std::atomic<bool> failed{false};
  parallel_for(static_cast<int64_t>(size), nthreads == 0 ? 8 : nthreads,
               [&](int64_t lo, int64_t hi) {
                 char* out = static_cast<char*>(dst) + lo;
                 uint64_t off = offset + static_cast<uint64_t>(lo);
                 int64_t want = hi - lo;
                 while (want > 0) {
                   ssize_t got = ::pread(fd, out, static_cast<size_t>(want),
                                         static_cast<off_t>(off));
                   if (got <= 0) {
                     failed.store(true);
                     return;
                   }
                   out += got;
                   off += static_cast<uint64_t>(got);
                   want -= got;
                   total.fetch_add(got);
                 }
               });
  ::close(fd);
  if (failed.load()) return -1;
  return total.load();
#else
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  if (std::fseek(f, static_cast<long>(offset), SEEK_SET) != 0) {
    std::fclose(f);
    return -1;
  }
  size_t got = std::fread(dst, 1, size, f);
  std::fclose(f);
  return static_cast<int64_t>(got);
#endif
}

// Widen bf16 (as u16) to f32 in parallel.
void qie_bf16_to_f32(const uint16_t* src, float* dst, int64_t n, int nthreads) {
  parallel_for(n, nthreads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      uint32_t bits = static_cast<uint32_t>(src[i]) << 16;
      std::memcpy(&dst[i], &bits, sizeof(float));
    }
  });
}

int qie_version() { return 1; }

}  // extern "C"
