// Packed RGB-D shard reader + multithreaded batch assembler.
//
// The reference feeds training through torch's DataLoader (native worker
// processes decoding PNG + .npy per example, data/base.py:30-188). The
// TPU-native equivalent keeps the chip fed from the host CPU without
// per-example Python: tools/pack_dataset.py decodes + resizes + disparity-
// encodes ONCE into a flat mmap-able shard, and this module assembles
// ready-to-upload float32 NHWC batches from it with C++ threads.
//
// Shard layout (little-endian, written by tools/pack_dataset.py):
//   8  bytes  magic   "SGPKv01\0"
//   4  bytes  u32 n_records
//   4  bytes  u32 height
//   4  bytes  u32 width
//   4  bytes  u32 flags        bit 0: has_depth (4th disparity channel)
//   then n_records of:
//     h*w*3 bytes  u8  RGB     (post-LANCZOS-resize pixels)
//     h*w*4 bytes  f32 channel (disparity in [-1,1]; only if has_depth)
//
// Batch values are bit-identical to the Python path: RGB maps through
// v / 127.5f - 1.0f (the same float32 ops numpy applies in io.load_rgb)
// and the disparity channel is copied verbatim.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr char kMagic[8] = {'S', 'G', 'P', 'K', 'v', '0', '1', '\0'};

struct Header {
  char magic[8];
  uint32_t n, h, w, flags;
};

struct Shard {
  int fd = -1;
  size_t map_bytes = 0;
  const uint8_t* base = nullptr;  // mmap base
  const uint8_t* records = nullptr;
  uint32_t n = 0, h = 0, w = 0;
  bool has_depth = false;
  size_t rgb_bytes = 0, depth_bytes = 0, rec_bytes = 0;
};

// 256-entry LUT computed with the exact ops numpy uses: float32(v)/127.5f-1.
struct RgbLut {
  float t[256];
  RgbLut() {
    for (int v = 0; v < 256; ++v) t[v] = static_cast<float>(v) / 127.5f - 1.0f;
  }
};
const RgbLut kLut;

void assemble_range(const Shard* s, const int64_t* idx, int64_t lo, int64_t hi,
                    float* out, int channels) {
  const size_t px = static_cast<size_t>(s->h) * s->w;
  for (int64_t b = lo; b < hi; ++b) {
    const uint8_t* rec = s->records + static_cast<size_t>(idx[b]) * s->rec_bytes;
    float* dst = out + static_cast<size_t>(b) * px * channels;
    const uint8_t* rgb = rec;
    if (s->has_depth) {
      const float* disp = reinterpret_cast<const float*>(rec + s->rgb_bytes);
      for (size_t p = 0; p < px; ++p) {
        dst[p * 4 + 0] = kLut.t[rgb[p * 3 + 0]];
        dst[p * 4 + 1] = kLut.t[rgb[p * 3 + 1]];
        dst[p * 4 + 2] = kLut.t[rgb[p * 3 + 2]];
        dst[p * 4 + 3] = disp[p];
      }
    } else {
      for (size_t p = 0; p < px; ++p) {
        dst[p * 3 + 0] = kLut.t[rgb[p * 3 + 0]];
        dst[p * 3 + 1] = kLut.t[rgb[p * 3 + 1]];
        dst[p * 3 + 2] = kLut.t[rgb[p * 3 + 2]];
      }
    }
  }
}

}  // namespace

extern "C" {

void* sgpk_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 ||
      static_cast<size_t>(st.st_size) < sizeof(Header)) {
    ::close(fd);
    return nullptr;
  }
  void* m = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (m == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  const Header* hd = static_cast<const Header*>(m);
  Shard* s = new Shard();
  s->fd = fd;
  s->map_bytes = st.st_size;
  s->base = static_cast<const uint8_t*>(m);
  s->records = s->base + sizeof(Header);
  s->n = hd->n;
  s->h = hd->h;
  s->w = hd->w;
  s->has_depth = (hd->flags & 1u) != 0;
  s->rgb_bytes = static_cast<size_t>(s->h) * s->w * 3;
  s->depth_bytes = s->has_depth ? static_cast<size_t>(s->h) * s->w * 4 : 0;
  s->rec_bytes = s->rgb_bytes + s->depth_bytes;
  // overflow-safe validation: bound h/w first (so rec_bytes cannot wrap),
  // then compare n against the record capacity by division (no n*rec mul)
  const bool dims_ok =
      s->h > 0 && s->w > 0 && s->h <= (1u << 16) && s->w <= (1u << 16);
  const size_t payload = s->map_bytes - sizeof(Header);
  if (memcmp(hd->magic, kMagic, 8) != 0 || s->n == 0 || !dims_ok ||
      s->rec_bytes == 0 ||
      static_cast<size_t>(s->n) > payload / s->rec_bytes) {
    munmap(m, s->map_bytes);
    ::close(fd);
    delete s;
    return nullptr;
  }
  return s;
}

void sgpk_close(void* h) {
  Shard* s = static_cast<Shard*>(h);
  if (!s) return;
  munmap(const_cast<uint8_t*>(s->base), s->map_bytes);
  ::close(s->fd);
  delete s;
}

int64_t sgpk_count(void* h) { return static_cast<Shard*>(h)->n; }
int64_t sgpk_height(void* h) { return static_cast<Shard*>(h)->h; }
int64_t sgpk_width(void* h) { return static_cast<Shard*>(h)->w; }
int64_t sgpk_channels(void* h) {
  return static_cast<Shard*>(h)->has_depth ? 4 : 3;
}

// Assemble records idx[0..n) into out [n, H, W, C] float32 (C preallocated
// by the caller as sgpk_channels()). Returns 0 on success, -1 on a bad index.
int32_t sgpk_assemble(void* h, const int64_t* idx, int64_t n, float* out,
                      int32_t threads) {
  const Shard* s = static_cast<const Shard*>(h);
  for (int64_t i = 0; i < n; ++i)
    if (idx[i] < 0 || idx[i] >= static_cast<int64_t>(s->n)) return -1;
  const int channels = s->has_depth ? 4 : 3;
  if (threads <= 0) {
    unsigned hw = std::thread::hardware_concurrency();
    threads = hw ? static_cast<int32_t>(hw) : 4;
  }
  if (threads > n) threads = static_cast<int32_t>(n);
  if (threads <= 1) {
    assemble_range(s, idx, 0, n, out, channels);
    return 0;
  }
  std::vector<std::thread> pool;
  pool.reserve(threads);
  const int64_t per = (n + threads - 1) / threads;
  for (int32_t t = 0; t < threads; ++t) {
    const int64_t lo = t * per;
    const int64_t hi = std::min<int64_t>(lo + per, n);
    if (lo >= hi) break;
    pool.emplace_back(assemble_range, s, idx, lo, hi, out, channels);
  }
  for (auto& th : pool) th.join();
  return 0;
}

// Gather records idx[0..n) into SEPARATE buffers: rgb_out [n, H, W, 3]
// float32 (scaled to [-1, 1]) and depth_out [n, H, W] float32 (the stored
// channel copied verbatim; pass nullptr to skip). The pair-dataset frame
// store uses this: examples need rgb and depth as separate arrays.
int32_t sgpk_gather(void* h, const int64_t* idx, int64_t n, float* rgb_out,
                    float* depth_out, int32_t threads) {
  const Shard* s = static_cast<const Shard*>(h);
  for (int64_t i = 0; i < n; ++i)
    if (idx[i] < 0 || idx[i] >= static_cast<int64_t>(s->n)) return -1;
  if (depth_out && !s->has_depth) return -2;
  if (threads <= 0) {
    unsigned hw = std::thread::hardware_concurrency();
    threads = hw ? static_cast<int32_t>(hw) : 4;
  }
  if (threads > n) threads = static_cast<int32_t>(n);
  const size_t px = static_cast<size_t>(s->h) * s->w;
  auto run = [&](int64_t lo, int64_t hi) {
    for (int64_t b = lo; b < hi; ++b) {
      const uint8_t* rec =
          s->records + static_cast<size_t>(idx[b]) * s->rec_bytes;
      float* dst = rgb_out + static_cast<size_t>(b) * px * 3;
      for (size_t p = 0; p < px * 3; ++p) dst[p] = kLut.t[rec[p]];
      if (depth_out) {
        memcpy(depth_out + static_cast<size_t>(b) * px, rec + s->rgb_bytes,
               px * sizeof(float));
      }
    }
  };
  if (threads <= 1) {
    run(0, n);
    return 0;
  }
  std::vector<std::thread> pool;
  pool.reserve(threads);
  const int64_t per = (n + threads - 1) / threads;
  for (int32_t t = 0; t < threads; ++t) {
    const int64_t lo = t * per;
    const int64_t hi = std::min<int64_t>(lo + per, n);
    if (lo >= hi) break;
    pool.emplace_back(run, lo, hi);
  }
  for (auto& th : pool) th.join();
  return 0;
}

}  // extern "C"
