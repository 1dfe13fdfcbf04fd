// fastloader: native batch-assembly backend for the training data path.
//
// The reference feeds training with nerfstudio CacheDataloader worker
// processes + torch pixel samplers (lse_datamanager.py:258-283,
// lse_pixel_sampler.py). The TPU rebuild keeps the whole step on-device and
// only needs the host to produce small fixed-shape batches: sampled pixel
// indices + gathered ground-truth values. This library does that with a
// counter-based RNG and multithreaded gathers over the preloaded image /
// event-frame arrays, plus a double-buffered prefetcher so batch k+1 is
// assembled while the accelerator executes step k.
//
// C ABI only (used from Python via ctypes): no pybind11 dependency.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

// splitmix64: tiny, high-quality counter-based RNG (public-domain algorithm)
static inline uint64_t splitmix64(uint64_t x) {
  x += 0x9E3779B97F4A7C15ULL;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
  return x ^ (x >> 31);
}

struct Dims {
  int64_t n_imgs, h, w, c;
};

void sample_and_gather_u8(const uint8_t* images, Dims d, uint64_t seed,
                          int64_t n_rays, int64_t img_limit, int32_t* out_idx,
                          float* out_val, int n_threads) {
  if (img_limit <= 0 || img_limit > d.n_imgs) img_limit = d.n_imgs;
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      uint64_t r0 = splitmix64(seed + 3 * i);
      uint64_t r1 = splitmix64(seed + 3 * i + 1);
      uint64_t r2 = splitmix64(seed + 3 * i + 2);
      int32_t ci = static_cast<int32_t>(r0 % img_limit);
      int32_t yi = static_cast<int32_t>(r1 % d.h);
      int32_t xi = static_cast<int32_t>(r2 % d.w);
      out_idx[3 * i] = ci;
      out_idx[3 * i + 1] = yi;
      out_idx[3 * i + 2] = xi;
      const uint8_t* px = images + ((ci * d.h + yi) * d.w + xi) * d.c;
      for (int64_t k = 0; k < d.c; ++k)
        out_val[i * d.c + k] = px[k] * (1.0f / 255.0f);
    }
  };
  if (n_threads <= 1 || n_rays < 4096) {
    worker(0, n_rays);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n_rays + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk, hi = std::min(n_rays, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back(worker, lo, hi);
  }
  for (auto& t : ts) t.join();
}

void sample_and_gather_f32(const float* frames, Dims d, uint64_t seed,
                           int64_t n_rays, int64_t img_limit, float scale,
                           int32_t* out_idx, float* out_val, int n_threads) {
  if (img_limit <= 0 || img_limit > d.n_imgs) img_limit = d.n_imgs;
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      uint64_t r0 = splitmix64(seed + 3 * i);
      uint64_t r1 = splitmix64(seed + 3 * i + 1);
      uint64_t r2 = splitmix64(seed + 3 * i + 2);
      int32_t ci = static_cast<int32_t>(r0 % img_limit);
      int32_t yi = static_cast<int32_t>(r1 % d.h);
      int32_t xi = static_cast<int32_t>(r2 % d.w);
      out_idx[3 * i] = ci;
      out_idx[3 * i + 1] = yi;
      out_idx[3 * i + 2] = xi;
      const float* px = frames + ((ci * d.h + yi) * d.w + xi) * d.c;
      for (int64_t k = 0; k < d.c; ++k) out_val[i * d.c + k] = px[k] * scale;
    }
  };
  if (n_threads <= 1 || n_rays < 4096) {
    worker(0, n_rays);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n_rays + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk, hi = std::min(n_rays, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back(worker, lo, hi);
  }
  for (auto& t : ts) t.join();
}

// int16 event frames with an optional frame-index translation table:
// `sel` maps the LOGICAL frame index (what training sees, d.n_imgs entries)
// to the PHYSICAL frame in the backing buffer. This is the memmap path —
// `frames` may point straight into an OS-mapped .npy, so the only pages
// ever touched are the ones sampled pixels land on, and the page-fault IO
// happens on the prefetcher thread, overlapped with the training step.
void sample_and_gather_i16(const int16_t* frames, const int64_t* sel, Dims d,
                           uint64_t seed, int64_t n_rays, int64_t img_limit,
                           float scale, int32_t* out_idx, float* out_val,
                           int n_threads) {
  if (img_limit <= 0 || img_limit > d.n_imgs) img_limit = d.n_imgs;
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      uint64_t r0 = splitmix64(seed + 3 * i);
      uint64_t r1 = splitmix64(seed + 3 * i + 1);
      uint64_t r2 = splitmix64(seed + 3 * i + 2);
      int32_t ci = static_cast<int32_t>(r0 % img_limit);
      int32_t yi = static_cast<int32_t>(r1 % d.h);
      int32_t xi = static_cast<int32_t>(r2 % d.w);
      out_idx[3 * i] = ci;
      out_idx[3 * i + 1] = yi;
      out_idx[3 * i + 2] = xi;
      int64_t phys = sel ? sel[ci] : ci;
      const int16_t* px = frames + ((phys * d.h + yi) * d.w + xi) * d.c;
      for (int64_t k = 0; k < d.c; ++k) out_val[i * d.c + k] = px[k] * scale;
    }
  };
  if (n_threads <= 1 || n_rays < 4096) {
    worker(0, n_rays);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n_rays + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk, hi = std::min(n_rays, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back(worker, lo, hi);
  }
  for (auto& t : ts) t.join();
}

// -------------------------------------------------------------------------
// double-buffered prefetcher: one producer thread assembles batch k+1 while
// the caller consumes batch k (the CacheDataloader-worker equivalent).
// -------------------------------------------------------------------------

struct Prefetcher {
  // dataset pointers (owned by Python; must outlive the prefetcher)
  const uint8_t* col = nullptr;
  Dims col_d{};
  const float* evs = nullptr;          // eager float32 event frames, or ...
  const int16_t* evs_i16 = nullptr;    // ... memmapped int16 raw counts
  const int64_t* evs_sel = nullptr;    // logical->physical frame map (i16)
  Dims evs_d{};
  float evs_scale = 1.0f;
  int64_t evs_img_limit = 0;

  int64_t n_col = 0, n_evs = 0;
  uint64_t seed = 0;
  std::atomic<uint64_t> step{0};

  // two buffers, each: col_idx, col_val, evs_idx, evs_val
  struct Buf {
    std::vector<int32_t> col_idx, evs_idx;
    std::vector<float> col_val, evs_val;
    uint64_t for_step = ~0ULL;
    bool ready = false;
  };
  Buf bufs[2];
  std::mutex mu;
  std::condition_variable cv_ready, cv_need;
  std::atomic<bool> stop_flag{false};
  std::thread worker;

  void fill(Buf& b, uint64_t s) {
    uint64_t sd = splitmix64(seed ^ (s * 0x9E3779B97F4A7C15ULL));
    if (n_col > 0)
      sample_and_gather_u8(col, col_d, sd, n_col, 0, b.col_idx.data(),
                           b.col_val.data(), 2);
    if (n_evs > 0) {
      if (evs_i16)
        sample_and_gather_i16(evs_i16, evs_sel, evs_d, splitmix64(sd), n_evs,
                              evs_img_limit, evs_scale, b.evs_idx.data(),
                              b.evs_val.data(), 2);
      else
        sample_and_gather_f32(evs, evs_d, splitmix64(sd), n_evs, evs_img_limit,
                              evs_scale, b.evs_idx.data(), b.evs_val.data(), 2);
    }
    b.for_step = s;
  }

  void run() {
    uint64_t next = 0;
    while (!stop_flag.load()) {
      Buf& b = bufs[next % 2];
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_need.wait(lk, [&] { return stop_flag.load() || !b.ready; });
        if (stop_flag.load()) return;
      }
      fill(b, next);
      {
        std::lock_guard<std::mutex> lk(mu);
        b.ready = true;
      }
      cv_ready.notify_all();
      ++next;
    }
  }
};

}  // namespace

extern "C" {

void lse_sample_rgb(const uint8_t* images, int64_t n_imgs, int64_t h,
                    int64_t w, int64_t c, uint64_t seed, int64_t n_rays,
                    int32_t* out_idx, float* out_val, int n_threads) {
  sample_and_gather_u8(images, {n_imgs, h, w, c}, seed, n_rays, 0, out_idx,
                       out_val, n_threads);
}

void lse_sample_events(const float* frames, int64_t n_imgs, int64_t h,
                       int64_t w, int64_t c, uint64_t seed, int64_t n_rays,
                       int64_t img_limit, float e_thresh, int32_t* out_idx,
                       float* out_val, int n_threads) {
  sample_and_gather_f32(frames, {n_imgs, h, w, c}, seed, n_rays, img_limit,
                        e_thresh, out_idx, out_val, n_threads);
}

void lse_sample_events_i16(const int16_t* frames, int64_t n_imgs, int64_t h,
                           int64_t w, int64_t c, uint64_t seed, int64_t n_rays,
                           int64_t img_limit, float e_thresh, int32_t* out_idx,
                           float* out_val, int n_threads) {
  sample_and_gather_i16(frames, nullptr, {n_imgs, h, w, c}, seed, n_rays,
                        img_limit, e_thresh, out_idx, out_val, n_threads);
}

void* lse_prefetcher_create(const uint8_t* col, int64_t cn, int64_t ch,
                            int64_t cw, int64_t cc, int64_t n_col,
                            const float* evs, int64_t en, int64_t eh,
                            int64_t ew, int64_t ec, int64_t n_evs,
                            int64_t evs_img_limit, float evs_scale,
                            uint64_t seed) {
  auto* p = new Prefetcher();
  p->col = col;
  p->col_d = {cn, ch, cw, cc};
  p->evs = evs;
  p->evs_d = {en, eh, ew, ec};
  p->evs_scale = evs_scale;
  p->evs_img_limit = evs_img_limit;
  p->n_col = n_col;
  p->n_evs = n_evs;
  p->seed = seed;
  for (auto& b : p->bufs) {
    b.col_idx.resize(static_cast<size_t>(n_col) * 3);
    b.col_val.resize(static_cast<size_t>(n_col) * cc);
    b.evs_idx.resize(static_cast<size_t>(n_evs) * 3);
    b.evs_val.resize(static_cast<size_t>(n_evs) * ec);
  }
  p->worker = std::thread([p] { p->run(); });
  return p;
}

// Memmap-preserving variant: event frames as int16 raw counts (possibly an
// OS-mapped .npy) + a logical->physical frame-index table. en is the number
// of LOGICAL frames (== length of sel).
void* lse_prefetcher_create_i16(const uint8_t* col, int64_t cn, int64_t ch,
                                int64_t cw, int64_t cc, int64_t n_col,
                                const int16_t* evs, const int64_t* sel,
                                int64_t en, int64_t eh, int64_t ew, int64_t ec,
                                int64_t n_evs, int64_t evs_img_limit,
                                float evs_scale, uint64_t seed) {
  auto* p = new Prefetcher();
  p->col = col;
  p->col_d = {cn, ch, cw, cc};
  p->evs_i16 = evs;
  p->evs_sel = sel;
  p->evs_d = {en, eh, ew, ec};
  p->evs_scale = evs_scale;
  p->evs_img_limit = evs_img_limit;
  p->n_col = n_col;
  p->n_evs = n_evs;
  p->seed = seed;
  for (auto& b : p->bufs) {
    b.col_idx.resize(static_cast<size_t>(n_col) * 3);
    b.col_val.resize(static_cast<size_t>(n_col) * cc);
    b.evs_idx.resize(static_cast<size_t>(n_evs) * 3);
    b.evs_val.resize(static_cast<size_t>(n_evs) * ec);
  }
  p->worker = std::thread([p] { p->run(); });
  return p;
}

// Blocks until batch `step` is ready, then copies it out and releases the
// buffer for refilling.
void lse_prefetcher_next(void* handle, uint64_t step, int32_t* col_idx,
                         float* col_val, int32_t* evs_idx, float* evs_val) {
  auto* p = static_cast<Prefetcher*>(handle);
  Prefetcher::Buf& b = p->bufs[step % 2];
  {
    std::unique_lock<std::mutex> lk(p->mu);
    p->cv_ready.wait(lk, [&] { return b.ready && b.for_step == step; });
  }
  if (p->n_col > 0) {
    std::memcpy(col_idx, b.col_idx.data(), b.col_idx.size() * sizeof(int32_t));
    std::memcpy(col_val, b.col_val.data(), b.col_val.size() * sizeof(float));
  }
  if (p->n_evs > 0) {
    std::memcpy(evs_idx, b.evs_idx.data(), b.evs_idx.size() * sizeof(int32_t));
    std::memcpy(evs_val, b.evs_val.data(), b.evs_val.size() * sizeof(float));
  }
  {
    std::lock_guard<std::mutex> lk(p->mu);
    b.ready = false;
  }
  p->cv_need.notify_all();
}

void lse_prefetcher_destroy(void* handle) {
  auto* p = static_cast<Prefetcher*>(handle);
  p->stop_flag.store(true);
  p->cv_need.notify_all();
  if (p->worker.joinable()) p->worker.join();
  delete p;
}

}  // extern "C"
