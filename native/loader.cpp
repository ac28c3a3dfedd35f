// Native data-loader core for the single-video SR pipeline.
//
// TPU-native equivalent of the reference's DataLoader worker processes
// (/root/reference/data.py:122,134: 4 python workers re-decoding PNGs and
// re-concatenating the 21-frame LR window every epoch). Here the video is
// decoded once into a host cache (python side) and this library does the hot
// per-batch work without Python/numpy overhead:
//
//   * gather_windows: assemble (B, h, w, T*C) channel-concat LR windows from
//     the (N, h, w, C) frame cache in one interleaved pass (numpy needs a
//     transpose + reshape copy);
//   * u8_to_f32: normalize uint8 -> [0,1] float32 (when the caller wants
//     host-side conversion instead of on-device);
//   * prefetcher: a background pthread that assembles the next batch while
//     the accelerator consumes the current one (double buffering).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

extern "C" {

// lr:    (n_frames, h, w, c) uint8, C-contiguous
// idx:   (batch, win) int64 frame indices
// out:   (batch, h, w, win*c) uint8
void gather_windows(const uint8_t* lr, int64_t n_frames, int64_t h, int64_t w,
                    int64_t c, const int64_t* idx, int64_t batch, int64_t win,
                    uint8_t* out) {
  const int64_t frame_stride = h * w * c;
  const int64_t row_elems = w * c;
  const int64_t out_row = w * win * c;
  for (int64_t b = 0; b < batch; ++b) {
    const int64_t* widx = idx + b * win;
    uint8_t* ob = out + b * h * out_row;
    for (int64_t t = 0; t < win; ++t) {
      const uint8_t* src = lr + widx[t] * frame_stride;
      for (int64_t y = 0; y < h; ++y) {
        const uint8_t* srow = src + y * row_elems;
        uint8_t* orow = ob + y * out_row + t * c;
        for (int64_t x = 0; x < w; ++x) {
          std::memcpy(orow + x * win * c, srow + x * c, c);
        }
      }
    }
  }
}

// Gather single frames: hr (n, H, W, C) + idx (batch,) -> out (batch, H, W, C)
void gather_frames(const uint8_t* frames, int64_t h, int64_t w, int64_t c,
                   const int64_t* idx, int64_t batch, uint8_t* out) {
  const int64_t fs = h * w * c;
  for (int64_t b = 0; b < batch; ++b) {
    std::memcpy(out + b * fs, frames + idx[b] * fs, fs);
  }
}

void u8_to_f32(const uint8_t* in, int64_t n, float* out) {
  constexpr float kInv = 1.0f / 255.0f;
  for (int64_t i = 0; i < n; ++i) out[i] = in[i] * kInv;
}

// ---------------------------------------------------------------------------
// Double-buffered prefetcher: one worker thread assembles batches ahead.
// ---------------------------------------------------------------------------

struct Prefetcher {
  const uint8_t* lr;
  const uint8_t* hr;
  int64_t n_frames, lh, lw, lc, hh, hw, hc, win, batch;
  std::vector<int64_t> order;        // sample -> center index
  std::vector<int64_t> window_idx;   // per-sample window (win indices each)
  int64_t pos = 0;

  // two slots
  std::vector<uint8_t> lr_buf[2];
  std::vector<uint8_t> hr_buf[2];
  int64_t count[2] = {0, 0};
  int ready[2] = {0, 0};
  int consume_slot = 0;
  bool stop_flag = false;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  std::thread worker;

  void fill(int slot) {
    int64_t take = std::min(batch, (int64_t)order.size() - pos);
    count[slot] = take;
    if (take <= 0) return;
    std::vector<int64_t> widx((size_t)take * win);
    std::vector<int64_t> cidx(take);
    for (int64_t i = 0; i < take; ++i) {
      int64_t s = order[pos + i];
      cidx[i] = s;  // caller pre-bakes hr index == sample center row
      for (int64_t t = 0; t < win; ++t)
        widx[i * win + t] = window_idx[s * win + t];
    }
    gather_windows(lr, n_frames, lh, lw, lc, widx.data(), take, win,
                   lr_buf[slot].data());
    gather_frames(hr, hh, hw, hc, cidx.data(), take, hr_buf[slot].data());
    pos += take;
  }

  void run() {
    int slot = 0;
    while (true) {
      std::unique_lock<std::mutex> lk(mu);
      cv_empty.wait(lk, [&] { return !ready[slot] || stop_flag; });
      if (stop_flag) return;
      lk.unlock();
      fill(slot);
      lk.lock();
      ready[slot] = 1;
      cv_full.notify_all();
      if (count[slot] <= 0) return;  // epoch exhausted
      slot ^= 1;
    }
  }
};

void* prefetcher_create(const uint8_t* lr, int64_t n_frames, int64_t lh,
                        int64_t lw, int64_t lc, const uint8_t* hr, int64_t hh,
                        int64_t hw, int64_t hc, const int64_t* window_idx,
                        const int64_t* order, int64_t n_samples, int64_t win,
                        int64_t batch) {
  auto* p = new Prefetcher();
  p->lr = lr; p->hr = hr;
  p->n_frames = n_frames;
  p->lh = lh; p->lw = lw; p->lc = lc;
  p->hh = hh; p->hw = hw; p->hc = hc;
  p->win = win; p->batch = batch;
  p->order.assign(order, order + n_samples);
  p->window_idx.assign(window_idx, window_idx + n_samples * win);
  for (int s = 0; s < 2; ++s) {
    p->lr_buf[s].resize((size_t)batch * lh * lw * win * lc);
    p->hr_buf[s].resize((size_t)batch * hh * hw * hc);
  }
  p->worker = std::thread([p] { p->run(); });
  return p;
}

// Returns the number of samples in the batch (0 => exhausted). Copies the
// slot contents into caller buffers and releases the slot.
int64_t prefetcher_next(void* handle, uint8_t* lr_out, uint8_t* hr_out) {
  auto* p = static_cast<Prefetcher*>(handle);
  std::unique_lock<std::mutex> lk(p->mu);
  // fills alternate 0,1,0,1...; consume with a matching rotating cursor
  int slot = p->consume_slot;
  p->cv_full.wait(lk, [&] { return p->ready[slot]; });
  int64_t n = p->count[slot];
  if (n > 0) {
    std::memcpy(lr_out, p->lr_buf[slot].data(),
                (size_t)n * p->lh * p->lw * p->win * p->lc);
    std::memcpy(hr_out, p->hr_buf[slot].data(),
                (size_t)n * p->hh * p->hw * p->hc);
  }
  p->ready[slot] = 0;
  p->consume_slot = slot ^ 1;
  p->cv_empty.notify_all();
  return n;
}

void prefetcher_destroy(void* handle) {
  auto* p = static_cast<Prefetcher*>(handle);
  {
    std::unique_lock<std::mutex> lk(p->mu);
    p->stop_flag |= 1;
    p->cv_empty.notify_all();
  }
  if (p->worker.joinable()) p->worker.join();
  delete p;
}

}  // extern "C"
