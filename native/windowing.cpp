// Native batch-assembly core for the host input pipeline.
//
// The reference feeds the GPU from torch DataLoader worker *processes*
// (hpe/main_h36m_lifting.py:599-609). On TPU hosts the equivalent hot
// loop is gathering L-frame windows out of per-video pose arrays into a
// fixed-shape batch buffer; this does it in one multithreaded C++ pass
// (replicate-padding short tails), replacing the per-sample Python loop.
//
// Built as a plain shared library (no pybind11 in this environment);
// bound from Python via ctypes (manipose_tpu/data/native.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Gather `n_windows` clips of `seq_len` frames into `out`.
//   videos:       array of n_videos pointers to float32 [n_frames_i, row]
//   video_len:    frames per video
//   row:          floats per frame (J * C)
//   video_idx:    window -> source video
//   start_frame:  window -> first frame (may overrun: replicate-pad)
//   out:          [n_windows, seq_len, row] float32, pre-allocated
void gather_windows(const float** videos, const int64_t* video_len,
                    int64_t row, const int64_t* video_idx,
                    const int64_t* start_frame, int64_t n_windows,
                    int64_t seq_len, float* out, int n_threads) {
  auto worker = [&](int64_t w0, int64_t w1) {
    for (int64_t w = w0; w < w1; ++w) {
      const float* src = videos[video_idx[w]];
      const int64_t len = video_len[video_idx[w]];
      const int64_t start = start_frame[w];
      float* dst = out + w * seq_len * row;
      const int64_t valid =
          std::max<int64_t>(0, std::min(seq_len, len - start));
      if (valid > 0) {
        std::memcpy(dst, src + start * row,
                    static_cast<size_t>(valid * row) * sizeof(float));
      }
      // replicate-pad the tail (generators.py:136-152 semantics)
      if (valid < seq_len && len > 0) {
        const float* last = src + (len - 1) * row;
        for (int64_t f = valid; f < seq_len; ++f) {
          std::memcpy(dst + f * row, last,
                      static_cast<size_t>(row) * sizeof(float));
        }
      }
    }
  };

  if (n_threads <= 1 || n_windows < 4) {
    worker(0, n_windows);
    return;
  }
  const int threads = std::min<int64_t>(n_threads, n_windows);
  std::vector<std::thread> pool;
  const int64_t chunk = (n_windows + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    const int64_t w0 = t * chunk;
    const int64_t w1 = std::min<int64_t>(w0 + chunk, n_windows);
    if (w0 < w1) pool.emplace_back(worker, w0, w1);
  }
  for (auto& th : pool) th.join();
}

// In-place elementwise multiply of a batch by per-(frame, joint) masks:
//   batch: [n, seq_len, joints, chans], mask: [n, seq_len, joints]
void apply_masks(float* batch, const float* mask, int64_t n,
                 int64_t seq_len, int64_t joints, int64_t chans) {
  const int64_t cells = n * seq_len * joints;
  for (int64_t i = 0; i < cells; ++i) {
    const float m = mask[i];
    float* p = batch + i * chans;
    for (int64_t c = 0; c < chans; ++c) p[c] *= m;
  }
}

int windowing_abi_version() { return 1; }

}  // extern "C"
