// Native push-based streaming engine (host-side audio-callback runtime).
//
// The product serving loop (azoom/zoom_api.py::AudioZoom.push) needs a
// real-time-friendly buffer layer between an audio callback and the
// device-side enhancement graph: accept arbitrary-sized sample blocks,
// hand out fixed 2 s analysis windows, and overlap-add the enhanced
// windows back into a finalized stream. The reference keeps this in
// NumPy slices (Final_pipeline/src/inference.py:171-233 rebuilds python
// lists per chunk); here it is a C++ ring buffer with amortized O(1)
// pushes, no per-block allocation, and exact Hann 50 % OLA — the JAX
// graph stays the compute path, this is the runtime around it.
//
// Exposed as a C ABI consumed via ctypes (azoom/stream/native.py). Build:
//   g++ -O3 -march=native -shared -fPIC stream_engine.cpp -o libstream.so
//
// Protocol per window (transactional: the stream only advances on
// commit, so a failed enhancement between peek and commit leaves the
// buffer untouched and the window is re-presented on the next peek):
//   push(samples)            -> buffer (M, k) planar samples
//   windows_ready()          -> how many full windows are extractable
//   next_window(out)         -> PEEK one (M, win) window (no advance)
//   commit(enhanced, out)    -> advance by hop; Hann-weight + OLA; writes
//                               hop finalized samples (0 for the first
//                               window: its second half becomes the
//                               pending tail)
// All entry points take an internal mutex: ctypes releases the GIL, so a
// producer thread (audio callback pushing) and a consumer thread
// (peek/commit draining) may race otherwise.

#include <cmath>
#include <cstring>
#include <mutex>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

struct StreamState {
  std::mutex mu;
  int n_mics = 0;
  int win = 0;
  int hop = 0;
  bool started = false;
  // Per-channel contiguous FIFO: data[read .. read+size) is live. The
  // front is compacted once `read` exceeds one window, so push/pop never
  // reallocate after warm-up and never memmove more than `size` floats.
  std::vector<std::vector<float>> chan;
  size_t read = 0;
  size_t size = 0;
  std::vector<float> window;    // periodic Hann, length win
  std::vector<float> ola_norm;  // w[:hop] + w[hop:], length hop
  std::vector<float> tail;      // pending weighted second half, length hop
};

}  // namespace

extern "C" {

void* azoom_stream_create(int n_mics, int win, int hop) {
  if (n_mics <= 0 || win <= 0 || hop <= 0 || win != 2 * hop) return nullptr;
  auto* s = new StreamState();
  s->n_mics = n_mics;
  s->win = win;
  s->hop = hop;
  s->chan.assign(static_cast<size_t>(n_mics), {});
  for (auto& c : s->chan) c.reserve(static_cast<size_t>(4 * win));
  s->window.resize(static_cast<size_t>(win));
  for (int i = 0; i < win; ++i)
    s->window[static_cast<size_t>(i)] =
        static_cast<float>(0.5 - 0.5 * std::cos(2.0 * kPi * i / win));
  s->ola_norm.resize(static_cast<size_t>(hop));
  for (int i = 0; i < hop; ++i) {
    const float n = s->window[static_cast<size_t>(i)] +
                    s->window[static_cast<size_t>(i + hop)];
    s->ola_norm[static_cast<size_t>(i)] = n > 1e-6f ? n : 1e-6f;
  }
  s->tail.assign(static_cast<size_t>(hop), 0.0f);
  return s;
}

void azoom_stream_destroy(void* h) { delete static_cast<StreamState*>(h); }

void azoom_stream_reset(void* h) {
  auto* s = static_cast<StreamState*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  for (auto& c : s->chan) c.clear();
  s->read = 0;
  s->size = 0;
  s->started = false;
  std::fill(s->tail.begin(), s->tail.end(), 0.0f);
}

// samples: planar float[n_mics][n] (C-contiguous (M, n) array).
int azoom_stream_push(void* h, const float* samples, int n) {
  if (n < 0) return -1;
  auto* s = static_cast<StreamState*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  // Compact lazily so each vector stays bounded by live size + one push.
  const bool compact = s->read > static_cast<size_t>(s->win);
  for (int m = 0; m < s->n_mics; ++m) {
    auto& c = s->chan[static_cast<size_t>(m)];
    if (compact) c.erase(c.begin(), c.begin() + static_cast<long>(s->read));
    c.insert(c.end(), samples + static_cast<size_t>(m) * n,
             samples + static_cast<size_t>(m) * n + n);
  }
  if (compact) s->read = 0;
  s->size += static_cast<size_t>(n);
  return 0;
}

int azoom_stream_windows_ready(void* h) {
  auto* s = static_cast<StreamState*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  if (s->size < static_cast<size_t>(s->win)) return 0;
  return static_cast<int>((s->size - static_cast<size_t>(s->win)) /
                              static_cast<size_t>(s->hop) +
                          1);
}

// out: float[n_mics][win]. PEEK: returns 1 and fills `out` if a window is
// ready, else 0. Does NOT advance — commit() consumes the window, so an
// enhancement failure between peek and commit loses nothing.
int azoom_stream_next_window(void* h, float* out) {
  auto* s = static_cast<StreamState*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  if (s->size < static_cast<size_t>(s->win)) return 0;
  for (int m = 0; m < s->n_mics; ++m) {
    std::memcpy(out + static_cast<size_t>(m) * s->win,
                s->chan[static_cast<size_t>(m)].data() + s->read,
                sizeof(float) * static_cast<size_t>(s->win));
  }
  return 1;
}

// enhanced: float[win] (the mono enhanced window for the last peeked
// next_window). out: float[hop]. Consumes the window (advances by hop)
// and returns the number of finalized samples written (hop, or 0 for
// the very first window of a stream); -1 if no window was pending.
int azoom_stream_commit(void* h, const float* enhanced, float* out) {
  auto* s = static_cast<StreamState*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  if (s->size < static_cast<size_t>(s->win)) return -1;
  s->read += static_cast<size_t>(s->hop);
  s->size -= static_cast<size_t>(s->hop);
  const int hop = s->hop;
  int written = 0;
  if (s->started) {
    for (int i = 0; i < hop; ++i) {
      const float head =
          enhanced[i] * s->window[static_cast<size_t>(i)];
      out[i] = (s->tail[static_cast<size_t>(i)] + head) /
               s->ola_norm[static_cast<size_t>(i)];
    }
    written = hop;
  }
  for (int i = 0; i < hop; ++i)
    s->tail[static_cast<size_t>(i)] =
        enhanced[i + hop] * s->window[static_cast<size_t>(i + hop)];
  s->started = true;
  return written;
}

}  // extern "C"
