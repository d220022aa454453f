// Native corpus loader: the data-ingestion role the reference delegates to
// torch DataLoader worker processes (model_training.py:155
// ``DataLoader(..., num_workers=2)``) and keras.utils.Sequence
// (model_neural.py:25-94), re-owned as a host-side C++ engine.
//
// One background thread scans a directory tree for RIFF/WAVE files,
// decodes them (PCM16 / PCM32 / IEEE float32, any channel count ->
// mono mean, linear resample to the pipeline rate), and keeps a ring of
// pre-cropped source batches filled ahead of the trainer: the Python
// side's next() is a memcpy from a completed slot, so WAV IO and decode
// overlap device compute instead of serializing with it.
//
// Deterministic given (seed, file set): crops are drawn from a
// xorshift64* stream owned by the producer thread. ctypes releases the
// GIL around every entry point; the slot ring is guarded by one mutex +
// two condition variables (classic bounded buffer).

#include <algorithm>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <filesystem>
#include <fstream>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace fs = std::filesystem;

namespace {

struct Rng {  // xorshift64* — deterministic, seedable, header-only
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed ? seed : 0x9e3779b97f4a7c15ULL) {}
  uint64_t next() {
    s ^= s >> 12;
    s ^= s << 25;
    s ^= s >> 27;
    return s * 0x2545F4914F6CDD1DULL;
  }
  // unbiased-enough integer in [0, n) for corpus-scale n
  uint64_t below(uint64_t n) { return n ? next() % n : 0; }
};

// Is (fmt, bits) a sample format this engine can decode?
// PCM 8 (unsigned) / 16 / 24 / 32 and IEEE float32 — the same families
// scipy's read_wav handles on the Python LocalCorpus path.
bool supported_format(uint16_t fmt, uint16_t bits) {
  if (fmt == 3) return bits == 32;
  if (fmt == 1) return bits == 8 || bits == 16 || bits == 24 || bits == 32;
  return false;
}

// Minimal RIFF/WAVE decode -> mono float32 at native rate.
// Returns false on anything it cannot decode. With probe_only=true the
// sample data is never read or allocated: header chunks are parsed and
// validated (format supported, non-empty data chunk) so undecodable or
// truncated files can be dropped from the corpus at open time instead of
// silently turning into all-silence crops mid-training.
//
// All chunk sizes from the RIFF header are clamped to the bytes actually
// remaining in the file, so a corrupt 4 GiB declared size can neither
// over-allocate (bad_alloc -> std::terminate in the worker) nor make a
// truncated read look like a full decode.
bool decode_wav(const std::string& path, std::vector<float>* out,
                int* rate_out, bool probe_only = false) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  f.seekg(0, std::ios::end);
  const uint64_t file_size = static_cast<uint64_t>(f.tellg());
  f.seekg(0, std::ios::beg);
  if (file_size < 12) return false;
  char id[4];
  uint32_t sz;
  f.read(id, 4);
  f.read(reinterpret_cast<char*>(&sz), 4);
  char wave[4];
  f.read(wave, 4);
  if (!f || std::memcmp(id, "RIFF", 4) || std::memcmp(wave, "WAVE", 4))
    return false;
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  std::vector<char> data;
  uint64_t data_sz = 0;
  while (f.read(id, 4) && f.read(reinterpret_cast<char*>(&sz), 4)) {
    const uint64_t pos = static_cast<uint64_t>(f.tellg());
    const uint64_t remaining = file_size > pos ? file_size - pos : 0;
    const uint64_t clamped = std::min<uint64_t>(sz, remaining);
    if (!std::memcmp(id, "fmt ", 4)) {
      if (clamped < 16) return false;
      std::vector<char> chunk(clamped);
      f.read(chunk.data(), static_cast<std::streamsize>(clamped));
      std::memcpy(&fmt, chunk.data(), 2);
      std::memcpy(&channels, chunk.data() + 2, 2);
      std::memcpy(&rate, chunk.data() + 4, 4);
      std::memcpy(&bits, chunk.data() + 14, 2);
      if (fmt == 0xFFFE && clamped >= 26)  // WAVE_FORMAT_EXTENSIBLE
        std::memcpy(&fmt, chunk.data() + 24, 2);
    } else if (!std::memcmp(id, "data", 4)) {
      data_sz = clamped;
      if (!probe_only) {
        data.resize(clamped);
        f.read(data.data(), static_cast<std::streamsize>(clamped));
      }
      break;
    } else {
      f.seekg(static_cast<std::streamoff>(clamped + (clamped & 1)),
              std::ios::cur);  // chunks are word-aligned
    }
  }
  if (!data_sz || !channels || !rate || !supported_format(fmt, bits))
    return false;
  *rate_out = static_cast<int>(rate);
  const size_t bytes = bits / 8;
  const size_t frames = data_sz / (bytes * channels);
  if (!frames) return false;
  if (probe_only) return true;
  out->resize(frames);
  const char* p = data.data();
  for (size_t i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (uint16_t c = 0; c < channels; ++c) {
      const char* s = p + (i * channels + c) * bytes;
      if (fmt == 3) {  // IEEE float32
        float v;
        std::memcpy(&v, s, 4);
        acc += v;
      } else if (bits == 8) {  // PCM8 is unsigned, midpoint 128
        acc += (static_cast<uint8_t>(*s) - 128) / 128.0;
      } else if (bits == 16) {
        int16_t v;
        std::memcpy(&v, s, 2);
        acc += v / 32768.0;
      } else if (bits == 24) {  // little-endian signed 24-bit
        const int32_t v = (static_cast<uint8_t>(s[0]) << 8) |
                          (static_cast<uint8_t>(s[1]) << 16) |
                          (static_cast<int32_t>(static_cast<int8_t>(s[2]))
                           << 24);
        acc += v / 2147483648.0;
      } else {  // PCM32
        int32_t v;
        std::memcpy(&v, s, 4);
        acc += v / 2147483648.0;
      }
    }
    (*out)[i] = static_cast<float>(acc / channels);
  }
  return true;
}

// Windowed-sinc resample (Hann window, 16 taps per side), anti-aliased:
// the kernel cutoff is 0.9 * min(rate_in, rate_out) / 2, so decimation
// low-passes before it subsamples — matching the spirit of LocalCorpus's
// resample_fft rather than aliasing like plain linear interpolation.
void resample_sinc(const std::vector<float>& in, int rate_in, int rate_out,
                   std::vector<float>* out) {
  if (rate_in == rate_out || in.empty()) {
    *out = in;
    return;
  }
  const double step = static_cast<double>(rate_in) / rate_out;
  const double cutoff = 0.9 * std::min(1.0, 1.0 / step);  // of Nyquist(in)
  const int half = step > 1.0 ? static_cast<int>(std::ceil(16 * step)) : 16;
  const size_t n = static_cast<size_t>(
      static_cast<double>(in.size()) * rate_out / rate_in);
  out->resize(n);
  const double pi = 3.14159265358979323846;
  for (size_t i = 0; i < n; ++i) {
    const double t = i * step;
    const long k0 = static_cast<long>(std::floor(t)) - half + 1;
    const long k1 = static_cast<long>(std::floor(t)) + half;
    double acc = 0.0, wsum = 0.0;
    for (long k = std::max(0L, k0);
         k <= std::min(static_cast<long>(in.size()) - 1, k1); ++k) {
      const double x = (t - k) * cutoff;
      const double s = x == 0.0 ? 1.0 : std::sin(pi * x) / (pi * x);
      const double w = 0.5 + 0.5 * std::cos(pi * (t - k) / half);  // Hann
      acc += in[static_cast<size_t>(k)] * s * cutoff * w;
      wsum += s * cutoff * w;
    }
    // normalize by the kernel sum: unity DC gain, clean edge handling
    (*out)[i] = static_cast<float>(wsum > 1e-12 ? acc / wsum : acc);
  }
}

struct Corpus {
  std::vector<std::string> files;
  int fs, batch, n_samples, depth;
  int n_dropped = 0;  // files rejected by the open-time decode probe
  // bounded ring of filled batches
  std::vector<std::vector<float>> slots;
  size_t head = 0, tail = 0, filled = 0;
  std::mutex mu;
  std::condition_variable can_fill, can_take;
  bool stop = false;
  std::thread worker;
  Rng rng;
  // tiny decode cache (most corpora re-hit files across batches)
  std::vector<std::pair<size_t, std::vector<float>>> cache;
  static constexpr size_t kCacheMax = 64;

  Corpus(uint64_t seed) : rng(seed) {}

  const std::vector<float>& load(size_t idx) {
    for (auto& kv : cache)
      if (kv.first == idx) return kv.second;
    std::vector<float> raw, audio;
    int rate = 0;
    // Every file passed the open-time probe; a failure here means it
    // changed/corrupted since. Retry with other files rather than
    // silently feeding silence into the training distribution.
    size_t tries = 0;
    while (!decode_wav(files[idx], &raw, &rate) && ++tries < 8)
      idx = rng.below(files.size());
    if (raw.empty()) raw.assign(1, 0.0f), rate = fs;
    resample_sinc(raw, rate, fs, &audio);
    if (audio.empty()) audio.assign(1, 0.0f);
    if (cache.size() >= kCacheMax) cache.erase(cache.begin());
    cache.emplace_back(idx, std::move(audio));
    return cache.back().second;
  }

  void crop(std::vector<float>* dst, size_t off) {
    const auto& audio = load(rng.below(files.size()));
    const size_t n = static_cast<size_t>(n_samples);
    if (audio.size() >= n) {
      const size_t start = rng.below(audio.size() - n + 1);
      std::copy(audio.begin() + start, audio.begin() + start + n,
                dst->begin() + off);
    } else {
      // loop-pad short files; like LocalCorpus.sample, present a random
      // alignment rather than always starting at phase 0
      const size_t start = rng.below(audio.size());
      for (size_t i = 0; i < n; ++i)
        (*dst)[off + i] = audio[(start + i) % audio.size()];
    }
  }

  void run() {
    for (;;) {
      std::unique_lock<std::mutex> lock(mu);
      can_fill.wait(lock, [&] { return stop || filled < slots.size(); });
      if (stop) return;
      auto& slot = slots[tail];
      lock.unlock();
      // fill outside the lock: decode/IO must not block the consumer.
      // An exception here (e.g. allocation failure on a pathological
      // file) must not std::terminate the whole training process: zero
      // the slot and keep serving.
      try {
        for (int b = 0; b < batch; ++b)
          crop(&slot, static_cast<size_t>(b) * n_samples);
      } catch (...) {
        std::fill(slot.begin(), slot.end(), 0.0f);
      }
      lock.lock();
      tail = (tail + 1) % slots.size();
      ++filled;
      can_take.notify_one();
    }
  }
};

}  // namespace

extern "C" {

void* azoom_corpus_open(const char* root, int fs, uint64_t seed, int batch,
                        int n_samples, int depth) {
  auto* c = new Corpus(seed);
  std::error_code ec;
  for (fs::recursive_directory_iterator it(root, ec), end; it != end;
       it.increment(ec)) {
    if (ec) break;
    if (it->is_regular_file(ec)) {
      auto ext = it->path().extension().string();
      std::transform(ext.begin(), ext.end(), ext.begin(), ::tolower);
      if (ext == ".wav") c->files.push_back(it->path().string());
    }
  }
  std::sort(c->files.begin(), c->files.end());
  // Open-time decode probe (headers only, no sample IO): drop files the
  // decoder cannot handle so they never silently become silence crops.
  // The dropped count is queryable (azoom_corpus_n_dropped) for logging.
  {
    std::vector<std::string> ok;
    ok.reserve(c->files.size());
    for (auto& path : c->files) {
      std::vector<float> unused;
      int rate = 0;
      if (decode_wav(path, &unused, &rate, /*probe_only=*/true))
        ok.push_back(std::move(path));
      else
        ++c->n_dropped;
    }
    c->files = std::move(ok);
  }
  if (c->files.empty()) {
    delete c;
    return nullptr;
  }
  c->fs = fs;
  c->batch = batch;
  c->n_samples = n_samples;
  c->depth = std::max(depth, 1);
  c->slots.assign(c->depth,
                  std::vector<float>(static_cast<size_t>(batch) * n_samples));
  c->worker = std::thread([c] { c->run(); });
  return c;
}

int azoom_corpus_n_files(void* h) {
  return static_cast<int>(static_cast<Corpus*>(h)->files.size());
}

// Files found but rejected by the open-time decode probe.
int azoom_corpus_n_dropped(void* h) {
  return static_cast<Corpus*>(h)->n_dropped;
}

// Blocks until a prefetched batch is ready; out is (batch * n_samples).
void azoom_corpus_next(void* h, float* out) {
  auto* c = static_cast<Corpus*>(h);
  std::unique_lock<std::mutex> lock(c->mu);
  c->can_take.wait(lock, [&] { return c->filled > 0; });
  auto& slot = c->slots[c->head];
  std::memcpy(out, slot.data(), slot.size() * sizeof(float));
  c->head = (c->head + 1) % c->slots.size();
  --c->filled;
  c->can_fill.notify_one();
}

void azoom_corpus_close(void* h) {
  auto* c = static_cast<Corpus*>(h);
  {
    std::lock_guard<std::mutex> lock(c->mu);
    c->stop = true;
  }
  c->can_fill.notify_all();
  c->worker.join();
  delete c;
}

}  // extern "C"
