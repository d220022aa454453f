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

// Minimal RIFF/WAVE decode -> mono float32 at native rate.
// Returns false on anything that is not a PCM16/PCM32/float32 WAV.
bool decode_wav(const std::string& path, std::vector<float>* out,
                int* rate_out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
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
  while (f.read(id, 4) && f.read(reinterpret_cast<char*>(&sz), 4)) {
    if (!std::memcmp(id, "fmt ", 4)) {
      std::vector<char> chunk(sz);
      f.read(chunk.data(), sz);
      if (sz < 16) return false;
      std::memcpy(&fmt, chunk.data(), 2);
      std::memcpy(&channels, chunk.data() + 2, 2);
      std::memcpy(&rate, chunk.data() + 4, 4);
      std::memcpy(&bits, chunk.data() + 14, 2);
      if (fmt == 0xFFFE && sz >= 26)  // WAVE_FORMAT_EXTENSIBLE: sub-format
        std::memcpy(&fmt, chunk.data() + 24, 2);
    } else if (!std::memcmp(id, "data", 4)) {
      data.resize(sz);
      f.read(data.data(), sz);
      break;
    } else {
      f.seekg(sz + (sz & 1), std::ios::cur);  // chunks are word-aligned
    }
  }
  if (data.empty() || !channels || !rate) return false;
  const size_t bytes = bits / 8;
  if (!bytes) return false;
  const size_t frames = data.size() / (bytes * channels);
  out->resize(frames);
  const char* p = data.data();
  for (size_t i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (uint16_t c = 0; c < channels; ++c) {
      const char* s = p + (i * channels + c) * bytes;
      if (fmt == 3 && bits == 32) {  // IEEE float
        float v;
        std::memcpy(&v, s, 4);
        acc += v;
      } else if (fmt == 1 && bits == 16) {
        int16_t v;
        std::memcpy(&v, s, 2);
        acc += v / 32768.0;
      } else if (fmt == 1 && bits == 32) {
        int32_t v;
        std::memcpy(&v, s, 4);
        acc += v / 2147483648.0;
      } else {
        return false;
      }
    }
    (*out)[i] = static_cast<float>(acc / channels);
  }
  *rate_out = static_cast<int>(rate);
  return true;
}

void resample_linear(const std::vector<float>& in, int rate_in, int rate_out,
                     std::vector<float>* out) {
  if (rate_in == rate_out || in.empty()) {
    *out = in;
    return;
  }
  const size_t n = static_cast<size_t>(
      static_cast<double>(in.size()) * rate_out / rate_in);
  out->resize(n);
  const double step = static_cast<double>(rate_in) / rate_out;
  for (size_t i = 0; i < n; ++i) {
    const double t = i * step;
    const size_t k = std::min(static_cast<size_t>(t), in.size() - 1);
    const size_t k1 = std::min(k + 1, in.size() - 1);
    const double a = t - k;
    (*out)[i] = static_cast<float>((1.0 - a) * in[k] + a * in[k1]);
  }
}

struct Corpus {
  std::vector<std::string> files;
  int fs, batch, n_samples, depth;
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
    if (!decode_wav(files[idx], &raw, &rate)) raw.assign(1, 0.0f), rate = fs;
    resample_linear(raw, rate, fs, &audio);
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
    } else {  // loop-pad short files (LocalCorpus.sample semantics)
      for (size_t i = 0; i < n; ++i)
        (*dst)[off + i] = audio[i % audio.size()];
    }
  }

  void run() {
    for (;;) {
      std::unique_lock<std::mutex> lock(mu);
      can_fill.wait(lock, [&] { return stop || filled < slots.size(); });
      if (stop) return;
      auto& slot = slots[tail];
      lock.unlock();
      // fill outside the lock: decode/IO must not block the consumer
      for (int b = 0; b < batch; ++b)
        crop(&slot, static_cast<size_t>(b) * n_samples);
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
