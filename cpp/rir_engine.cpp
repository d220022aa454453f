// Native image-source RIR engine (host-side scene preparation).
//
// The reference delegates room simulation to pyroomacoustics' C++ core
// (Final_pipeline/src/simulation.py:105-144). azoom's device path is the
// vectorized JAX ISM (azoom/sim/room.py); this translation unit is the
// host-side twin for CPU-bound dataset factories: an OpenMP-parallel
// Allen-Berkley shoebox image-source model with Hann-windowed-sinc
// fractional-delay injection, matching the JAX kernel's math exactly so
// either backend can generate training scenes.
//
// Exposed as a C ABI consumed via ctypes (azoom/sim/native.py). Build:
//   g++ -O3 -march=native -fopenmp -shared -fPIC rir_engine.cpp -o librir.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

constexpr double kPi = 3.14159265358979323846;

inline double sinc(double x) {
  if (std::fabs(x) < 1e-12) return 1.0;
  const double px = kPi * x;
  return std::sin(px) / px;
}

struct Image {
  double dist;
  double amp;
};

}  // namespace

extern "C" {

// Compute one RIR: source -> mic in a shoebox room.
//   source, mic: double[3]; room_dim: double[3]
//   absorption: uniform wall energy absorption (Sabine)
//   max_order: image reflection order (0 = anechoic)
//   fs: sample rate; n_taps: windowed-sinc width
//   rir_out: float[rir_length] (caller-allocated, zero-initialized here)
// Returns 0 on success.
int azoom_shoebox_rir(const double* source, const double* mic,
                      const double* room_dim, double absorption, int max_order,
                      int fs, double c, int n_taps, float* rir_out,
                      int rir_length) {
  if (max_order < 0 || rir_length <= 0 || n_taps <= 0) return -1;
  std::memset(rir_out, 0, sizeof(float) * static_cast<size_t>(rir_length));
  const double beta = std::sqrt(std::max(0.0, 1.0 - absorption));

  const int R = max_order;
  const int side = 2 * R + 1;
  // Accumulate into a per-thread buffer to avoid atomics on the scatter.
#if defined(_OPENMP)
  const int n_threads = omp_get_max_threads();
#else
  const int n_threads = 1;
#endif
  std::vector<std::vector<double>> partial(
      static_cast<size_t>(n_threads),
      std::vector<double>(static_cast<size_t>(rir_length), 0.0));

#pragma omp parallel for collapse(2) schedule(static)
  for (int inx = 0; inx < side; ++inx) {
    for (int iny = 0; iny < side; ++iny) {
#if defined(_OPENMP)
      double* acc = partial[static_cast<size_t>(omp_get_thread_num())].data();
#else
      double* acc = partial[0].data();
#endif
      const int nx = inx - R;
      const int ny = iny - R;
      for (int nz = -R; nz <= R; ++nz) {
        for (int q = 0; q < 8; ++q) {
          const int qx = q & 1, qy = (q >> 1) & 1, qz = (q >> 2) & 1;
          // Reflection count per axis: |n - q| + |n| (Allen & Berkley).
          const int refl = std::abs(nx - qx) + std::abs(nx) +
                           std::abs(ny - qy) + std::abs(ny) +
                           std::abs(nz - qz) + std::abs(nz);
          if (refl > R) continue;
          const double ix =
              (1.0 - 2.0 * qx) * source[0] + 2.0 * nx * room_dim[0] - mic[0];
          const double iy =
              (1.0 - 2.0 * qy) * source[1] + 2.0 * ny * room_dim[1] - mic[1];
          const double iz =
              (1.0 - 2.0 * qz) * source[2] + 2.0 * nz * room_dim[2] - mic[2];
          const double dist = std::sqrt(ix * ix + iy * iy + iz * iz);
          const double amp =
              std::pow(beta, refl) / (4.0 * kPi * std::max(dist, 1e-2));
          const double delay = dist / c * fs;
          const int base = static_cast<int>(std::floor(delay));
          const double frac = delay - base;
          const int half = n_taps / 2;
          for (int k = 0; k < n_taps; ++k) {
            const int idx = base + k - half;
            if (idx < 0 || idx >= rir_length) continue;
            const double t = (k - half) - frac;
            const double win =
                std::max(0.0, 0.5 + 0.5 * std::cos(2.0 * kPi * t / n_taps));
            acc[idx] += amp * sinc(t) * win;
          }
        }
      }
    }
  }

  for (const auto& buf : partial)
    for (int i = 0; i < rir_length; ++i)
      rir_out[i] += static_cast<float>(buf[static_cast<size_t>(i)]);
  return 0;
}

// All (source, mic) pairs: rirs_out shape [n_sources][n_mics][rir_length].
int azoom_rir_matrix(const double* sources, int n_sources, const double* mics,
                     int n_mics, const double* room_dim, double absorption,
                     int max_order, int fs, double c, int n_taps,
                     float* rirs_out, int rir_length) {
  for (int s = 0; s < n_sources; ++s) {
    for (int m = 0; m < n_mics; ++m) {
      const int rc = azoom_shoebox_rir(
          sources + 3 * s, mics + 3 * m, room_dim, absorption, max_order, fs,
          c, n_taps, rirs_out + (static_cast<size_t>(s) * n_mics + m) * rir_length,
          rir_length);
      if (rc != 0) return rc;
    }
  }
  return 0;
}

}  // extern "C"
