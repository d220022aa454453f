"""Independent host-side STOI re-derivation used as the golden reference.

A direct NumPy transcription of the classic STOI algorithm (Taal,
Hendriks, Heusdens, Jensen, "A short-time objective intelligibility
measure for time-frequency weighted noisy speech", ICASSP 2010), following
the conventions of the public ``pystoi`` implementation the reference
repo scores with (Final_pipeline/src/metrics.py:157, scripts/eval.py:19):

  * polyphase resample to 10 kHz (scipy.signal.resample_poly),
  * silent-frame removal with 40 dB dynamic range against the loudest
    clean frame, COMPACTING both signals by overlap-adding the retained
    frames (azoom's jittable version performs the same compaction with
    static shapes: argsort-compact, zero the tail, scatter-add OLA),
  * 256-sample Hann frames, hop 128, 512-point FFT,
  * 15 one-third-octave bands from 150 Hz with nearest-bin edge mapping,
  * length-30 segments, per-segment normalization and -15 dB SDR clipping,
  * per-(segment, band) correlation, averaged.

Deliberately written as plain sequential NumPy (loops, list compaction) so
it shares no structure with azoom/eval/stoi.py's vectorized masked
formulation — an error in either shows up as disagreement.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import resample_poly

FS = 10_000
N_FRAME = 256
HOP = 128
NFFT = 512
NUMBAND = 15
MINFREQ = 150.0
N_SEG = 30
BETA = -15.0
DYN_RANGE = 40.0


def _thirdoct() -> np.ndarray:
    """Band matrix with pystoi's nearest-bin edge convention."""
    f = np.linspace(0, FS, NFFT + 1)[: NFFT // 2 + 1]
    k = np.arange(NUMBAND)
    cf = MINFREQ * 2.0 ** (k / 3.0)
    flo = cf * 2.0 ** (-1.0 / 6.0)
    fhi = cf * 2.0 ** (1.0 / 6.0)
    H = np.zeros((NUMBAND, len(f)))
    for i in range(NUMBAND):
        lo = int(np.argmin((f - flo[i]) ** 2))
        hi = int(np.argmin((f - fhi[i]) ** 2))
        H[i, lo:hi] = 1.0
    return H


def _frame(x: np.ndarray) -> np.ndarray:
    n = (len(x) - N_FRAME) // HOP + 1
    w = np.hanning(N_FRAME + 2)[1:-1]
    return np.stack([x[i * HOP : i * HOP + N_FRAME] * w for i in range(n)])


def _remove_silent(x: np.ndarray, y: np.ndarray):
    """Drop frames (in both signals) whose clean energy is more than
    DYN_RANGE dB below the loudest clean frame; overlap-add the keepers
    back into compacted time signals (pystoi remove_silent_frames)."""
    xf = _frame(x)
    yf = _frame(y)
    e = 20.0 * np.log10(np.linalg.norm(xf, axis=1) + 1e-16)
    keep = e > (np.max(e) - DYN_RANGE)
    xf, yf = xf[keep], yf[keep]
    n = len(xf)
    out_len = (n - 1) * HOP + N_FRAME if n else 0
    xs = np.zeros(out_len)
    ys = np.zeros(out_len)
    for i in range(n):
        xs[i * HOP : i * HOP + N_FRAME] += xf[i]
        ys[i * HOP : i * HOP + N_FRAME] += yf[i]
    return xs, ys


def stoi_ref(clean: np.ndarray, degraded: np.ndarray, fs: int) -> float:
    x = np.asarray(clean, np.float64)
    y = np.asarray(degraded, np.float64)
    if fs != FS:
        x = resample_poly(x, FS, fs)
        y = resample_poly(y, FS, fs)
    x, y = _remove_silent(x, y)

    xf = _frame(x)
    yf = _frame(y)
    X = np.abs(np.fft.rfft(xf, NFFT, axis=1))
    Y = np.abs(np.fft.rfft(yf, NFFT, axis=1))
    H = _thirdoct()
    Xb = np.sqrt((X**2) @ H.T)  # (T, B)
    Yb = np.sqrt((Y**2) @ H.T)

    T = len(Xb)
    if T < N_SEG:
        raise ValueError("signal too short for STOI")
    c = 10.0 ** (-BETA / 20.0)
    corrs = []
    for s in range(T - N_SEG + 1):
        Xs = Xb[s : s + N_SEG]  # (N, B)
        Ys = Yb[s : s + N_SEG]
        alpha = np.linalg.norm(Xs, axis=0, keepdims=True) / (
            np.linalg.norm(Ys, axis=0, keepdims=True) + 1e-16
        )
        Yn = np.minimum(alpha * Ys, Xs * (1.0 + c))
        Xm = Xs - Xs.mean(axis=0, keepdims=True)
        Ym = Yn - Yn.mean(axis=0, keepdims=True)
        denom = np.linalg.norm(Xm, axis=0) * np.linalg.norm(Ym, axis=0) + 1e-16
        corrs.append(np.sum(Xm * Ym, axis=0) / denom)
    return float(np.mean(corrs))
