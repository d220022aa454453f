"""Native PESQ: a from-scratch ITU-T P.862-family implementation.

The reference scores perceptual quality with the ``pesq`` C extension
(Final_pipeline/src/metrics.py:8-14,48-66; published PESQ-WB 1.03-1.61 in
Final_pipeline/data/results/batch_metrics.csv). That package does not
exist in this environment, so until round 2 the framework had NO
perceptual-quality capability at all (columns rendered "N/A"). This
module closes that gap with a self-contained NumPy implementation of the
P.862 processing chain:

  level alignment -> input filter (IRS receive for NB / 100 Hz high-pass
  biquad for WB per P.862.2) -> envelope-based time alignment -> framed
  Bark-band "pitch power densities" -> frequency- and gain-compensation
  -> Zwicker loudness -> masked disturbance + asymmetry factor ->
  (L_p-over-bands, L6-over-split-seconds, L2-over-time) cognitive
  aggregation -> raw score 4.5 - 0.1 D - 0.0309 DA -> MOS-LQO mapping
  (P.862.1 for NB, P.862.2 for WB).

CONFORMANCE STATUS (round 4): the 16 kHz band structure is now
TABLE-EXACT per the published P.862 reference tables (pesqpar.h):
49-band ``nr_of_hz_bands_per_bark_band_16k`` FFT-bin grouping,
``centre_of_band_bark_16k`` / ``width_of_band_bark_16k``,
``abs_thresh_power_16k``, and ``pow_dens_correction_factor_16k``
(== 100 / nr, which the tables confirm). The perceptual model applies
the ITU low-band modified-Zwicker exponent (h = min(6/(z+2), 2)^0.15
for z < 4 Bark), ITU band-1-onward audible-power/Lp sums, and the ITU
gain-smoothing order (0.2*old + 0.8*new). The tables are validated by
cross-table consistency tests in tests/test_pesq_conformance.py: the
bin counts sum to exactly 256 (the 512-FFT half spectrum), the
correction factors are 100/nr to float32 noise, and consecutive Bark
centres differ by the mean of adjacent widths to 6 decimals — joint
constraints a mis-transcribed table cannot satisfy.

REMAINING non-conformance, stated honestly: (1) time alignment is
constant-delay only (envelope cross-correlation + sample refinement) —
the full P.862 utterance splitting / bad-interval realignment is not
implemented, which matters for time-warped codecs but not for this
framework's constant-latency outputs; (2) the 8 kHz (narrowband-rate)
path still uses the DERIVED Bark layout (z = 7 asinh(f/650) edges +
Terhardt threshold), not the 42-band ITU tables; 16 kHz NB and WB are
the table-exact modes (the reference's published column is PESQ-WB at
16 kHz, Final_pipeline/src/metrics.py:48-66); (3) the ITU conformance
WAV vectors are not available in this environment, so end-to-end
certification against the ITU binary remains unrun. Scores at 16 kHz
are comparable to ITU-binary numbers at the accuracy of the remaining
alignment simplification; ordering on the reference's committed output
WAVs is validated in tests/test_pesq_conformance.py.

Host-side by design (like the reference's C extension): the alignment
search is data-dependent control flow that has no business inside an XLA
graph, and perceptual scoring is an offline eval step here.
"""

from __future__ import annotations

import numpy as np

__all__ = ["pesq_native", "raw_pesq", "mos_lqo_nb", "mos_lqo_wb"]

# Cognitive-model constants (ITU-T P.862 / pesqpar.h).
TARGET_AVG_POWER = 1e7
D_POW_F, D_POW_S, D_POW_T = 2.0, 6.0, 2.0  # symmetric: bands, split-sec, time
A_POW_F, A_POW_S, A_POW_T = 1.0, 6.0, 2.0  # asymmetric
FRAMES_PER_SYLLABLE = 20  # "split second" = 20 half-overlapped frames
SL = 1.866055e-1  # loudness scale
SP_16K = 6.910853e-6  # power scale, 16 kHz (Nf=512)
SP_8K = 2.764344e-5  # power scale, 8 kHz (Nf=256)


# ---------------------------------------------------------------------------
# Band structure.
#
# 16 kHz: the EXACT ITU-T P.862 49-band tables (pesqpar.h). Consecutive
# runs of rfft bins (512-point FFT, 31.25 Hz each, starting at DC) are
# grouped per ``_NR_HZ_BANDS_16K``; the grouped power is scaled by
# 100/nr (``pow_dens_correction_factor_16k`` — the published table IS
# 100/nr to float32 noise) and by Sp. Validated by cross-table
# consistency in tests/test_pesq_conformance.py.
#
# 8 kHz: derived layout (uniform in z = 7 asinh(f/650), Terhardt
# threshold) — see the module docstring's conformance note.
# ---------------------------------------------------------------------------

# nr_of_hz_bands_per_bark_band_16k — sums to exactly 256 rfft bins.
_NR_HZ_BANDS_16K = np.array([
    1, 1, 1, 1, 1, 1, 1, 1, 2, 1,
    1, 1, 1, 1, 2, 1, 1, 2, 2, 2,
    2, 2, 2, 2, 2, 3, 3, 3, 3, 4,
    3, 4, 5, 4, 5, 6, 6, 7, 8, 9,
    9, 12, 12, 15, 16, 18, 21, 25, 20,
], np.int64)

# centre_of_band_bark_16k
_CENTRE_BARK_16K = np.array([
    0.078672, 0.316341, 0.636559, 0.961246, 1.290450,
    1.624217, 1.962597, 2.305636, 2.653383, 3.005889,
    3.363201, 3.725371, 4.092449, 4.464486, 4.841533,
    5.223642, 5.610866, 6.003256, 6.400869, 6.803755,
    7.211971, 7.625571, 8.044611, 8.469146, 8.899232,
    9.334927, 9.776288, 10.223374, 10.676242, 11.134952,
    11.599563, 12.070135, 12.546731, 13.029408, 13.518232,
    14.013264, 14.514566, 15.022202, 15.536238, 16.056736,
    16.583761, 17.117382, 17.657663, 18.204674, 18.758478,
    19.319147, 19.886751, 20.461355, 21.043034,
], np.float64)

# width_of_band_bark_16k
_WIDTH_BARK_16K = np.array([
    0.157344, 0.317994, 0.322441, 0.326934, 0.331474,
    0.336061, 0.340697, 0.345381, 0.350114, 0.354897,
    0.359729, 0.364611, 0.369544, 0.374529, 0.379565,
    0.384653, 0.389794, 0.394989, 0.400236, 0.405538,
    0.410894, 0.416306, 0.421773, 0.427297, 0.432877,
    0.438514, 0.444209, 0.449962, 0.455774, 0.461645,
    0.467577, 0.473569, 0.479621, 0.485736, 0.491912,
    0.498151, 0.504454, 0.510819, 0.517250, 0.523745,
    0.530308, 0.536934, 0.543629, 0.550390, 0.557220,
    0.564119, 0.571085, 0.578125, 0.585232,
], np.float64)

# abs_thresh_power_16k (power units, 0 dB SPL == 1.0; the mid-band
# plateau is 10^-0.6 = 0.251189)
_ABS_THRESH_16K = np.array([
    51286152.0, 2454709.5, 70794.59375, 4897.788574, 1174.897705,
    389.045166, 104.712860, 45.708820, 17.782795, 9.772372,
    4.897789, 3.090296, 1.905461, 1.258925, 0.977237,
    0.724436, 0.562341, 0.457088, 0.389045, 0.331131,
    0.295121, 0.269153, 0.257040, 0.251189, 0.251189,
    0.251189, 0.251189, 0.251189, 0.251189, 0.251189,
    0.251189, 0.251189, 0.251189, 0.251189, 0.251189,
    0.251189, 0.251189, 0.251189, 0.251189, 0.251189,
    0.251189, 0.251189, 0.251189, 0.251189, 0.251189,
    0.251189, 0.316228, 0.398107, 0.501187,
], np.float64)


def _bark(f: np.ndarray) -> np.ndarray:
    return 7.0 * np.arcsinh(np.asarray(f, np.float64) / 650.0)


def _inv_bark(z: np.ndarray) -> np.ndarray:
    return 650.0 * np.sinh(np.asarray(z, np.float64) / 7.0)


class _Bands:
    """Per-sample-rate constants: FFT bin -> Bark band grouping tables."""

    def __init__(self, fs: int):
        if fs == 16_000:
            self.nf, self.nb, self.sp = 512, 49, SP_16K
        elif fs == 8_000:
            self.nf, self.nb, self.sp = 256, 42, SP_8K
        else:
            raise ValueError(f"PESQ supports fs 8000/16000, got {fs}")
        self.fs = fs
        self.hop = self.nf // 2
        freqs = np.fft.rfftfreq(self.nf, 1.0 / fs)
        if fs == 16_000:
            # ITU tables: consecutive-bin grouping with 100/nr correction
            self.centre_bark = _CENTRE_BARK_16K
            self.width_bark = _WIDTH_BARK_16K
            self.abs_thresh = _ABS_THRESH_16K
            self.group = np.zeros((self.nb, freqs.size), np.float64)
            start = 0
            for band, nr in enumerate(_NR_HZ_BANDS_16K):
                self.group[band, start : start + nr] = 100.0 / nr
                start += nr
            self.group[:, 0] = 0.0  # DC excluded
        else:
            # Derived layout (no published 8 kHz tables available here)
            f_max = 4_000.0
            z_lo, z_hi = _bark(50.0), _bark(f_max)
            edges_z = np.linspace(z_lo, z_hi, self.nb + 1)
            edges_hz = _inv_bark(edges_z)
            centre_hz = _inv_bark(0.5 * (edges_z[:-1] + edges_z[1:]))
            self.centre_bark = _bark(centre_hz)
            self.width_bark = np.diff(edges_z)
            idx = np.searchsorted(edges_hz, freqs, side="right") - 1
            idx[freqs < edges_hz[0]] = 0
            idx = np.clip(idx, 0, self.nb - 1)
            self.group = np.zeros((self.nb, freqs.size), np.float64)
            self.group[idx, np.arange(freqs.size)] = 1.0
            self.group[:, 0] = 0.0  # DC excluded
            khz = np.maximum(centre_hz, 20.0) / 1000.0
            tq_db = (
                3.64 * khz**-0.8
                - 6.5 * np.exp(-0.6 * (khz - 3.3) ** 2)
                + 1e-3 * khz**4
            )
            self.abs_thresh = 10.0 ** (np.clip(tq_db, -10.0, 80.0) / 10.0)
        # ITU modified-Zwicker exponent: low bands (z < 4 Bark) get
        # exponent 0.23 * min(6/(z+2), 2)^0.15 (pesqmain intensity
        # warping); 1.0 factor elsewhere.
        h = np.where(
            self.centre_bark < 4.0, 6.0 / (self.centre_bark + 2.0), 1.0
        )
        self.zwicker_pow = 0.23 * np.minimum(h, 2.0) ** 0.15
        # ITU Hann convention: symmetric, 2*pi*n/(Nf-1)
        self.window = 0.5 * (
            1.0 - np.cos(2.0 * np.pi * np.arange(self.nf) / (self.nf - 1))
        )


_BANDS_CACHE: dict[int, _Bands] = {}


def _bands(fs: int) -> _Bands:
    if fs not in _BANDS_CACHE:
        _BANDS_CACHE[fs] = _Bands(fs)
    return _BANDS_CACHE[fs]


# ---------------------------------------------------------------------------
# Front end: level alignment, input filters, time alignment
# ---------------------------------------------------------------------------

def _band_power(x: np.ndarray, fs: int, lo: float, hi: float) -> float:
    """Average power of x restricted to [lo, hi] Hz (FFT brick-wall)."""
    X = np.fft.rfft(x)
    f = np.fft.rfftfreq(x.size, 1.0 / fs)
    sel = (f >= lo) & (f <= hi)
    return float(np.sum(np.abs(X[sel]) ** 2) / (x.size * x.size) * 2.0)


def _fix_level(x: np.ndarray, fs: int) -> np.ndarray:
    """Scale so the 325-3250 Hz band has average power TARGET_AVG_POWER
    (P.862 fixed level alignment)."""
    p = _band_power(x, fs, 325.0, 3_250.0)
    return x * np.sqrt(TARGET_AVG_POWER / (p + 1e-20))

# IRS receive characteristic, piecewise-linear gain in dB over log-f
# (P.862 narrowband input filter, applied in the frequency domain).
_IRS_HZ = np.array([
    0, 50, 100, 125, 160, 200, 250, 300, 350, 400, 500, 600, 700, 800,
    1000, 1300, 1600, 2000, 2500, 3000, 3250, 3500, 4000, 5000, 6300, 8000,
], np.float64)
_IRS_DB = np.array([
    -200.0, -40.0, -20.0, -12.0, -6.0, 0.0, 4.0, 6.0, 8.0, 10.0, 11.0,
    12.0, 12.0, 12.0, 12.0, 12.0, 12.0, 12.0, 12.0, 12.0, 12.0, 4.0,
    -200.0, -200.0, -200.0, -200.0,
], np.float64)


def _irs_filter(x: np.ndarray, fs: int) -> np.ndarray:
    """Apply the IRS receive magnitude response via FFT (NB mode)."""
    n = x.size
    X = np.fft.rfft(x)
    f = np.fft.rfftfreq(n, 1.0 / fs)
    gain_db = np.interp(f, _IRS_HZ, _IRS_DB)
    X *= 10.0 ** (gain_db / 20.0)
    return np.fft.irfft(X, n=n)


def _wb_input_filter(x: np.ndarray) -> np.ndarray:
    """P.862.2 wideband input high-pass biquad (~100 Hz corner)."""
    from scipy.signal import lfilter

    b = np.array([2.6657628, -5.3315255, 2.6657628])
    a = np.array([1.0, -1.8890331, 0.89487434])
    return lfilter(b, a, x.astype(np.float64))


def _align(ref: np.ndarray, deg: np.ndarray, fs: int) -> tuple[np.ndarray, np.ndarray]:
    """Constant-delay time alignment.

    Crude stage: cross-correlate 4 ms log-energy envelopes (P.862
    input_align). Fine stage: sample-level cross-correlation in a
    +/- one-envelope-frame window around the crude estimate. Variable
    per-utterance delay tracking (full P.862 utterance splitting) is not
    implemented; outputs of this framework have constant latency.
    """
    frame = max(int(0.004 * fs), 16)
    T = min(ref.size, deg.size) // frame

    def env(x):
        e = np.sum(x[: T * frame].reshape(T, frame) ** 2, axis=1)
        return np.log10(e + 1e-10)

    er, ed = env(ref), env(deg)
    er -= er.mean()
    ed -= ed.mean()
    xc = np.correlate(ed, er, mode="full")
    crude = (int(np.argmax(xc)) - (T - 1)) * frame  # deg lags ref by `crude`

    span = frame  # +/- one envelope frame of sample-level search
    best_off, best_val = crude, -np.inf
    n = min(ref.size, deg.size)
    seg = slice(n // 4, min(n // 4 + 4 * fs, n - span - abs(crude) - 1))
    r = ref[seg]
    if r.size > frame:
        r = r - r.mean()
        rn = np.sqrt(np.sum(r * r)) + 1e-12
        for off in range(crude - span, crude + span + 1):
            lo = seg.start + off
            if lo < 0 or lo + r.size > deg.size:
                continue
            d = deg[lo : lo + r.size]
            v = float(np.dot(r, d - d.mean())) / rn
            if v > best_val:
                best_val, best_off = v, off
    off = best_off
    if off > 0:
        deg = deg[off:]
    elif off < 0:
        ref = ref[-off:]
    n = min(ref.size, deg.size)
    return ref[:n], deg[:n]


# ---------------------------------------------------------------------------
# Perceptual model
# ---------------------------------------------------------------------------

def _pitch_power_densities(x: np.ndarray, bands: _Bands) -> np.ndarray:
    """(T, Nb) Bark-band power densities of half-overlapped Hann frames."""
    nf, hop = bands.nf, bands.hop
    T = max((x.size - nf) // hop + 1, 0)
    if T == 0:
        return np.zeros((0, bands.nb))
    idx = np.arange(T)[:, None] * hop + np.arange(nf)[None, :]
    frames = x[idx] * bands.window
    spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2  # unnormalized, as P.862
    return (spec @ bands.group.T) * bands.sp  # (T, Nb)


def _total_audible(ppd: np.ndarray, bands: _Bands, factor: float) -> np.ndarray:
    """(T,) per-frame power summed over bands above factor*threshold.

    ITU convention: the sum starts at band 1 (band 0 is excluded from
    every audible-power and Lp aggregate in pesqmain)."""
    audible = ppd[:, 1:] > factor * bands.abs_thresh[None, 1:]
    return np.sum(np.where(audible, ppd[:, 1:], 0.0), axis=1)


def _loudness(ppd: np.ndarray, bands: _Bands) -> np.ndarray:
    """Zwicker loudness density per band (P.862 intensity warping), with
    the ITU low-band modified exponent (bands.zwicker_pow)."""
    p0 = bands.abs_thresh[None, :]
    zp = bands.zwicker_pow[None, :]
    ratio = np.maximum(ppd, 0.0) / p0
    loud = SL * (p0 / 0.5) ** zp * ((0.5 + 0.5 * ratio) ** zp - 1.0)
    return np.where(ppd > p0, loud, 0.0)


def _weighted_lp(x: np.ndarray, w: np.ndarray, p: float) -> np.ndarray:
    """P.862 pseudo-Lp over bands 1..Nb-1 (band 0 excluded, ITU):
    ((sum (|x| w)^p)/sum w)^(1/p) * sum w."""
    w = w[1:]
    tw = np.sum(w)
    s = np.sum((np.abs(x[:, 1:]) * w[None, :]) ** p, axis=1) / tw
    return s ** (1.0 / p) * tw


def _lpq_time(fd: np.ndarray, p_split: float, p_time: float) -> float:
    """Split-second L_{p_split} then L_{p_time} over time (ITU
    Lpq_weight): windows of 20 frames advancing by 10, anchored at every
    start <= last frame; the split-second mean divides by the FULL
    window length even when the tail window runs past the end."""
    if fd.size == 0:
        return 0.0
    n, hop = FRAMES_PER_SYLLABLE, FRAMES_PER_SYLLABLE // 2
    padded = np.concatenate([fd, np.zeros(n)])
    starts = np.arange(0, fd.size, hop)
    chunks = padded[starts[:, None] + np.arange(n)[None, :]]
    per_split = (np.sum(chunks**p_split, axis=1) / n) ** (1.0 / p_split)
    return float(np.mean(per_split**p_time) ** (1.0 / p_time))


def raw_pesq(ref: np.ndarray, deg: np.ndarray, fs: int, mode: str = "wb") -> float:
    """Raw P.862 score (~ -0.5 .. 4.5) before MOS-LQO mapping."""
    bands = _bands(fs)
    ref = np.asarray(ref, np.float64).reshape(-1)
    deg = np.asarray(deg, np.float64).reshape(-1)
    n = min(ref.size, deg.size)
    ref, deg = ref[:n], deg[:n]
    if n < 2 * bands.nf or np.max(np.abs(ref)) <= 0:
        return 4.5 if np.array_equal(ref, deg) else -0.5

    ref = _fix_level(ref, fs)
    deg = _fix_level(deg, fs)
    if mode == "wb":
        ref, deg = _wb_input_filter(ref), _wb_input_filter(deg)
    else:
        ref, deg = _irs_filter(ref, fs), _irs_filter(deg, fs)
    ref, deg = _align(ref, deg, fs)

    ppd_r = _pitch_power_densities(ref, bands)  # (T, Nb)
    ppd_d = _pitch_power_densities(deg, bands)
    T = min(ppd_r.shape[0], ppd_d.shape[0])
    if T == 0:
        return -0.5
    ppd_r, ppd_d = ppd_r[:T], ppd_d[:T]

    # Frequency compensation: equalize the *reference* to the degraded's
    # average (speech-active frames) spectrum, bounded [0.01, 100].
    active = _total_audible(ppd_r, bands, 1.0) > 1e7
    if not np.any(active):
        active = np.ones(T, bool)
    avg_r = np.mean(ppd_r[active], axis=0)
    avg_d = np.mean(ppd_d[active], axis=0)
    partial = np.clip((avg_d + 1_000.0) / (avg_r + 1_000.0), 0.01, 100.0)
    ppd_r_c = ppd_r * partial[None, :]

    # Short-term gain compensation: equalize the *degraded* frame power to
    # the compensated reference, smoothed, bounded [3e-4, 5].
    tot_r = _total_audible(ppd_r_c, bands, 1.0)
    tot_d = _total_audible(ppd_d, bands, 1.0)
    ratio = (tot_r + 5e3) / (tot_d + 5e3)
    gain = np.empty(T)
    g = ratio[0]
    gain[0] = np.clip(g, 3e-4, 5.0)
    for t in range(1, T):
        # ITU smoothing order: scale = 0.2 * old + 0.8 * new
        g = 0.2 * g + 0.8 * ratio[t]
        gain[t] = np.clip(g, 3e-4, 5.0)
    ppd_d_c = ppd_d * gain[:, None]

    loud_r = _loudness(ppd_r_c, bands)
    loud_d = _loudness(ppd_d_c, bands)

    # Masked disturbance with a 0.25*min deadzone.
    d = loud_d - loud_r
    m = 0.25 * np.minimum(loud_d, loud_r)
    d = np.sign(d) * np.maximum(np.abs(d) - m, 0.0)

    # Asymmetry factor: additive distortions weigh more than omissions.
    asym = ((ppd_d_c + 50.0) / (ppd_r_c + 50.0)) ** 1.2
    asym = np.where(asym < 3.0, 0.0, np.minimum(asym, 12.0))

    w = bands.width_bark
    fd_s = _weighted_lp(d, w, D_POW_F)
    fd_a = _weighted_lp(d * asym, w, A_POW_F)

    # Emphasis toward loud reference frames; cap at 45.
    h = ((_total_audible(ppd_r_c, bands, 1.0) + 1e5) / 1e7) ** 0.04
    fd_s = np.minimum(fd_s / h, 45.0)
    fd_a = np.minimum(fd_a / h, 45.0)

    d_symm = _lpq_time(fd_s, D_POW_S, D_POW_T)
    d_asym = _lpq_time(fd_a, A_POW_S, A_POW_T)
    return float(np.clip(4.5 - 0.1 * d_symm - 0.0309 * d_asym, -0.5, 4.5))


def mos_lqo_nb(raw: float) -> float:
    """ITU-T P.862.1 raw -> MOS-LQO mapping (narrowband)."""
    return 0.999 + 4.0 / (1.0 + np.exp(-1.4945 * raw + 4.6607))


def mos_lqo_wb(raw: float) -> float:
    """ITU-T P.862.2 raw -> MOS-LQO mapping (wideband)."""
    return 0.999 + 4.0 / (1.0 + np.exp(-1.3669 * raw + 3.8224))


def pesq_native(fs: int, ref: np.ndarray, deg: np.ndarray, mode: str = "wb") -> float:
    """MOS-LQO score; same call signature as ``pesq.pesq``.

    mode "nb" (fs 8000/16000) or "wb" (fs 16000 only), as the reference
    uses them (Final_pipeline/src/metrics.py:48-66).
    """
    if mode == "wb" and fs != 16_000:
        raise ValueError("wideband PESQ requires fs=16000")
    raw = raw_pesq(ref, deg, fs, mode)
    return float(mos_lqo_wb(raw) if mode == "wb" else mos_lqo_nb(raw))
