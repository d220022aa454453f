"""Hop-granularity streaming enhancement — the low-latency product path.

The reference's runtime processes 2 s windows with 50 % overlap, so a
sample is final only ~1 s after capture (Final_pipeline/src/inference.py:
171-233). This module runs the causal pipeline (CRN mask net + recursive
masked MVDR, azoom.pipelines.online_learned) *statefully*, one STFT hop at
a time: every ``hop`` new samples produce one new frame and finalize one
hop of output, bounding algorithmic latency between one hop and one window
(32-64 ms at 1024/512 @ 16 kHz).

Exactness: the CRN's convolutions have time-kernel 1, so its only time
state is the LSTM carries (threaded explicitly via
``CRNMaskNet.initial_carries``); the MVDR covariance recursion is the same
exponential update as :func:`azoom.stream.online.online_masked_mvdr`. The
streamed output therefore equals the offline
:func:`azoom.pipelines.online_learned.online_learned_enhance` output on
the finalized interior bit-for-bit up to float tolerance
(tests/test_lowlat_stream.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from azoom.beam.linalgmm import solve_hermitian
from azoom.config import PipelineConfig
from azoom.dsp.delays import steering_vector
from azoom.dsp.windows import hann
from azoom.masks.features import logmag_ipd_features
from azoom.utils.host import to_numpy

__all__ = ["OnlineEnhancer"]


def _make_step(model, variables: Any, cfg: PipelineConfig, forget: float,
               mask_floor: float, eps: float = 1e-6,
               steer_align: bool = True):
    """Build the jitted one-hop step. Closes over model/variables/cfg so
    the weights are burned into the compiled program once."""
    n_fft, hop = cfg.n_fft, cfg.hop
    if n_fft != 2 * hop:
        raise ValueError("low-latency streaming requires 50% overlap (n_fft == 2*hop)")
    # Closure constants stay HOST NumPy: a complex jnp constant created
    # eagerly would need a device->host fetch at lowering time, which the
    # axon TPU runtime does not implement.
    freqs = np.arange(n_fft // 2 + 1, dtype=np.float32) * (cfg.fs / n_fft)
    eye = np.eye(cfg.n_mics, dtype=np.complex64)

    @jax.jit
    def step(ctx, steer_deg, sigma, carries, R_sum, w_sum, tail):
        win = hann(n_fft)
        # One analysis frame with the scipy stft conventions of
        # azoom.dsp.stft (Hann, 1/win.sum() scaling).
        fr = jnp.asarray(freqs)
        y = jnp.fft.rfft(ctx * win, axis=-1) / jnp.sum(win)  # (M, F)
        d = steering_vector(fr, steer_deg, cfg.mic_dist, cfg.c, cfg.n_mics, positions=cfg.geometry())
        # Steer-aligned features (parity with online_learned_enhance):
        # rotate by conj(d) so the look direction appears broadside to the
        # broadside-trained causal net; exact no-op at steer_deg = 90.
        y_feat = y * jnp.conj(d).T if steer_align else y
        feats = logmag_ipd_features(y_feat[:, :, None])[None]  # (1, F, 1, 2)
        mask, new_carries = model.apply(
            variables, feats, carries=carries, return_carries=True
        )
        m = mask[0, :, 0]  # (F,) target mask for this frame
        noise = 1.0 - m

        # Recursive mask-weighted covariance (online_masked_mvdr's update).
        outer = jnp.einsum("mf,nf->fmn", y, jnp.conj(y))
        R_sum = forget * R_sum + outer * noise[:, None, None]
        w_sum = forget * w_sum + noise
        # sigma is TRACED (the zoom knob: diagonal loading <-> beamwidth),
        # so mid-stream AudioZoom.set_zoom() changes reuse the compiled
        # program — same rationale as steer_deg.
        R = R_sum / (w_sum + eps)[:, None, None] + sigma * eye
        # M-general dispatch (closed-form 2x2 at M=2, unrolled Cholesky
        # beyond) — the low-latency path works on any linear array.
        Rinv_d = solve_hermitian(R, d)
        denom = jnp.sum(jnp.conj(d) * Rinv_d, axis=-1, keepdims=True)
        w = Rinv_d / (denom + 1e-10)
        s = jnp.sum(jnp.conj(w) * y.T, axis=-1)  # (F,)
        s = s * jnp.maximum(m, mask_floor)
        s = jnp.where(fr >= cfg.hp_cutoff_hz, s, 0.0)

        # Synthesis frame + one-hop OLA finalization (istft conventions:
        # irfft * win * win.sum(), normalized by the pairwise win^2 sum).
        rec = jnp.fft.irfft(s, n=n_fft) * win * jnp.sum(win)
        norm = jnp.maximum(win[:hop] ** 2 + win[hop:] ** 2, 1e-10)
        out = (tail + rec[:hop]) / norm
        return out, new_carries, R_sum, w_sum, rec[hop:]

    return step


class OnlineEnhancer:
    """Stateful hop-by-hop enhancer: feed arbitrary sample blocks, get
    finalized audio back one-to-two hops later.

    Args:
      cfg: physics/STFT configuration (must use 50 % overlap).
      model / variables: a *causal* mask net supporting streaming carries
        (CRNMaskNet(unidirectional=True)).
      steer_deg: look direction; mutable between pushes via
        :meth:`set_direction` (traced, so no recompile).
      sigma: diagonal loading (the zoom <-> beamwidth knob); defaults to
        cfg.sigma and is mutable between pushes via :meth:`set_sigma`
        (traced too).
    """

    def __init__(self, cfg: PipelineConfig, model, variables: Any,
                 steer_deg: float = 90.0, forget: float = 0.98,
                 mask_floor: float = 0.05, sigma: float | None = None,
                 steer_align: bool = True):
        self.cfg = cfg
        self.steer_deg = float(steer_deg)
        self.sigma = float(cfg.sigma if sigma is None else sigma)
        self._model = model
        self._step = _make_step(model, variables, cfg, forget, mask_floor,
                                steer_align=steer_align)
        self._hop = cfg.hop
        self._n_fft = cfg.n_fft
        self.reset()

    def reset(self) -> None:
        M, F = self.cfg.n_mics, self.cfg.n_fft // 2 + 1
        # ctx holds the last n_fft extended-stream samples; starting from
        # zeros reproduces scipy stft's boundary='zeros' lead padding.
        self._ctx = np.zeros((M, self._n_fft), np.float32)
        self._carries = self._model.initial_carries(1)

        # The complex covariance prime is CREATED ON DEVICE inside a jit:
        # a host->device transfer of a complex array is unimplemented on
        # the axon TPU runtime (it fails asynchronously and surfaces at
        # the next sync point).
        @jax.jit
        def _prime():
            eye = jax.lax.complex(
                jnp.eye(M, dtype=jnp.float32) * 1e-6,
                jnp.zeros((M, M), jnp.float32),
            )
            return jnp.broadcast_to(eye, (F, M, M))

        self._R = _prime()
        self._w = jnp.full((F,), 1e-6, jnp.float32)
        self._tail = jnp.zeros((self._hop,), jnp.float32)
        self._inbuf = np.zeros((M, 0), np.float32)
        self._frames = 0

    def set_direction(self, steer_deg: float) -> None:
        self.steer_deg = float(steer_deg)

    def set_sigma(self, sigma: float) -> None:
        """Change the diagonal loading (zoom level) mid-stream; takes
        effect from the next pushed hop, no recompile."""
        self.sigma = float(sigma)

    @property
    def latency_samples(self) -> int:
        """Worst-case algorithmic latency (one analysis window)."""
        return self._n_fft

    def push(self, samples) -> np.ndarray:
        """Feed (M, k) samples; returns finalized enhanced audio (a
        multiple of hop samples, possibly empty)."""
        samples = np.asarray(samples, np.float32)
        self._inbuf = np.concatenate([self._inbuf, samples], axis=1)
        outs = []
        while self._inbuf.shape[1] >= self._hop:
            block, self._inbuf = (
                self._inbuf[:, : self._hop], self._inbuf[:, self._hop:],
            )
            self._ctx = np.concatenate([self._ctx[:, self._hop:], block], axis=1)
            out, self._carries, self._R, self._w, self._tail = self._step(
                jnp.asarray(self._ctx), jnp.float32(self.steer_deg),
                jnp.float32(self.sigma),
                self._carries, self._R, self._w, self._tail,
            )
            # Frame 0 finalizes only the synthetic lead padding — drop it.
            if self._frames > 0:
                outs.append(out)
            self._frames += 1
        if not outs:
            return np.zeros(0, np.float32)
        # ONE device fetch per push, however many hops it contained: on a
        # remote-tunnel deployment each fetch pays a ~30 ms round trip
        # regardless of size (measured round 4), so fetching per hop made
        # a K-hop push cost K round trips. Dispatches above are async;
        # only this fetch blocks.
        if len(outs) == 1:
            return to_numpy(outs[0])
        return to_numpy(jnp.concatenate(outs))

    def flush(self) -> np.ndarray:
        """Finalize buffered input by zero-padding one window; returns the
        remaining enhanced samples for the pushed audio."""
        n_left = self._inbuf.shape[1]
        pad = self._n_fft + (-(n_left) % self._hop)
        out = self.push(np.zeros((self.cfg.n_mics, pad), np.float32))
        keep = n_left + self._hop  # tail hops still covering real input
        return out[: keep] if keep < out.shape[0] else out
