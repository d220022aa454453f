"""Batched live serving: S concurrent streams through ONE compiled program.

The round-4 serving analysis (RESULTS "post-nano serving frontier")
showed the nano net's matmuls are M-starved at small batch: marginal
work is nearly free until the tile fills, so the way to serve MANY live
streams is not S single-stream AudioZoom instances (S dispatches, S
fetch round trips, S half-empty tiles) but one batched program whose
batch axis IS the stream axis — the same shape the 18,397x bench
measures, applied to live OLA streaming.

``AudioZoomServer`` holds S synchronized stream states (a server tick
pushes one equal-sized block per stream — the typical real-time media
server shape) and runs stft -> mask net -> MVDR -> istft for all ready
windows in one jit call per tick. Device round trips per tick: ONE
dispatch + ONE fetch, regardless of S (the round-4 tunnel measurement:
each fetch costs ~31 ms on remote deployments — per stream that's
31/S ms amortized).

Per-stream zoom state (direction / sigma) is a traced input, so a
camera pan on any stream re-uses the compiled program.

Reference anchor: tf_lite_version/inference.py:245 processes ONE file
per process; this is the TPU-native many-streams answer.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from azoom.config import PipelineConfig
from azoom.utils.host import to_numpy

__all__ = ["AudioZoomServer"]


@functools.partial(
    jax.jit, static_argnames=("cfg", "model", "feature_kind", "use_pallas",
                              "dsp_precision", "sigma_static")
)
def _serve_windows(
    windows: jnp.ndarray,
    steer_deg: jnp.ndarray,
    sigma: jnp.ndarray,
    model,
    variables: Any,
    cfg: PipelineConfig,
    feature_kind: str,
    use_pallas: bool,
    dsp_precision: str,
    sigma_static: float | None,
) -> jnp.ndarray:
    """(S, M, win) -> (S, win): the batched serving step (one program).

    ``sigma_static``: when every stream shares one zoom width, its value
    (a trace-time constant) routes the beamformer through the fused
    Pallas kernel (which bakes the loading into the kernel body);
    ``None`` = heterogeneous per-stream ``sigma`` via the XLA path.
    """
    from azoom.beam.mvdr import masked_mvdr
    from azoom.dsp.delays import steering_vector
    from azoom.dsp.stft import istft, rfft_freqs, stft
    from azoom.pipelines.learned import predict_mask

    freqs = rfft_freqs(cfg.n_fft, cfg.fs)
    Y = stft(windows, cfg.n_fft, cfg.hop, precision=dsp_precision)
    mask = predict_mask(model, variables, Y, feature_kind)
    d = steering_vector(
        freqs, steer_deg, cfg.mic_dist, cfg.c, cfg.n_mics,
        positions=cfg.geometry(),
    )  # (S, F, M)
    pallas_ok = use_pallas and cfg.n_mics == 2 and sigma_static is not None
    if pallas_ok:
        from azoom.pallas.mvdr_kernel import masked_mvdr_pallas

        def one(Ys, ms, ds):
            return masked_mvdr_pallas(
                Ys, 1.0 - ms, ds, freqs, target_mask=ms, mask_floor=0.05,
                sigma=sigma_static, hp_cutoff_hz=cfg.hp_cutoff_hz,
            )

        S = jax.vmap(one)(Y, mask, d)
    else:
        def one(Ys, ms, ds, sg):
            return masked_mvdr(
                Ys, 1.0 - ms, ds, freqs, target_mask=ms, mask_floor=0.05,
                sigma=sg, hp_cutoff_hz=cfg.hp_cutoff_hz,
            )

        S = jax.vmap(one)(Y, mask, d, sigma)
    return istft(S, cfg.n_fft, cfg.hop, length=windows.shape[-1],
                 precision=dsp_precision)


class AudioZoomServer:
    """S concurrent live audio-zoom streams, one compiled step per tick.

    Args:
      n_streams: S, fixed at construction (the compiled batch axis).
      cfg: shared physics/STFT config (per-stream geometry would need
        per-stream configs — out of scope; direction and zoom ARE
        per-stream).
      model: bundled model name (default the nano serving flagship).
      int8: serve the int8-MXU path.
      dsp_precision: 'fast' by default — the benchmarked serving DSP.

    Usage::

        srv = AudioZoomServer(16, cfg=PipelineConfig(mic_dist=0.04))
        srv.set_zoom(3, direction_deg=60.0, zoom=0.8)   # stream 3 pans
        out = srv.push(blocks)   # (S, M, k) in -> (S, hop-aligned) out

    Every stream advances by the same block length per push (the media-
    server tick shape). Output rows align with input rows; like
    AudioZoom.push, output sample 0 corresponds to input sample
    win_size//2 (the OLA warm-up hop).
    """

    def __init__(self, n_streams: int, cfg: PipelineConfig | None = None,
                 model: str = "tpufpu_nano", int8: bool = True,
                 use_pallas: bool | None = None,
                 dsp_precision: str = "fast"):
        from azoom.models.pretrained import load_bundled

        self.S = int(n_streams)
        self.cfg = cfg or PipelineConfig(mic_dist=0.04)
        self._model, self._variables, self._fk = load_bundled(
            model, quant=int8)
        self._use_pallas = (jax.default_backend() == "tpu"
                            if use_pallas is None else use_pallas)
        self._dsp_precision = dsp_precision
        self._win = self.cfg.win_size
        self._hop = self._win // 2
        self._steer = np.full(self.S, 90.0, np.float32)
        self._sigma = np.full(self.S, self.cfg.sigma, np.float32)
        w = np.hanning(self._win + 1)[:-1].astype(np.float32)
        self._window = w
        self._ola_norm = np.maximum(w[: self._hop] + w[self._hop:], 1e-6)
        self.reset()

    def reset(self) -> None:
        self._inbuf = np.zeros((self.S, self.cfg.n_mics, 0), np.float32)
        self._tail = np.zeros((self.S, self._hop), np.float32)
        self._started = False

    def set_zoom(self, stream: int, direction_deg: float | None = None,
                 zoom: float | None = None) -> None:
        """Per-stream camera state; traced inputs — no recompile."""
        if direction_deg is not None:
            self._steer[stream] = float(direction_deg)
        if zoom is not None:
            from azoom.beam.zoom import zoom_to_sigma

            self._sigma[stream] = float(zoom_to_sigma(float(zoom)))

    def push(self, blocks) -> np.ndarray:
        """(S, M, k) new samples for every stream -> (S, j*hop) enhanced
        (j >= 0 windows became ready; all streams advance in lockstep)."""
        blocks = np.asarray(blocks, np.float32)
        if blocks.shape[0] != self.S:
            raise ValueError(
                f"expected {self.S} streams, got {blocks.shape[0]}")
        self._inbuf = np.concatenate([self._inbuf, blocks], axis=2)
        outs = []
        while self._inbuf.shape[2] >= self._win:
            windows = self._inbuf[:, :, : self._win]
            uniform = float(self._sigma[0]) if np.all(
                self._sigma == self._sigma[0]) else None
            enhanced = to_numpy(_serve_windows(
                jnp.asarray(windows), jnp.asarray(self._steer),
                jnp.asarray(self._sigma), self._model, self._variables,
                self.cfg, self._fk, self._use_pallas, self._dsp_precision,
                uniform,
            ))  # (S, win)
            weighted = enhanced * self._window
            head = weighted[:, : self._hop]
            if self._started:
                outs.append((self._tail + head) / self._ola_norm)
            self._tail = weighted[:, self._hop:]
            self._started = True
            self._inbuf = self._inbuf[:, :, self._hop:]
        if not outs:
            return np.zeros((self.S, 0), np.float32)
        return np.concatenate(outs, axis=1)
