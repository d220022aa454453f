"""Batched live serving: S concurrent streams through ONE compiled program.

The round-4 serving analysis (RESULTS "post-nano serving frontier")
showed the nano net's matmuls are M-starved at small batch: marginal
work is nearly free until the tile fills, so the way to serve MANY live
streams is not S single-stream AudioZoom instances (S dispatches, S
fetch round trips, S half-empty tiles) but one batched program whose
batch axis IS the stream axis — the same shape the throughput bench
measures, applied to live OLA streaming.

``AudioZoomServer`` holds S synchronized stream states (a server tick
pushes one equal-sized block per stream — the typical real-time media
server shape) and runs stft -> mask net -> MVDR -> istft for all ready
windows in one jit call per tick. Device round trips per tick: ONE
dispatch + ONE fetch, regardless of S.

Round-5 productization (VERDICT r4 items 1-4, 8 + ADVICE r4 #3):

* **Steer-aligned features** — the batched step rotates the STFT by the
  conjugate steering vector before feature extraction (and uses the
  first-pair IPD under explicit geometries), exactly like
  ``pipelines.learned.learned_enhance``: panned streams feed the mask
  net in-distribution cues instead of raw off-broadside phases.
* **Per-stream traced zoom width** — sigma rides the fused Pallas MVDR
  kernel as a VMEM operand, so heterogeneous per-stream widths AND live
  pans all reuse one compiled program (no ``sigma_static`` recompile
  trap, no silent XLA fallback).
* **Streaming mask-reuse** (``mask_reuse=True``) — on the frame-aligned
  geometry (win_size = 32768: the half-window hop is 32 whole STFT
  hops) each window's first 33 frames see audio the previous window
  already masked, so the net runs on only [new + context] = 48 frames
  instead of 80 padded; the previous window's masks are stitched in for
  the shared half. Measured quality-free (−0.03 dB over 16 blind
  scenes, ``scripts/mask_reuse_study.py``) and 1.60× less net per
  served audio-second.
* **Device-side OLA + compact wire** — the rolling window buffer and
  the overlap-add tail live ON DEVICE: a steady-state tick uploads only
  the hop of NEW samples per stream and fetches only the hop of
  FINALIZED samples, and ``wire='int16'`` moves both legs as 16-bit PCM
  (audio is WAV-born; quantization is below the mask floor). Per-tick
  transport drops from (win f32 up + win f32 down) to
  (hop i16 up + hop i16 down) = 8× less — on tunnel deployments, where
  transport IS the tick (RESULTS "Batched live serving"), this is the
  difference between 64 and 128+ live streams per chip.
* **Multi-chip** (``mesh=``) — the stream axis shards over a
  ``jax.sharding.Mesh``: serving is embarrassingly stream-parallel, so
  S streams × N chips is one SPMD program with no collectives; state
  buffers stay resident on their shards across ticks.
* **Per-stream tracking + churn** — ``track=True`` runs the momentum
  (direction-state) bearing filter per stream from in-graph DOA
  histograms (one extra (S, A) fetch per tick), so each stream's beam
  follows ITS moving talker; ``attach()``/``detach()`` reuse slots
  within the fixed compiled S with a one-window warm-up.

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


def _decode_wire(x: jnp.ndarray) -> jnp.ndarray:
    """int16 PCM -> float32 in [-1, 1); float32 passes through."""
    if x.dtype == jnp.int16:
        return x.astype(jnp.float32) * (1.0 / 32768.0)
    return x


def _steer_and_mask(
    Y, steer, model, variables, cfg, feature_kind, ipd_scale, pair_mode,
    frames_from=None,
):
    """Shared feature path of the batched step: steering vector, conj-
    rotation of the features (ADVICE r4 #3 — mirrors learned_enhance so
    panned streams see broadside cues), then the mask net — over the
    full window or, for mask-reuse ticks, only frames [frames_from:].

    Returns (d (S, F, M), mask (S, F, T_net)).
    """
    from azoom.dsp.delays import steering_vector
    from azoom.dsp.stft import rfft_freqs
    from azoom.pipelines.learned import predict_mask

    freqs = rfft_freqs(cfg.n_fft, cfg.fs)
    d = steering_vector(
        freqs, steer, cfg.mic_dist, cfg.c, cfg.n_mics,
        positions=cfg.geometry(),
    )  # (S, F, M)
    # Per-channel unit-modulus rotation: the steered target's inter-
    # channel phases become zero (broadside as seen by the features);
    # channel magnitudes — hence logmag — are untouched. Exact no-op at
    # broadside for linear arrays.
    Y_feat = Y * jnp.conj(d).swapaxes(-1, -2)[..., None]
    if frames_from is not None:
        Y_feat = Y_feat[..., frames_from:]
    mask = predict_mask(
        model, variables, Y_feat, feature_kind,
        ipd_scale=ipd_scale, pair_mode=pair_mode,
    )
    return d, mask


def _beamform(Y, mask, d, sigma, cfg, use_pallas):
    """Masked MVDR over the stream axis with per-stream TRACED sigma —
    the Pallas kernel takes the loading as a VMEM operand (round 5), so
    heterogeneous zoom widths ride the fused path and width pans never
    recompile (VERDICT r4 #8)."""
    from azoom.dsp.stft import rfft_freqs

    freqs = rfft_freqs(cfg.n_fft, cfg.fs)
    noise = 1.0 - mask
    if use_pallas and cfg.n_mics == 2:
        from azoom.pallas.mvdr_kernel import masked_mvdr_pallas as mvdr_fn
    else:
        from azoom.beam.mvdr import masked_mvdr as mvdr_fn

    def one(Ys, nm, tm, ds, sg):
        return mvdr_fn(
            Ys, nm, ds, freqs, target_mask=tm, mask_floor=0.05,
            sigma=sg, hp_cutoff_hz=cfg.hp_cutoff_hz,
        )

    return jax.vmap(one)(Y, noise, mask, d, sigma)


def _doa_hist(Y, cfg):
    from azoom.localize.srp import ipd_angle_histogram

    _, hist = ipd_angle_histogram(Y, cfg.mic_dist, cfg.fs, c=cfg.c)
    return hist  # (S, A)


@functools.partial(
    jax.jit,
    static_argnames=("model", "cfg", "feature_kind", "use_pallas",
                     "dsp_precision", "ipd_scale", "pair_mode", "track"),
)
def _prime_step(
    window, steer, sigma, variables,
    model, cfg: PipelineConfig, feature_kind, use_pallas, dsp_precision,
    ipd_scale, pair_mode, track,
):
    """First tick: a FULL (S, M, win) window primes the device state.

    Returns (win_state f32, ola_tail, mask, doa_hist|None) — no output
    samples (the OLA warm-up hop, matching AudioZoom.push semantics).
    """
    from azoom.dsp.stft import istft, stft

    w = _decode_wire(window)
    win = w.shape[-1]
    hop = win // 2
    Y = stft(w, cfg.n_fft, cfg.hop, precision=dsp_precision)
    d, mask = _steer_and_mask(
        Y, steer, model, variables, cfg, feature_kind, ipd_scale, pair_mode
    )
    S = _beamform(Y, mask, d, sigma, cfg, use_pallas)
    enh = istft(S, cfg.n_fft, cfg.hop, length=win, precision=dsp_precision)
    hann = jnp.asarray(np.hanning(win + 1)[:-1], jnp.float32)
    weighted = enh * hann
    hist = _doa_hist(Y, cfg) if track else None
    return w, weighted[:, hop:], mask, hist


@functools.partial(
    jax.jit,
    static_argnames=("model", "cfg", "feature_kind", "use_pallas",
                     "dsp_precision", "ipd_scale", "pair_mode", "track",
                     "reuse", "wire_int16"),
    donate_argnames=("win_state", "tail", "prev_mask"),
)
def _tick_step(
    win_state, tail, prev_mask, new_hop, steer, sigma, reset, variables,
    model, cfg: PipelineConfig, feature_kind, use_pallas, dsp_precision,
    ipd_scale, pair_mode, track, reuse, wire_int16,
):
    """Steady-state tick: one hop of new samples in, one finalized hop out.

    All stream state (rolling window, OLA tail, previous masks) is
    device-resident and donated — a tick moves only (S, M, hop) up and
    (S, hop) [+ (S, A) tracking] down.

    ``reset`` (S,) re-initializes churned slots (attach/detach) inside
    the same program: window/tail zero (output ramps in over one hop),
    previous masks one (the reused half of the first window serves
    delay-and-sum rather than silence).

    ``reuse``: None for a full net pass per window, or (shift, ctx) for
    frame-aligned mask-reuse — window k's frame j sees the same audio as
    window k-1's frame j+shift, so frames [0, T-shift) take the previous
    stitched mask's [shift, T) and the net recomputes only the trailing
    [T-shift-ctx, T) (ctx context frames + the genuinely-new half).
    Validated quality-free in scripts/mask_reuse_study.py (−0.03 dB).
    """
    from azoom.dsp.stft import istft, stft

    x = _decode_wire(new_hop)
    hop = x.shape[-1]
    win = 2 * hop
    rs1 = reset[:, None]
    rs2 = reset[:, None, None]
    win_state = jnp.where(rs2, 0.0, win_state)
    tail = jnp.where(rs1, 0.0, tail)
    win_state = jnp.concatenate([win_state[:, :, hop:], x], axis=2)

    Y = stft(win_state, cfg.n_fft, cfg.hop, precision=dsp_precision)
    if reuse is None:
        d, mask = _steer_and_mask(
            Y, steer, model, variables, cfg, feature_kind, ipd_scale,
            pair_mode,
        )
    else:
        shift, ctx = reuse
        T = Y.shape[-1]
        prev_mask = jnp.where(rs2, 1.0, prev_mask)
        d, tail_mask = _steer_and_mask(
            Y, steer, model, variables, cfg, feature_kind, ipd_scale,
            pair_mode, frames_from=T - shift - ctx,
        )
        mask = jnp.concatenate(
            [prev_mask[:, :, shift:], tail_mask[:, :, ctx:]], axis=-1
        )
    S = _beamform(Y, mask, d, sigma, cfg, use_pallas)
    enh = istft(S, cfg.n_fft, cfg.hop, length=win, precision=dsp_precision)
    hann = jnp.asarray(np.hanning(win + 1)[:-1], jnp.float32)
    ola_norm = jnp.maximum(hann[:hop] + hann[hop:], 1e-6)
    weighted = enh * hann
    out = (tail + weighted[:, :hop]) / ola_norm
    if wire_int16:
        out = jnp.clip(out * 32767.0, -32767.0, 32767.0).astype(jnp.int16)
    hist = _doa_hist(Y, cfg) if track else None
    return out, win_state, weighted[:, hop:], mask, hist


class _MomentumBank:
    """Vectorized momentum bearing filters: S streams, one trellis.

    The numpy twin of ``localize.tracking.momentum_track`` causal=True
    (one window per tick per stream), batched over the stream axis —
    state (direction d in {-1,0,+1}, bearing theta); the momentum state
    carries identity through bearing crossings (RESULTS "Crossing-
    trajectory"). Tuned regime per the round-4 crossing study: rate
    6 deg/window-hop, sigma 3, switch penalty 12, tight (8 deg)
    first-window aiming prior.
    """

    def __init__(self, n_streams: int, angles: np.ndarray):
        self.S = n_streams
        self.angles = angles
        A = angles.shape[0]
        dirs = np.array([-1.0, 0.0, 1.0])
        step = angles[None, :] - angles[:, None]  # (A_prev, A_next)
        step_cost = -0.5 * (
            (step[None] - dirs[:, None, None] * 6.0) / 3.0
        ) ** 2  # (D', A_prev, A_next)
        switch = -12.0 * np.abs(dirs[:, None] - dirs[None, :])
        trans = (switch[:, None, :, None]
                 + step_cost[None].transpose(0, 2, 1, 3))
        self.trans = trans.reshape(3 * A, 3 * A).astype(np.float32)
        self.scores = np.zeros((n_streams, 3 * A), np.float32)
        self.fresh = np.ones(n_streams, bool)

    def reset(self, slot=None) -> None:
        if slot is None:
            self.fresh[:] = True
        else:
            self.fresh[slot] = True

    def update(self, hist: np.ndarray, center: np.ndarray,
               fov: np.ndarray, active: np.ndarray) -> np.ndarray:
        """One tick for every stream; returns per-stream MAP bearing.

        hist (S, A) magnitude^2 angle votes; center/fov (S,) the camera
        FOV gate per stream; active (S,) — inactive slots keep their
        center (their histogram is silence/garbage).
        """
        A = self.angles.shape[0]
        p = np.maximum(hist, 0.0)
        p = p / (p.sum(axis=1, keepdims=True) + 1e-20)
        emis = np.log(p + 1e-6)
        gate = (np.abs(self.angles[None, :] - center[:, None])
                <= fov[:, None] / 2.0)
        emis = np.where(gate, emis, -1e9).astype(np.float32)
        emis_s = np.tile(emis, (1, 3))
        # Fresh slots: camera aiming prior (the user points the camera at
        # the talker when the zoom starts).
        prior = -0.5 * (
            (self.angles[None, :] - center[:, None]) / 8.0
        ) ** 2
        init = emis_s + np.tile(prior, (1, 3)).astype(np.float32)
        # Running slots: one forward-Viterbi step over the shared trellis.
        stepd = (
            self.scores[:, :, None] + self.trans[None]
        ).max(axis=1) + emis_s
        scores = np.where(self.fresh[:, None], init, stepd)
        self.scores = scores - scores.max(axis=1, keepdims=True)
        self.fresh[:] = False
        theta = self.angles[np.argmax(scores, axis=1) % A]
        return np.where(active, theta, center).astype(np.float32)


class AudioZoomServer:
    """S concurrent live audio-zoom streams, one compiled step per tick.

    Args:
      n_streams: S, the compiled batch axis (slots; see attach/detach).
      cfg: shared physics/STFT config (per-stream geometry would need
        per-stream configs — out of scope; direction and zoom ARE
        per-stream). ``mask_reuse`` requires the frame-aligned streaming
        geometry: ``cfg.win_size // 2`` a multiple of ``cfg.hop``
        (win_size=32768 at the 1024/512 STFT).
      model: bundled model name (default the nano serving flagship).
      int8: serve the int8-MXU path.
      dsp_precision: 'fast' by default — the benchmarked serving DSP.
      mask_reuse: stitch the previous window's masks over the shared
        half and run the net only on [context + new] frames — measured
        quality-free and 1.60x less net per served audio-second
        (RESULTS "post-nano serving frontier"). Steering pans update
        reused masks one window late (the beamformer itself re-steers
        instantly — only the mask's TF selection lags).
      reuse_context: net context frames re-computed before the new half.
      wire: 'float32' or 'int16' — int16 moves push/fetch as 16-bit PCM
        (4x less D2H + 2x less H2D; quantization is −90 dB, far below
        the mask floor). With 'int16', push() accepts int16 PCM or
        float32 (converted host-side) and RETURNS int16 PCM.
      track: per-stream momentum bearing tracking — each stream's beam
        follows its own moving talker inside that stream's camera FOV
        (one extra (S, A) histogram fetch per tick; the tracked bearing
        steers the NEXT tick — strictly causal).
      fov_deg: default camera field of view for the tracking gate.
      mesh: optional single-axis ``jax.sharding.Mesh`` — shards the
        stream axis across devices (S % mesh.size == 0). Serving is
        embarrassingly stream-parallel: one SPMD program, state buffers
        stay resident per shard, no collectives.

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
                 dsp_precision: str = "fast",
                 mask_reuse: bool = False, reuse_context: int = 16,
                 wire: str = "float32",
                 track: bool = False, fov_deg: float = 60.0,
                 mesh=None):
        from azoom.models.pretrained import geo_adapt_dist, load_bundled

        self.S = int(n_streams)
        self.cfg = cfg or PipelineConfig(mic_dist=0.04)
        self._model, self._variables, self._fk = load_bundled(
            model, quant=int8)
        self._use_pallas = (jax.default_backend() == "tpu"
                            if use_pallas is None else use_pallas)
        self._dsp_precision = dsp_precision
        if wire not in ("float32", "int16"):
            raise ValueError(f"wire must be 'float32' or 'int16', got {wire!r}")
        self._wire_i16 = wire == "int16"
        self._track = bool(track)
        self._win = self.cfg.win_size
        self._hop = self._win // 2
        # Feature-path conventions under explicit geometries: first-pair
        # IPD + effective-baseline adaptation (mirrors learned_enhance).
        self._pair_mode = "mean"
        d_feat = self.cfg.mic_dist
        if self.cfg.mic_positions is not None:
            self._pair_mode = "first"
            p0 = self.cfg.mic_positions[0] + (0.0, 0.0)
            p1 = self.cfg.mic_positions[1] + (0.0, 0.0)
            d_feat = ((p0[0] - p1[0]) ** 2 + (p0[1] - p1[1]) ** 2) ** 0.5
        train_d = geo_adapt_dist(model, d_feat)
        self._ipd_scale = 1.0 if train_d is None else train_d / d_feat

        self._reuse = None
        if mask_reuse:
            if self._hop % self.cfg.hop != 0:
                raise ValueError(
                    f"mask_reuse needs frame-aligned streaming geometry: "
                    f"win_size//2 ({self._hop}) must be a multiple of the "
                    f"STFT hop ({self.cfg.hop}) — e.g. win_size=32768"
                )
            shift = self._hop // self.cfg.hop
            T = self.cfg.frames_per_chunk
            ctx = int(reuse_context)
            if not 0 < shift + ctx <= T:
                raise ValueError(
                    f"reuse_context={ctx} out of range for T={T}, "
                    f"shift={shift}"
                )
            self._reuse = (shift, ctx)

        self._mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if len(mesh.axis_names) != 1:
                raise ValueError("mesh must have exactly one axis")
            if self.S % mesh.devices.size != 0:
                raise ValueError(
                    f"n_streams={self.S} not divisible by mesh size "
                    f"{mesh.devices.size}"
                )
            axis = mesh.axis_names[0]
            self._shd_s = NamedSharding(mesh, P(axis))
            self._shd_rep = NamedSharding(mesh, P())
            # Replicate the model once; stream-axis tensors shard.
            self._variables = jax.device_put(self._variables, self._shd_rep)

        self._steer = np.full(self.S, 90.0, np.float32)
        self._center = np.full(self.S, 90.0, np.float32)
        self._fov = np.full(self.S, float(fov_deg), np.float32)
        self._sigma = np.full(self.S, self.cfg.sigma, np.float32)
        self._active = np.ones(self.S, bool)
        self._tracker = None
        if self._track:
            # ipd_angle_histogram's angle grid (localize/srp.py).
            self._tracker = _MomentumBank(
                self.S, np.linspace(0.0, 180.0, 181).astype(np.float32)
            )
        self.reset()

    # -- per-stream state ---------------------------------------------------

    def reset(self) -> None:
        """Drop all stream state (all slots)."""
        dt = np.int16 if self._wire_i16 else np.float32
        self._inbuf = np.zeros((self.S, self.cfg.n_mics, 0), dt)
        self._primed = False
        self._dev_win = None
        self._dev_tail = None
        self._dev_mask = None
        self._pending_reset = np.zeros(self.S, bool)
        if self._tracker is not None:
            self._tracker.reset()
            self._steer = self._center.copy()

    def set_zoom(self, stream: int, direction_deg: float | None = None,
                 zoom: float | None = None,
                 fov_deg: float | None = None) -> None:
        """Per-stream camera state; traced inputs — no recompile."""
        if direction_deg is not None:
            self._center[stream] = float(direction_deg)
            self._steer[stream] = float(direction_deg)
            if self._tracker is not None:
                self._tracker.reset(stream)  # re-aim: fresh prior
        if fov_deg is not None:
            self._fov[stream] = float(fov_deg)
        if zoom is not None:
            from azoom.beam.zoom import zoom_to_sigma

            self._sigma[stream] = float(zoom_to_sigma(float(zoom)))

    @property
    def bearings(self) -> np.ndarray:
        """Current per-stream beam bearing (tracked or camera center)."""
        return self._steer.copy()

    def attach(self, slot: int | None = None,
               direction_deg: float = 90.0, zoom: float | None = None,
               fov_deg: float | None = None) -> int:
        """Claim a free slot for a NEW live stream (stream churn within
        the fixed compiled S). The slot's device state is re-initialized
        inside the next tick; its output ramps in over one window
        (OLA warm-up + delay-and-sum masks on the first reused half).
        Returns the slot index."""
        if slot is None:
            free = np.flatnonzero(~self._active)
            if free.size == 0:
                raise RuntimeError(f"all {self.S} slots active")
            slot = int(free[0])
        elif self._active[slot]:
            raise RuntimeError(f"slot {slot} already active")
        self._active[slot] = True
        self._pending_reset[slot] = True
        self._inbuf[slot] = 0
        self.set_zoom(slot, direction_deg=direction_deg, zoom=zoom,
                      fov_deg=fov_deg)
        return slot

    def detach(self, slot: int) -> None:
        """Release a slot (its rows keep flowing as silence until
        re-attached; lockstep shapes never change)."""
        self._active[slot] = False
        self._inbuf[slot] = 0
        if self._tracker is not None:
            self._tracker.reset(slot)

    # -- serving ------------------------------------------------------------

    def _put_s(self, x):
        """Host -> device with stream-axis sharding when on a mesh."""
        if self._mesh is not None:
            return jax.device_put(x, self._shd_s)
        return jnp.asarray(x)

    def _encode_blocks(self, blocks) -> np.ndarray:
        blocks = np.asarray(blocks)
        if self._wire_i16:
            if blocks.dtype != np.int16:
                blocks = np.clip(
                    blocks.astype(np.float32) * 32767.0, -32767, 32767
                ).astype(np.int16)
        else:
            blocks = blocks.astype(np.float32)
        return blocks

    def push(self, blocks) -> np.ndarray:
        """(S, M, k) new samples for every stream -> (S, j*hop) enhanced
        (j >= 0 windows became ready; all streams advance in lockstep).
        int16 PCM in AND out when wire='int16'. Inactive slots ignore
        their input rows (zeroed) and emit silence/garbage rows —
        callers route only attached slots."""
        blocks = self._encode_blocks(blocks)
        if blocks.shape[0] != self.S:
            raise ValueError(
                f"expected {self.S} streams, got {blocks.shape[0]}")
        if not self._active.all():
            blocks = blocks.copy()
            blocks[~self._active] = 0
        self._inbuf = np.concatenate([self._inbuf, blocks], axis=2)
        outs = []
        while True:
            if not self._primed:
                if self._inbuf.shape[2] < self._win:
                    break
                self._prime(self._inbuf[:, :, : self._win])
                self._inbuf = self._inbuf[:, :, self._win:]
            else:
                if self._inbuf.shape[2] < self._hop:
                    break
                outs.append(self._tick(self._inbuf[:, :, : self._hop]))
                self._inbuf = self._inbuf[:, :, self._hop:]
        if not outs:
            dt = np.int16 if self._wire_i16 else np.float32
            return np.zeros((self.S, 0), dt)
        return np.concatenate(outs, axis=1)

    def _prime(self, window) -> None:
        win_state, tail, mask, hist = _prime_step(
            self._put_s(window), self._put_s(self._steer),
            self._put_s(self._sigma), self._variables,
            self._model, self.cfg, self._fk, self._use_pallas,
            self._dsp_precision, self._ipd_scale, self._pair_mode,
            self._track,
        )
        self._dev_win, self._dev_tail, self._dev_mask = win_state, tail, mask
        self._primed = True
        self._pending_reset[:] = False
        if self._track:
            self._track_update(hist)

    def _tick(self, new_hop) -> np.ndarray:
        reset = self._pending_reset.copy()
        self._pending_reset[:] = False
        out, self._dev_win, self._dev_tail, self._dev_mask, hist = _tick_step(
            self._dev_win, self._dev_tail, self._dev_mask,
            self._put_s(new_hop), self._put_s(self._steer),
            self._put_s(self._sigma), self._put_s(reset), self._variables,
            self._model, self.cfg, self._fk, self._use_pallas,
            self._dsp_precision, self._ipd_scale, self._pair_mode,
            self._track, self._reuse, self._wire_i16,
        )
        if self._track:
            self._track_update(to_numpy(hist))
        return to_numpy(out)

    def _track_update(self, hist: np.ndarray) -> None:
        """Advance every stream's bearing filter; the new bearings steer
        the NEXT tick (strictly causal — the histogram is past audio)."""
        self._steer = self._tracker.update(
            np.asarray(hist), self._center, self._fov, self._active
        )
