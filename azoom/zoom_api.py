"""AudioZoom — the product-level facade.

One object that ties the whole framework to the product concept (a camera
UI driving an acoustic beam): set the *zoom state* (look direction, field
of view, zoom level), then feed audio — whole clips or a live sample
stream. Internally: zoom level -> diagonal loading (beam.zoom), FOV ->
localization gate (localize.srp), direction -> steering; enhancement is
the blind autosteer pipeline (optionally composed with a bundled mask
net — the camera FOV picks the zoom region, the audio DOA histogram
refines the steering inside it, the net provides the mask).

Two latency modes:

  * ``latency="high"`` (default): 2 s windows with Hann-weighted 50 %
    overlap-add — the reference's execution model, maximum quality;
    ``push()`` output emerges ~1 s behind the input.
  * ``latency="low"``: hop-granularity causal streaming (CRN mask net +
    recursive MVDR, azoom.stream.lowlat) — 32-64 ms algorithmic latency.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp
import numpy as np

from azoom.beam.zoom import zoom_to_sigma
from azoom.config import PipelineConfig
from azoom.pipelines.autosteer import autosteer_enhance
from azoom.utils.host import to_numpy

__all__ = ["AudioZoom"]


@dataclasses.dataclass
class AudioZoom:
    """High-level audio-zoom processor.

    Args:
      cfg: physics/STFT configuration.
      direction_deg: where the camera looks (beam steering center).
      fov_deg: visual field of view (localization gate width).
      zoom: UI zoom level in [0, 1]; controls beamwidth via diagonal
        loading (0 = wide, 1 = maximally narrow).
      enhance_fn: optional override (M, win) -> (win,); defaults to the
        blind autosteer pipeline under the current zoom state.
      model: optional bundled mask-net name ('fpu', 'fpu_reverb',
        'fpu_multigeo', 'deepfpu', 'tpufpu', 'tpufpu_slim',
        'tpufpu_nano', 'crn_causal') — routes enhancement through the
        learned pipeline. 'tpufpu_nano' is the serving flagship
        (distilled half-width encoder+decoder, 1.76x the slim net's
        speed at equal quality); geometry adaptation handles arrays
        smaller than the 4 cm training spacing automatically, and
        cfg.n_mics > 2 runs the whole stack on a larger linear array.
      int8: serve the mask net on the int8-MXU path (calibrated static
        activation scales — the benchmarked flagship configuration;
        within ~0.2 dB blind SIR of float, 1.5x the throughput).
      autosteer: when a model is set, refine the look direction with the
        blind DOA histogram inside the camera FOV before steering the net
        (the full camera -> DOA -> learned-mask product path). False
        steers exactly at ``direction_deg``.
      track: follow a MOVING talker (azoom.pipelines.tracked). Whole-clip
        ``enhance()`` runs the Viterbi MAP bearing track over the chunk
        trellis; streaming ``push()`` carries the forward-Viterbi filter's
        score vector across windows (camera aiming prior on the first
        window), so the beam follows the talker from one window to the
        next instead of re-locking from scratch (or, with
        ``track=False``, assuming one fixed bearing). Composes with
        latency='low': the bearing filter advances once per second of
        received audio and retargets the compiled per-hop step, while
        OUTPUT latency stays at one hop (32-64 ms).
      tracker: 'causal' (position-only forward Viterbi — the round-3
        streaming default) or 'momentum' (direction-state trellis,
        round 4): REQUIRED when a second moving talker's bearing may
        CROSS the target's — position-only filtering identity-swaps at
        the crossing, the momentum state carries through it (measured
        within 0.9 dB of ground-truth steering on crossing scenes;
        RESULTS.md "Crossing-trajectory"). Applies to the streaming
        push() filter and, at latency='high', whole-clip enhance().
      latency: 'high' (2 s windows, best quality) or 'low' (hop-level
        causal streaming, 32-64 ms; requires a causal model — defaults to
        'crn_causal' when none is given).
      native: allow the C++ stream runtime for push() buffering (built
        on first use if a toolchain is present — a one-time ~2 s `make`;
        set False to pin the pure-NumPy path).
      pipelined: double-buffered streaming serve (round 4): push()
        DISPATCHES window N to the device asynchronously and retrieves
        window N-1's already-finished result, so per-push wall time is
        host prep + D2H transfer instead of the full dispatch + compute
        round trip — the tunnel-dispatch latency rides under the 1 s of
        real time between window arrivals. Costs one extra hop of
        output latency (on top of the OLA hop) and weakens the
        transactional guarantee: a rare device-side failure surfaces
        one window late, losing that window's hop. Uses the NumPy
        buffering path (the native engine's peek/commit contract is
        strictly in-order). High-latency mode only.
      dsp_precision: 'exact' (default) or 'fast' — 'fast' runs the TPU
        matmul-DFT STFT/iSTFT single-pass bf16 (the benchmarked serving
        configuration: 1.32x the step at a ~-54 dB error floor, measured
        zero blind-SIR cost; learned paths only).
      harmonic_regen: HRNR stage-2 post-filter (azoom.beam.postfilter;
        reference roadmap TODO:9) on the learned steady-steer paths.
        Regime guidance from RESULTS.md: on for noisy scenes (stationary
        interference / low-SNR capture: +0.8-1.0 dB SINR, +0.014-0.034
        STOI), off (default) for clean competing-talker scenes where the
        re-opened bins leak interference (-5 dB SIR).
      mask_reuse: frame-aligned streaming mask reuse for ``push()``
        (round 5): the previous window's masks cover the shared half of
        each new window and the net recomputes only [context + new]
        frames — measured quality-free (scripts/mask_reuse_study.py,
        certified through the server path in RESULTS). Requires
        ``latency='high'``, a (non-causal) mask net, and
        ``cfg.win_size // 2`` a multiple of ``cfg.hop`` (e.g.
        win_size=32768). Streaming then delegates to a single-slot
        AudioZoomServer (device-resident window/OLA/mask state, one
        hop up + one hop down per window): ``track=True`` composes
        (per-stream momentum filter), ``autosteer``/``enhance_fn``/
        ``pipelined``/``harmonic_regen`` do not. Whole-clip
        ``enhance()`` is unaffected (it is not streaming).
    """

    cfg: PipelineConfig = PipelineConfig(mic_dist=0.04)
    direction_deg: float = 90.0
    fov_deg: float = 60.0
    zoom: float = 0.5
    enhance_fn: Callable | None = None
    model: str | None = None
    int8: bool = False
    autosteer: bool = True
    track: bool = False
    tracker: str = "causal"
    latency: str = "high"
    native: bool = True
    pipelined: bool = False
    dsp_precision: str = "exact"
    harmonic_regen: bool = False
    mask_reuse: bool = False

    def __post_init__(self):
        if self.latency not in ("high", "low"):
            raise ValueError(f"latency must be 'high' or 'low', got {self.latency!r}")
        if self.tracker not in ("causal", "momentum"):
            raise ValueError(
                f"tracker must be 'causal' or 'momentum', got {self.tracker!r}"
            )
        if self.latency == "low" and self.model is None:
            self.model = "crn_causal"
        self._mask_net = None
        self._train_mic_dist = None
        if self.model is not None:
            from azoom.models.pretrained import geo_adapt_dist, load_bundled

            self._mask_net = load_bundled(self.model, quant=self.int8)
            # Geometry adaptation: rescale phase features to the net's
            # training spacing when this array is smaller than it
            # (geo_adapt_dist docstring; no-op at the 4 cm default).
            self._train_mic_dist = geo_adapt_dist(self.model, self.cfg.mic_dist)
        if self.latency == "low":
            net = self._mask_net[0]
            if not hasattr(net, "initial_carries"):
                raise ValueError(
                    f"latency='low' needs a causal streaming model "
                    f"(e.g. 'crn_causal'); {self.model!r} cannot stream"
                )
        if self.mask_reuse:
            if self.latency != "high" or self.model is None:
                raise ValueError(
                    "mask_reuse needs latency='high' and a mask net"
                )
            if hasattr(self._mask_net[0], "initial_carries"):
                raise ValueError(
                    "mask_reuse applies to windowed (non-causal) nets; "
                    f"{self.model!r} already streams per-frame"
                )
            if self.enhance_fn is not None or self.pipelined:
                raise ValueError(
                    "mask_reuse is the server streaming path — it does "
                    "not compose with enhance_fn or pipelined"
                )
        self._reset_stream()

    # -- zoom state ---------------------------------------------------------

    def set_zoom(self, direction_deg=None, fov_deg=None, zoom=None) -> None:
        if direction_deg is not None:
            self.direction_deg = float(direction_deg)
            if getattr(self, "_online", None) is not None:
                self._online.set_direction(self.direction_deg)
        if fov_deg is not None:
            self.fov_deg = float(fov_deg)
        if zoom is not None:
            self.zoom = float(np.clip(zoom, 0.0, 1.0))
            if getattr(self, "_online", None) is not None:
                # Low-latency mode: the loading is a traced input of the
                # compiled step — propagate the new zoom mid-stream.
                self._online.set_sigma(self.sigma)
        if getattr(self, "_srv", None) is not None:
            self._srv.set_zoom(0, direction_deg=direction_deg,
                               zoom=zoom, fov_deg=fov_deg)

    @property
    def sigma(self) -> float:
        return float(zoom_to_sigma(self.zoom))

    def _zoom_cfg(self) -> PipelineConfig:
        return self.cfg.replace(
            sigma=self.sigma, angle_target_deg=self.direction_deg
        )

    def _update_track(self, window: jnp.ndarray, cfg) -> float:
        """Causal per-window bearing update: one forward-Viterbi filtering
        step (azoom.localize.tracking.causal_track) with the running score
        vector carried across push() windows. Keeping the full posterior
        over angles — instead of the previous EMA point estimate — is what
        lets the tracker recover from a transiently-captured wrong peak
        (the EMA's rate gate made an early wrong lock permanent)."""
        from azoom.dsp.stft import stft
        from azoom.localize.srp import ipd_angle_histogram

        Y = stft(window, cfg.n_fft, cfg.hop)
        angles, hist = ipd_angle_histogram(Y, cfg.mic_dist, cfg.fs, c=cfg.c)
        angles, hist = np.asarray(angles), np.asarray(hist)
        # Log emission, FOV-gated (mirrors tracking._emissions).
        p = np.maximum(hist, 0.0)
        p = p / (p.sum() + 1e-20)
        emis = np.log(p + 1e-6)
        gate = np.abs(angles - self.direction_deg) <= self.fov_deg / 2.0
        emis = np.where(gate, emis, -1e9)
        if self.tracker == "momentum":
            return self._update_track_momentum(angles, emis)
        if self._track_scores is None:
            # First window: camera aiming prior (the user points the
            # camera at the talker when the zoom starts) — the one chunk
            # with no temporal context must not lock onto a distractor
            # out-talking the target. Same prior scale as the static
            # autosteer (pipelines/autosteer.py).
            sigma_p = self.fov_deg / 5.0
            scores = emis - 0.5 * ((angles - self.direction_deg) / sigma_p) ** 2
        else:
            trans_sigma = 12.0  # deg per window hop (tracked.py default)
            diff = angles[:, None] - angles[None, :]
            trans = -0.5 * (diff / trans_sigma) ** 2
            scores = (self._track_scores[:, None] + trans).max(axis=0) + emis
        self._track_scores = scores - scores.max()
        self._track_theta = float(angles[np.argmax(scores)])
        return self._track_theta

    def _update_track_momentum(self, angles: np.ndarray,
                               emis: np.ndarray) -> float:
        """Streaming direction-state filtering (the numpy twin of
        tracking.momentum_track causal=True, one window per call): state
        (d, theta) with d in {-1, 0, +1}; the momentum carries identity
        through a bearing crossing with a second moving talker. Tuned
        regime per the round-4 crossing study: rate 6 deg/window-hop,
        sigma 3, switch penalty 12, TIGHT (8 deg) first-window aiming
        prior."""
        A = angles.shape[0]
        if getattr(self, "_mom_trans", None) is None or \
                self._mom_trans.shape[0] != 3 * A:
            dirs = np.array([-1.0, 0.0, 1.0])
            step = angles[None, :] - angles[:, None]  # (A_prev, A_next)
            step_cost = -0.5 * (
                (step[None] - dirs[:, None, None] * 6.0) / 3.0
            ) ** 2  # (D', A_prev, A_next)
            switch = -12.0 * np.abs(dirs[:, None] - dirs[None, :])
            trans = (switch[:, None, :, None]
                     + step_cost[None].transpose(0, 2, 1, 3))
            self._mom_trans = trans.reshape(3 * A, 3 * A).astype(np.float32)
        emis_s = np.tile(emis, 3)
        if self._track_scores is None or self._track_scores.shape[0] != 3 * A:
            prior = -0.5 * ((angles - self.direction_deg) / 8.0) ** 2
            scores = emis_s + np.tile(prior, 3)
        else:
            scores = (
                self._track_scores[:, None] + self._mom_trans
            ).max(axis=0) + emis_s
        self._track_scores = scores - scores.max()
        self._track_theta = float(angles[int(np.argmax(scores)) % A])
        return self._track_theta

    def _enhance_window(self, window: jnp.ndarray) -> jnp.ndarray:
        cfg = self._zoom_cfg()
        if self.enhance_fn is not None:
            return self.enhance_fn(window)
        if self.track and (
            self._mask_net is None
            or not hasattr(self._mask_net[0], "initial_carries")
        ):
            theta = self._update_track(window, cfg)
            if self._mask_net is not None:
                from azoom.pipelines.learned import learned_enhance

                net, variables, feats = self._mask_net
                return learned_enhance(
                    window, net, variables, cfg, feature_kind=feats,
                    steer_deg=jnp.float32(theta), fov_deg=float(self.fov_deg),
                    train_mic_dist=self._train_mic_dist,
                    dsp_precision=self.dsp_precision,
                    harmonic_regen=self.harmonic_regen,
                )
            from azoom.pipelines.tracked import steered_heuristic_enhance

            return steered_heuristic_enhance(window, cfg, jnp.float32(theta))
        if self._mask_net is not None:
            net, variables, feats = self._mask_net
            if self.autosteer and not hasattr(net, "initial_carries"):
                # Camera FOV -> DOA-refined steering -> learned mask: the
                # blind product path (VERDICT: autosteer + learned composed).
                out, _ = autosteer_enhance(
                    window, cfg,
                    fov_center_deg=self.direction_deg,
                    fov_width_deg=self.fov_deg,
                    model=net, variables=variables, feature_kind=feats,
                    fov_gate=True,
                    train_mic_dist=self._train_mic_dist,
                    dsp_precision=self.dsp_precision,
                    harmonic_regen=self.harmonic_regen,
                )
                return out
            if hasattr(net, "initial_carries"):
                from azoom.pipelines.online_learned import online_learned_enhance

                return online_learned_enhance(window, net, variables, cfg)
            from azoom.pipelines.learned import learned_enhance

            # Exact-steering variant; the camera FOV still gates the noise
            # covariance (visual-guided covariance gating).
            return learned_enhance(
                window, net, variables, cfg, feature_kind=feats,
                fov_deg=float(self.fov_deg),
                train_mic_dist=self._train_mic_dist,
                dsp_precision=self.dsp_precision,
                harmonic_regen=self.harmonic_regen,
            )
        out, _ = autosteer_enhance(
            window, cfg, fov_center_deg=self.direction_deg,
            fov_width_deg=self.fov_deg,
        )
        return out

    # -- whole-clip ---------------------------------------------------------

    def enhance(self, mixture) -> np.ndarray:
        """Whole-clip enhancement: (M, n) -> (n,) numpy.

        With ``track=True`` the clip is chunked and the Viterbi MAP
        bearing track steers every chunk at its own estimate (the
        moving-talker path, azoom.pipelines.tracked); otherwise one
        whole-clip program."""
        mixture = jnp.asarray(mixture)
        if (
            self.track
            and self.enhance_fn is None
            and self.latency == "high"
            and mixture.shape[-1] > self.cfg.win_size
        ):
            from azoom.pipelines.tracked import tracked_autosteer_enhance

            kwargs = {}
            if self._mask_net is not None:
                net, variables, feats = self._mask_net
                kwargs = dict(
                    model=net, variables=variables, feature_kind=feats,
                    train_mic_dist=self._train_mic_dist,
                    dsp_precision=self.dsp_precision,
                )
            out, _ = tracked_autosteer_enhance(
                mixture, self._zoom_cfg(),
                fov_center_deg=self.direction_deg,
                fov_width_deg=float(self.fov_deg),
                tracker=("momentum" if self.tracker == "momentum"
                         else "viterbi"),
                **kwargs,
            )
            return to_numpy(out)
        return to_numpy(self._enhance_window(mixture))

    # -- live streaming -----------------------------------------------------

    def _reset_stream(self):
        self._track_theta = None  # causal tracker state (track=True)
        self._track_scores = None  # forward-Viterbi score vector
        self._mom_trans = None  # momentum trellis (built on first window)
        self._online = None
        self._srv = None
        if self.mask_reuse:
            from azoom.stream.server import AudioZoomServer

            # Single-slot server: device-resident window/OLA/mask state,
            # frame-aligned mask reuse, per-stream (= this stream)
            # steering/zoom/tracking. The server's momentum filter IS
            # the facade's tracked path at this cadence.
            self._srv = AudioZoomServer(
                1, cfg=self.cfg, model=self.model, int8=self.int8,
                dsp_precision=self.dsp_precision, mask_reuse=True,
                track=self.track, fov_deg=self.fov_deg,
            )
            self._srv.set_zoom(0, direction_deg=self.direction_deg,
                               zoom=self.zoom, fov_deg=self.fov_deg)
            return
        if self.latency == "low":
            from azoom.stream.lowlat import OnlineEnhancer

            net, variables, _ = self._mask_net
            self._online = OnlineEnhancer(
                self._zoom_cfg(), net, variables, steer_deg=self.direction_deg
            )
            # track=True at low latency: the forward-Viterbi bearing
            # filter updates once per second of received audio (the same
            # steering cadence as the 2 s / 50 % tracked OLA path, so the
            # 12 deg/hop motion model transfers) and retargets the
            # compiled per-hop step via set_direction — steering follows
            # the talker while OUTPUT latency stays at one hop.
            self._ll_track_buf = np.zeros((self.cfg.n_mics, 0), np.float32)
            self._ll_track_win = int(self.cfg.fs)
            return
        self._win = self.cfg.win_size
        self._hop = self._win // 2
        # Buffering/OLA runs in the native C++ engine when the toolchain
        # is available (amortized O(1) pushes, no per-block reallocation);
        # the NumPy path below is the portable fallback. Either way the
        # enhancement itself stays on device.
        from azoom.stream.native import NativeStream, native_available

        # pipelined mode defers retrieval by one window, which the native
        # engine's strictly-in-order peek/commit contract cannot express
        # — pin the NumPy buffering path there.
        self._native = (
            NativeStream(self.cfg.n_mics, self._win)
            if self.native and native_available() and not self.pipelined
            else None
        )
        self._inbuf = np.zeros((self.cfg.n_mics, 0), np.float32)
        self._pipe_pending = None  # device result of the last window
        self._tail = np.zeros(self._hop, np.float32)
        self._started = False
        # Finalized hops not yet handed to the caller: lives on the object
        # (not a push()-local) so an enhancement failure on a LATER window
        # of the same push cannot discard audio already finalized by
        # earlier windows — the retry returns it.
        self._out_pending: list[np.ndarray] = []
        w = np.hanning(self._win + 1)[:-1].astype(np.float32)
        self._window = w
        # 50% Hann overlap-add sums to a (nearly) constant; dividing by the
        # exact pairwise sum makes the stream reconstruction gain exactly 1.
        self._ola_norm = np.maximum(w[: self._hop] + w[self._hop :], 1e-6)

    def reset(self) -> None:
        """Drop all stream state (e.g. on seek or device change)."""
        self._track_theta = None
        self._track_scores = None
        if getattr(self, "_srv", None) is not None:
            self._srv.reset()
            return
        if getattr(self, "_online", None) is not None:
            self._online.reset()
            self._ll_track_buf = np.zeros((self.cfg.n_mics, 0), np.float32)
            return
        if getattr(self, "_native", None) is not None:
            self._native.reset()
            self._inbuf = np.zeros((self.cfg.n_mics, 0), np.float32)
            self._tail[:] = 0.0
            self._started = False
            self._out_pending = []
            return
        self._reset_stream()

    def push(self, samples) -> np.ndarray:
        """Feed (M, k) new samples; returns whatever enhanced audio is ready
        (multiple of hop samples, possibly empty). Output sample 0
        corresponds to INPUT sample ``win_size // 2`` — the stream's
        one-hop (1 s default) overlap-add warm-up; align by that offset
        when comparing against the input. Transactional under
        enhancement failure: if the enhancer raises, no audio is lost —
        already-finalized hops are returned by the next push, and the
        failed window is re-processed. In ``latency='low'`` mode the hop
        is one STFT hop (32 ms), not one second."""
        samples = np.asarray(samples, np.float32)
        if getattr(self, "_srv", None) is not None:
            return self._srv.push(samples[None])[0]
        if self._online is not None:
            if self.track:
                # Every full second of received audio advances the
                # forward-Viterbi bearing filter and retargets the
                # compiled per-hop step (traced steer input — no
                # recompile). All histogram samples are already-received
                # past audio, so the update is strictly causal.
                buf = np.concatenate([self._ll_track_buf, samples], axis=1)
                w = self._ll_track_win
                while buf.shape[1] >= w:
                    theta = self._update_track(
                        jnp.asarray(buf[:, :w]), self._zoom_cfg()
                    )
                    self._online.set_direction(theta)
                    buf = buf[:, w:]
                self._ll_track_buf = buf
            return self._online.push(samples)
        out = self._out_pending
        if self._native is not None:
            self._native.push(samples)
            for window in self._native.windows():
                enhanced = to_numpy(self._enhance_window(jnp.asarray(window)))
                done = self._native.commit(enhanced)
                if done.size:
                    out.append(done)
        else:
            self._inbuf = np.concatenate([self._inbuf, samples], axis=1)
            while self._inbuf.shape[1] >= self._win:
                window = self._inbuf[:, : self._win]
                dev = self._enhance_window(jnp.asarray(window))
                if self.pipelined:
                    # Double-buffered: dispatch window N (async — jax
                    # returns immediately), retrieve window N-1 whose
                    # compute overlapped the last inter-push interval.
                    dev, self._pipe_pending = self._pipe_pending, dev
                    self._inbuf = self._inbuf[:, self._hop :]
                    if dev is None:
                        continue
                    self._ola_finalize(to_numpy(dev), out)
                else:
                    self._ola_finalize(to_numpy(dev), out)
                    self._inbuf = self._inbuf[:, self._hop :]
        self._out_pending = []
        return np.concatenate(out) if out else np.zeros(0, np.float32)

    def _ola_finalize(self, enhanced: np.ndarray, out: list) -> None:
        weighted = enhanced * self._window
        head = weighted[: self._hop]
        if self._started:
            out.append((self._tail + head) / self._ola_norm)
        self._tail = weighted[self._hop :]
        self._started = True

    def flush(self) -> np.ndarray:
        """Drain the pipeline (pipelined mode): retrieve and finalize the
        in-flight window. A no-op (empty return) otherwise."""
        if getattr(self, "_pipe_pending", None) is None:
            return np.zeros(0, np.float32)
        out: list[np.ndarray] = []
        dev, self._pipe_pending = self._pipe_pending, None
        self._ola_finalize(to_numpy(dev), out)
        return np.concatenate(out) if out else np.zeros(0, np.float32)
