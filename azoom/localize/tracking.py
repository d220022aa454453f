"""DOA tracking over time: smooth azimuth trajectories from noisy
per-chunk angular spectra.

The reference localizes once per recording (scripts/debug_srp.py scans a
whole file); azoom's autosteer (azoom.pipelines.autosteer) likewise uses
one whole-utterance DOA. A moving talker / panning camera needs a
*trajectory*: per-chunk angular spectra (azoom.localize.srp.
ipd_angle_histogram) are noisy — a chunk where an interferer out-talks the
target votes for the wrong mode — so the per-chunk argmax zig-zags. The
trackers here impose temporal coherence:

- `viterbi_track` (offline / utmost accuracy): the max-a-posteriori angle
  path through the (chunk x angle) trellis under a Gaussian angular-rate
  motion model. TPU shape: the trellis step is a dense (A, A) max-plus
  product inside a lax.scan — the angle axis stays a vector lane axis, no
  data-dependent control flow.
- `causal_track` (streaming / default for live use): forward-Viterbi
  *filtering* — the same trellis as `viterbi_track`, but the running score
  vector's argmax is emitted per chunk with no backtracking, so chunk c's
  estimate uses only chunks <= c. Keeping the full posterior over angles
  is what makes it robust: a transient wrong peak perturbs one term of an
  accumulating score instead of hijacking a point estimate. Optional
  `lag` (fixed-lag smoothing: near-MAP accuracy at a bounded steering
  delay) and `init_prior_sigma_deg` (camera aiming prior on the first
  chunk) close most of the remaining gap to the offline path.
- `ema_track` (causal, legacy): gated-peak pick + exponential smoothing.
  Each chunk only looks at histogram mass within a rate-limited window
  around the previous estimate. Cheap, but a wrong early lock is
  unrecoverable — the rate gate then *excludes* the true talker (measured:
  a 12 s glide scene where EMA scores −4.7 dB while the forward-Viterbi
  filter recovers to +18.2 dB, within 8 dB of the offline MAP path's
  +26.6; RESULTS.md "Moving-talker").

Both accept the camera field-of-view as a scalar or a per-chunk array
(a panning camera is a trajectory of FOV centers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "viterbi_track",
    "causal_track",
    "ema_track",
    "momentum_track",
    "track_two_sources",
]


def _emissions(
    angles: jnp.ndarray,
    hists: jnp.ndarray,
    fov_center_deg,
    fov_width_deg: float,
    floor: float,
) -> jnp.ndarray:
    """Log-probability emissions (C, A) from raw histograms, FOV-gated.

    Each chunk's histogram is normalized to a distribution over angles;
    a floor keeps silent/ambiguous chunks from dominating the path with
    -inf spikes. fov_center_deg may be a scalar or (C,) trajectory.
    """
    hists = jnp.maximum(hists, 0.0)
    p = hists / (jnp.sum(hists, axis=-1, keepdims=True) + 1e-20)
    emis = jnp.log(p + floor)
    if fov_center_deg is not None:
        center = jnp.asarray(fov_center_deg, jnp.float32)
        in_fov = (
            jnp.abs(angles - center[..., None]) <= fov_width_deg / 2.0
        )  # (A,) or (C, A)
        emis = jnp.where(in_fov, emis, -1e9)
    return emis


@functools.partial(
    jax.jit, static_argnames=("fov_width_deg", "trans_sigma_deg", "floor")
)
def viterbi_track(
    angles: jnp.ndarray,
    hists: jnp.ndarray,
    trans_sigma_deg: float = 12.0,
    fov_center_deg: float | jnp.ndarray | None = None,
    fov_width_deg: float = 180.0,
    floor: float = 1e-6,
) -> jnp.ndarray:
    """MAP angle path through the chunk-time angular-spectrum trellis.

    Args:
      angles: (A,) the angle grid of the histograms (degrees).
      hists: (C, A) per-chunk angular spectra (non-negative; e.g.
        ipd_angle_histogram per 2 s chunk).
      trans_sigma_deg: motion-model scale — the Gaussian log-penalty on the
        azimuth change between consecutive chunks. 12 deg/chunk at a 1 s
        chunk hop admits a fast walking talker (~1 m/s at 2 m range)
        while suppressing mode-hops to interferers tens of degrees away.
      fov_center_deg / fov_width_deg: optional camera FOV gate; center may
        be a per-chunk (C,) trajectory (panning camera).
      floor: emission probability floor (silent-chunk robustness).

    Returns: (C,) tracked azimuth per chunk (degrees).
    """
    emis = _emissions(angles, hists, fov_center_deg, fov_width_deg, floor)
    emis = jnp.broadcast_to(emis, hists.shape)  # (C, A)
    diff = angles[:, None] - angles[None, :]  # (A_prev -> A_next)
    trans = -0.5 * (diff / trans_sigma_deg) ** 2  # (A, A)

    def step(score_prev, emis_c):
        # score_prev: (A,) best log-prob of any path ending at each angle.
        cand = score_prev[:, None] + trans  # (A_prev, A_next)
        bp = jnp.argmax(cand, axis=0)  # (A_next,)
        score = jnp.max(cand, axis=0) + emis_c
        # Re-zero to keep scores from drifting to -inf on long streams.
        score = score - jnp.max(score)
        return score, bp

    score0 = emis[0] - jnp.max(emis[0])
    score_last, bps = jax.lax.scan(step, score0, emis[1:])  # bps (C-1, A)

    last = jnp.argmax(score_last)

    # Backtrack: bps[c-1] maps the state at chunk c to its predecessor at
    # chunk c - 1. Emitting the PREDECESSOR (not the carry) makes the
    # reverse-scan outputs land at [s_0 .. s_{C-2}] — the carry-emitting
    # variant dropped chunk 0's state and duplicated the last one
    # (ADVICE r4: a clean 30->80 ridge tracked as [40..80, 80]).
    def back(idx, bp):
        prev = bp[idx]
        return prev, prev

    _, path_rev = jax.lax.scan(back, last, bps, reverse=True)
    path = jnp.concatenate([path_rev, jnp.asarray([last])])
    return angles[path]


@functools.partial(
    jax.jit,
    static_argnames=(
        "fov_width_deg", "trans_sigma_deg", "floor", "lag",
        "init_prior_sigma_deg",
    ),
)
def causal_track(
    angles: jnp.ndarray,
    hists: jnp.ndarray,
    trans_sigma_deg: float = 12.0,
    fov_center_deg: float | jnp.ndarray | None = None,
    fov_width_deg: float = 180.0,
    floor: float = 1e-6,
    lag: int = 0,
    init_prior_sigma_deg: float | None = None,
) -> jnp.ndarray:
    """Forward-Viterbi filtering: the causal counterpart of viterbi_track.

    Runs the identical max-plus trellis recursion but emits the running
    score vector's argmax at every chunk instead of backtracking from the
    end — chunk c's bearing uses only chunks <= c, so the same scan step
    can be carried across streaming windows (AudioZoom.push does exactly
    this with the score vector as the tracker state).

    Two robustness knobs beyond plain filtering:
      lag: fixed-lag smoothing — chunk c's bearing may use chunks
        <= c + lag (backtracked ``lag`` steps from the running argmax),
        i.e. a steering decision delayed by ``lag`` chunk hops. lag=0 is
        pure filtering; lag=2 matches the steering-at-ground-truth
        ceiling on the moving study (+26.6 dB mean vs +23.7 filtering,
        +26.5 vs +18.2 on the wrong-first-peak scene; RESULTS.md
        "Moving-talker").
      init_prior_sigma_deg: Gaussian aiming prior (stddev, degrees) on
        the FIRST chunk's emissions, centered at the camera axis
        (fov_center_deg's first value) — the same prior
        azoom.pipelines.autosteer applies statically. The user aims the
        camera at the talker when the zoom starts, so a distractor
        out-talking the target in chunk 0 (the one chunk with no
        temporal context) should not win the initial lock. Measured
        +26.7 dB mean on the moving study at ZERO added latency —
        slightly better than lag=2 — so the camera pipelines default it
        on (sigma = FOV/5).

    Returns: (C,) tracked azimuth per chunk (degrees).
    """
    emis = _emissions(angles, hists, fov_center_deg, fov_width_deg, floor)
    emis = jnp.broadcast_to(emis, hists.shape)  # (C, A)
    if init_prior_sigma_deg is not None and fov_center_deg is not None:
        center0 = jnp.reshape(
            jnp.asarray(fov_center_deg, jnp.float32), (-1,)
        )[0]
        prior0 = -0.5 * ((angles - center0) / init_prior_sigma_deg) ** 2
        emis = emis.at[0].add(prior0)
    diff = angles[:, None] - angles[None, :]
    trans = -0.5 * (diff / trans_sigma_deg) ** 2  # (A, A)

    def step(score_prev, emis_c):
        cand = score_prev[:, None] + trans  # (A_prev, A_next)
        bp = jnp.argmax(cand, axis=0)  # (A_next,)
        score = jnp.max(cand, axis=0) + emis_c
        score = score - jnp.max(score)
        return score, (score, bp)

    score0 = emis[0] - jnp.max(emis[0])
    _, (scores, bps) = jax.lax.scan(step, score0, emis[1:])
    scores = jnp.concatenate([score0[None], scores])  # (C, A)
    if lag == 0:
        return angles[jnp.argmax(scores, axis=-1)]

    # Fixed-lag smoothing: decide chunk c from the trellis at
    # ce = min(c + lag, C - 1), backtracking ce - c steps. bp_all[c] maps
    # the state at chunk c to its predecessor at c - 1 (identity row for
    # c = 0, never followed).
    C, A = scores.shape
    bp_all = jnp.concatenate(
        [jnp.arange(A, dtype=bps.dtype)[None], bps]
    )  # (C, A)
    idx = jnp.arange(C)
    pos = jnp.minimum(idx + lag, C - 1)
    state = jnp.argmax(scores[pos], axis=-1)  # (C,)
    for _ in range(lag):  # lag is static and small: unrolled gathers
        move = pos > idx
        state = jnp.where(move, bp_all[pos, state], state)
        pos = jnp.where(move, pos - 1, pos)
    return angles[state]


@functools.partial(
    jax.jit,
    static_argnames=(
        "trans_sigma_deg", "rate_deg_per_chunk", "switch_penalty",
        "fov_width_deg", "floor", "causal", "init_prior_sigma_deg",
    ),
)
def momentum_track(
    angles: jnp.ndarray,
    hists: jnp.ndarray,
    trans_sigma_deg: float = 3.0,
    rate_deg_per_chunk: float = 6.0,
    switch_penalty: float = 12.0,
    fov_center_deg: float | jnp.ndarray | None = None,
    fov_width_deg: float = 180.0,
    floor: float = 1e-6,
    causal: bool = False,
    init_prior_sigma_deg: float | None = None,
) -> jnp.ndarray:
    """Viterbi DOA tracking with a DIRECTION (momentum) state.

    Why it exists (round-4 crossing-trajectory item): with a
    position-only Gaussian motion model, two talkers whose bearings
    CROSS are fundamentally ambiguous — the "sail through" path and the
    "bounce off" (identity-swap) path visit angle sequences of identical
    per-step cost, so `viterbi_track`/`causal_track` break the tie on
    emission noise and can swap identities at the crossing. Augmenting
    each state with a coarse direction d in {-1, 0, +1} restores
    velocity continuity: continuing in the current direction is cheap,
    reversing pays `switch_penalty` (in log-prob units per unit
    direction change), so the MAP path carries the talker THROUGH the
    crossing instead of bouncing.

    Transition model on states (d, theta):
      cost = -((theta' - theta - d' * rate) / sigma)^2 / 2
             - switch_penalty * |d' - d|
    i.e. direction d' predicts a step of d' * rate_deg_per_chunk
    degrees per chunk hop, and direction changes are sticky.

    Tuning (round-4 crossing study, real audio): identity retention
    needs the regime sigma ~ rate / 2 (a loose sigma lets the +1 state
    follow the DESCENDING distractor ridge cheaply), switch_penalty >=
    ~12 (the post-crossing emission gap to a louder distractor is
    ~1 nat/chunk — the one-time reversal cost must beat its
    accumulation), and a TIGHT first-chunk aiming prior (sigma ~ 8 deg:
    the camera is ON the talker at zoom start; the FOV/5 static default
    is too weak against a louder distractor inside the FOV). With
    sigma=3 / rate=5.5 / switch=12 / prior=8 all three crossing scenes
    track through the intersection offline AND causally (max ~7 deg
    error) where every position-only tracker swapped.

    Args mirror viterbi_track/causal_track; `causal=True` runs the
    forward filtering variant (streaming), `init_prior_sigma_deg`
    applies the camera aiming prior to chunk 0 (requires
    fov_center_deg).

    Returns: (C,) tracked azimuth per chunk (degrees).
    """
    emis = _emissions(angles, hists, fov_center_deg, fov_width_deg, floor)
    emis = jnp.broadcast_to(emis, hists.shape)  # (C, A)
    if init_prior_sigma_deg is not None and fov_center_deg is not None:
        center0 = jnp.reshape(
            jnp.asarray(fov_center_deg, jnp.float32), (-1,)
        )[0]
        prior0 = -0.5 * ((angles - center0) / init_prior_sigma_deg) ** 2
        emis = emis.at[0].add(prior0)
    A = angles.shape[0]
    dirs = jnp.asarray([-1.0, 0.0, 1.0], jnp.float32)
    D = 3
    # (D', A_prev, A_next): step cost under each new direction
    step = angles[None, :] - angles[:, None]  # (A_prev, A_next)
    expected = dirs[:, None, None] * rate_deg_per_chunk
    step_cost = -0.5 * ((step[None] - expected) / trans_sigma_deg) ** 2
    # (D, D'): direction stickiness
    switch = -switch_penalty * jnp.abs(dirs[:, None] - dirs[None, :])
    # trans[(d, a) -> (d', a')] flattened to (D*A, D*A)
    trans = (
        switch[:, None, :, None] + step_cost[None, :, :, :].transpose(0, 2, 1, 3)
    )
    # indices: [d, a_prev, d', a_next]
    trans = trans.reshape(D * A, D * A)
    emis_s = jnp.tile(emis, (1, D))  # (C, D*A) — emissions direction-blind

    def step_fn(score_prev, emis_c):
        cand = score_prev[:, None] + trans
        bp = jnp.argmax(cand, axis=0)
        score = jnp.max(cand, axis=0) + emis_c
        score = score - jnp.max(score)
        return score, (score, bp)

    score0 = emis_s[0] - jnp.max(emis_s[0])
    _, (scores, bps) = jax.lax.scan(step_fn, score0, emis_s[1:])
    scores = jnp.concatenate([score0[None], scores])  # (C, D*A)

    if causal:
        return angles[jnp.argmax(scores, axis=-1) % A]

    last = jnp.argmax(scores[-1])

    # Predecessor-emitting backtrack — see viterbi_track for why.
    def back(idx, bp):
        prev = bp[idx]
        return prev, prev

    _, path_rev = jax.lax.scan(back, last, bps, reverse=True)
    path = jnp.concatenate([path_rev, jnp.asarray([last])])
    return angles[path % A]


@functools.partial(
    jax.jit,
    static_argnames=(
        "trans_sigma_deg", "rate_deg_per_chunk", "switch_penalty",
        "fov_width_deg", "floor", "causal", "init_prior_sigma_deg",
        "exclusion_deg",
    ),
)
def track_two_sources(
    angles: jnp.ndarray,
    hists: jnp.ndarray,
    trans_sigma_deg: float = 3.0,
    rate_deg_per_chunk: float = 6.0,
    switch_penalty: float = 12.0,
    fov_center_deg: float | jnp.ndarray | None = None,
    fov_width_deg: float = 180.0,
    floor: float = 1e-6,
    causal: bool = False,
    init_prior_sigma_deg: float | None = None,
    exclusion_deg: float = 10.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Two-hypothesis tracking: the target track plus a second track.

    Greedy sequential assignment (track-before-detect style): the TARGET
    path is momentum-tracked first (with the camera aiming prior when
    given — the user points the camera at the talker at zoom start);
    its +/- exclusion_deg corridor is then suppressed from the angular
    spectra and the second source is momentum-tracked on the residual.
    Both tracks therefore stay coherent through a bearing crossing: the
    momentum state carries each THROUGH the intersection (see
    momentum_track), and the exclusion keeps track 2 from collapsing
    onto track 1.

    Returns: (target_path (C,), other_path (C,)) in degrees.
    """
    kw = dict(
        trans_sigma_deg=trans_sigma_deg,
        rate_deg_per_chunk=rate_deg_per_chunk,
        switch_penalty=switch_penalty,
        fov_width_deg=fov_width_deg,
        floor=floor,
        causal=causal,
    )
    target = momentum_track(
        angles, hists, fov_center_deg=fov_center_deg,
        init_prior_sigma_deg=init_prior_sigma_deg, **kw
    )
    # Suppress the target corridor; track the strongest residual source.
    # (No FOV gate for the second track: the interferer may be outside
    # the camera's zoom window.)
    keep = jnp.abs(angles[None, :] - target[:, None]) > exclusion_deg
    residual = jnp.where(keep, jnp.maximum(hists, 0.0), 0.0)
    other = momentum_track(angles, residual, fov_center_deg=None, **kw)
    return target, other


@functools.partial(
    jax.jit,
    static_argnames=("rate_deg_per_chunk", "alpha", "fov_width_deg", "floor"),
)
def ema_track(
    angles: jnp.ndarray,
    hists: jnp.ndarray,
    rate_deg_per_chunk: float = 20.0,
    alpha: float = 0.6,
    fov_center_deg: float | jnp.ndarray | None = None,
    fov_width_deg: float = 180.0,
    floor: float = 1e-6,
) -> jnp.ndarray:
    """Causal tracker: rate-gated peak pick + exponential smoothing.

    The first chunk initializes from the (FOV-gated) global peak; each
    later chunk picks the histogram peak within ±rate_deg_per_chunk of the
    previous estimate (rejecting interferer-mode capture) and blends
    ``theta <- alpha * peak + (1 - alpha) * theta``. Runs as a lax.scan —
    usable chunk-by-chunk in the streaming/low-latency runtime.

    Returns: (C,) tracked azimuth per chunk (degrees).
    """
    emis = _emissions(angles, hists, fov_center_deg, fov_width_deg, floor)
    emis = jnp.broadcast_to(emis, hists.shape)
    theta0 = angles[jnp.argmax(emis[0])]

    def step(theta, emis_c):
        gated = jnp.where(
            jnp.abs(angles - theta) <= rate_deg_per_chunk, emis_c, -1e9
        )
        peak = angles[jnp.argmax(gated)]
        theta = alpha * peak + (1.0 - alpha) * theta
        return theta, theta

    _, path = jax.lax.scan(step, theta0, emis[1:])
    return jnp.concatenate([theta0[None], path])
