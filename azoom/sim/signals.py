"""Synthetic speech-like test signals.

The reference downloads LJSpeech / LibriSpeech / MUSAN at runtime via
kagglehub (rt_av_zoom/core/world.py:38-67, Final_pipeline/src/simulation.py:
21-31). This environment has zero egress, so tests, benchmarks, and the
hermetic demo path synthesize *speech-like* signals instead: a voiced
harmonic series with a randomly-walking pitch contour, formant-ish spectral
shaping, syllabic amplitude modulation, and unvoiced noise bursts. These
have the spectro-temporal sparsity that makes IBM masking meaningful (two
talkers rarely dominate the same TF bin), which is all the oracle pipeline
needs to reproduce the reference's ~36 dB oracle-SIR behavior
(readme.md:23).

Everything is a pure jitted function of a PRNG key, so a whole batch of
training scenes is one XLA program (replacing Dataset.__getitem__,
model_training.py:55-92).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "speech_like",
    "speech_like_batch",
    "colored_noise",
    "music_like",
    "babble_like",
    "interferer_signal",
    "INTERFERER_KINDS",
]


@functools.partial(jax.jit, static_argnames=("n_samples", "fs"))
def speech_like(
    key: jax.Array,
    n_samples: int,
    fs: int = 16_000,
    f0_base: float = 160.0,
) -> jnp.ndarray:
    """One synthetic utterance (n_samples,), roughly speech-shaped.

    Components: 12-harmonic voiced source with a smoothed random-walk pitch
    around ``f0_base``, 1/h spectral tilt, two syllable-rate (~3 Hz and
    ~7 Hz) amplitude modulators with random phase, and a high-pass noise
    floor standing in for unvoiced consonants.
    """
    k_f0, k_am1, k_am2, k_noise, k_jit = jax.random.split(key, 5)
    t = jnp.arange(n_samples, dtype=jnp.float32) / fs

    # Pitch contour: smoothed random walk, +/- ~20% around f0_base. The
    # phase integral is computed on the small control grid and linearly
    # interpolated to sample rate (uniform grid -> direct index math, no
    # searchsorted and no length-n cumsum: a length-n scan through the
    # remote TPU compiler took minutes, this compiles instantly).
    n_ctrl = 64
    walk = jnp.cumsum(jax.random.normal(k_f0, (n_ctrl,)) * 0.06)
    walk = walk - jnp.mean(walk)
    f0_ctrl = f0_base * jnp.exp(jnp.clip(walk, -0.35, 0.35))  # (C,)
    dt_ctrl = n_samples / fs / (n_ctrl - 1)
    phase_ctrl = (
        2.0 * jnp.pi * dt_ctrl * jnp.concatenate(
            [jnp.zeros((1,)), jnp.cumsum(0.5 * (f0_ctrl[1:] + f0_ctrl[:-1]))]
        )
    )  # trapezoid integral of f0 on the control grid, (C,)
    pos = jnp.arange(n_samples, dtype=jnp.float32) * ((n_ctrl - 1) / max(n_samples - 1, 1))
    idx = jnp.clip(pos.astype(jnp.int32), 0, n_ctrl - 2)
    frac = pos - idx
    phase0 = phase_ctrl[idx] * (1.0 - frac) + phase_ctrl[idx + 1] * frac

    harmonics = jnp.arange(1, 13, dtype=jnp.float32)
    # Formant-ish envelope: emphasize ~500 Hz and ~1500 Hz regions.
    f_h = harmonics * f0_base
    formant = (
        jnp.exp(-(((f_h - 500.0) / 350.0) ** 2))
        + 0.6 * jnp.exp(-(((f_h - 1500.0) / 500.0) ** 2))
        + 0.15
    )
    amp_h = formant / harmonics
    voiced = jnp.sum(
        amp_h[:, None] * jnp.sin(harmonics[:, None] * phase0[None, :]), axis=0
    )

    # Syllabic AM: product of two raised sinusoids with random rate/phase.
    r1 = 2.0 + 2.0 * jax.random.uniform(k_am1)
    r2 = 5.0 + 4.0 * jax.random.uniform(k_am2)
    p1 = 2.0 * jnp.pi * jax.random.uniform(k_am1)
    p2 = 2.0 * jnp.pi * jax.random.uniform(k_am2)
    am = (0.55 + 0.45 * jnp.sin(2 * jnp.pi * r1 * t + p1)) * (
        0.6 + 0.4 * jnp.sin(2 * jnp.pi * r2 * t + p2)
    )
    am = jnp.maximum(am, 0.0) ** 1.5  # sharpen into syllable bursts

    # Unvoiced noise floor (first-difference ~ high-pass white noise).
    noise = jax.random.normal(k_noise, (n_samples,))
    noise = jnp.diff(noise, prepend=0.0) * 0.02

    x = voiced * am + noise * (0.3 + 0.7 * (1.0 - am))
    return (x / (jnp.max(jnp.abs(x)) + 1e-9)).astype(jnp.float32)


def speech_like_batch(
    key: jax.Array, n_signals: int, n_samples: int, fs: int = 16_000
) -> jnp.ndarray:
    """(n_signals, n_samples) batch with distinct pitch registers so sources
    are spectrally separable (like different talkers)."""
    keys = jax.random.split(key, n_signals)
    f0s = 110.0 * (1.35 ** jnp.arange(n_signals, dtype=jnp.float32))
    f0s = jnp.clip(f0s, 90.0, 320.0)
    return jax.vmap(lambda k, f0: speech_like(k, n_samples, fs, f0))(keys, f0s)


# -- Non-speech interferers (the reference's MUSAN axis) ---------------------
#
# The reference's world generator takes ``--dataset musan`` and draws
# interferers from MUSAN's music/noise corpora (rt_av_zoom/core/
# world.py:38-67). With zero egress these synthesize the same three
# interference *classes* — steady noise textures, harmonic music, and
# multi-talker babble — so the robustness axis exists without the download.


@functools.partial(jax.jit, static_argnames=("n_samples", "fs"))
def colored_noise(
    key: jax.Array,
    n_samples: int,
    fs: int = 16_000,
    slope: float | jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Steady 1/f^slope noise texture (fan/traffic/crowd-floor class).

    ``slope``: spectral exponent; 0 = white, 1 = pink, 2 = brown. Defaults
    to a random draw in [0.5, 1.8] (most environmental noise sits there).
    """
    k_slope, k_noise = jax.random.split(key)
    if slope is None:
        slope = 0.5 + 1.3 * jax.random.uniform(k_slope)
    white = jax.random.normal(k_noise, (n_samples,))
    X = jnp.fft.rfft(white)
    f = jnp.fft.rfftfreq(n_samples, 1.0 / fs)
    shape = jnp.where(f > 0, jnp.maximum(f, 1e-3) ** (-0.5 * slope), 0.0)
    # Keep a 50 Hz high-pass knee so "brown" doesn't become pure DC rumble.
    shape = shape * (1.0 - jnp.exp(-(f / 50.0) ** 2))
    x = jnp.fft.irfft(X * shape, n=n_samples)
    return (x / (jnp.max(jnp.abs(x)) + 1e-9)).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_samples", "fs"))
def music_like(
    key: jax.Array,
    n_samples: int,
    fs: int = 16_000,
    base_hz: float = 220.0,
) -> jnp.ndarray:
    """Harmonic "music" texture: two voices stepping through a pentatonic
    scale with note-rate envelopes and vibrato.

    Unlike speech, the pitch is piecewise-stable (notes, not glides), the
    harmonic stack is richer and not formant-shaped, and the amplitude
    envelope follows the note grid rather than syllables — the spectro-
    temporal statistics that make music a distinct interference class.
    """
    k_notes, k_det, k_env, k_vib = jax.random.split(key, 4)
    t = jnp.arange(n_samples, dtype=jnp.float32) / fs
    dur = n_samples / fs
    n_notes = max(int(dur * 3), 2)  # ~3 notes/second

    # Pentatonic scale steps (semitones) chosen by a bounded random walk.
    penta = jnp.asarray([0.0, 2.0, 4.0, 7.0, 9.0, 12.0])
    steps = jax.random.randint(k_notes, (n_notes,), 0, 6)
    semis = penta[steps]
    note_f0 = base_hz * 2.0 ** (semis / 12.0)  # (N,)

    # Sample-rate note index (piecewise constant pitch).
    pos = jnp.clip(
        (t / dur * n_notes).astype(jnp.int32), 0, n_notes - 1
    )
    f0_t = note_f0[pos]
    vib = 1.0 + 0.004 * jnp.sin(
        2 * jnp.pi * 5.5 * t + 2 * jnp.pi * jax.random.uniform(k_vib)
    )
    phase = 2.0 * jnp.pi * jnp.cumsum(f0_t * vib) / fs

    # Note envelope: attack/decay within each note slot.
    frac = (t / dur * n_notes) - pos
    env = jnp.minimum(frac / 0.08, 1.0) * jnp.exp(-2.2 * frac)

    harmonics = jnp.arange(1, 9, dtype=jnp.float32)
    amp_h = 1.0 / harmonics**1.5
    voice1 = jnp.sum(
        amp_h[:, None] * jnp.sin(harmonics[:, None] * phase[None, :]), axis=0
    )
    # Second voice a fifth above, detuned a few cents, its own level.
    det = 1.5 * (1.0 + 0.002 * (jax.random.uniform(k_det) - 0.5))
    voice2 = jnp.sum(
        amp_h[:, None] * jnp.sin(harmonics[:, None] * det * phase[None, :]),
        axis=0,
    )
    bal = 0.4 + 0.3 * jax.random.uniform(k_env)
    x = env * (voice1 + bal * voice2)
    return (x / (jnp.max(jnp.abs(x)) + 1e-9)).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_samples", "fs", "n_talkers"))
def babble_like(
    key: jax.Array,
    n_samples: int,
    fs: int = 16_000,
    n_talkers: int = 6,
) -> jnp.ndarray:
    """Multi-talker babble: the sum of ``n_talkers`` independent
    speech-like streams — spectrally speech but with the TF sparsity
    filled in (few gaps for a mask to exploit), the classic hard
    interference for mask-based enhancement."""
    kf, ks = jax.random.split(key)
    f0s = jax.random.uniform(kf, (n_talkers,), minval=95.0, maxval=300.0)
    keys = jax.random.split(ks, n_talkers)
    x = jnp.sum(
        jax.vmap(lambda k, f0: speech_like(k, n_samples, fs, f0))(keys, f0s),
        axis=0,
    )
    return (x / (jnp.max(jnp.abs(x)) + 1e-9)).astype(jnp.float32)


INTERFERER_KINDS = ("speech", "babble", "music", "noise")


def interferer_signal(
    key: jax.Array,
    n_samples: int,
    fs: int = 16_000,
    kind: str = "speech",
    f0: float | jnp.ndarray = 160.0,
) -> jnp.ndarray:
    """One interferer of the requested class (``kind`` is static — each
    class is its own compiled program, like the reference's --dataset
    switch selects a corpus)."""
    if kind == "speech":
        return speech_like(key, n_samples, fs, f0)
    if kind == "babble":
        return babble_like(key, n_samples, fs)
    if kind == "music":
        return music_like(key, n_samples, fs)
    if kind == "noise":
        return colored_noise(key, n_samples, fs)
    if kind == "mixed":
        # Uniform random class PER DRAW, traced (one compiled program
        # covers all four): the robustness-training distribution for the
        # reference's MUSAN axis (world.py:38-67 --dataset switch).
        k_kind, k_sig = jax.random.split(key)
        idx = jax.random.randint(k_kind, (), 0, len(INTERFERER_KINDS))
        return jax.lax.switch(idx, [
            lambda k: speech_like(k, n_samples, fs, f0),
            lambda k: babble_like(k, n_samples, fs),
            lambda k: music_like(k, n_samples, fs),
            lambda k: colored_noise(k, n_samples, fs),
        ], k_sig)
    raise ValueError(
        f"unknown interferer kind {kind!r}; have "
        f"{INTERFERER_KINDS + ('mixed',)}"
    )
