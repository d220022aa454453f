"""Library-grade scene simulation: reverb/anechoic mixtures with answer keys.

TPU-native rebuild of ``generate_scene`` (Final_pipeline/src/simulation.py:
58-219) and the gen-1 world generator (rt_av_zoom/core/world.py:112-268):

  * room mode: image-source RIRs (azoom.sim.room) convolved with each
    source at each mic,
  * anechoic mode: far-field fractional-delay mixing (azoom.sim.farfield),
  * SIR control: scale interferers so ch-1 powers hit the target SIR
    (simulation.py:167-179),
  * SNR control: AWGN at a target SNR per channel (simulation.py:47-56),
  * global peak normalization of the noisy mixture, shared with the stems
    so oracle masks and metrics see consistent scales (simulation.py:193-202).

Pure function of a PRNG key -> a dict of arrays; the CLI layer handles WAV
persistence. Batched scene generation = vmap over keys.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

from azoom.config import RoomConfig
from azoom.sim.room import fft_convolve, inverse_sabine, rir_matrix
from azoom.sim.signals import interferer_signal, speech_like

__all__ = ["add_awgn", "apply_sir_gain", "simulate_room_scene", "generate_scene"]


def add_awgn(key: jax.Array, signal: jnp.ndarray, snr_db: float) -> jnp.ndarray:
    """Gaussian noise at a target SNR (simulation.py:47-56)."""
    sig_power = jnp.mean(signal**2, axis=-1, keepdims=True)
    noise_power = sig_power / (10.0 ** (snr_db / 10.0))
    noise = jax.random.normal(key, signal.shape) * jnp.sqrt(noise_power)
    return signal + noise


def apply_sir_gain(
    target_ch0: jnp.ndarray, interf: jnp.ndarray, sir_db: float, eps: float = 1e-12
) -> jnp.ndarray:
    """Gain applied to the summed interference so that
    10 log10(P_tgt / (g^2 P_int)) = sir_db, measured on channel 0
    (simulation.py:167-179). interf: (..., M, n)."""
    p_t = jnp.mean(target_ch0**2, axis=-1)
    p_i = jnp.mean(interf[..., 0, :] ** 2, axis=-1) + eps
    desired = 10.0 ** (sir_db / 10.0)
    gain = jnp.sqrt(p_t / (p_i * desired))
    return interf * gain[..., None, None]


def simulate_room_scene(
    key: jax.Array,
    target_sig: jnp.ndarray,
    interferer_sigs: jnp.ndarray,
    room: RoomConfig,
    reverb: bool = True,
    snr_db: float = 50.0,
    fs: int = 16_000,
    max_order: int | None = None,
) -> dict:
    """Room-acoustics scene from given source signals.

    Args:
      target_sig: (n,) mono target.
      interferer_sigs: (K, n) interferers; first is placed at the fixed
        ~40 deg position, the rest uniformly random inside the room with
        1 m wall margin (simulation.py:126-134).

    Returns dict: mixture (M, n), target_ref (n,), interference_ref (n,)
    (channel-0 stems), plus 'rirs' (S, M, L).
    """
    n = target_sig.shape[-1]
    K = interferer_sigs.shape[0] if interferer_sigs.ndim > 1 else 0
    mics = jnp.asarray(room.mic_locs, jnp.float32)

    k_pos, k_noise0, k_noise1 = jax.random.split(key, 3)
    positions = [jnp.asarray(room.target_pos, jnp.float32)]
    if K >= 1:
        positions.append(jnp.asarray(room.interferer_pos_fixed, jnp.float32))
    if K >= 2:
        dims = jnp.asarray(room.room_dim, jnp.float32)
        # Uniform in [1, L-1] per horizontal axis, fixed 1.5 m height
        # (simulation.py:131-134).
        rnd = 1.0 + jax.random.uniform(k_pos, (K - 1, 2)) * (dims[:2] - 2.0)
        positions.extend(
            [jnp.concatenate([rnd[i], jnp.asarray([1.5])]) for i in range(K - 1)]
        )
    sources = jnp.stack(positions)  # (S, 3)

    if reverb:
        absorption = inverse_sabine(room.rt60_target, room.room_dim)
        order = room.max_order if max_order is None else max_order
    else:
        absorption = 1.0  # beta = 0: direct path only (simulation.py:115-117)
        order = 0
    rir_len = min(int(0.6 * fs), n)
    rirs = rir_matrix(
        sources, mics, room.room_dim, absorption, order, fs, rir_len
    )  # (S, M, L)

    sigs = jnp.concatenate(
        [target_sig[None], interferer_sigs.reshape(K, n)] if K else [target_sig[None]]
    )  # (S, n)
    # Convolve every (source, mic) pair; (S, M, n).
    wet = fft_convolve(sigs[:, None, :], rirs, n)

    target = wet[0]  # (M, n)
    if K:
        interf = jnp.sum(wet[1:], axis=0)  # (M, n)
        interf = apply_sir_gain(target[0], interf, room.sir_target_db)
    else:
        interf = jnp.zeros_like(target)

    clean_mix = target + interf  # (M, n), any mic count
    if clean_mix.shape[0] == 2:
        # Keep the historical 2-mic key assignment bit-for-bit.
        noise_keys = jnp.stack([k_noise0, k_noise1])
    else:
        noise_keys = jax.random.split(k_noise0, clean_mix.shape[0])
    noisy = jax.vmap(add_awgn, in_axes=(0, 0, None))(
        noise_keys, clean_mix, snr_db
    )

    peak = jnp.max(jnp.abs(noisy)) + 1e-9
    return {
        "mixture": noisy / peak,
        "target_ref": target[0] / peak,
        "interference_ref": interf[0] / peak,
        "target_stereo": target / peak,
        "interference_stereo": interf / peak,
        "rirs": rirs,
    }


@dataclasses.dataclass(frozen=True)
class SceneSpec:
    """Static knobs of generate_scene (mirrors the reference CLI surface).

    ``interferer_kind`` is the reference's ``--dataset`` corpus switch
    (world.py:38-67: ljspeech/librispeech vs musan music/noise) mapped to
    the synthetic signal classes: 'speech' | 'babble' | 'music' | 'noise'.
    """

    reverb: bool = True
    n_interferers: int = 1
    snr_db: float = 50.0
    duration_s: float = 4.0
    fs: int = 16_000
    interferer_kind: str = "speech"


def generate_scene(
    key: jax.Array,
    spec: SceneSpec = SceneSpec(),
    room: RoomConfig = RoomConfig(),
    source_signals: jnp.ndarray | None = None,
    max_order: int | None = None,
) -> dict:
    """Full scene generation from a PRNG key — the library equivalent of
    ``python run.py sim`` (run.py:29-38). Sources default to synthetic
    speech-like utterances (no corpus download in this environment)."""
    n = int(spec.duration_s * spec.fs)
    k_sig, k_scene = jax.random.split(key)
    if source_signals is None:
        keys = jax.random.split(k_sig, spec.n_interferers + 1)
        f0s = jnp.asarray([150.0, 220.0, 120.0, 260.0, 180.0])
        source_signals = jnp.stack(
            [speech_like(keys[0], n, spec.fs, float(f0s[0]))]
            + [
                interferer_signal(
                    keys[i], n, spec.fs, spec.interferer_kind,
                    float(f0s[i % 5]),
                )
                for i in range(1, spec.n_interferers + 1)
            ]
        )
    return simulate_room_scene(
        k_scene,
        source_signals[0],
        source_signals[1:],
        room,
        reverb=spec.reverb,
        snr_db=spec.snr_db,
        fs=spec.fs,
        max_order=max_order,
    )
