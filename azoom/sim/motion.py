"""Moving-source far-field synthesis (time-varying DOA).

The reference's world builders place every source at a FIXED azimuth for
the whole clip (world_building.py:61-93, simulation.py:105-144) — the
"visual zoom" target never moves. Real audio-visual zooming must follow a
walking talker / panning camera, so azoom adds time-varying-DOA scene
synthesis: the trajectory is sampled per block, each Hann-windowed 50 %-
overlap block is rendered with its block's static far-field fractional
delays (azoom.dsp.delays.fractional_delay), and the blocks are crossfaded
by overlap-add. Block-crossfaded delay switching is the standard
time-varying-filter construction: within a block the scene is exactly the
anechoic far-field model, and across blocks the Hann ramps interpolate the
two delayed images, so the rendered DOA glides smoothly between block
anchors.

TPU shape: the (block x source x mic) delay grid is one batched
fractional_delay call (small rfft pairs on the VPU) and the overlap-add is
a lax.scan — the whole moving scene, stems included, is one jitted
program, same as the static `make_scene`.

Note on the per-segment circular delay: fractional_delay applies an rfft
phase ramp, which is circular over the segment. The far-field TDOA is at
most mic_dist/c (≈ 3.7 samples at 16 kHz / 8 cm), and the Hann window
tapers each segment to zero at its edges, so the wrapped samples are
numerically negligible (verified against the static renderer in
tests/test_motion.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from azoom.dsp.delays import far_field_delays, fractional_delay

__all__ = [
    "traj_block_count",
    "linear_trajectory",
    "mix_far_field_moving",
    "make_moving_scene",
    "make_moving_room_scene",
]


def traj_block_count(n_samples: int, block: int) -> int:
    """Number of trajectory anchor blocks a clip of n_samples needs at the
    given block hop (one anchor per `block` samples, ceil)."""
    return -(-n_samples // block)


def linear_trajectory(
    start_deg: float, end_deg: float, n_blocks: int
) -> jnp.ndarray:
    """(B,) azimuth anchors gliding linearly from start to end."""
    return jnp.linspace(start_deg, end_deg, n_blocks, dtype=jnp.float32)


def _moving_images(
    sources: jnp.ndarray,
    angle_traj_deg: jnp.ndarray,
    mic_dist: float,
    c: float,
    n_mics: int,
    fs: float,
    block: int,
) -> jnp.ndarray:
    """Per-source per-mic time-varying delayed images.

    Args:
      sources: (S, n) mono source signals.
      angle_traj_deg: (S, B) per-block azimuth anchors (B =
        traj_block_count(n, block)); a static source is a constant row.

    Returns:
      (S, M, n) images: source s as heard at mic m while gliding along its
      trajectory.
    """
    S, n = sources.shape
    B = traj_block_count(n, block)
    seg = 2 * block
    # Periodic Hann: w[t] + w[t + block] = 1 exactly (50 % COLA). The
    # source is padded with one leading block of zeros and rendered with
    # B + 1 windows, so EVERY sample of the original range sits under two
    # windows summing to exactly 1 — no edge normalization, no divide-by-
    # near-zero at the taper feet.
    t = jnp.arange(seg, dtype=jnp.float32)
    w = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * t / seg)

    padded = (B + 2) * block
    xp = jnp.pad(sources, ((0, 0), (block, padded - n - block)))
    starts = jnp.arange(B + 1) * block

    segs = jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(xp, s, seg, axis=-1)
    )(starts)  # (B+1, S, seg)
    segs = segs * w

    # Window b peaks at original sample (b - 1/2) * block; anchor it with
    # edge replication so block k of the ORIGINAL timeline crossfades
    # between anchors k and k+1 (half-block phase shift, exact for
    # constant rows and a smooth glide otherwise).
    traj = jnp.broadcast_to(
        jnp.asarray(angle_traj_deg, jnp.float32), (S, B)
    )  # (S, B)
    traj = jnp.concatenate([traj[:, :1], traj], axis=1).T  # (B+1, S)
    tau = far_field_delays(traj, mic_dist, c, n_mics)  # (B+1, S, M)
    delayed = fractional_delay(segs[:, :, None, :], tau, fs)  # (B+1, S, M, seg)

    def body(out, inp):
        s, seg_bsm = inp
        cur = jax.lax.dynamic_slice_in_dim(out, s, seg, axis=-1)
        out = jax.lax.dynamic_update_slice_in_dim(
            out, cur + seg_bsm, s, axis=-1
        )
        return out, None

    out0 = jnp.zeros((S, n_mics, padded), sources.dtype)
    out, _ = jax.lax.scan(body, out0, (starts, delayed))
    return out[..., block : block + n]


@functools.partial(
    jax.jit, static_argnames=("mic_dist", "fs", "c", "n_mics", "block")
)
def mix_far_field_moving(
    sources: jnp.ndarray,
    angle_traj_deg: jnp.ndarray,
    mic_dist: float,
    fs: float,
    c: float = 343.0,
    n_mics: int = 2,
    block: int = 2048,
) -> jnp.ndarray:
    """Mix S moving far-field sources into an M-mic observation.

    Args:
      sources: (S, n) mono source signals.
      angle_traj_deg: (S, B) per-block azimuths, B = traj_block_count(n,
        block). Constant rows reproduce `mix_far_field` (verified to
        tolerance in tests/test_motion.py).
      block: trajectory anchor hop in samples (2048 = 128 ms @ 16 kHz).

    Returns: (M, n) mixture.
    """
    return jnp.sum(
        _moving_images(
            sources, angle_traj_deg, mic_dist, c, n_mics, fs, block
        ),
        axis=0,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "room", "fs", "block", "radius", "snr_db", "max_order", "reverb",
    ),
)
def make_moving_room_scene(
    key: jax.Array,
    target: jnp.ndarray,
    interferers: jnp.ndarray,
    target_traj_deg: jnp.ndarray,
    room,
    fs: int = 16_000,
    block: int = 2048,
    radius: float = 1.0,
    snr_db: float = 50.0,
    max_order: int | None = None,
    reverb: bool = True,
):
    """MOVING talker in a reverberant shoebox room (image-source model).

    The reverberant twin of :func:`make_moving_scene` and the moving twin
    of :func:`azoom.sim.scene.simulate_room_scene`: the target walks a
    circle of ``radius`` meters around the mic-array center along the
    ``target_traj_deg`` azimuth anchors ((B,), one per ``block`` samples;
    azimuth convention matches the far-field model — 90 deg = broadside),
    and each Hann-windowed 50 %-overlap block is convolved with the FULL
    image-source RIR at its block's position, then crossfaded by
    overlap-add — the same time-varying-filter construction as the
    anechoic builder, with per-block room acoustics instead of per-block
    fractional delays (reverberant tails ride the overlap-add past each
    block boundary, exactly as a time-varying FIR state would).
    Interferers are STATIC, placed as `simulate_room_scene` places them
    (first at the fixed reference position, the rest uniformly random
    with 1 m wall margins — simulation.py:126-134).

    Args:
      key: PRNG key (random interferer placement + sensor noise).
      target: (n,) dry target; interferers: (K, n) dry interferers.
      room: RoomConfig (hashable; closed over at trace time).
      max_order: ISM reflection order override (room.max_order default;
        tests use a small order to bound the image lattice on CPU).

    Returns dict: mixture (M, n), target_ref / interference_ref (n,)
    channel-0 stems sharing the mixture's peak normalization.
    """
    from azoom.sim.room import fft_convolve, inverse_sabine, rir_matrix
    from azoom.sim.scene import add_awgn, apply_sir_gain

    n = target.shape[-1]
    B = traj_block_count(n, block)
    K = interferers.shape[0] if interferers.ndim == 2 else 0
    mics = jnp.asarray(room.mic_locs, jnp.float32)  # (M, 3)
    M = mics.shape[0]
    center = jnp.mean(mics, axis=0)

    if reverb:
        absorption = inverse_sabine(room.rt60_target, room.room_dim)
        order = room.max_order if max_order is None else max_order
    else:
        absorption = 1.0
        order = 0
    L = min(int(0.6 * fs), n)

    # Anchor positions: walk the azimuth circle at mic height. Anchor 0 is
    # duplicated so block k crossfades between anchors k and k+1 — the
    # same half-block phase convention as _moving_images.
    traj = jnp.asarray(target_traj_deg, jnp.float32).reshape(B)
    traj = jnp.concatenate([traj[:1], traj])  # (B+1,)
    az = jnp.deg2rad(traj)
    pos = center[None, :] + radius * jnp.stack(
        [jnp.cos(az), jnp.sin(az), jnp.zeros_like(az)], axis=-1
    )  # (B+1, 3)
    # Per-anchor RIRs, sequentially (lax.map) — the image lattice per
    # (source, mic) pair is large, so a vmap over ~100 anchors would
    # materialize gigabytes of scatter indices.
    rirs = jax.lax.map(
        lambda p: rir_matrix(
            p[None], mics, room.room_dim, absorption, order, fs, L
        )[0],
        pos,
    )  # (B+1, M, L)

    # Hann COLA segments of the dry target (see _moving_images).
    seg = 2 * block
    t = jnp.arange(seg, dtype=jnp.float32)
    w = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * t / seg)
    padded = (B + 2) * block
    xp = jnp.pad(target, (block, padded - n - block))
    starts = jnp.arange(B + 1) * block
    segs = jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(xp, s, seg, axis=-1)
    )(starts) * w  # (B+1, seg)

    out_len = seg + L - 1
    wet_segs = fft_convolve(segs[:, None, :], rirs, out_len)  # (B+1, M, out)

    def body(out, inp):
        s, seg_m = inp
        cur = jax.lax.dynamic_slice_in_dim(out, s, out_len, axis=-1)
        return jax.lax.dynamic_update_slice_in_dim(
            out, cur + seg_m, s, axis=-1
        ), None

    buf0 = jnp.zeros((M, padded + L), target.dtype)
    buf, _ = jax.lax.scan(body, buf0, (starts, wet_segs))
    target_wet = buf[..., block : block + n]  # (M, n)

    # Static interferers: fixed-then-random placement, SIR gain on ch 0.
    k_pos, k_noise = jax.random.split(key)
    if K:
        ipos = [jnp.asarray(room.interferer_pos_fixed, jnp.float32)]
        if K >= 2:
            dims = jnp.asarray(room.room_dim, jnp.float32)
            rnd = 1.0 + jax.random.uniform(k_pos, (K - 1, 2)) * (dims[:2] - 2.0)
            ipos.extend(
                [jnp.concatenate([rnd[i], jnp.asarray([1.5])])
                 for i in range(K - 1)]
            )
        irirs = rir_matrix(
            jnp.stack(ipos), mics, room.room_dim, absorption, order, fs, L
        )  # (K, M, L)
        interf = jnp.sum(
            fft_convolve(interferers[:, None, :], irirs, n), axis=0
        )  # (M, n)
        interf = apply_sir_gain(target_wet[0], interf, room.sir_target_db)
    else:
        interf = jnp.zeros_like(target_wet)

    clean = target_wet + interf
    noise_keys = jax.random.split(k_noise, M)
    noisy = jax.vmap(add_awgn, in_axes=(0, 0, None))(noise_keys, clean, snr_db)
    peak = jnp.max(jnp.abs(noisy)) + 1e-9
    return {
        "mixture": noisy / peak,
        "target_ref": target_wet[0] / peak,
        "interference_ref": interf[0] / peak,
    }


@functools.partial(
    jax.jit,
    static_argnames=("mic_dist", "fs", "c", "n_mics", "block", "normalize"),
)
def make_moving_scene(
    target: jnp.ndarray,
    interferers: jnp.ndarray,
    target_traj_deg: jnp.ndarray,
    interferer_angles_deg: jnp.ndarray,
    mic_dist: float,
    fs: float,
    c: float = 343.0,
    n_mics: int = 2,
    block: int = 2048,
    normalize: bool = True,
):
    """Far-field scene with a MOVING target and ground-truth stems.

    The moving twin of azoom.sim.farfield.make_scene: the target glides
    along `target_traj_deg` ((B,) anchors, B = traj_block_count(n, block))
    while interferers stay at fixed azimuths ((K,)) or move too ((K, B)).

    Returns dict with:
      mixture: (M, n)
      target_ref: (n,) the moving target as heard at mic 0 (time-varying
        delay included) — the "answer key" stem, same convention as the
        static builder (world_building.py:82-85).
      interference_ref: (n,) summed interferers at mic 0.
      All stems share the mixture's peak normalization.
    """
    n = target.shape[-1]
    B = traj_block_count(n, block)
    K = interferers.shape[0] if interferers.ndim == 2 else 0
    itraj = jnp.broadcast_to(
        jnp.asarray(interferer_angles_deg, jnp.float32).reshape(K, -1), (K, B)
    )
    traj = jnp.concatenate(
        [jnp.asarray(target_traj_deg, jnp.float32)[None, :], itraj], axis=0
    )  # (1+K, B)
    sources = jnp.concatenate([target[None, :], interferers], axis=0)
    imgs = _moving_images(sources, traj, mic_dist, c, n_mics, fs, block)
    mixture = jnp.sum(imgs, axis=0)  # (M, n)
    target_ref = imgs[0, 0]
    interference_ref = jnp.sum(imgs[1:, 0, :], axis=0)
    if normalize:
        peak = jnp.max(jnp.abs(mixture)) + 1e-9
        mixture = mixture / peak
        target_ref = target_ref / peak
        interference_ref = interference_ref / peak
    return {
        "mixture": mixture,
        "target_ref": target_ref,
        "interference_ref": interference_ref,
    }
