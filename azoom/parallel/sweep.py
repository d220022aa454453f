"""Sharded batch evaluation sweeps — batch_run.py as one array program.

The reference's sweep driver loops scenes serially on one CPU
(Final_pipeline/batch_run.py:12-49: for i in range(n): sim -> inf -> eval).
Here a sweep is a *batch axis*: generate B scenes from B PRNG keys, enhance
them, and score them — vmapped, jitted, and sharded over the 'data' axis of
a device mesh so every chip owns B/n_devices scenes and the only
communication is the final metric gather. This is the BASELINE.json north
star ("batch_run.py sweeps thousands of mixtures per step").

Two sweep families cover the reference's campaign configurations:

  * :func:`oracle_sweep` — ground-truth IBM mask + MVDR, the correctness
    ceiling (oracle_debug.py semantics).
  * :func:`learned_sweep` — a trained mask net (closed-over flax model +
    variables) feeding a selectable beamformer, over anechoic or
    image-source reverb scenes: the blind flagship configuration the
    reference measures in batch_metrics.csv (batch_run.py:23-29, RT60=0.5,
    2 interferers, TFLite mask + hybrid null BF).

Scene families are parameterized (interferer count, fixed or randomized
geometry, reverb) mirroring simulation.py:126-136's random placement, so
campaigns explore the robustness envelope rather than one fixed geometry.

Fault tolerance (batch_run.py:47-49's try/except-continue) becomes
numerical: per-scene metrics are jnp.where-guarded, and non-finite scores
are masked out of the aggregate instead of aborting the sweep.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from azoom.config import PipelineConfig, RoomConfig, ROOM_DEFAULT
from azoom.eval.projection import osinr_osir
from azoom.eval.stoi import stoi
from azoom.pipelines.oracle import oracle_enhance
from azoom.sim.farfield import make_scene
from azoom.sim.scene import simulate_room_scene
from azoom.sim.signals import interferer_signal, speech_like

__all__ = ["oracle_sweep", "learned_sweep", "sweep_summary", "sharded_sweep"]

# Fixed anechoic interferer angles: the first two match the reference's
# canonical 40/130 deg geometry (model_training.py:66-77); more interferers
# extend symmetrically toward the endfire directions.
_FIXED_ANGLES = (40.0, 130.0, 20.0, 160.0, 60.0, 120.0)


def _synth_sources(
    key: jax.Array,
    n_sources: int,
    n_samples: int,
    fs: int,
    interferer_kind: str = "speech",
):
    """(n_sources, n) sources: a speech-like target plus interferers of
    the requested class (the reference's --dataset musan axis,
    world.py:38-67 — 'speech' | 'babble' | 'music' | 'noise')."""
    kf, ks = jax.random.split(key)
    f0s = jax.random.uniform(kf, (n_sources,), minval=100.0, maxval=280.0)
    keys = jax.random.split(ks, n_sources)
    if interferer_kind == "speech":
        return jax.vmap(lambda k, f0: speech_like(k, n_samples, fs, f0))(keys, f0s)
    target = speech_like(keys[0], n_samples, fs, f0s[0])
    interf = [
        interferer_signal(keys[i], n_samples, fs, interferer_kind, f0s[i])
        for i in range(1, n_sources)
    ]
    return jnp.stack([target] + interf)


def _random_interferer_angles(key: jax.Array, n: int, target_deg: float):
    """n azimuths uniform over [10, 170] deg excluding +/-15 deg around the
    target — the anechoic analogue of simulation.py:126-136's random
    interferer placement."""
    ku, kb = jax.random.split(key)
    u = jax.random.uniform(ku, (n,))
    side = jax.random.bernoulli(kb, 0.5, (n,))
    lo_width = (target_deg - 15.0) - 10.0
    hi_width = 170.0 - (target_deg + 15.0)
    below = 10.0 + u * lo_width
    above = (target_deg + 15.0) + u * hi_width
    return jnp.where(side, below, above)


def _scene_from_key(
    k: jax.Array,
    cfg: PipelineConfig,
    n_samples: int,
    n_interferers: int,
    reverb: bool,
    randomize: bool,
    room: RoomConfig,
    interferer_kind: str = "speech",
    snr_db: float = 50.0,
) -> dict:
    """One scene (mixture + answer-key stems) from one PRNG key.
    ``snr_db`` controls the AWGN sensor-noise floor (world.py:93-98 /
    simulation.py:47-56 semantics; the reference's batch driver pins 50)."""
    k_sig, k_geo, k_awgn = jax.random.split(k, 3)
    sigs = _synth_sources(
        k_sig, n_interferers + 1, n_samples, cfg.fs, interferer_kind
    )
    if reverb:
        # Room mode randomizes interferer placement internally for the
        # 2nd+ interferer (simulation.py:126-134 semantics). The simulated
        # array always matches the enhancement config: re-space when the
        # mic COUNT or the SPACING disagrees (cfg and room are both static
        # under jit) — otherwise a library caller passing
        # cfg.replace(mic_dist=0.01) with the default room would silently
        # simulate the 8 cm pair while steering/geo-adapting for 1 cm
        # (the round-3 geometry fix, applied at the source instead of
        # only in the batch CLI).
        if cfg.mic_positions is not None:
            # Explicit geometry: place the actual array in the room.
            room = room.with_array_positions(cfg.mic_positions)
        else:
            (x0, _, _), (x1, _, _) = room.mic_locs[0], room.mic_locs[1]
            if (len(room.mic_locs) != cfg.n_mics
                    or abs(abs(x1 - x0) - cfg.mic_dist) > 1e-9):
                room = room.with_linear_array(cfg.n_mics, cfg.mic_dist)
        return simulate_room_scene(
            k_geo, sigs[0], sigs[1:], room, reverb=True, fs=cfg.fs,
            snr_db=snr_db,
        )
    if randomize:
        angles = _random_interferer_angles(
            k_geo, n_interferers, cfg.angle_target_deg
        )
    else:
        if n_interferers > len(_FIXED_ANGLES):
            raise ValueError(
                f"fixed-angle scenes support at most {len(_FIXED_ANGLES)} "
                f"interferers (got {n_interferers}); use randomize=True"
            )
        angles = jnp.asarray(_FIXED_ANGLES[:n_interferers])
    sc = make_scene(
        sigs[0], sigs[1:], cfg.angle_target_deg, angles, cfg.mic_dist,
        cfg.fs, n_mics=cfg.n_mics, positions=cfg.geometry(),
    )
    if snr_db < 50.0:  # 50 = the reference's effectively-noiseless default
        from azoom.sim.scene import add_awgn

        keys = jax.random.split(k_awgn, cfg.n_mics)
        sc = dict(sc)
        sc["mixture"] = jax.vmap(add_awgn, in_axes=(0, 0, None))(
            keys, sc["mixture"], snr_db
        )
    return sc


def _score(out: jnp.ndarray, sc: dict, cfg: PipelineConfig, with_stoi: bool) -> dict:
    """Projection metrics (+ optional STOI) for one enhanced scene,
    including the input-side SINR baseline (sinr_in) the CSV needs."""
    sinr_out, sir_out = osinr_osir(out, sc["target_ref"], sc["interference_ref"])
    sinr_in, sir_in = osinr_osir(
        sc["mixture"][0], sc["target_ref"], sc["interference_ref"]
    )
    res = {
        "sir_in": sir_in,
        "sinr_in": sinr_in,
        "sir_out": sir_out,
        "sir_imp": sir_out - sir_in,
        "sinr_out": sinr_out,
    }
    if with_stoi:
        res["stoi"] = stoi(sc["target_ref"], out, cfg.fs)
    return res


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "n_scenes", "n_samples", "with_stoi", "n_interferers",
        "reverb", "randomize", "room", "with_waveforms", "interferer_kind",
        "snr_db", "post_filter",
    ),
)
def oracle_sweep(
    key: jax.Array,
    cfg: PipelineConfig,
    n_scenes: int = 16,
    n_samples: int = 32_000,
    with_stoi: bool = False,
    n_interferers: int = 2,
    reverb: bool = False,
    randomize: bool = False,
    room: RoomConfig = ROOM_DEFAULT,
    with_waveforms: bool = False,
    interferer_kind: str = "speech",
    snr_db: float = 50.0,
    post_filter: str = "binary",
) -> dict:
    """Generate + enhance + score n_scenes oracle runs in one program.

    Defaults reproduce the round-1 behavior (anechoic, 2 interferers at
    the fixed 40/130 deg geometry); ``randomize``/``reverb``/
    ``n_interferers`` open the robustness envelope. Returns per-scene
    arrays: sir_in, sinr_in, sir_out, sir_imp, sinr_out (+ stoi;
    ``with_waveforms`` adds the (B, n) enhanced/target pairs so host-side
    perceptual scoring — PESQ — can run after the device sweep)."""
    keys = jax.random.split(key, n_scenes)

    def one(k):
        sc = _scene_from_key(
            k, cfg, n_samples, n_interferers, reverb, randomize, room,
            interferer_kind, snr_db,
        )
        out = oracle_enhance(
            sc["mixture"], sc["target_ref"], sc["interference_ref"], cfg,
            post_filter=post_filter,
        )
        res = _score(out, sc, cfg, with_stoi)
        if with_waveforms:
            res["enhanced"] = out
            res["target"] = sc["target_ref"]
        return res

    return jax.vmap(one)(keys)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "model", "n_scenes", "n_samples", "with_stoi", "n_interferers",
        "reverb", "randomize", "room", "beamformer", "feature_kind",
        "with_waveforms", "steer_error_deg", "interferer_kind",
        "train_mic_dist", "snr_db", "dsp_precision", "harmonic_regen",
    ),
)
def learned_sweep(
    key: jax.Array,
    cfg: PipelineConfig,
    model,
    variables: Any,
    n_scenes: int = 16,
    n_samples: int = 32_000,
    with_stoi: bool = True,
    n_interferers: int = 2,
    reverb: bool = True,
    randomize: bool = True,
    room: RoomConfig = ROOM_DEFAULT,
    beamformer: str = "mvdr",
    feature_kind: str = "logmag_ipd",
    with_waveforms: bool = False,
    steer_error_deg: float = 0.0,
    interferer_kind: str = "speech",
    train_mic_dist: float | None = None,
    snr_db: float = 50.0,
    dsp_precision: str = "exact",
    harmonic_regen: bool = False,
) -> dict:
    """Blind learned-mask campaign sweep: synth scenes (reverb by default,
    mirroring batch_run.py:23-29's RT60=0.5 / 2-interferer config), enhance
    with the trained mask net + selected beamformer ('mvdr' or
    'hard_null'), and score — all in one vmapped program. The model is
    static; its variables are a traced pytree (shardable/donatable).

    ``steer_error_deg`` models camera pointing error in the audio-visual
    product: scenes keep the true target at ``cfg.angle_target_deg``, but
    the enhancement stack (steering vector, FOV gating, physics features)
    is steered ``steer_error_deg`` degrees off it — the robustness axis the
    'rmvb' beamformer is designed for."""
    from azoom.pipelines.learned import learned_enhance

    keys = jax.random.split(key, n_scenes)
    enh_cfg = cfg.replace(
        angle_target_deg=cfg.angle_target_deg + steer_error_deg
    )

    def one(k):
        sc = _scene_from_key(
            k, cfg, n_samples, n_interferers, reverb, randomize, room,
            interferer_kind, snr_db,
        )
        out = learned_enhance(
            sc["mixture"], model, variables, enh_cfg,
            beamformer=beamformer, feature_kind=feature_kind,
            train_mic_dist=train_mic_dist,
            dsp_precision=dsp_precision,
            harmonic_regen=harmonic_regen,
        )
        res = _score(out, sc, cfg, with_stoi)
        if with_waveforms:
            res["enhanced"] = out
            res["target"] = sc["target_ref"]
        return res

    return jax.vmap(one)(keys)


def sharded_sweep(
    sweep_fn: Callable[..., dict],
    key: jax.Array,
    mesh,
    n_scenes: int,
    *args: Any,
    axis_name: str = "data",
    **kwargs: Any,
) -> dict:
    """Run a vmapped sweep with its scene axis sharded over the mesh.

    ``sweep_fn(key, *args, n_scenes=..., **kwargs) -> dict of (B,) arrays``
    (e.g. :func:`oracle_sweep` / :func:`learned_sweep`). The key split and
    all compute are sharded; XLA partitions the program so each device
    synthesizes and scores only its own scenes.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if n_scenes % mesh.devices.size != 0:
        raise ValueError(
            f"n_scenes={n_scenes} must divide over {mesh.devices.size} devices"
        )
    shard = NamedSharding(mesh, P(axis_name))

    # One sharding for every (B,)-shaped leaf of the result dict.
    return jax.jit(
        lambda k: sweep_fn(k, *args, n_scenes=n_scenes, **kwargs),
        out_shardings=shard,
    )(key)


def sweep_summary(results: dict) -> dict:
    """Aggregate a sweep's per-scene metrics, masking non-finite entries
    (the vectorized form of batch_run.py's per-run try/except)."""
    out = {}
    for name, v in results.items():
        v = jnp.asarray(v)
        ok = jnp.isfinite(v)
        n_ok = jnp.sum(ok)
        safe = jnp.where(ok, v, 0.0)
        mean = jnp.sum(safe) / jnp.maximum(n_ok, 1)
        var = jnp.sum(jnp.where(ok, (v - mean) ** 2, 0.0)) / jnp.maximum(n_ok, 1)
        out[name] = {
            "mean": float(mean),
            "std": float(jnp.sqrt(var)),
            "min": float(jnp.min(jnp.where(ok, v, jnp.inf))),
            "max": float(jnp.max(jnp.where(ok, v, -jnp.inf))),
            "n": int(n_ok),
            "n_failed": int(jnp.sum(~ok)),
        }
    return out
