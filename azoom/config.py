"""Central configuration for the azoom framework.

One canonical source of truth for sampling rate, STFT parameters, array
geometry, and beamformer settings. The reference repo scattered these over
three mechanisms (module constants, config.json, Final_pipeline/src/config.py
-- see /root/reference/Final_pipeline/src/config.py:1-29 and
rt_av_zoom/core/masked_mvdr.py:9-18) with inconsistent mic spacings
(0.01 / 0.04 / 0.08 m). Here every pipeline takes an explicit, hashable
``PipelineConfig`` so jitted functions can close over it statically.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

SPEED_OF_SOUND = 343.0  # m/s


def parse_geometry(spec: str) -> tuple[tuple[float, ...], ...]:
    """Parse a CLI ``--geometry`` string into a mic_positions tuple.

    Format: semicolon-separated mics, comma-separated coordinates in
    meters — ``"x,y"`` or ``"x,y,z"`` per mic (a bare ``"x"`` means a
    point on the array axis). Example, a 4-mic 3 x 2 cm rectangle:
    ``"-0.015,-0.01;0.015,-0.01;-0.015,0.01;0.015,0.01"``.
    """
    mics = []
    for part in spec.split(";"):
        part = part.strip()
        if not part:
            continue
        coords = tuple(float(v) for v in part.split(","))
        if not 1 <= len(coords) <= 3:
            raise ValueError(
                f"--geometry mic '{part}': expected 1-3 coordinates"
            )
        mics.append(coords)
    if len(mics) < 2:
        raise ValueError("--geometry needs at least 2 mics")
    return tuple(mics)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Static physics + STFT configuration (hashable; safe to close over in jit)."""

    # Audio
    fs: int = 16_000

    # STFT (gens 2-4 of the reference: N_FFT=1024, hop 512,
    # Final_pipeline/src/config.py:17-18)
    n_fft: int = 1024
    hop: int = 512

    # Streaming window: 2.0 s chunks with 50% overlap-add
    # (Final_pipeline/src/config.py:19 WIN_SIZE=32000)
    win_size: int = 32_000

    # Array geometry: 2-mic linear array by default. ``mic_positions``
    # (round 4) expresses ARBITRARY planar/3-D arrays — a tuple of
    # (x, y) or (x, y, z) coordinates in meters, array-centered; when
    # set it overrides the uniform-linear (n_mics, mic_dist) layout for
    # steering, scene synthesis, and localization. Use with_geometry()
    # to set it (keeps n_mics in sync). The reference is hard-wired to
    # the scalar-spacing model (masked_mvdr.py:22-35).
    n_mics: int = 2
    mic_dist: float = 0.08  # Final_pipeline/src/config.py:29 MIC_DIST
    mic_positions: tuple[tuple[float, ...], ...] | None = None
    c: float = SPEED_OF_SOUND

    # Beamforming
    angle_target_deg: float = 90.0
    sigma: float = 1e-7          # diagonal loading; doubles as "zoom" knob
    hp_cutoff_hz: float = 100.0  # bypass unstable low bins

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def frames_per_chunk(self) -> int:
        """STFT frames produced for one win_size chunk (scipy conventions:
        zero `boundary` extension of n_fft//2 each side, then tail-padded
        to a whole number of hops — matches azoom.dsp.stft.stft_frame_count)."""
        ext = self.win_size + 2 * (self.n_fft // 2)
        n_add = (-(ext - self.n_fft)) % self.hop
        return (ext + n_add - self.n_fft) // self.hop + 1

    def replace(self, **kw) -> "PipelineConfig":
        return dataclasses.replace(self, **kw)

    def with_geometry(self, positions) -> "PipelineConfig":
        """Explicit array geometry: ``positions`` is an iterable of
        per-mic (x,), (x, y) or (x, y, z) coordinates in meters (or bare
        floats, taken as x on the array axis). Sets ``mic_positions``
        and keeps ``n_mics`` consistent."""
        pos = tuple(
            tuple(float(v) for v in (p if hasattr(p, "__len__") else (p,)))
            for p in positions
        )
        return self.replace(mic_positions=pos, n_mics=len(pos))

    def geometry(self):
        """Explicit mic coordinates as a jnp array (M, k) — or None when
        the array is the canonical uniform-linear layout. Pass as the
        ``positions=`` argument of dsp.delays functions."""
        if self.mic_positions is None:
            return None
        import jax.numpy as jnp

        return jnp.asarray(self.mic_positions, jnp.float32)

    def for_input(self, mixture) -> "PipelineConfig":
        """Reconcile the static mic count with an (..., M, n) input.

        Callers are supposed to keep ``n_mics`` in sync with the recording
        (cli.run replaces it from the WAV's channel count); the pipeline
        entry points call this so a config/input mismatch can never build
        a wrong-sized steering vector. The channel count is a trace-time
        constant, so this costs nothing under jit.
        """
        if getattr(mixture, "ndim", 1) < 2:
            return self
        m = int(mixture.shape[-2])
        if m == self.n_mics:
            return self
        if self.mic_positions is not None:
            # An explicit geometry can't be silently re-spaced: a channel
            # count that disagrees with it is a real misconfiguration.
            raise ValueError(
                f"input has {m} channels but mic_positions describes "
                f"{self.n_mics} mics; fix the geometry or the recording"
            )
        return self.replace(n_mics=m)


# The canonical "final generation" configuration (reference gen 4).
DEFAULT = PipelineConfig()

# Gen-1 legacy configuration (rt_av_zoom/core/masked_mvdr.py:9-18:
# N_FFT=512, hop 256, D=0.01).
GEN1 = PipelineConfig(n_fft=512, hop=256, mic_dist=0.01)


@dataclasses.dataclass(frozen=True)
class RoomConfig:
    """Room-acoustics simulation defaults (Final_pipeline/src/config.py:21-29)."""

    room_dim: tuple[float, float, float] = (4.9, 4.9, 4.9)
    rt60_target: float = 0.5
    sir_target_db: float = 0.0
    # Mic array positions inside the room ([..]:27-28)
    mic_locs: tuple[tuple[float, float, float], ...] = (
        (2.41, 2.45, 1.5),
        (2.49, 2.45, 1.5),
    )
    target_pos: tuple[float, float, float] = (2.45, 3.45, 1.5)
    interferer_pos_fixed: tuple[float, float, float] = (3.22, 3.06, 1.5)
    max_order: int = 15

    def with_mic_dist(self, mic_dist: float) -> "RoomConfig":
        """Same room, mic pair re-spaced to ``mic_dist`` around the same
        center. Keeps room simulation geometry consistent with
        PipelineConfig.mic_dist (the reference itself disagrees across
        generations: masked_mvdr.py:10 D=0.01, world.py:28-31 8 cm,
        world_building.py:13 4 cm)."""
        (x0, y, z), (x1, _, _) = self.mic_locs[0], self.mic_locs[1]
        cx = 0.5 * (x0 + x1)
        locs = ((cx - mic_dist / 2, y, z), (cx + mic_dist / 2, y, z))
        return dataclasses.replace(self, mic_locs=locs)

    def with_linear_array(self, n_mics: int, mic_dist: float) -> "RoomConfig":
        """Same room, an ``n_mics``-element uniform linear array spaced
        ``mic_dist`` apart along x, centered where the original pair was.
        The reference has no analogue (it is hard-wired to 2 mics); this
        is the room-mode entry point for azoom's M-mic generalization —
        the DoF study (scripts/dof_study.py) uses it to show extra mics
        recover what readme.md:19 documents as unrecoverable at M=2."""
        (x0, y, z), (x1, _, _) = self.mic_locs[0], self.mic_locs[1]
        cx = 0.5 * (x0 + x1)
        span = (n_mics - 1) * mic_dist
        locs = tuple(
            (cx - span / 2 + m * mic_dist, y, z) for m in range(n_mics)
        )
        return dataclasses.replace(self, mic_locs=locs)


    def with_array_positions(self, positions) -> "RoomConfig":
        """Place an EXPLICIT mic array in the room: ``positions`` is the
        PipelineConfig.mic_positions tuple — per-mic (x,), (x, y) or
        (x, y, z) offsets in meters, array-centered. The array center is
        kept where the original pair's center was, array-x along room-x
        and array-y along room-y (the steering plane is the room floor
        plane). Completes the round-4 arbitrary-geometry axis for the
        reverb simulator."""
        (x0, y0, z0), (x1, _, _) = self.mic_locs[0], self.mic_locs[1]
        cx = 0.5 * (x0 + x1)
        locs = []
        for p in positions:
            p = tuple(p) if hasattr(p, "__len__") else (float(p),)
            px = p[0]
            py = p[1] if len(p) > 1 else 0.0
            pz = p[2] if len(p) > 2 else 0.0
            locs.append((cx + px, y0 + py, z0 + pz))
        return dataclasses.replace(self, mic_locs=tuple(locs))


ROOM_DEFAULT = RoomConfig()


@dataclasses.dataclass(frozen=True)
class PathsConfig:
    """Run-directory layout mirroring the reference product
    (Final_pipeline/run.py:24-26: data/simulated/{name} -> data/results/{name}_results)."""

    root: Path = Path("data")

    @property
    def sim_dir(self) -> Path:
        return self.root / "simulated"

    @property
    def results_dir(self) -> Path:
        return self.root / "results"

    def run_sim_dir(self, run_name: str) -> Path:
        return self.sim_dir / run_name

    def run_results_dir(self, run_name: str) -> Path:
        return self.results_dir / f"{run_name}_results"


PATHS = PathsConfig()
