"""azoom — TPU-native real-time audio-visual zooming framework.

A brand-new JAX/XLA/Pallas implementation of a 2-microphone "Audio Zoom"
system: isolate one speech source at a steered direction out of an N-source
mixture via mask-driven MVDR / hard-null / GEV beamforming, with on-device
scene simulation, learned mask estimation (Flax U-Nets), streaming
overlap-add inference, and sharded batch evaluation sweeps.

Capability parity target: Senpai-sama06/real-time-audio-visual-zooming
(see SURVEY.md for the full component inventory).
"""

import os as _os

import jax as _jax

# Persistent compilation cache: first TPU compiles in this environment go
# through a remote-compile tunnel and can take minutes; caching makes every
# subsequent process start fast. Opt out with AZOOM_NO_COMPILE_CACHE=1.
#
# TPU-family backends ONLY: serializing mesh-compiled CPU executables through
# the persistent cache has been observed to segfault the interpreter on some
# hosts (both the cache read and write paths), so the cache is never enabled
# when the requested platform is CPU (the test-suite configuration) or when
# no platform is pinned. The cache dir is versioned by the JAX version so a
# jax upgrade can never deserialize a stale incompatible executable.


def _enable_compile_cache():
    if _os.environ.get("AZOOM_NO_COMPILE_CACHE"):
        return
    platforms = _os.environ.get("JAX_PLATFORMS", "")
    primary = platforms.split(",")[0].strip().lower()
    if primary not in ("tpu", "axon"):
        return
    _cache_dir = _os.environ.get(
        "AZOOM_COMPILE_CACHE_DIR",
        _os.path.join(
            _os.path.expanduser("~"), ".cache", f"azoom_jax_cache_{_jax.__version__}"
        ),
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


_enable_compile_cache()

from azoom.config import DEFAULT, GEN1, PipelineConfig, RoomConfig
from azoom.zoom_api import AudioZoom

__version__ = "0.1.0"

__all__ = ["AudioZoom", "DEFAULT", "GEN1", "PipelineConfig", "RoomConfig", "__version__"]
