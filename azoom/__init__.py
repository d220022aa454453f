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
if not _os.environ.get("AZOOM_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "AZOOM_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "azoom_jax_cache"),
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

from azoom.config import DEFAULT, GEN1, PipelineConfig, RoomConfig
from azoom.zoom_api import AudioZoom

__version__ = "0.1.0"

__all__ = ["AudioZoom", "DEFAULT", "GEN1", "PipelineConfig", "RoomConfig", "__version__"]
