from azoom.localize.srp import (
    gcc_phat_localize,
    gcc_phat_map,
    ipd_angle_histogram,
    ipd_histogram_localize,
    srp_localize,
    srp_map,
)
from azoom.localize.tracking import ema_track, viterbi_track

__all__ = [
    "gcc_phat_localize",
    "gcc_phat_map",
    "ipd_angle_histogram",
    "ipd_histogram_localize",
    "srp_localize",
    "srp_map",
    "ema_track",
    "viterbi_track",
]
