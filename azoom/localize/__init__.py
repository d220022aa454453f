from azoom.localize.srp import (
    gcc_phat_localize,
    gcc_phat_map,
    ipd_angle_histogram,
    ipd_histogram_localize,
    srp_localize,
    srp_map,
)

__all__ = [
    "gcc_phat_localize",
    "gcc_phat_map",
    "ipd_angle_histogram",
    "ipd_histogram_localize",
    "srp_localize",
    "srp_map",
]
