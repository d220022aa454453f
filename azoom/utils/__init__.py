from azoom.utils.flops import compiled_flops, roofline_report
from azoom.utils.host import to_numpy
from azoom.utils.profiling import force, realtime_factor, stage_timer, time_fn, trace

__all__ = [
    "compiled_flops",
    "roofline_report",
    "to_numpy",
    "force",
    "realtime_factor",
    "stage_timer",
    "time_fn",
    "trace",
]
