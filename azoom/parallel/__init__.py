from azoom.parallel.mesh import data_sharding, make_mesh, replicated
from azoom.parallel.sweep import oracle_sweep, sharded_sweep, sweep_summary

__all__ = [
    "data_sharding",
    "make_mesh",
    "replicated",
    "oracle_sweep",
    "sharded_sweep",
    "sweep_summary",
]
