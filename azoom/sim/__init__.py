from azoom.sim.farfield import make_scene, mix_far_field
from azoom.sim.motion import (
    linear_trajectory,
    make_moving_room_scene,
    make_moving_scene,
    mix_far_field_moving,
    traj_block_count,
)
from azoom.sim.signals import speech_like, speech_like_batch

__all__ = [
    "make_scene",
    "mix_far_field",
    "make_moving_scene",
    "make_moving_room_scene",
    "mix_far_field_moving",
    "linear_trajectory",
    "traj_block_count",
    "speech_like",
    "speech_like_batch",
]
