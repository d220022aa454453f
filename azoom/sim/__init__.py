from azoom.sim.farfield import make_scene, mix_far_field
from azoom.sim.signals import speech_like, speech_like_batch

__all__ = ["make_scene", "mix_far_field", "speech_like", "speech_like_batch"]
