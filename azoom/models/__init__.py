from azoom.models.unet import DeepFPU, FreqPreservingUNet, pad_frames, time_pool_factor

__all__ = ["DeepFPU", "FreqPreservingUNet", "pad_frames", "time_pool_factor"]
