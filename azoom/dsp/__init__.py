from azoom.dsp.delays import (
    far_field_delays,
    fractional_delay,
    mic_positions,
    steering_matrix,
    steering_vector,
)
from azoom.dsp.params import choose_best_stft_params, stft_reconstruct_mse
from azoom.dsp.resample import resample_fft, resample_poly
from azoom.dsp.stft import istft, rfft_freqs, stft, stft_frame_count
from azoom.dsp.windows import hann

__all__ = [
    "far_field_delays",
    "fractional_delay",
    "mic_positions",
    "steering_matrix",
    "steering_vector",
    "istft",
    "rfft_freqs",
    "stft",
    "stft_frame_count",
    "hann",
    "choose_best_stft_params",
    "stft_reconstruct_mse",
    "resample_fft",
    "resample_poly",
]
