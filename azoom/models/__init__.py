from azoom.models.blstm import BLSTMMaskNet
from azoom.models.qcnn import QCNNMaskNet, QuaternionConv
from azoom.models.quantize import (
    dequantize_variables,
    quantize_variables,
    quantized_size_bytes,
)
from azoom.models.unet import DeepFPU, FreqPreservingUNet, pad_frames, time_pool_factor

__all__ = [
    "BLSTMMaskNet",
    "QCNNMaskNet",
    "QuaternionConv",
    "DeepFPU",
    "FreqPreservingUNet",
    "pad_frames",
    "time_pool_factor",
    "dequantize_variables",
    "quantize_variables",
    "quantized_size_bytes",
]
