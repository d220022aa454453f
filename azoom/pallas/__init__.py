from azoom.pallas.mvdr_kernel import masked_mvdr_pallas, mvdr_pallas_raw
from azoom.pallas.qconv_kernel import qconv3x3_pallas
from azoom.pallas.tpufpu_serve import tpufpu_apply_pallas

__all__ = [
    "masked_mvdr_pallas",
    "mvdr_pallas_raw",
    "qconv3x3_pallas",
    "tpufpu_apply_pallas",
]
