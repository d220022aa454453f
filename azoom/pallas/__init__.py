from azoom.pallas.mvdr_kernel import masked_mvdr_pallas, mvdr_pallas_raw

__all__ = ["masked_mvdr_pallas", "mvdr_pallas_raw"]
