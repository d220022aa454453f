from azoom.localize.srp import srp_localize, srp_map

__all__ = ["srp_localize", "srp_map"]
