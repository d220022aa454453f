from azoom.utils.host import to_numpy

__all__ = ["to_numpy"]
