from azoom.wpe.dereverb import wpe, wpe_dereverb

__all__ = ["wpe", "wpe_dereverb"]
