from azoom.io.wav import diagnose, read_wav, write_wav

__all__ = ["diagnose", "read_wav", "write_wav"]
