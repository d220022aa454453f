from azoom.stream.chunker import chunk_signal, overlap_add_chunks, streaming_enhance
from azoom.stream.online import online_enhance, online_masked_mvdr

__all__ = [
    "chunk_signal",
    "overlap_add_chunks",
    "streaming_enhance",
    "online_enhance",
    "online_masked_mvdr",
]
