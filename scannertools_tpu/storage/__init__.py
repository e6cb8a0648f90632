from .base import StorageBackend, StoredStream, StreamWriter
from .named import NamedStream, NamedVideoStream

__all__ = [
    "NamedStream", "NamedVideoStream", "StorageBackend", "StoredStream",
    "StreamWriter",
]
