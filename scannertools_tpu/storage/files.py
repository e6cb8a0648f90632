"""Files storage: one file per element.

Reference parity: FilesStorage/FilesStream (storage/files.py:9-96) backed by
the C++ Files source/sink (files_source.cpp:33-271, files_sink.cpp:32-105).
posix only here; gcs/s3 need storehouse-style clients that this image lacks —
the constructor accepts the same kwargs and raises if a remote type is
requested without support.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from .base import StorageBackend, StoredStream, StreamWriter


class FilesStorage(StorageBackend):
    def __init__(self, storage_type: str = "posix", bucket: Optional[str] = None,
                 region: Optional[str] = None, endpoint: Optional[str] = None):
        if storage_type != "posix":
            raise NotImplementedError(
                f"storage_type={storage_type!r}: only posix is available in "
                "this environment (no gcs/s3 client libraries)"
            )
        self._storage_type = storage_type
        self._bucket = bucket
        self._region = region
        self._endpoint = endpoint


class FilesStream(StoredStream):
    """Stream where each element is a file (reference storage/files.py:52-96)."""

    def __init__(self, paths: Sequence[str], storage: Optional[FilesStorage] = None):
        self._storage = storage or FilesStorage()
        self._paths = list(paths)

    def __len__(self) -> int:
        return len(self._paths)

    def load_bytes(self, rows=None):
        paths = self._paths
        if rows is not None:
            paths = [paths[i] for i in rows]
        for path in paths:
            with open(path, "rb") as f:
                yield f.read()

    def committed(self) -> bool:
        return all(os.path.isfile(p) for p in self._paths)

    def exists(self) -> bool:
        return any(os.path.isfile(p) for p in self._paths)

    def delete(self) -> None:
        for p in self._paths:
            try:
                os.unlink(p)
            except OSError:
                pass

    def storage(self) -> FilesStorage:
        return self._storage

    def writer(self, type_name: str) -> "FilesStreamWriter":
        return FilesStreamWriter(self)


class FilesStreamWriter(StreamWriter):
    """Writes element i to paths[i] (files_sink.cpp:61-74)."""

    def __init__(self, stream: FilesStream):
        self._stream = stream
        self._i = 0

    def append(self, element: bytes) -> None:
        if self._i >= len(self._stream._paths):
            raise IndexError(
                f"FilesStream sink got more elements than paths "
                f"({len(self._stream._paths)})"
            )
        path = self._stream._paths[self._i]
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(element)
        os.replace(tmp, path)
        self._i += 1

    def commit(self) -> None:
        pass
