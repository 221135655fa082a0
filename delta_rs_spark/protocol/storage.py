"""Storage backends for the transaction log (driver-side, small I/O).

Mirrors the reference's ``StorageBackend`` trait surface
(``rust/src/storage/mod.rs:373-427``): head/get/list/put/delete plus
*atomic create-if-absent* rename — the primitive the whole commit protocol
rests on (``rust/src/storage/file/rename.rs:27-62``).

Only the local filesystem backend is implemented (the test environment);
object-store backends (S3 + lock, ADLS) plug in behind the same interface —
see the reference's DynamoDB-lock design (``rust/src/storage/s3/mod.rs``).
Executors never use this module: data files are read/written by Spark's own
Hadoop FileSystem layer. This module only touches ``_delta_log/``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator
from urllib.parse import urlparse


class FileAlreadyExistsError(FileExistsError):
    """Raised when an atomic create-if-absent target already exists."""


@dataclass
class ObjectMeta:
    path: str
    size: int
    modification_time: float  # unix seconds


class StorageBackend:
    """Abstract small-object store for the `_delta_log` directory."""

    def head_obj(self, path: str) -> ObjectMeta:
        raise NotImplementedError

    def get_obj(self, path: str) -> bytes:
        raise NotImplementedError

    def list_objs(self, path: str) -> Iterator[ObjectMeta]:
        raise NotImplementedError

    def put_obj(self, path: str, data: bytes) -> None:
        raise NotImplementedError

    def delete_obj(self, path: str) -> None:
        raise NotImplementedError

    def rename_obj_noreplace(self, src: str, dst: str) -> None:
        """Atomically move src→dst, failing with FileAlreadyExistsError if dst exists."""
        raise NotImplementedError

    def join(self, *parts: str) -> str:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        try:
            self.head_obj(path)
            return True
        except FileNotFoundError:
            return False

    def makedirs(self, path: str) -> None:
        raise NotImplementedError


class LocalFileBackend(StorageBackend):
    """POSIX filesystem backend.

    Atomic create-if-absent uses ``os.link`` (hard link fails with EEXIST if
    the destination exists, atomically, and publishes fully-written content),
    equivalent to the reference's ``renameat2(RENAME_NOREPLACE)``.
    """

    def head_obj(self, path: str) -> ObjectMeta:
        st = os.stat(path)
        return ObjectMeta(path=path, size=st.st_size, modification_time=st.st_mtime)

    def get_obj(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def list_objs(self, path: str) -> Iterator[ObjectMeta]:
        try:
            entries = sorted(os.scandir(path), key=lambda e: e.name)
        except FileNotFoundError:
            return
        for e in entries:
            if e.is_file():
                st = e.stat()
                yield ObjectMeta(path=e.path, size=st.st_size, modification_time=st.st_mtime)

    def put_obj(self, path: str, data: bytes) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def delete_obj(self, path: str) -> None:
        os.remove(path)

    def rename_obj_noreplace(self, src: str, dst: str) -> None:
        try:
            os.link(src, dst)
        except FileExistsError as e:
            raise FileAlreadyExistsError(dst) from e
        os.unlink(src)

    def join(self, *parts: str) -> str:
        return os.path.join(*parts)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)


def parse_table_uri(table_uri: str) -> tuple[str, StorageBackend]:
    """URI → (root path, backend). file:// and bare paths → local FS.

    Cloud schemes raise with a pointer to the extension seam (the reference
    ships S3/Azure backends behind the same trait — out of scope locally).
    """
    parsed = urlparse(table_uri)
    if parsed.scheme in ("", "file"):
        root = parsed.path if parsed.scheme == "file" else table_uri
        return os.path.abspath(root), LocalFileBackend()
    raise NotImplementedError(
        f"storage scheme {parsed.scheme!r} not available in this environment; "
        "implement a StorageBackend (see reference rust/src/storage/) and register it"
    )
