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


class MemoryBackend(StorageBackend):
    """In-memory object store for the LOG layer: a model of an object store
    with atomic conditional put (the capability S3 lacks and the reference
    emulates with a DynamoDB lock — ``rust/src/storage/s3/dynamodb_lock.rs``).

    One process-wide namespace keyed by path; rename_obj_noreplace holds one
    lock across the exists-check + move, giving the same contract the
    reference demands of every backend (``rust/src/storage/mod.rs:416-423``).
    Useful for protocol tests and as the template for a real object-store
    backend (swap the dict for PUT-if-absent / lock-service calls). Data
    files still need a Spark-readable filesystem — this backend serves
    ``_delta_log`` traffic, which is exactly the part delta-rs abstracts.
    """

    import threading as _threading

    _stores: dict[str, dict[str, tuple[bytes, float]]] = {}
    # created at class definition (single-threaded import), so concurrent
    # first constructions can never install two different locks
    _lock = _threading.Lock()

    def __init__(self, namespace: str = "default"):
        self.ns = namespace
        with MemoryBackend._lock:
            MemoryBackend._stores.setdefault(namespace, {})

    @property
    def _objs(self) -> dict[str, tuple[bytes, float]]:
        return MemoryBackend._stores[self.ns]

    def head_obj(self, path: str) -> ObjectMeta:
        with MemoryBackend._lock:
            if path not in self._objs:
                # directories "exist" if any object lives under them
                if any(k.startswith(path.rstrip("/") + "/") for k in self._objs):
                    return ObjectMeta(path=path, size=0, modification_time=0.0)
                raise FileNotFoundError(path)
            data, mtime = self._objs[path]
            return ObjectMeta(path=path, size=len(data), modification_time=mtime)

    def get_obj(self, path: str) -> bytes:
        with MemoryBackend._lock:
            if path not in self._objs:
                raise FileNotFoundError(path)
            return self._objs[path][0]

    def list_objs(self, path: str) -> Iterator[ObjectMeta]:
        prefix = path.rstrip("/") + "/"
        with MemoryBackend._lock:
            items = [
                (k, v) for k, v in self._objs.items() if k.startswith(prefix)
            ]
        for k, (data, mtime) in sorted(items):
            yield ObjectMeta(path=k, size=len(data), modification_time=mtime)

    def put_obj(self, path: str, data: bytes) -> None:
        import time as _time

        with MemoryBackend._lock:
            self._objs[path] = (data, _time.time())

    def delete_obj(self, path: str) -> None:
        with MemoryBackend._lock:
            self._objs.pop(path, None)

    def rename_obj_noreplace(self, src: str, dst: str) -> None:
        with MemoryBackend._lock:
            if dst in self._objs:
                raise FileAlreadyExistsError(dst)
            if src not in self._objs:
                raise FileNotFoundError(src)
            self._objs[dst] = self._objs.pop(src)

    def join(self, *parts: str) -> str:
        return "/".join(p.strip("/") if i else p.rstrip("/") for i, p in enumerate(parts))

    def makedirs(self, path: str) -> None:
        pass  # object stores have no directories


class S3Backend(StorageBackend):
    """S3 object-store backend for the `_delta_log` directory (boto3).

    The reference's S3 backend (``rust/src/storage/s3/mod.rs``) predates S3
    conditional writes and had to emulate atomic rename with an external
    DynamoDB lock (copy + delete under lease, ``dynamodb_lock.rs:202-380``)
    — or run single-writer without it (``storage/s3/mod.rs:1``). S3 now
    supports conditional PUT natively (``IfNoneMatch="*"`` → HTTP 412 if the
    key exists), so ``rename_obj_noreplace`` here is get(src) → conditional
    put(dst) → delete(src): the dst creation is the atomic
    create-if-absent point the commit protocol needs
    (``rust/src/storage/mod.rs:416-423``), with no lock service. Commit
    objects are single-digit-KB NDJSON, so the driver-side get/put is cheap;
    executors read/write data files through Spark's own s3a layer, never
    through this class.

    A pre-built client can be injected (tests use botocore's Stubber).
    """

    def __init__(self, client=None):
        if client is None:
            try:
                import boto3
            except ImportError as e:  # pragma: no cover
                raise NotImplementedError(
                    "s3:// tables need boto3 on the driver"
                ) from e
            client = boto3.client("s3")
        self.client = client

    @staticmethod
    def _split(path: str) -> tuple[str, str]:
        parsed = urlparse(path)
        if parsed.scheme not in ("s3", "s3a") or not parsed.netloc:
            raise ValueError(f"not an s3 path: {path!r}")
        return parsed.netloc, parsed.path.lstrip("/")

    @staticmethod
    def _is_missing(err) -> bool:
        code = err.response.get("Error", {}).get("Code", "")
        return code in ("404", "NoSuchKey", "NotFound")

    @staticmethod
    def _is_precondition_failed(err) -> bool:
        code = err.response.get("Error", {}).get("Code", "")
        status = err.response.get("ResponseMetadata", {}).get("HTTPStatusCode")
        return code == "PreconditionFailed" or status == 412

    def head_obj(self, path: str) -> ObjectMeta:
        from botocore.exceptions import ClientError

        bucket, key = self._split(path)
        try:
            resp = self.client.head_object(Bucket=bucket, Key=key)
        except ClientError as e:
            if self._is_missing(e):
                raise FileNotFoundError(path) from e
            raise
        return ObjectMeta(
            path=path,
            size=resp["ContentLength"],
            modification_time=resp["LastModified"].timestamp(),
        )

    def get_obj(self, path: str) -> bytes:
        from botocore.exceptions import ClientError

        bucket, key = self._split(path)
        try:
            resp = self.client.get_object(Bucket=bucket, Key=key)
        except ClientError as e:
            if self._is_missing(e):
                raise FileNotFoundError(path) from e
            raise
        return resp["Body"].read()

    def list_objs(self, path: str) -> Iterator[ObjectMeta]:
        bucket, prefix = self._split(path)
        prefix = prefix.rstrip("/") + "/"
        token = None
        while True:
            kwargs = {"Bucket": bucket, "Prefix": prefix}
            if token:
                kwargs["ContinuationToken"] = token
            resp = self.client.list_objects_v2(**kwargs)
            for item in resp.get("Contents", []):
                yield ObjectMeta(
                    path=f"s3://{bucket}/{item['Key']}",
                    size=item["Size"],
                    modification_time=item["LastModified"].timestamp(),
                )
            if not resp.get("IsTruncated"):
                return
            token = resp.get("NextContinuationToken")

    def put_obj(self, path: str, data: bytes) -> None:
        bucket, key = self._split(path)
        self.client.put_object(Bucket=bucket, Key=key, Body=data)

    def delete_obj(self, path: str) -> None:
        bucket, key = self._split(path)
        self.client.delete_object(Bucket=bucket, Key=key)

    def rename_obj_noreplace(self, src: str, dst: str) -> None:
        from botocore.exceptions import ClientError

        data = self.get_obj(src)
        bucket, key = self._split(dst)
        try:
            self.client.put_object(
                Bucket=bucket, Key=key, Body=data, IfNoneMatch="*"
            )
        except ClientError as e:
            if self._is_precondition_failed(e):
                # dst won the race; leave src for the caller's retry loop
                raise FileAlreadyExistsError(dst) from e
            raise
        self.delete_obj(src)

    def join(self, *parts: str) -> str:
        return "/".join(p.strip("/") if i else p.rstrip("/") for i, p in enumerate(parts))

    def makedirs(self, path: str) -> None:
        pass  # object stores have no directories


def parse_table_uri(table_uri: str) -> tuple[str, StorageBackend]:
    """URI → (root path, backend). file:// and bare paths → local FS;
    memory:// → in-process object-store model (log layer only);
    s3:// / s3a:// → S3 via boto3 with conditional-PUT atomic commits.

    Other cloud schemes raise with a pointer to the extension seam (the
    reference ships S3/Azure backends behind the same trait;
    MemoryBackend documents the contract a real one must meet).
    """
    parsed = urlparse(table_uri)
    if parsed.scheme in ("", "file"):
        root = parsed.path if parsed.scheme == "file" else table_uri
        return os.path.abspath(root), LocalFileBackend()
    if parsed.scheme == "memory":
        return f"memory://{parsed.netloc}{parsed.path}".rstrip("/"), MemoryBackend()
    if parsed.scheme in ("s3", "s3a"):
        return f"s3://{parsed.netloc}{parsed.path}".rstrip("/"), S3Backend()
    raise NotImplementedError(
        f"storage scheme {parsed.scheme!r} not available in this environment; "
        "implement a StorageBackend (see reference rust/src/storage/) and register it"
    )
