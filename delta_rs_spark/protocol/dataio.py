"""Data-plane I/O resolution: how Spark reaches a table's *data* files.

The log layer always goes through :class:`StorageBackend` (small driver-side
I/O). Data files are different: at scale they must be read and written by
Spark's own distributed I/O, never funneled through the driver. This module
decides, per table, which of two paths applies:

- **native** (local filesystem, or a scheme listed in
  ``DELTA_RS_SPARK_NATIVE_DATA_SCHEMES`` because the cluster ships the
  matching Hadoop filesystem jars, e.g. ``s3a`` via hadoop-aws): Spark
  reads/writes the table URI directly. This is the 100 TB path — executors
  stream data, the driver only renames/commits.

- **mirrored** (``memory://``, or object-store tables in an environment
  without Hadoop connector jars): data files flow through the
  StorageBackend on the driver, staged in a local *mirror* directory that
  preserves the log-relative layout (so lineage extraction and Hive
  partition derivation work unchanged). Writes stage locally, then upload;
  reads download on first touch (files are immutable — uuid names — so the
  mirror never invalidates). Correct and fully testable against mocked
  backends, but bounded by driver bandwidth: it is the protocol-contract /
  compatibility path, NOT the scale path. A real cluster ships the jars
  and stays native.

This is what lets merge-on-read DML, CDF change files, and OPTIMIZE run
with identical swap-commit semantics on every backend instead of being
gated to the local filesystem.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import uuid

from .storage import LocalFileBackend

#: env var: comma-separated URI schemes whose data plane Spark can reach
#: natively (the cluster has the Hadoop connector jars on the classpath).
NATIVE_SCHEMES_ENV = "DELTA_RS_SPARK_NATIVE_DATA_SCHEMES"


def _mirror_root_for(table_root: str) -> str:
    key = hashlib.md5(table_root.encode()).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), "delta_rs_spark_mirror", key)


class DataPlane:
    """Per-table resolver between native Spark I/O and backend-mirrored I/O."""

    def __init__(self, log):
        self._log = log
        self._mirror = _mirror_root_for(log.table_root)
        if isinstance(log.backend, LocalFileBackend):
            self.native = True
        else:
            scheme = log.table_root.split("://", 1)[0] if "://" in log.table_root else ""
            allowed = {
                s.strip()
                for s in os.environ.get(NATIVE_SCHEMES_ENV, "").split(",")
                if s.strip()
            }
            self.native = scheme in allowed

    # ---- read side --------------------------------------------------------

    @property
    def scan_root(self) -> str:
        """Root that scanned file paths live under — the string lineage
        extraction strips, and the ``basePath`` for Hive derivation."""
        return self._log.table_root if self.native else self._mirror

    def readable_uri(self, rel_path: str) -> str:
        """URI Spark can read for one log-relative data file (absolute paths
        — shallow clones — pass through on the native plane)."""
        if self.native:
            if "://" in rel_path or rel_path.startswith("/"):
                return rel_path
            return self._log.backend.join(self._log.table_root, rel_path)
        return self._localize_file(rel_path)

    def readable_dir(self, rel_dir: str) -> str:
        """Local-or-native URI for a whole data directory (deletion-vector
        position dirs, change-data dirs)."""
        if self.native:
            return self._log.backend.join(self._log.table_root, rel_dir)
        dst_dir = os.path.join(self._mirror, rel_dir)
        prefix = self._log.backend.join(self._log.table_root, rel_dir)
        root = self._log.table_root.rstrip("/") + "/"
        for meta in self._log.backend.list_objs(prefix):
            rel = meta.path.split(root, 1)[-1]
            self._localize_file(rel, expected_size=meta.size)
        return dst_dir

    def _localize_file(self, rel_path: str, expected_size: int | None = None) -> str:
        dst = os.path.join(self._mirror, rel_path)
        if os.path.exists(dst) and (
            expected_size is None or os.path.getsize(dst) == expected_size
        ):
            return dst  # immutable files: existence == validity
        src = self._log.backend.join(self._log.table_root, rel_path)
        data = self._log.backend.get_obj(src)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        tmp = f"{dst}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, dst)
        return dst

    # ---- write side -------------------------------------------------------

    def stage_dir(self, kind: str) -> str:
        """Directory Spark can WRITE staged parquet into. Native: a hidden
        dir inside the table (promotion is then a cheap same-FS rename).
        Mirrored: a local temp dir (promotion uploads via the backend)."""
        name = f".tmp-{kind}-{uuid.uuid4().hex}"
        if self.native:
            return self._log.backend.join(self._log.table_root, name)
        path = os.path.join(self._mirror, name)
        os.makedirs(path, exist_ok=True)
        return path

    def publish_file(self, local_src: str, final_rel: str) -> tuple[int, int]:
        """Move one staged file to its final log-relative path; returns
        (size, modification_time_ms). Native: os.rename (same filesystem —
        atomic and free). Mirrored: backend put + keep a mirror copy so an
        immediate read-back skips the download."""
        import time as _time

        if self.native:
            dst = self._log.backend.join(self._log.table_root, final_rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.rename(local_src, dst)
            st = os.stat(dst)
            return st.st_size, int(st.st_mtime * 1000)
        with open(local_src, "rb") as fh:
            data = fh.read()
        self._log.backend.put_obj(
            self._log.backend.join(self._log.table_root, final_rel), data
        )
        mirror_dst = os.path.join(self._mirror, final_rel)
        os.makedirs(os.path.dirname(mirror_dst), exist_ok=True)
        os.replace(local_src, mirror_dst)
        return len(data), int(_time.time() * 1000)

    def publish_bytes(self, data: bytes, final_rel: str) -> None:
        """Publish driver-produced bytes (deletion-vector .bin files,
        similar metadata-adjacent artifacts) at a log-relative path."""
        if self.native:
            dst = self._log.backend.join(self._log.table_root, final_rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            tmp = f"{dst}.tmp-{uuid.uuid4().hex}"
            with open(tmp, "wb") as fh:
                fh.write(data)
            os.replace(tmp, dst)
            return
        self._log.backend.put_obj(
            self._log.backend.join(self._log.table_root, final_rel), data
        )
        mirror_dst = os.path.join(self._mirror, final_rel)
        os.makedirs(os.path.dirname(mirror_dst), exist_ok=True)
        with open(mirror_dst, "wb") as fh:
            fh.write(data)

    def publish_dir(self, local_dir: str, rel_dir: str) -> int:
        """Publish every file of a staged directory under ``rel_dir``
        (names preserved); returns total bytes."""
        total = 0
        for dirpath, _dirs, files in os.walk(local_dir):
            for f in files:
                if f.startswith((".", "_")) and not f.endswith(".parquet"):
                    continue  # Spark _SUCCESS / .crc markers
                src = os.path.join(dirpath, f)
                rel = os.path.relpath(src, local_dir)
                size, _ = self.publish_file(
                    src, f"{rel_dir}/{rel.replace(os.sep, '/')}"
                )
                total += size
        return total

    def evict(self, rel_path: str) -> None:
        """Drop the mirror copy of a deleted file (vacuum hook) so mirror
        disk usage tracks the live table, not its whole history."""
        p = os.path.join(self._mirror, rel_path)
        try:
            os.remove(p)
        except OSError:
            pass

    def dir_bytes(self, rel_dir: str) -> int:
        """Total bytes under a published data directory."""
        if self.native:
            root = self._log.backend.join(self._log.table_root, rel_dir)
            total = 0
            for dirpath, _dirs, files in os.walk(root):
                for f in files:
                    total += os.path.getsize(os.path.join(dirpath, f))
            return total
        prefix = self._log.backend.join(self._log.table_root, rel_dir)
        return sum(m.size for m in self._log.backend.list_objs(prefix))
