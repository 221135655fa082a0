"""Data-plane I/O resolution: how Spark reaches a table's *data* files.

The log layer always goes through :class:`StorageBackend` (small driver-side
I/O). Data files are different: at scale they must be read and written by
Spark's own distributed I/O, never funneled through the driver. This module
decides, per table, which of three shapes applies:

- **native local** (local filesystem): Spark reads/writes paths directly;
  staged-file promotion is a same-FS rename (atomic and free).

- **native remote** (a scheme listed in
  ``DELTA_RS_SPARK_NATIVE_DATA_SCHEMES`` because the cluster ships the
  matching Hadoop filesystem jars, e.g. ``s3a`` via hadoop-aws): Spark
  streams data to/from the store directly — the 100 TB path. The driver
  handles only metadata-sized work: listing the staged files (one LIST),
  promoting each to its final name via the backend's SERVER-SIDE copy
  (S3 CopyObject / GCS rewrite / Azure copy-from-URL — no payload through
  the driver), and publishing driver-produced small artifacts (DV .bin
  files). The env value's spelling is what Spark's jars register (s3a),
  while the StorageBackend speaks the canonical scheme (s3) — URIs are
  translated at the Spark boundary, so either spelling in the env works
  for a table opened under either spelling.

- **mirrored** (``memory://``, or object-store tables in an environment
  without Hadoop connector jars): data files flow through the
  StorageBackend on the driver, staged in a local *mirror* directory that
  preserves the log-relative layout (so lineage extraction and Hive
  partition derivation work unchanged). Writes stage locally, then upload;
  reads download on first touch (files are immutable — uuid names — so the
  mirror never invalidates). Correct and fully testable against mocked
  backends, but bounded by driver bandwidth: it is the protocol-contract /
  compatibility path, NOT the scale path.

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
#: Spell them the way the jars register the FileSystem (``s3a``, ``abfss``,
#: ``gs``); canonical spellings (``s3``) are accepted and treated as the
#: Spark-facing scheme too.
NATIVE_SCHEMES_ENV = "DELTA_RS_SPARK_NATIVE_DATA_SCHEMES"

#: scheme aliases → the canonical scheme ``parse_table_uri`` normalizes
#: table roots to. One family = one storage service reachable through one
#: backend; the member spelling only matters to Spark's FileSystem registry.
_SCHEME_CANON = {"s3a": "s3", "s3n": "s3", "abfs": "abfss"}


def _canon_scheme(scheme: str) -> str:
    return _SCHEME_CANON.get(scheme, scheme)


def _mirror_root_for(table_root: str) -> str:
    key = hashlib.md5(table_root.encode()).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), "delta_rs_spark_mirror", key)


class DataPlane:
    """Per-table resolver between native Spark I/O and backend-mirrored I/O."""

    def __init__(self, log):
        self._log = log
        self._mirror = _mirror_root_for(log.table_root)
        root = log.table_root
        self._canon = root.split("://", 1)[0] if "://" in root else ""
        self._spark_scheme: str | None = None
        if isinstance(log.backend, LocalFileBackend):
            self.native = True
            self.remote = False
        else:
            allowed = [
                s.strip()
                for s in os.environ.get(NATIVE_SCHEMES_ENV, "").split(",")
                if s.strip()
            ]
            # the env spelling is what Spark's FileSystem registry knows;
            # match by FAMILY so env=s3a covers an s3://-normalized root
            match = next(
                (s for s in allowed if _canon_scheme(s) == self._canon), None
            )
            self.native = match is not None
            self.remote = self.native
            self._spark_scheme = match

    # ---- scheme translation (Spark boundary) -------------------------------

    def spark_uri(self, uri: str) -> str:
        """Canonical backend URI → the URI Spark's jars resolve (s3 → s3a)."""
        if (
            self._spark_scheme
            and self._spark_scheme != self._canon
            and uri.startswith(self._canon + "://")
        ):
            return self._spark_scheme + uri[len(self._canon):]
        return uri

    def canonical_uri(self, uri: str) -> str:
        """Spark-facing URI → the canonical URI the StorageBackend speaks."""
        if (
            self._spark_scheme
            and self._spark_scheme != self._canon
            and uri.startswith(self._spark_scheme + "://")
        ):
            return self._canon + uri[len(self._spark_scheme):]
        return uri

    # ---- read side --------------------------------------------------------

    @property
    def scan_root(self) -> str:
        """Root that scanned file paths live under — the string lineage
        extraction strips, and the ``basePath`` for Hive derivation."""
        if self.native:
            return self.spark_uri(self._log.table_root)
        return self._mirror

    def readable_uri(self, rel_path: str) -> str:
        """URI Spark can read for one log-relative data file. Absolute
        paths (shallow clones) pass through on native planes and are
        fetched into the mirror on mirrored planes."""
        if self.native:
            if "://" in rel_path or rel_path.startswith("/"):
                return self.spark_uri(rel_path)
            return self.spark_uri(
                self._log.backend.join(self._log.table_root, rel_path)
            )
        if "://" in rel_path:
            return self._localize_foreign(rel_path)
        if rel_path.startswith("/"):
            return rel_path  # clone of a local-FS table
        return self._localize_file(rel_path)

    def local_uri(self, rel_path: str) -> str:
        """A path DRIVER-SIDE pyarrow can open (footer probes, manifest
        counts). Native-local passes through; mirrored and native-remote
        planes fetch through the backend into the mirror — bounded,
        metadata-sized use only."""
        if self.native and not self.remote:
            return self.readable_uri(rel_path)
        if "://" in rel_path:
            return self._localize_foreign(self.canonical_uri(rel_path))
        if rel_path.startswith("/"):
            return rel_path
        return self._localize_file(rel_path)

    def readable_dir(self, rel_dir: str) -> str:
        """Local dir holding a whole data directory (legacy deletion-vector
        position dirs decoded with driver-side pyarrow) — downloaded via
        the backend on non-local planes."""
        if self.native and not self.remote:
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
        self._write_local(dst, data)
        return dst

    def _localize_foreign(self, uri: str) -> str:
        """Fetch an ABSOLUTE uri (a shallow clone's source file, possibly a
        different table root) into this table's mirror under a stable
        content-addressed name."""
        from .storage import parse_table_uri

        name = uri.rsplit("/", 1)[-1]
        dst = os.path.join(
            self._mirror,
            ".clone",
            f"{hashlib.md5(uri.encode()).hexdigest()[:16]}-{name}",
        )
        if os.path.exists(dst):
            return dst
        normalized, backend = parse_table_uri(uri)
        self._write_local(dst, backend.get_obj(normalized))
        return dst

    @staticmethod
    def _write_local(dst: str, data: bytes) -> None:
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        tmp = f"{dst}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, dst)

    # ---- write side -------------------------------------------------------

    def stage_dir(self, kind: str) -> str:
        """Directory Spark can WRITE staged parquet into. Native: a hidden
        dir inside the table (local: promotion is a cheap same-FS rename;
        remote: promotion is a server-side copy). Mirrored: a local temp
        dir (promotion uploads via the backend)."""
        name = f".tmp-{kind}-{uuid.uuid4().hex}"
        if self.native:
            return self.spark_uri(
                self._log.backend.join(self._log.table_root, name)
            )
        path = os.path.join(self._mirror, name)
        os.makedirs(path, exist_ok=True)
        return path

    def staged_files(self, staging_dir: str) -> list[str]:
        """The staged parquet data files under a :meth:`stage_dir` result
        (Spark marker files excluded), as Spark-facing paths/URIs."""
        if "://" in staging_dir:
            prefix = self.canonical_uri(staging_dir)
            out = []
            for meta in self._log.backend.list_objs(prefix):
                base = meta.path.rsplit("/", 1)[-1]
                if base.endswith(".parquet") and not base.startswith((".", "_")):
                    out.append(self.spark_uri(meta.path))
            return out
        out = []
        for dirpath, _dirs, files in os.walk(staging_dir):
            for f in files:
                if f.endswith(".parquet") and not f.startswith((".", "_")):
                    out.append(os.path.join(dirpath, f))
        return out

    def cleanup_stage(self, staging_dir: str) -> None:
        """Remove a staging dir and everything left in it (marker files,
        files of a failed promotion)."""
        if "://" in staging_dir:
            prefix = self.canonical_uri(staging_dir)
            for meta in list(self._log.backend.list_objs(prefix)):
                try:
                    self._log.backend.delete_obj(meta.path)
                except OSError:  # pragma: no cover - best-effort cleanup
                    pass
            return
        import shutil

        shutil.rmtree(staging_dir, ignore_errors=True)

    def publish_file(self, staged_src: str, final_rel: str) -> tuple[int, int]:
        """Move one staged file to its final log-relative path; returns
        (size, modification_time_ms). Native local: os.rename (atomic,
        free). Native remote: SERVER-SIDE backend copy + delete — no
        payload through the driver. Mirrored: backend put + keep a mirror
        copy so an immediate read-back skips the download."""
        import time as _time

        dst = self._log.backend.join(self._log.table_root, final_rel)
        if self.native and not self.remote:
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.rename(staged_src, dst)
            st = os.stat(dst)
            return st.st_size, int(st.st_mtime * 1000)
        if self.remote:
            src = self.canonical_uri(staged_src)
            self._log.backend.copy_obj(src, dst)
            self._log.backend.delete_obj(src)
            meta = self._log.backend.head_obj(dst)
            return meta.size, int(meta.modification_time * 1000)
        with open(staged_src, "rb") as fh:
            data = fh.read()
        self._log.backend.put_obj(dst, data)
        mirror_dst = os.path.join(self._mirror, final_rel)
        os.makedirs(os.path.dirname(mirror_dst), exist_ok=True)
        os.replace(staged_src, mirror_dst)
        return len(data), int(_time.time() * 1000)

    def publish_bytes(self, data: bytes, final_rel: str) -> None:
        """Publish driver-produced bytes (deletion-vector .bin files,
        similar metadata-adjacent artifacts) at a log-relative path."""
        if self.native and not self.remote:
            dst = self._log.backend.join(self._log.table_root, final_rel)
            self._write_local(dst, data)
            return
        self._log.backend.put_obj(
            self._log.backend.join(self._log.table_root, final_rel), data
        )
        if not self.remote:
            # mirrored plane reads through the mirror — pre-seed it
            mirror_dst = os.path.join(self._mirror, final_rel)
            self._write_local(mirror_dst, data)

    def evict(self, rel_path: str) -> None:
        """Drop the mirror copy of a deleted file (vacuum hook) so mirror
        disk usage tracks the live table, not its whole history."""
        p = os.path.join(self._mirror, rel_path)
        try:
            os.remove(p)
        except OSError:
            pass
