"""Transaction-log path scheme, listing, and checkpoint discovery.

Naming follows the Delta protocol exactly (reference ``rust/src/delta.rs:407-443``):
commits ``_delta_log/{version:020d}.json``, checkpoints
``{version:020d}.checkpoint.parquet`` or the multi-part variant
``{version:020d}.checkpoint.{part:010d}.{parts:010d}.parquet``, and the
``_last_checkpoint`` JSON pointer.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from typing import Optional

from .actions import Action, actions_to_log_entry, parse_log_entry
from .storage import FileAlreadyExistsError, parse_table_uri

DELTA_LOG_DIR = "_delta_log"
LAST_CHECKPOINT = "_last_checkpoint"

_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
# single-part and multi-part checkpoint names (reference regexes, delta.rs:449-456)
_CHECKPOINT_RE = re.compile(r"^(\d{20})\.checkpoint\.parquet$")
_CHECKPOINT_PARTS_RE = re.compile(r"^(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet$")
# log-compaction files (public Delta log-compaction layout): the reconciled
# actions of commits [start, end] in one NDJSON object — readers may fold the
# compaction instead of the individual commits; foreign readers that predate
# the feature ignore the name (it matches no commit/checkpoint pattern)
_COMPACTION_RE = re.compile(r"^(\d{20})\.(\d{20})\.compacted\.json$")
# V2 checkpoint manifests (public `v2Checkpoint` table feature):
# {version}.checkpoint.{uniqueStr}.parquet — matched AFTER the multi-part
# pattern (whose {part}.{parts} segment would also satisfy uniqueStr)
_CHECKPOINT_V2_RE = re.compile(r"^(\d{20})\.checkpoint\.([A-Za-z0-9_-]+)\.parquet$")
SIDECAR_DIR = "_sidecars"


@dataclass
class CheckPoint:
    version: int
    size: Optional[int] = None
    parts: Optional[int] = None
    # V2 checkpoints: the manifest's uniqueStr ({v}.checkpoint.{uuid}.parquet)
    uuid: Optional[str] = None

    def to_json(self) -> str:
        d = {"version": self.version}
        if self.size is not None:
            d["size"] = self.size
        if self.parts is not None:
            d["parts"] = self.parts
        if self.uuid is not None:
            d["uuid"] = self.uuid
        return json.dumps(d, separators=(",", ":"))

    @classmethod
    def from_json(cls, text: str) -> "CheckPoint":
        d = json.loads(text)
        return cls(
            version=d["version"],
            size=d.get("size"),
            parts=d.get("parts"),
            uuid=d.get("uuid"),
        )


class DeltaLog:
    """Driver-side handle on one table's ``_delta_log`` directory."""

    def __init__(self, table_uri: str):
        self.table_root, self.backend = parse_table_uri(table_uri)
        self.log_dir = self.backend.join(self.table_root, DELTA_LOG_DIR)
        self._data_plane = None
        self._ts_cache: dict[int, int] = {}

    @property
    def data_plane(self):
        """Lazy per-table :class:`~.dataio.DataPlane` (native Spark I/O vs
        backend-mirrored I/O for data files)."""
        if self._data_plane is None:
            from .dataio import DataPlane

            self._data_plane = DataPlane(self)
        return self._data_plane

    # ---- path scheme -------------------------------------------------
    def commit_path(self, version: int) -> str:
        return self.backend.join(self.log_dir, f"{version:020d}.json")

    def checkpoint_paths(self, cp: CheckPoint) -> list[str]:
        if cp.uuid is not None:
            return [
                self.backend.join(
                    self.log_dir, f"{cp.version:020d}.checkpoint.{cp.uuid}.parquet"
                )
            ]
        if cp.parts is None:
            return [self.backend.join(self.log_dir, f"{cp.version:020d}.checkpoint.parquet")]
        return [
            self.backend.join(
                self.log_dir,
                f"{cp.version:020d}.checkpoint.{part:010d}.{cp.parts:010d}.parquet",
            )
            for part in range(1, cp.parts + 1)
        ]

    def last_checkpoint_path(self) -> str:
        return self.backend.join(self.log_dir, LAST_CHECKPOINT)

    def compaction_path(self, start: int, end: int) -> str:
        return self.backend.join(
            self.log_dir, f"{start:020d}.{end:020d}.compacted.json"
        )

    # ---- discovery ---------------------------------------------------
    def is_delta_table(self) -> bool:
        return self.backend.exists(self.log_dir) and (
            self.latest_version() is not None or self.read_last_checkpoint() is not None
        )

    def list_commit_versions(self) -> list[int]:
        versions = []
        for meta in self.backend.list_objs(self.log_dir):
            name = meta.path.rsplit("/", 1)[-1]
            m = _COMMIT_RE.match(name)
            if m:
                versions.append(int(m.group(1)))
        return sorted(versions)

    def latest_version(self) -> Optional[int]:
        versions = self.list_commit_versions()
        return versions[-1] if versions else None

    def read_last_checkpoint(self) -> Optional[CheckPoint]:
        try:
            return CheckPoint.from_json(
                self.backend.get_obj(self.last_checkpoint_path()).decode("utf-8")
            )
        except FileNotFoundError:
            return None

    def find_latest_checkpoint_for_version(self, version: int) -> Optional[CheckPoint]:
        """Newest COMPLETE checkpoint ≤ version, by log-dir scan (single,
        multi-part and v2).

        Mirrors the reference's regex scan (``rust/src/delta.rs:445-502``),
        with one strengthening: a multi-part checkpoint only qualifies when
        every one of its parts is present — a writer that crashed after
        uploading part 1 of 3 must not poison snapshot loads; replay falls
        back to the next-newest complete checkpoint (or plain commits).
        """
        singles: set[int] = set()
        multi: dict[tuple[int, int], set[int]] = {}
        v2: dict[int, str] = {}
        for meta in self.backend.list_objs(self.log_dir):
            name = meta.path.rsplit("/", 1)[-1]
            m = _CHECKPOINT_RE.match(name)
            if m:
                singles.add(int(m.group(1)))
                continue
            m = _CHECKPOINT_PARTS_RE.match(name)
            if m:
                v, part, parts = int(m.group(1)), int(m.group(2)), int(m.group(3))
                multi.setdefault((v, parts), set()).add(part)
                continue
            m = _CHECKPOINT_V2_RE.match(name)
            if m:
                v2[int(m.group(1))] = m.group(2)

        best: Optional[CheckPoint] = None
        for v in singles:
            if v <= version and (best is None or v > best.version):
                best = CheckPoint(version=v)
        for (v, parts), seen in multi.items():
            if v <= version and len(seen) == parts and (
                best is None or v > best.version
            ):
                best = CheckPoint(version=v, parts=parts)
        for v, uid in v2.items():
            if v <= version and (best is None or v > best.version):
                best = CheckPoint(version=v, uuid=uid)
        return best

    def sidecar_path(self, name: str) -> str:
        return self.backend.join(self.log_dir, SIDECAR_DIR, name)

    def list_compactions(self) -> list[tuple[int, int]]:
        """(start, end) ranges of every log-compaction file, sorted."""
        out: list[tuple[int, int]] = []
        for meta in self.backend.list_objs(self.log_dir):
            name = meta.path.rsplit("/", 1)[-1]
            m = _COMPACTION_RE.match(name)
            if m:
                out.append((int(m.group(1)), int(m.group(2))))
        return sorted(out)

    def try_read_compaction(self, start: int, end: int) -> Optional[list[Action]]:
        try:
            return parse_log_entry(
                self.backend.get_obj(self.compaction_path(start, end)).decode("utf-8")
            )
        except FileNotFoundError:
            return None

    # ---- commit I/O ----------------------------------------------------
    def read_commit(self, version: int) -> list[Action]:
        return parse_log_entry(self.backend.get_obj(self.commit_path(version)).decode("utf-8"))

    def try_read_commit(self, version: int) -> Optional[list[Action]]:
        try:
            return self.read_commit(version)
        except FileNotFoundError:
            return None

    def commit_timestamp_ms(self, version: int) -> int:
        """Commit wall-clock time for time travel and streaming bounds.

        Prefers ``commitInfo.inCommitTimestamp`` (public Delta
        inCommitTimestamp feature: writer-stamped, monotonic — the reliable
        clock on object stores where an object's mtime is its upload/copy
        time); falls back to the log file's mtime, the reference behavior
        (``delta.rs:711-729``). Memoized: committed timestamps never change.
        """
        cached = self._ts_cache.get(version)
        if cached is not None:
            return cached
        path = self.commit_path(version)
        ict: Optional[int] = None
        try:
            # bounded head read: commitInfo is the first log line by writer
            # contract, so 64 KB covers it however many actions follow (a
            # ranged GET on object stores — never the whole commit object)
            raw = self.backend.get_obj_head(path, 65536)
            first, sep, _rest = raw.partition(b"\n")
            if not sep and len(raw) == 65536:
                # pathological first line longer than the head window
                first = self.backend.get_obj(path).split(b"\n", 1)[0]
            obj = json.loads(first)
            info = obj.get("commitInfo")
            if info is not None and info.get("inCommitTimestamp") is not None:
                ict = int(info["inCommitTimestamp"])
        except FileNotFoundError:
            raise
        except Exception:  # malformed first line → mtime fallback
            ict = None
        if ict is None:
            ict = int(self.backend.head_obj(path).modification_time * 1000)
        self._ts_cache[version] = ict
        return ict

    def write_tmp_commit(self, actions: list[Action], token: str) -> str:
        """Phase 1 of two-phase commit: NDJSON to ``_commit_<token>.json.tmp``."""
        tmp = self.backend.join(self.log_dir, f"_commit_{token}.json.tmp")
        self.backend.put_obj(tmp, (actions_to_log_entry(actions) + "\n").encode("utf-8"))
        return tmp

    def try_commit(self, tmp_path: str, version: int) -> None:
        """Phase 2: atomic rename-without-replace to the versioned name.

        Raises FileAlreadyExistsError when the version was taken by a
        concurrent writer — the caller retries at version+1.
        """
        self.backend.rename_obj_noreplace(tmp_path, self.commit_path(version))

    def absolute(self, path: str) -> str:
        """Resolve a log-recorded (possibly relative) file path against the
        table root — same contract as Snapshot._absolute."""
        if "://" in path or path.startswith("/"):
            return path
        return self.backend.join(self.table_root, path)

    def readable(self, path: str) -> str:
        """Like :meth:`absolute`, but guaranteed readable by Spark/pyarrow —
        a backend-mirrored local copy on non-native data planes."""
        return self.data_plane.readable_uri(path)

    def readable_dir(self, rel_dir: str) -> str:
        return self.data_plane.readable_dir(rel_dir)

    def put_last_checkpoint(self, cp: CheckPoint) -> None:
        self.backend.put_obj(self.last_checkpoint_path(), cp.to_json().encode("utf-8"))


__all__ = ["DeltaLog", "CheckPoint", "FileAlreadyExistsError", "DELTA_LOG_DIR"]
