"""Snapshot state fold over log actions.

Replay semantics match the reference's ``process_action``
(``rust/src/delta.rs:1418-1449``): add appends; remove drops the path from the
active set and records a tombstone; metaData wholly replaces; txn upserts the
per-app watermark; protocol replaces versions; commitInfo accumulates.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Iterable, Optional

from .actions import (
    Action,
    AddAction,
    CdcAction,
    CommitInfoAction,
    DomainMetadataAction,
    MetaDataAction,
    ProtocolAction,
    RemoveAction,
    TxnAction,
)


@dataclass
class TableState:
    """Materialized snapshot state (cf. ``DeltaTableState``, ``rust/src/delta.rs:324-335``)."""

    # path → AddAction; dict preserves insertion order and makes remove O(1)
    files: dict[str, AddAction] = field(default_factory=dict)
    tombstones: dict[str, RemoveAction] = field(default_factory=dict)
    commit_infos: list[dict[str, Any]] = field(default_factory=list)
    app_transaction_version: dict[str, int] = field(default_factory=dict)
    min_reader_version: int = 0
    min_writer_version: int = 0
    reader_features: Optional[list[str]] = None
    writer_features: Optional[list[str]] = None
    metadata: Optional[MetaDataAction] = None
    # domain → configuration JSON string (latest wins; removed tombstones)
    domain_metadata: dict[str, str] = field(default_factory=dict)

    def apply(self, action: Action) -> None:
        if isinstance(action, AddAction):
            # re-add supersedes a prior tombstone for the same path
            self.tombstones.pop(action.path, None)
            self.files[action.path] = action
        elif isinstance(action, RemoveAction):
            self.files.pop(action.path, None)
            self.tombstones[action.path] = action
        elif isinstance(action, MetaDataAction):
            self.metadata = action
        elif isinstance(action, TxnAction):
            self.app_transaction_version[action.app_id] = action.version
        elif isinstance(action, ProtocolAction):
            self.min_reader_version = action.min_reader_version
            self.min_writer_version = action.min_writer_version
            self.reader_features = action.reader_features
            self.writer_features = action.writer_features
        elif isinstance(action, CommitInfoAction):
            self.commit_infos.append(action.info)
        elif isinstance(action, CdcAction):
            pass  # change-data files are not part of the active data set
        elif isinstance(action, DomainMetadataAction):
            if action.removed:
                self.domain_metadata.pop(action.domain, None)
            else:
                self.domain_metadata[action.domain] = action.configuration
        else:  # pragma: no cover
            raise TypeError(f"unknown action {type(action)}")

    def apply_all(self, actions: Iterable[Action]) -> None:
        for a in actions:
            self.apply(a)

    @property
    def file_paths(self) -> list[str]:
        return list(self.files.keys())

    def total_size_bytes(self) -> int:
        return sum(a.size for a in self.files.values())

    def num_records(self) -> Optional[int]:
        """Σ live rows over active files (numRecords minus deletion-vector
        cardinality); None if any file lacks stats."""
        total = 0
        for a in self.files.values():
            n = a.logical_records
            if n is None:
                return None
            total += n
        return total
