"""Table snapshot: log replay → active file list → Spark DataFrame.

Load strategy mirrors the reference (``rust/src/delta.rs:589-709``): start
from the newest checkpoint ≤ target version (``_last_checkpoint`` hint, else
log-dir scan), fold the JSON commit tail. All of this is driver-side and
small; the resulting file list feeds one Spark parquet scan — the scan itself
(vectorized reader, pushdown, codegen) is entirely Catalyst's.
"""

from __future__ import annotations

import json
from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .actions import (
    Action,
    AddAction,
    MetaDataAction,
    ProtocolAction,
    RemoveAction,
    TxnAction,
)
from .log import CheckPoint, DeltaLog
from .partitions import FilterTuple, compile_filters, file_matches
from .schema import partition_value_to_typed, schema_string_to_spark
from .state import TableState
from .stats import SkipTuple, prune_files


class DeltaTableError(Exception):
    pass


class NotATableError(DeltaTableError):
    pass


class Snapshot:
    """Immutable view of a table at one version."""

    def __init__(self, log: DeltaLog, version: int, state: TableState):
        self.log = log
        self.version = version
        self.state = state

    # ---- construction --------------------------------------------------
    @classmethod
    def load(cls, log: DeltaLog, version: Optional[int] = None) -> "Snapshot":
        state = TableState()
        start_version = 0

        cp: Optional[CheckPoint] = None
        last_cp = log.read_last_checkpoint()
        if version is None:
            cp = last_cp
        else:
            if last_cp is not None and last_cp.version <= version:
                cp = last_cp
            else:
                cp = log.find_latest_checkpoint_for_version(version)
        if cp is not None:
            state.apply_all(read_checkpoint_actions(log, cp))
            start_version = cp.version + 1

        v = start_version
        loaded = cp.version if cp is not None else -1
        while version is None or v <= version:
            actions = log.try_read_commit(v)
            if actions is None:
                break
            state.apply_all(actions)
            loaded = v
            v += 1

        if loaded < 0:
            raise NotATableError(f"{log.table_root} is not a Delta table (empty log)")
        if version is not None and loaded != version:
            raise DeltaTableError(
                f"version {version} does not exist in {log.table_root} (latest {loaded})"
            )
        return cls(log, loaded, state)

    def apply_new_versions(self) -> "Snapshot":
        """Incremental refresh: fold commits newer than this snapshot
        (reference ``update_incremental``, ``rust/src/delta.rs:612-638``)."""
        v = self.version + 1
        state = self.state
        loaded = self.version
        while True:
            actions = self.log.try_read_commit(v)
            if actions is None:
                break
            state.apply_all(actions)
            loaded = v
            v += 1
        return Snapshot(self.log, loaded, state) if loaded != self.version else self

    # ---- accessors -------------------------------------------------------
    @property
    def metadata(self) -> MetaDataAction:
        if self.state.metadata is None:
            raise DeltaTableError("snapshot has no metaData action")
        return self.state.metadata

    def schema(self) -> T.StructType:
        return schema_string_to_spark(self.metadata.schema_string)

    def data_schema(self) -> T.StructType:
        """Schema of the parquet data files = table schema minus partition columns."""
        pcols = set(self.metadata.partition_columns)
        return T.StructType([f for f in self.schema().fields if f.name not in pcols])

    def files(
        self,
        partition_filters: Sequence[FilterTuple] | None = None,
        skip_predicates: Sequence[SkipTuple] | None = None,
    ) -> list[AddAction]:
        adds = list(self.state.files.values())
        if partition_filters:
            compiled = compile_filters(partition_filters)
            adds = [a for a in adds if file_matches(a, compiled)]
        if skip_predicates:
            adds = prune_files(adds, skip_predicates)
        return adds

    def file_paths(self, **kw) -> list[str]:
        return [a.path for a in self.files(**kw)]

    def file_uris(self, **kw) -> list[str]:
        return [self._absolute(a.path) for a in self.files(**kw)]

    def _absolute(self, path: str) -> str:
        if "://" in path or path.startswith("/"):
            return path
        return self.log.backend.join(self.log.table_root, path)

    def stats(self) -> list[Optional[dict[str, Any]]]:
        return [a.get_stats() for a in self.state.files.values()]

    # ---- DataFrame construction -------------------------------------------
    def to_df(
        self,
        spark: SparkSession,
        columns: Sequence[str] | None = None,
        partition_filters: Sequence[FilterTuple] | None = None,
        skip_predicates: Sequence[SkipTuple] | None = None,
    ) -> DataFrame:
        """Snapshot → DataFrame.

        File-level pruning (partition filters + stats skipping) happens here,
        *before* plan construction — Spark never lists or opens pruned files.
        Partition columns are attached from the log's partitionValues (the
        parquet files do not store them), grouped so each distinct partition
        tuple is one scan branch; row-level residual filtering is left to
        Catalyst.
        """
        adds = self.files(partition_filters=partition_filters, skip_predicates=skip_predicates)
        return self.df_for_adds(spark, adds, columns=columns)

    def df_for_adds(
        self,
        spark: SparkSession,
        adds: list[AddAction],
        columns: Sequence[str] | None = None,
    ) -> DataFrame:
        """DataFrame over an explicit subset of this snapshot's files.

        Used by to_df (after pruning) and by copy-on-write DML, which reads
        only the files it must rewrite."""
        table_schema = self.schema()
        pcols = self.metadata.partition_columns

        if not adds:
            return spark.createDataFrame([], table_schema).select(*(columns or table_schema.names))

        if not pcols:
            df = spark.read.schema(table_schema).parquet(*[self._absolute(a.path) for a in adds])
        else:
            df = self._read_partitioned(spark, adds)

        df = df.select(*table_schema.names)
        if columns:
            df = df.select(*columns)
        return df

    # above this many distinct partition tuples, a lit()-union plan becomes a
    # liability (a 10k-branch union stalls analysis); switch to one basePath
    # scan where Spark derives partition columns from the Hive paths
    MAX_UNION_BRANCHES = 64

    def _read_partitioned(self, spark: SparkSession, adds: list[AddAction]) -> DataFrame:
        """Attach partition columns from the log's partitionValues.

        Small group count (the common case after pruning): one union branch
        per distinct partition tuple with typed ``lit()`` columns — exact,
        no path parsing, works even for non-Hive layouts. Large group count
        (full scan of a heavily partitioned table): a single
        ``basePath`` scan over exactly the log's file list — one scan node,
        no plan explosion; Spark types the partition columns from our
        schema. Only the listed files are read either way — basePath only
        controls partition-column derivation, not file discovery.
        """
        schema = self.schema()
        data_schema = self.data_schema()
        pcols = self.metadata.partition_columns
        ptypes = {f.name: f.dataType for f in schema.fields if f.name in pcols}

        groups: dict[tuple, list[str]] = {}
        for a in adds:
            key = tuple(a.partition_values.get(c) for c in pcols)
            groups.setdefault(key, []).append(self._absolute(a.path))

        if len(groups) > self.MAX_UNION_BRANCHES:
            all_paths = [p for paths in groups.values() for p in paths]
            # basePath derivation requires the Hive key=value layout; fall
            # back to unions if any file's path doesn't encode it
            if all(f"/{c}=" in p for p in all_paths for c in pcols):
                return (
                    spark.read.schema(schema)
                    .option("basePath", self.log.table_root)
                    .parquet(*all_paths)
                )

        branches = []
        for key, paths in groups.items():
            branch = spark.read.schema(data_schema).parquet(*paths)
            for cname, sval in zip(pcols, key):
                typed = partition_value_to_typed(sval, ptypes[cname])
                branch = branch.withColumn(cname, F.lit(typed).cast(ptypes[cname]))
            branches.append(branch.select(*schema.names))
        df = branches[0]
        for b in branches[1:]:
            df = df.unionByName(b)
        return df

    # ---- misc ------------------------------------------------------------
    def min_reader_version(self) -> int:
        return self.state.min_reader_version

    def min_writer_version(self) -> int:
        return self.state.min_writer_version

    def app_transaction_version(self, app_id: str) -> Optional[int]:
        return self.state.app_transaction_version.get(app_id)


# ---- checkpoint parquet → actions (driver-side pyarrow) -------------------

def read_checkpoint_actions(log: DeltaLog, cp: CheckPoint) -> list[Action]:
    """Decode checkpoint parquet rows into actions.

    Row layout per the Delta protocol (one struct column per action type;
    reference reader ``rust/src/action.rs:726-775``). Reads with pyarrow on
    the driver: checkpoints are a few MB of metadata, not data-plane I/O.
    """
    import io

    import pyarrow.parquet as pq

    actions: list[Action] = []
    for path in log.checkpoint_paths(cp):
        table = pq.read_table(io.BytesIO(log.backend.get_obj(path)))
        for row in table.to_pylist():
            meta_d = row.get("metaData")
            if meta_d and meta_d.get("id") is not None:
                if isinstance(meta_d.get("format"), dict) is False and meta_d.get("format"):
                    meta_d["format"] = dict(meta_d["format"])
                actions.append(MetaDataAction.from_json_dict(_strip_none(meta_d)))
                continue
            proto = row.get("protocol")
            if proto and proto.get("minReaderVersion") is not None:
                actions.append(ProtocolAction.from_json_dict(proto))
                continue
            txn = row.get("txn")
            if txn and txn.get("appId") is not None:
                actions.append(TxnAction.from_json_dict(txn))
                continue
            add = row.get("add")
            if add and add.get("path") is not None:
                add = _strip_none(add)
                if add.get("stats") is None and add.get("stats_parsed") is not None:
                    add["stats"] = json.dumps(add.pop("stats_parsed"), default=str)
                add.pop("stats_parsed", None)
                add.pop("partitionValues_parsed", None)
                pv = add.get("partitionValues")
                if isinstance(pv, list):  # pyarrow map type → list of (k, v)
                    add["partitionValues"] = dict(pv)
                actions.append(AddAction.from_json_dict(add))
                continue
            remove = row.get("remove")
            if remove and remove.get("path") is not None:
                remove = _strip_none(remove)
                pv = remove.get("partitionValues")
                if isinstance(pv, list):
                    remove["partitionValues"] = dict(pv)
                actions.append(RemoveAction.from_json_dict(remove))
    return actions


def _strip_none(d: dict) -> dict:
    return {k: v for k, v in d.items() if v is not None}
