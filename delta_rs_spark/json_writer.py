"""Buffered JSON-row writer: accumulate rows, flush as ONE Delta commit.

Parity with the reference's ``BufferedJsonWriter``
(``rust/src/writer.rs:60-140``): ``write(value)`` buffers a JSON-style row
dict, ``record_txn(app_id, version)`` queues streaming watermarks, and
``flush()`` writes every buffered partition's parquet and commits a single
transaction carrying the adds plus the txn actions. Spark-first realization:
the buffered rows become one DataFrame (`createDataFrame` against the table
schema) and the existing write path stages/commits them — per-file stats and
the optimistic commit loop included.

JSON-native values coerce to the column type the way the reference's JSON
writer coerces: ints into double columns, ISO-8601 strings into
timestamp/date columns. Columns omitted from EVERY buffered row are left
out of the frame entirely so the write path's generated-column/DEFAULT
machinery fills them (a row-level ``None`` is an explicit NULL).

The buffer lives on the driver, like the reference's; this writer is for
modest ingest batches (streaming micro-batches, CDC trickles). Bulk loads
should call ``write_deltalake`` with a distributed DataFrame directly.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Optional

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .protocol.actions import TxnAction
from .table import DeltaTable
from .writer import SchemaMismatchError, write_deltalake


def _coerce_json_value(value: Any, dtype: T.DataType) -> Any:
    """JSON-native value → what Spark's strict row verifier accepts."""
    if value is None:
        return None
    if isinstance(dtype, (T.DoubleType, T.FloatType)) and isinstance(
        value, int
    ) and not isinstance(value, bool):
        return float(value)
    if isinstance(dtype, T.TimestampType) and isinstance(value, str):
        return _dt.datetime.fromisoformat(value)
    if isinstance(dtype, T.TimestampNTZType) and isinstance(value, str):
        return _dt.datetime.fromisoformat(value)
    if isinstance(dtype, T.DateType) and isinstance(value, str):
        return _dt.date.fromisoformat(value)
    if isinstance(dtype, T.DecimalType) and isinstance(value, (int, float, str)):
        import decimal

        return decimal.Decimal(str(value))
    return value


class BufferedJsonWriter:
    def __init__(self, spark: SparkSession, table_uri: str):
        self.spark = spark
        self.table = DeltaTable(table_uri)
        self._buffer: list[dict[str, Any]] = []
        self._txns: list[TxnAction] = []

    # schema / partitioning read through the table handle so a long-lived
    # writer (streaming sink) follows schema evolution across flushes
    @property
    def _schema(self) -> T.StructType:
        return self.table.schema()

    @property
    def _partition_cols(self) -> list[str]:
        return self.table.metadata().partition_columns

    def count(self) -> int:
        return len(self._buffer)

    def record_txn(self, app_id: str, version: int, last_updated: Optional[int] = None) -> None:
        """Queue a txn watermark to ride in the next flush's commit
        (reference ``rust/src/writer.rs:55-58``)."""
        self._txns.append(TxnAction(app_id=app_id, version=version, last_updated=last_updated))

    def write(self, value: dict[str, Any]) -> None:
        """Buffer one row. Partition values travel inside the row (they are
        ordinary columns; the flush's partitionBy splits them out), so a row
        missing a partition column is a schema mismatch, mirroring the
        reference's partition checks (``rust/src/writer.rs:65-80``)."""
        missing = [c for c in self._partition_cols if c not in value]
        if missing:
            raise SchemaMismatchError(
                f"row is missing partition column(s) {missing} required by the table"
            )
        unknown = [k for k in value if k not in self._schema.names]
        if unknown:
            raise SchemaMismatchError(f"row has column(s) {unknown} not in the table schema")
        self._buffer.append(value)

    def flush(self) -> Optional[int]:
        """Write buffered rows as parquet + ONE commit (adds + queued txns).
        Returns the committed version, or None if nothing was buffered but
        txns still need a commit vehicle (they get their own empty commit)."""
        if not self._buffer and not self._txns:
            return None
        schema = self._schema
        # writer-assigned columns (generated / DEFAULT / identity) that no
        # buffered row mentions stay OUT of the frame so the write path
        # computes them — a materialized None would read as an explicit NULL
        # and either fail generated-column validation or skip the DEFAULT.
        # Plain columns NULL-fill as before (appends require the full
        # schema). A key present with value None remains an explicit NULL.
        from .protocol import defaults as _dfl
        from .protocol import generated as _gen
        from .protocol import identity as _idc

        assigned = (
            set(_dfl.defaults(schema))
            | set(_gen.expressions(schema))
            | set(_idc.specs(schema))
        )
        fields = [
            f
            for f in schema.fields
            if f.name not in assigned or any(f.name in r for r in self._buffer)
        ]
        frame_schema = T.StructType(fields)
        rows = [
            tuple(
                _coerce_json_value(r.get(f.name), f.dataType) for f in fields
            )
            for r in self._buffer
        ]
        txns = list(self._txns)
        if rows:
            df = self.spark.createDataFrame(rows, frame_schema)
            table = write_deltalake(
                self.spark,
                df,
                self.table.table_uri,
                mode="append",
                extra_actions=txns,
            )
        else:
            txn_obj = self.table.begin()
            txn_obj.add_actions(txns)
            txn_obj.commit(operation="TXN")
            self.table.update()
            table = self.table
        self._buffer.clear()
        self._txns.clear()
        self.table = table
        return table.version
