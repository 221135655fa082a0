"""Exactly-once streaming sink: foreachBatch → transactional Delta append.

The idempotency protocol is the reference's ``txn`` watermark
(``rust/src/delta.rs:863-866,1437-1442`` and writer surface
``rust/src/writer.rs:55-58``): every micro-batch commit carries
``txn {appId, version: epochId}``; on retry/restart a batch whose epochId is
≤ the recorded watermark is skipped, so each batch lands exactly once no
matter how many times Structured Streaming replays it.

Usage::

    sink = ExactlyOnceDeltaSink(table_uri, app_id="my-query")
    (df.writeStream.foreachBatch(sink).option("checkpointLocation", ...).start())
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


class ExactlyOnceDeltaSink:
    def __init__(
        self,
        table_uri: str,
        app_id: str,
        partition_by: Optional[list[str]] = None,
        output_mode: str = "Append",
    ):
        self.table_uri = table_uri
        self.app_id = app_id
        self.partition_by = partition_by
        self.output_mode = output_mode
        self.skipped_epochs: list[int] = []  # observability for tests/metrics

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        from ..protocol.actions import TxnAction
        from ..protocol.snapshot import NotATableError
        from ..table import DeltaTable
        from ..writer import write_deltalake

        try:
            table = DeltaTable(self.table_uri)
            last = table.get_app_transaction_version(self.app_id)
            if last is not None and epoch_id <= last:
                self.skipped_epochs.append(epoch_id)
                return
        except NotATableError:
            pass  # first batch creates the table

        mode = "overwrite" if self.output_mode.lower() == "complete" else "append"
        write_deltalake(
            batch_df.sparkSession if hasattr(batch_df, "sparkSession") else batch_df.sql_ctx.sparkSession,
            batch_df,
            self.table_uri,
            mode=mode,
            partition_by=self.partition_by,
            extra_actions=[TxnAction(app_id=self.app_id, version=epoch_id)],
            operation="STREAMING UPDATE",
            operation_parameters_extra={
                "outputMode": self.output_mode,
                "queryId": self.app_id,
                "epochId": str(epoch_id),
            },
        )
