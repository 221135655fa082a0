"""BufferedJsonWriter parity tests (reference rust/src/writer.rs:60-140):
buffered rows flush as one commit; txn watermarks ride along; partition
column checks mirror the reference's errors."""

import pytest
from pyspark.sql import functions as F

from delta_rs_spark import DeltaTable, write_deltalake
from delta_rs_spark.json_writer import BufferedJsonWriter
from delta_rs_spark.writer import SchemaMismatchError


@pytest.fixture()
def part_table(spark, tmp_path):
    uri = str(tmp_path / "jt")
    df = spark.range(3).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("bucket"), F.lit(1.0).alias("v")
    )
    write_deltalake(spark, df, uri, partition_by=["bucket"])
    return uri


def test_buffered_rows_flush_as_one_commit(spark, part_table):
    w = BufferedJsonWriter(spark, part_table)
    w.write({"id": 10, "bucket": "0", "v": 2.5})
    w.write({"id": 11, "bucket": "1", "v": 3.5})
    w.record_txn("stream-app", 7)
    assert w.count() == 2
    v_before = DeltaTable(part_table).version

    version = w.flush()
    assert version == v_before + 1
    assert w.count() == 0

    t = DeltaTable(part_table)
    assert t.get_app_transaction_version("stream-app") == 7
    rows = {r.id: (r.bucket, r.v) for r in t.to_df(spark).collect()}
    assert rows[10] == ("0", 2.5)
    assert rows[11] == ("1", 3.5)
    assert len(rows) == 5


def test_partition_column_checks(spark, part_table):
    w = BufferedJsonWriter(spark, part_table)
    with pytest.raises(SchemaMismatchError, match="partition column"):
        w.write({"id": 1, "v": 1.0})  # missing bucket
    with pytest.raises(SchemaMismatchError, match="not in the table schema"):
        w.write({"id": 1, "bucket": "0", "v": 1.0, "extra": True})


def test_txn_only_flush(spark, part_table):
    w = BufferedJsonWriter(spark, part_table)
    w.record_txn("app-x", 3)
    w.flush()
    assert DeltaTable(part_table).get_app_transaction_version("app-x") == 3


def test_empty_flush_is_noop(spark, part_table):
    w = BufferedJsonWriter(spark, part_table)
    v = DeltaTable(part_table).version
    assert w.flush() is None
    assert DeltaTable(part_table).version == v
