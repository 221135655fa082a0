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


def test_json_native_values_coerce_and_defaults_fill(spark, tmp_path):
    """JSON-native values (int into double, ISO string into timestamp) must
    coerce, and writer-assigned columns omitted from every row must be
    computed (not materialized as explicit NULL)."""
    from delta_rs_spark.json_writer import BufferedJsonWriter

    uri = str(tmp_path / "t")
    write_deltalake(
        spark,
        spark.createDataFrame(
            [], "id long, price double, ts timestamp, tier string"
        ),
        uri,
        column_defaults={"tier": "'standard'"},
    )
    w = BufferedJsonWriter(spark, uri)
    w.write({"id": 1, "price": 5, "ts": "2024-06-01T10:00:00"})  # int + ISO
    w.write({"id": 2, "price": 2.5, "ts": "2024-06-01T11:00:00"})
    w.flush()
    rows = {r.id: r for r in DeltaTable(uri).to_df(spark).collect()}
    assert rows[1].price == 5.0 and rows[1].ts.hour == 10
    assert rows[1].tier == "standard"  # DEFAULT filled, not NULL
    assert rows[2].tier == "standard"


def test_generated_column_computed_through_json_writer(spark, tmp_path):
    from delta_rs_spark.json_writer import BufferedJsonWriter

    uri = str(tmp_path / "t")
    write_deltalake(
        spark,
        spark.createDataFrame([], "id long, x long"),
        uri,
        generated_columns={"g": "x + 1"},
    )
    w = BufferedJsonWriter(spark, uri)
    w.write({"id": 1, "x": 10})
    w.flush()
    row = DeltaTable(uri).to_df(spark).collect()[0]
    assert row.g == 11
