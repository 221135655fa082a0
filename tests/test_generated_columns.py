"""Generated columns (public Delta writer feature): expression stored in
field metadata (delta.generationExpression), computed when omitted,
validated when provided, recomputed through UPDATE/MERGE rewrites."""

import pytest
from pyspark.sql import functions as F

from delta_rs_spark.protocol import generated as gen
from delta_rs_spark.table import DeltaTable
from delta_rs_spark.writer import write_deltalake


def _mk(spark, path, **kw):
    df = spark.createDataFrame(
        [(1, "2024-03-05 10:00:00"), (2, "2024-04-01 09:30:00")],
        "id long, ts_s string",
    ).select("id", F.col("ts_s").cast("timestamp").alias("ts"))
    return write_deltalake(
        spark, df, path,
        generated_columns={"event_date": "CAST(ts AS DATE)"},
        **kw,
    )


def test_create_computes_and_annotates(spark, tmp_path):
    t = _mk(spark, str(tmp_path))
    assert t.protocol_versions() == (1, 4)
    assert gen.expressions(t.schema()) == {"event_date": "CAST(ts AS DATE)"}
    rows = {r.id: str(r.event_date) for r in t.to_df(spark).collect()}
    assert rows == {1: "2024-03-05", 2: "2024-04-01"}


def test_append_omitting_column_computes_it(spark, tmp_path):
    _mk(spark, str(tmp_path))
    df = spark.createDataFrame([(3, "2024-05-10 08:00:00")], "id long, ts_s string").select(
        "id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    write_deltalake(spark, df, str(tmp_path), mode="append")
    t = DeltaTable.for_path(str(tmp_path))
    rows = {r.id: str(r.event_date) for r in t.to_df(spark).collect()}
    assert rows[3] == "2024-05-10"


def test_append_with_wrong_value_rejected(spark, tmp_path):
    _mk(spark, str(tmp_path))
    df = (
        spark.createDataFrame([(4, "2024-05-10 08:00:00")], "id long, ts_s string")
        .select("id", F.col("ts_s").cast("timestamp").alias("ts"))
        .withColumn("event_date", F.lit("1999-01-01").cast("date"))
    )
    with pytest.raises(gen.GeneratedColumnError, match="event_date"):
        write_deltalake(spark, df, str(tmp_path), mode="append")
    # correct provided value passes
    ok = (
        spark.createDataFrame([(4, "2024-05-10 08:00:00")], "id long, ts_s string")
        .select("id", F.col("ts_s").cast("timestamp").alias("ts"))
        .withColumn("event_date", F.to_date(F.col("ts")))
    )
    write_deltalake(spark, ok, str(tmp_path), mode="append")
    assert DeltaTable.for_path(str(tmp_path)).to_df(spark).count() == 3


def test_update_recomputes_and_rejects_direct_assignment(spark, tmp_path):
    t = _mk(spark, str(tmp_path))
    with pytest.raises(gen.GeneratedColumnError, match="always computed"):
        t.update_where(spark, "id = 1", {"event_date": "DATE'2000-01-01'"})
    t.update_where(spark, "id = 1", {"ts": "CAST('2025-12-25 00:00:00' AS TIMESTAMP)"})
    t = DeltaTable.for_path(str(tmp_path))
    rows = {r.id: str(r.event_date) for r in t.to_df(spark).collect()}
    assert rows[1] == "2025-12-25"  # recomputed, not stale
    assert rows[2] == "2024-04-01"


def test_merge_recomputes(spark, tmp_path):
    t = _mk(spark, str(tmp_path))
    from delta_rs_spark.dml import merge

    source = spark.createDataFrame(
        [(1, "2030-01-01 12:00:00"), (9, "2031-06-15 07:00:00")], "id long, ts_s string"
    ).select("id", F.col("ts_s").cast("timestamp").alias("ts"))
    with pytest.raises(gen.GeneratedColumnError):
        merge(spark, t, source, "t.id = s.id", when_matched_update={"event_date": "s.ts"})
    merge(
        spark, t, source, "t.id = s.id",
        when_matched_update={"ts": "s.ts"},
        when_not_matched_insert=False,
    )
    t = DeltaTable.for_path(str(tmp_path))
    rows = {r.id: str(r.event_date) for r in t.to_df(spark).collect()}
    assert rows[1] == "2030-01-01" and rows[2] == "2024-04-01"


def test_merge_insert_computes(spark, tmp_path):
    t = _mk(spark, str(tmp_path))
    from delta_rs_spark.dml import merge

    # source lacks the generated column entirely — but INSERT requires the
    # full schema, so supply it (with the right value) via the expression
    source = (
        spark.createDataFrame([(9, "2031-06-15 07:00:00")], "id long, ts_s string")
        .select("id", F.col("ts_s").cast("timestamp").alias("ts"))
        .withColumn("event_date", F.lit(None).cast("date"))
    )
    merge(spark, t, source, "t.id = s.id", when_not_matched_insert=True)
    t = DeltaTable.for_path(str(tmp_path))
    rows = {r.id: str(r.event_date) for r in t.to_df(spark).collect()}
    assert rows[9] == "2031-06-15"  # recomputed despite the null placeholder


def test_generated_on_existing_table_rejected(spark, tmp_path):
    t = _mk(spark, str(tmp_path))
    df = t.to_df(spark)
    with pytest.raises(ValueError, match="CREATE-time"):
        write_deltalake(
            spark, df, str(tmp_path), mode="append",
            generated_columns={"event_date": "CAST(ts AS DATE)"},
        )


def test_generated_with_row_tracking_and_mapping(spark, tmp_path):
    t = _mk(
        spark, str(tmp_path),
        configuration={
            "delta.enableRowTracking": "true",
            "delta.columnMapping.mode": "name",
        },
    )
    assert t.protocol_versions() == (2, 7)
    wf = set(t.snapshot.state.writer_features)
    assert {"generatedColumns", "rowTracking", "columnMapping"} <= wf
    before = {
        r.id: r._row_id for r in t.to_df(spark, with_row_ids=True).collect()
    }
    t.update_where(spark, "id = 1", {"ts": "CAST('2026-01-01 00:00:00' AS TIMESTAMP)"})
    t = DeltaTable.for_path(str(tmp_path))
    got = {r.id: (str(r.event_date), r._row_id) for r in t.to_df(spark, with_row_ids=True).collect()}
    assert got[1][0] == "2026-01-01" and got[1][1] == before[1]


def test_create_validates_provided_generated_values(spark, tmp_path):
    """CREATE with a frame that PROVIDES a generated column must validate
    it — the invariant holds from version 0."""
    from delta_rs_spark.protocol.generated import GeneratedColumnError

    uri = str(tmp_path / "t")
    bad = spark.createDataFrame([(1, 5, 999)], "id long, x long, g long")
    with pytest.raises(GeneratedColumnError):
        write_deltalake(spark, bad, uri, generated_columns={"g": "x + 1"})
    good = spark.createDataFrame([(1, 5, 6)], "id long, x long, g long")
    write_deltalake(spark, good, str(tmp_path / "t2"), generated_columns={"g": "x + 1"})
