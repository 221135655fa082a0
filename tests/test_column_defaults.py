"""Column DEFAULT values (public ``allowColumnDefaults`` writer feature)."""

import os

import pytest

from delta_rs_spark import DeltaTable, write_deltalake
from delta_rs_spark.protocol import defaults as dfl


@pytest.fixture()
def src(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "region.parquet"))


def test_create_with_defaults_and_append_omits(spark, tmp_path, src):
    uri = str(tmp_path / "t")
    write_deltalake(
        spark,
        src,
        uri,
        column_defaults={"tier": "'bronze'", "score": "CAST(1.5 AS DOUBLE)"},
    )
    t = DeltaTable(uri)
    assert dfl.defaults(t.schema()) == {
        "tier": "'bronze'",
        "score": "CAST(1.5 AS DOUBLE)",
    }
    assert "allowColumnDefaults" in (t.snapshot.state.writer_features or [])
    rows = t.to_df(spark).collect()
    assert all(r["tier"] == "bronze" and r["score"] == 1.5 for r in rows)

    # append omitting the default columns materializes them per row
    write_deltalake(spark, src.limit(2), uri, mode="append")
    t.update()
    assert t.to_df(spark).filter("tier = 'bronze'").count() == src.count() + 2

    # a provided value always wins (default is a fallback, not a constraint)
    from pyspark.sql import functions as F

    gold = (
        src.limit(1)
        .withColumn("tier", F.lit("gold"))
        .withColumn("score", F.lit(9.9))
    )
    write_deltalake(spark, gold, uri, mode="append")
    t.update()
    assert t.to_df(spark).filter("tier = 'gold'").count() == 1


def test_alter_set_and_drop_default(spark, tmp_path, src):
    from delta_rs_spark.sql import sql

    uri = str(tmp_path / "t")
    write_deltalake(spark, src, uri)
    t = DeltaTable(uri)
    t.add_columns([("note", "STRING")])

    sql(spark, f"ALTER TABLE delta.`{uri}` ALTER COLUMN note SET DEFAULT 'n/a'")
    t.update()
    assert dfl.defaults(t.schema()) == {"note": "'n/a'"}
    assert "allowColumnDefaults" in (t.snapshot.state.writer_features or [])
    # writes omitting the column now get the default; pre-existing rows read NULL
    write_deltalake(spark, src.limit(1).select(*src.columns), uri, mode="append")
    t.update()
    got = t.to_df(spark)
    assert got.filter("note = 'n/a'").count() == 1
    assert got.filter("note IS NULL").count() == src.count()

    sql(spark, f"ALTER TABLE delta.`{uri}` ALTER COLUMN note DROP DEFAULT")
    t.update()
    assert dfl.defaults(t.schema()) == {}


def test_unknown_column_default_raises(spark, tmp_path, src):
    uri = str(tmp_path / "t")
    t = write_deltalake(spark, src, uri)
    with pytest.raises(dfl.ColumnDefaultError, match="no such column"):
        t.set_column_default("nope", "'x'")


def test_merge_insert_uses_defaults(spark, tmp_path, src):
    uri = str(tmp_path / "t")
    write_deltalake(spark, src, uri, column_defaults={"tier": "'bronze'"})
    t = DeltaTable(uri)

    source = src.limit(0).union(
        spark.createDataFrame([(99, "newregion")], src.schema)
    )  # unmatched row, NO tier column
    res = t.merge(
        spark,
        source,
        "t.r_regionkey = s.r_regionkey",
        when_not_matched_insert=True,
    )
    assert res["numTargetRowsInserted"] == 1
    got = t.to_df(spark).filter("r_regionkey = 99").collect()
    assert got and got[0]["tier"] == "bronze"


def test_exists_default_is_literal_folded(spark, tmp_path):
    """EXISTS_DEFAULT must be the DDL-time literal, not the raw expression
    (current_timestamp() re-evaluated at scan time would give every query
    a different value for the same stored rows)."""
    from delta_rs_spark.protocol import defaults as dfl

    uri = str(tmp_path / "t")
    write_deltalake(
        spark,
        spark.range(0, 3).selectExpr("id"),
        uri,
        column_defaults={"created_at": "current_timestamp()", "tag": "'x'"},
    )
    schema = DeltaTable(uri).schema()
    by_name = {f.name: f.metadata for f in schema.fields}
    exists_ts = by_name["created_at"][dfl.EXISTS_DEFAULT]
    assert exists_ts.startswith("TIMESTAMP '")  # folded literal
    assert by_name["created_at"][dfl.CURRENT_DEFAULT] == "current_timestamp()"
    assert by_name["tag"][dfl.EXISTS_DEFAULT] == "'x'"
