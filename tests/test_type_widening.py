"""Type widening (public Delta ``typeWidening`` table feature).

Metadata-only column-type widening: old parquet files keep their narrow
physical types and Spark's vectorized reader upcasts them at scan time;
``delta.typeChanges`` field metadata records each change. Parity-plus — the
reference engine (rust/src/schema.rs) has no type-evolution surface at all.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_rs_spark import DeltaTable, write_deltalake
from delta_rs_spark.maintenance import FeatureDropError
from delta_rs_spark.protocol import widening as tw


def _make(spark, uri, ddl, rows):
    write_deltalake(spark, spark.createDataFrame(rows, ddl), uri)
    return DeltaTable(uri)


def test_widen_int_to_long_reads_old_and_new_files(spark, tmp_path):
    uri = str(tmp_path / "t")
    t = _make(spark, uri, "id int, v int", [(1, 10), (2, 20)])
    v = t.widen_column_type("v", "bigint")
    assert v == t.version
    assert t.schema()["v"].dataType == T.LongType()
    # protocol + property + recorded change
    assert "typeWidening" in (t.snapshot.state.reader_features or [])
    assert "typeWidening" in (t.snapshot.state.writer_features or [])
    assert t.metadata().configuration.get("delta.enableTypeWidening") == "true"
    changes = tw.type_changes(t.schema())
    assert changes == {
        "v": [{"tableVersion": v, "fromType": "integer", "toType": "long"}]
    }
    # append a value that only fits in long; old int32 files upcast at scan
    big = 2**40
    write_deltalake(
        spark, spark.createDataFrame([(3, big)], "id int, v bigint"), uri, mode="append"
    )
    t.update()
    got = {r["v"] for r in t.to_df(spark).collect()}
    assert got == {10, 20, big}
    assert dict(t.to_df(spark).dtypes)["v"] == "bigint"


def test_widen_chain_records_every_step(spark, tmp_path):
    uri = str(tmp_path / "t")
    t = _make(spark, uri, "id int, v float", [(1, 1.5)])
    t.widen_column_type("v", T.DoubleType())
    with pytest.raises(tw.UnsupportedWideningError):
        t.widen_column_type("v", "float")  # narrowing back refused
    t2 = _make(spark, str(tmp_path / "u"), "id int, d decimal(5,2)", [])
    t2.widen_column_type("d", "decimal(10,2)")
    t2.widen_column_type("d", "decimal(12,4)")
    assert [c["toType"] for c in tw.type_changes(t2.schema())["d"]] == [
        "decimal(10,2)",
        "decimal(12,4)",
    ]


@pytest.mark.parametrize(
    "src_ddl,dst,ok",
    [
        ("v smallint", "int", True),
        ("v smallint", "bigint", True),
        ("v int", "double", True),
        ("v int", "decimal(10,0)", True),
        ("v int", "decimal(11,1)", True),
        ("v int", "decimal(9,0)", False),  # < 10 integral digits
        ("v bigint", "decimal(20,0)", True),
        ("v bigint", "decimal(19,0)", False),
        ("v bigint", "int", False),
        ("v double", "float", False),
        ("v string", "bigint", False),
        ("v decimal(10,2)", "decimal(11,1)", False),  # scale shrinks
        ("v date", "timestamp_ntz", True),
        ("v date", "timestamp", False),  # only ntz is in the spec
    ],
)
def test_widening_rule_matrix(spark, tmp_path, src_ddl, dst, ok):
    uri = str(tmp_path / "t")
    t = _make(spark, uri, f"id int, {src_ddl}", [])
    if ok:
        t.widen_column_type("v", dst)
        assert t.schema()["v"].dataType == T.DataType.fromDDL(dst)
    else:
        with pytest.raises(tw.UnsupportedWideningError):
            t.widen_column_type("v", dst)


def test_widen_date_to_timestamp_ntz_reads_and_features(spark, tmp_path):
    uri = str(tmp_path / "t")
    df = spark.createDataFrame([("2024-01-02",)], "s string").select(
        F.col("s").cast("date").alias("d")
    )
    write_deltalake(spark, df, uri)
    t = DeltaTable(uri)
    t.widen_column_type("d", "timestamp_ntz")
    assert "timestampNtz" in (t.snapshot.state.reader_features or [])
    [row] = t.to_df(spark).collect()
    assert row["d"] == dt.datetime(2024, 1, 2)


def test_widen_nested_struct_field(spark, tmp_path):
    uri = str(tmp_path / "t")
    df = spark.createDataFrame([(1, (7, "x"))], "id int, s struct<a:int,b:string>")
    write_deltalake(spark, df, uri)
    t = DeltaTable(uri)
    t.widen_column_type("s.a", "bigint")
    assert t.schema()["s"].dataType["a"].dataType == T.LongType()
    assert "s.a" in tw.type_changes(t.schema())
    write_deltalake(
        spark,
        spark.createDataFrame([(2, (2**40, "y"))], "id int, s struct<a:bigint,b:string>"),
        uri,
        mode="append",
    )
    t.update()
    assert {r["s"]["a"] for r in t.to_df(spark).collect()} == {7, 2**40}


def test_widen_unknown_column_raises(spark, tmp_path):
    t = _make(spark, str(tmp_path / "t"), "id int", [])
    with pytest.raises(ValueError, match="not found"):
        t.widen_column_type("nope", "bigint")


def test_sql_alter_column_type(spark, tmp_path):
    from delta_rs_spark.sql import sql as dsql

    uri = str(tmp_path / "t")
    _make(spark, uri, "id int, v int", [(1, 5)])
    out = dsql(spark, f"ALTER TABLE delta.`{uri}` ALTER COLUMN v TYPE BIGINT").collect()
    assert out[0]["toType"] == "BIGINT"
    assert DeltaTable(uri).schema()["v"].dataType == T.LongType()


def test_pyarrow_path_upcasts_old_files(spark, tmp_path):
    uri = str(tmp_path / "t")
    t = _make(spark, uri, "id int, v int", [(1, 10)])
    t.widen_column_type("v", "bigint")
    write_deltalake(
        spark, spark.createDataFrame([(2, 2**40)], "id int, v bigint"), uri, mode="append"
    )
    t.update()
    pt = t.to_pyarrow_table()
    import pyarrow as pa

    assert pt.schema.field("v").type == pa.int64()
    assert set(pt.column("v").to_pylist()) == {10, 2**40}


def test_stats_skipping_survives_widening(spark, tmp_path):
    uri = str(tmp_path / "t")
    narrow = spark.createDataFrame([(1, 10), (2, 20)], "id int, v int").coalesce(1)
    write_deltalake(spark, narrow, uri)
    t = DeltaTable(uri)
    t.widen_column_type("v", "bigint")
    wide = spark.createDataFrame([(3, 2**41)], "id int, v bigint").coalesce(1)
    write_deltalake(spark, wide, uri, mode="append")
    t.update()
    # min/max on the narrow file was written as ints; predicate beyond
    # int32 range must prune it and keep the wide file
    pruned = t.files(skip_predicates=[("v", ">", 2**40)])
    assert len(pruned) == 1
    assert t.to_df(spark).filter(F.col("v") > 2**40).count() == 1


def test_merge_write_auto_widens_when_enabled(spark, tmp_path):
    uri = str(tmp_path / "t")
    t = _make(spark, uri, "id int, v int", [(1, 10)])
    wide = spark.createDataFrame([(2, 2**40)], "id int, v bigint")
    # without the property: refused with a pointer to it
    with pytest.raises(Exception, match="enableTypeWidening"):
        write_deltalake(spark, wide, uri, mode="append", schema_mode="merge")
    t.set_properties({"delta.enableTypeWidening": "true"})
    write_deltalake(spark, wide, uri, mode="append", schema_mode="merge")
    t.update()
    assert t.schema()["v"].dataType == T.LongType()
    assert "typeWidening" in (t.snapshot.state.writer_features or [])
    assert "v" in tw.type_changes(t.schema())
    assert {r["v"] for r in t.to_df(spark).collect()} == {10, 2**40}


def test_merge_write_upcasts_narrow_incoming(spark, tmp_path):
    """Narrower incoming data casts UP to the table type — no schema change,
    no property needed."""
    uri = str(tmp_path / "t")
    t = _make(spark, uri, "id int, v bigint", [(1, 10)])
    narrow = spark.createDataFrame([(2, 20)], "id int, v int")
    write_deltalake(spark, narrow, uri, mode="append", schema_mode="merge")
    t.update()
    assert t.schema()["v"].dataType == T.LongType()
    assert tw.type_changes(t.schema()) == {}
    assert {r["v"] for r in t.to_df(spark).collect()} == {10, 20}


def test_merge_write_incompatible_types_still_refused(spark, tmp_path):
    uri = str(tmp_path / "t")
    t = _make(spark, uri, "id int, v string", [(1, "x")])
    t.set_properties({"delta.enableTypeWidening": "true"})
    bad = spark.createDataFrame([(2, 5)], "id int, v int")
    with pytest.raises(Exception, match="cannot change existing column types"):
        write_deltalake(spark, bad, uri, mode="append", schema_mode="merge")


def test_drop_feature_lifecycle(spark, tmp_path):
    uri = str(tmp_path / "t")
    t = _make(spark, uri, "id int, v int", [(1, 10)])
    t.widen_column_type("v", "bigint")

    # property still on -> refused
    with pytest.raises(FeatureDropError, match="enableTypeWidening"):
        t.drop_feature("typeWidening", truncate_history=True)
    t.unset_properties(["delta.enableTypeWidening"])

    # narrow physical files remain -> refused with the optimize hint
    with pytest.raises(FeatureDropError, match="narrow physical"):
        t.drop_feature("typeWidening", truncate_history=True)

    t.optimize(spark)  # rewrites at the wide type
    t.update()
    # reader-visible: requires TRUNCATE HISTORY
    with pytest.raises(FeatureDropError, match="reader-visible"):
        t.drop_feature("typeWidening")
    t.drop_feature("typeWidening", truncate_history=True)
    t.update()
    assert "typeWidening" not in (t.snapshot.state.reader_features or [])
    # bookkeeping stripped, wide type retained, data intact
    assert tw.type_changes(t.schema()) == {}
    assert t.schema()["v"].dataType == T.LongType()
    assert [r["v"] for r in t.to_df(spark).collect()] == [10]


def test_widen_partition_column(spark, tmp_path):
    """Partition values live as strings in the log; widening the partition
    column re-types them through the wider type on read."""
    uri = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10), (2, 20)], "bucket int, v int")
    from delta_rs_spark import write_deltalake as _w

    _w(spark, df, uri, partition_by=["bucket"])
    t = DeltaTable(uri)
    t.widen_column_type("bucket", "bigint")
    _w(
        spark,
        spark.createDataFrame([(2**40, 30)], "bucket bigint, v int"),
        uri,
        mode="append",
    )
    t.update()
    rows = {(r["bucket"], r["v"]) for r in t.to_df(spark).collect()}
    assert rows == {(1, 10), (2, 20), (2**40, 30)}
    assert dict(t.to_df(spark).dtypes)["bucket"] == "bigint"
    # partition pruning still works on both old and new values
    assert t.to_df(spark, partition_filters=[("bucket", "=", "1")]).count() == 1
    assert (
        t.to_df(spark, partition_filters=[("bucket", "=", str(2**40))]).count() == 1
    )


def test_widen_survives_column_mapping_rename(spark, tmp_path):
    """typeChanges metadata must ride along when column-mapping transforms
    rewrite the schema (rename keeps physical name + widening history)."""
    uri = str(tmp_path / "t")
    t = _make(spark, uri, "id int, v int", [(1, 10)])
    t.set_column_mapping_mode("name")
    t.widen_column_type("v", "bigint")
    t.rename_column("v", "value")
    t.update()
    changes = tw.type_changes(t.schema())
    assert "value" in changes and changes["value"][0]["toType"] == "long"
    write_deltalake(
        spark,
        spark.createDataFrame([(2, 2**40)], "id int, value bigint"),
        uri,
        mode="append",
    )
    t.update()
    assert {r["value"] for r in t.to_df(spark).collect()} == {10, 2**40}


def test_widen_across_cdf_and_checkpoint(spark, tmp_path):
    """Change-data-feed rows and checkpointed schemas both cross the
    widening boundary: pre-widen change files are narrow, post-widen wide;
    a reload from the checkpoint keeps the typeChanges bookkeeping."""
    uri = str(tmp_path / "t")
    write_deltalake(
        spark,
        spark.createDataFrame([(1, 10), (2, 20)], "id int, v int"),
        uri,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    t = DeltaTable(uri)
    t.update_where(spark, "id = 1", {"v": "11"})  # narrow change files (v1)
    t = DeltaTable(uri)
    t.widen_column_type("v", "bigint")  # v2
    t = DeltaTable(uri)
    t.update_where(spark, "id = 2", {"v": str(2**40)})  # wide change files (v3)
    t = DeltaTable(uri)
    cdf = t.load_cdf(spark, starting_version=1).collect()
    by_type = {}
    for r in cdf:
        by_type.setdefault(r["_change_type"], set()).add(r["v"])
    assert 11 in by_type["update_postimage"]
    assert 2**40 in by_type["update_postimage"]

    t.create_checkpoint()
    t2 = DeltaTable(uri)  # reload through the checkpoint
    assert tw.type_changes(t2.schema())["v"][0]["toType"] == "long"
    assert {r["v"] for r in t2.to_df(spark).collect()} == {11, 2**40}


def test_drop_feature_gate_sees_mapped_and_nested_narrow_files(spark, tmp_path):
    """The narrow-file gate must catch physical column names (column
    mapping) and nested struct fields — the regression let the drop
    through while files still carried int32 pages."""
    # column-mapped: files store col-<uuid>/original physical names
    uri = str(tmp_path / "m")
    t = _make(spark, uri, "id int, v int", [(1, 10)])
    t.set_column_mapping_mode("name")
    t.widen_column_type("v", "bigint")
    t.unset_properties(["delta.enableTypeWidening"])
    with pytest.raises(FeatureDropError, match="narrow physical"):
        t.drop_feature("typeWidening", truncate_history=True)

    # nested: widened struct field
    uri2 = str(tmp_path / "n")
    write_deltalake(
        spark,
        spark.createDataFrame([(1, (7, "x"))], "id int, s struct<a:int,b:string>"),
        uri2,
    )
    t2 = DeltaTable(uri2)
    t2.widen_column_type("s.a", "bigint")
    t2.unset_properties(["delta.enableTypeWidening"])
    with pytest.raises(FeatureDropError, match="narrow physical"):
        t2.drop_feature("typeWidening", truncate_history=True)
