"""VARIANT columns through Delta tables: the public ``variantType`` table
feature (reader 3 / writer 7, feature in BOTH lists — reader-visible
because the parquet files carry the VARIANT logical type). Spark 4's
native variant (parse_json / variant_get / to_json) is the engine type;
stats for variant-bearing files fall back to a Spark-side scan because
the local pyarrow cannot parse the VARIANT footer annotation."""

import json
import os

import pytest

from delta_rs_spark import DeltaTable, write_deltalake


@pytest.fixture()
def variant_df(spark):
    return spark.range(10).selectExpr(
        "id",
        "parse_json(concat('{\"k\":', id, ',\"tag\":\"t', id % 3, '\"}')) AS props",
    )


def test_variant_create_bumps_protocol(spark, tmp_path, variant_df):
    uri = str(tmp_path / "t")
    write_deltalake(spark, variant_df, uri)
    t = DeltaTable(uri)
    st = t.snapshot.state
    assert st.min_reader_version == 3 and st.min_writer_version == 7
    assert "variantType" in (st.reader_features or [])
    assert "variantType" in (st.writer_features or [])
    # Delta schemaString spells the type "variant"
    fields = {f["name"]: f["type"] for f in json.loads(t.metadata().schema_string)["fields"]}
    assert fields["props"] == "variant"


def test_variant_round_trip_and_extract(spark, tmp_path, variant_df):
    uri = str(tmp_path / "t")
    write_deltalake(spark, variant_df, uri)
    back = DeltaTable(uri).to_df(spark)
    assert back.schema["props"].dataType.typeName() == "variant"
    got = (
        back.selectExpr(
            "variant_get(props, '$.k', 'bigint') AS k",
            "variant_get(props, '$.tag', 'string') AS tag",
        )
        .orderBy("k")
        .collect()
    )
    assert [r.k for r in got] == list(range(10))
    assert got[4].tag == "t1"


def test_variant_stats_fallback_numrecords(spark, tmp_path, variant_df):
    """pyarrow can't read VARIANT footers, so stats come from the Spark
    fallback: numRecords must be exact (metadata-only counts depend on it)
    and the simple column still carries min/max."""
    uri = str(tmp_path / "t")
    write_deltalake(spark, variant_df, uri)
    t = DeltaTable(uri)
    adds = t.add_actions()
    n = 0
    for a in adds:
        assert a.stats is not None
        s = json.loads(a.stats)
        n += s["numRecords"]
        if s["numRecords"]:
            assert "id" in s["minValues"] and "props" not in s["minValues"]
    assert n == 10


def test_variant_dml_and_append(spark, tmp_path, variant_df):
    uri = str(tmp_path / "t")
    write_deltalake(spark, variant_df, uri)
    write_deltalake(spark, variant_df, uri, mode="append")
    t = DeltaTable(uri)
    t.delete(spark, "id >= 5")
    df = t.to_df(spark)
    assert df.count() == 10
    assert (
        df.selectExpr("cast(sum(variant_get(props,'$.k','bigint')) as long) s")
        .collect()[0].s
        == 2 * sum(range(5))
    )


def test_variant_schema_evolution_bumps_feature(spark, tmp_path):
    """Appending with mergeSchema that introduces a variant column carries
    the variantType bump in the same commit."""
    uri = str(tmp_path / "t")
    write_deltalake(spark, spark.range(3).selectExpr("id"), uri)
    t0 = DeltaTable(uri)
    assert "variantType" not in (t0.snapshot.state.reader_features or [])
    evolved = spark.range(3).selectExpr(
        "id", "parse_json(concat('{\"v\":', id, '}')) AS props"
    )
    write_deltalake(spark, evolved, uri, mode="append", schema_mode="merge")
    t = DeltaTable(uri)
    st = t.snapshot.state
    assert "variantType" in (st.reader_features or [])
    got = t.to_df(spark)
    assert got.count() == 6
    assert got.schema["props"].dataType.typeName() == "variant"


def test_collated_string_round_trip(spark, tmp_path):
    """Spark 4 collations serialize as plain ``string`` plus field-metadata
    ``__COLLATIONS`` — the Delta collations proposal's backward-compatible
    encoding, which the schema layer preserves verbatim. A collation-blind
    reader sees an ordinary string column; a collation-aware session gets
    case-insensitive semantics back after reload."""
    import json

    from delta_rs_spark import DeltaTable, write_deltalake

    uri = str(tmp_path / "t")
    df = spark.sql(
        "SELECT * FROM VALUES ('Apple'), ('apple'), ('BANANA') AS t(fruit)"
    ).selectExpr("cast(fruit as string collate UTF8_LCASE) AS fruit")
    write_deltalake(spark, df, uri)
    t = DeltaTable(uri)
    fields = json.loads(t.metadata().schema_string)["fields"]
    assert fields[0]["type"] == "string"  # plain type: old readers unaffected
    assert fields[0]["metadata"]["__COLLATIONS"] == {"fruit": "spark.UTF8_LCASE"}
    back = t.to_df(spark)
    assert "UTF8_LCASE" in back.schema["fruit"].dataType.simpleString().upper()
    # collation-aware comparison and grouping after reload
    assert back.filter("fruit = 'APPLE'").count() == 2
    assert back.select("fruit").distinct().count() == 2
