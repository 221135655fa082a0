"""COPY INTO: idempotent batch ingest — already-loaded files skip, the
registry rides the log as domainMetadata (survives checkpoints), FORCE
reloads, text formats take the table schema."""

import os

import pytest

from delta_rs_spark import DeltaTable, sql, write_deltalake
from delta_rs_spark.ingest import COPY_INTO_DOMAIN, CopyIntoError, copy_into


@pytest.fixture()
def target(spark, tmp_path):
    uri = str(tmp_path / "t")
    write_deltalake(spark, spark.range(0).selectExpr("id", "id * 2 AS v"), uri)
    return uri


def _land(spark, tmp_path, name, lo, hi):
    src = str(tmp_path / "landing" / name)
    spark.range(lo, hi).selectExpr("id", "id * 2 AS v").coalesce(1).write.parquet(src)
    return str(tmp_path / "landing")


def test_copy_into_loads_then_skips(spark, tmp_path, target):
    landing = _land(spark, tmp_path, "batch1", 0, 10)
    res = copy_into(spark, target, landing)
    assert res["num_inserted_rows"] == 10 and res["numFilesLoaded"] >= 1
    t = DeltaTable(target)
    assert t.to_df(spark).count() == 10
    assert COPY_INTO_DOMAIN in t.snapshot.state.domain_metadata
    # retry is a no-op: every file already registered
    res2 = copy_into(spark, target, landing)
    assert res2["numFilesLoaded"] == 0 and res2["numFilesSkipped"] >= 1
    assert DeltaTable(target).to_df(spark).count() == 10
    # a new landing file loads alone
    _land(spark, tmp_path, "batch2", 10, 15)
    res3 = copy_into(spark, target, landing)
    assert res3["num_inserted_rows"] == 5
    assert DeltaTable(target).to_df(spark).count() == 15


def test_copy_into_registry_survives_checkpoint(spark, tmp_path, target):
    landing = _land(spark, tmp_path, "b1", 0, 8)
    copy_into(spark, target, landing)
    t = DeltaTable(target)
    t.create_checkpoint()
    res = copy_into(spark, target, landing)  # fresh handle reads checkpoint
    assert res["numFilesLoaded"] == 0
    assert DeltaTable(target).to_df(spark).count() == 8


def test_copy_into_force_reloads(spark, tmp_path, target):
    landing = _land(spark, tmp_path, "b1", 0, 6)
    copy_into(spark, target, landing)
    res = copy_into(spark, target, landing, force=True)
    assert res["num_inserted_rows"] == 6
    assert DeltaTable(target).to_df(spark).count() == 12


def test_copy_into_csv_uses_table_schema(spark, tmp_path, target):
    src = tmp_path / "csvland"
    src.mkdir()
    (src / "a.csv").write_text("id,v\n100,200\n101,202\n")
    res = copy_into(spark, target, str(src), file_format="csv")
    assert res["num_inserted_rows"] == 2
    got = DeltaTable(target).to_df(spark).orderBy("id").collect()
    assert [(r.id, r.v) for r in got] == [(100, 200), (101, 202)]


def test_copy_into_sql_and_pattern(spark, tmp_path, target):
    landing = tmp_path / "landing"
    _land(spark, tmp_path, "keep", 0, 4)
    (landing / "noise.txt").write_text("not parquet")
    out = sql(
        spark,
        f"COPY INTO delta.`{target}` FROM '{landing}' "
        f"FILEFORMAT = PARQUET PATTERN = '*.parquet'",
    ).collect()[0]
    assert int(out["num_inserted_rows"]) == 4
    ops = [e.get("operation") for e in DeltaTable(target).history()]
    assert "COPY INTO" in ops


def test_copy_into_missing_source_and_bad_format(spark, target):
    with pytest.raises(CopyIntoError, match="does not exist"):
        copy_into(spark, target, "/nonexistent/dir")
    with pytest.raises(CopyIntoError, match="FILEFORMAT"):
        copy_into(spark, target, "/tmp", file_format="orc")


def test_copy_into_identity_table(spark, tmp_path):
    """Target with a GENERATED ALWAYS identity column: source files omit the
    column (as they must) and the writer assigns it."""
    uri = str(tmp_path / "t_id")
    write_deltalake(
        spark,
        spark.range(0).selectExpr("id AS v"),
        uri,
        identity_columns={"row_id": {"start": 1, "step": 1}},
    )
    src = str(tmp_path / "landing_id" / "b1")
    spark.range(0, 8).selectExpr("id AS v").coalesce(1).write.parquet(src)
    res = copy_into(spark, uri, str(tmp_path / "landing_id"))
    assert res["num_inserted_rows"] == 8
    rows = DeltaTable(uri).to_df(spark).collect()
    ids = sorted(r.row_id for r in rows)
    assert ids == list(range(1, 9))  # assigned, unique, from START WITH


def test_concurrent_copy_into_registries_merge(spark, tmp_path, target):
    """Two COPY INTOs racing from the same snapshot must not clobber each
    other's loaded-file registry: the loser's commit aborts on the domain
    conflict and its retry merges on top of the winner's registry."""
    import json as _json

    from delta_rs_spark.ingest import _registry
    from delta_rs_spark.transactions import ConcurrentDomainMetadataError

    landing_a = _land(spark, tmp_path, "ra", 0, 5)
    copy_into(spark, target, landing_a, pattern="ra/*")

    # simulate the race at the transaction level: a txn that read the
    # domain sees a competing domain write land first
    from delta_rs_spark.protocol.actions import DomainMetadataAction
    from delta_rs_spark.transactions import DeltaTransaction

    t = DeltaTable(target)
    loser = DeltaTransaction(t)
    loser.record_reads(domains=[COPY_INTO_DOMAIN])
    loser.add_action(
        DomainMetadataAction(domain=COPY_INTO_DOMAIN, configuration="{}")
    )
    winner = DeltaTransaction(DeltaTable(target))
    winner.add_action(
        DomainMetadataAction(
            domain=COPY_INTO_DOMAIN, configuration='{"w": {"size": 1}}'
        )
    )
    winner.commit(operation="COPY INTO")
    with pytest.raises(ConcurrentDomainMetadataError):
        loser.commit(operation="COPY INTO")

    # end-to-end: copy_into's retry loop re-reads the (clobbered-to-"w")
    # registry and merges the new batch on top of it
    landing_b = _land(spark, tmp_path, "rb", 5, 9)
    copy_into(spark, target, landing_b, pattern="rb/*")
    reg = _registry(DeltaTable(target))
    assert "w" in reg  # the winner's entry survived
    assert any("rb" in k for k in reg)


def _write_avro(path, schema, records):
    from delta_rs_spark.uniform.avro import write_container

    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(write_container(schema, records))


_AVRO_SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "v", "type": ["null", "long"], "default": None},
    ],
}


def test_copy_into_avro_loads_then_skips(spark, tmp_path):
    # own target: 'v' must be nullable (the landing data carries a null)
    target = str(tmp_path / "t_avro")
    write_deltalake(
        spark, spark.createDataFrame([], "id bigint, v bigint"), target
    )
    landing = str(tmp_path / "avro_landing")
    _write_avro(
        os.path.join(landing, "a.avro"),
        _AVRO_SCHEMA,
        [{"id": i, "v": i * 2} for i in range(5)],
    )
    _write_avro(
        os.path.join(landing, "b.avro"),
        _AVRO_SCHEMA,
        [{"id": 5, "v": None}],
    )
    res = copy_into(spark, target, landing, file_format="avro")
    assert res["num_inserted_rows"] == 6 and res["numFilesLoaded"] == 2
    rows = {r.id: r.v for r in DeltaTable(target).to_df(spark).collect()}
    assert rows == {0: 0, 1: 2, 2: 4, 3: 6, 4: 8, 5: None}
    # idempotent: both files registered
    res2 = copy_into(spark, target, landing, file_format="avro")
    assert res2["numFilesLoaded"] == 0 and res2["numFilesSkipped"] == 2


def test_copy_into_avro_logical_types(spark, tmp_path):
    import datetime as dt
    from decimal import Decimal

    uri = str(tmp_path / "t_logical")
    write_deltalake(
        spark,
        spark.createDataFrame(
            [],
            "id bigint, d date, ts timestamp, amt decimal(10,2)",
        ),
        uri,
    )
    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {
                "name": "ts",
                "type": {"type": "long", "logicalType": "timestamp-micros"},
            },
            {
                "name": "amt",
                "type": {
                    "type": "bytes",
                    "logicalType": "decimal",
                    "precision": 10,
                    "scale": 2,
                },
            },
        ],
    }
    amt = (12345).to_bytes(3, "big", signed=True)  # 123.45
    _write_avro(
        str(tmp_path / "land" / "x.avro"),
        schema,
        [
            {
                "id": 1,
                "d": 19723,  # 2024-01-01
                "ts": 1704110400000000,  # 2024-01-01 12:00:00 UTC
                "amt": amt,
            }
        ],
    )
    res = copy_into(spark, uri, str(tmp_path / "land"), file_format="avro")
    assert res["num_inserted_rows"] == 1
    r = DeltaTable(uri).to_df(spark).collect()[0]
    assert r.d == dt.date(2024, 1, 1)
    assert r.ts == dt.datetime(2024, 1, 1, 12, 0, 0)
    assert r.amt == Decimal("123.45")


def test_copy_into_avro_missing_required_column_raises(spark, tmp_path, target):
    schema = {
        "type": "record",
        "name": "row",
        "fields": [{"name": "id", "type": "long"}],  # no 'v'
    }
    _write_avro(
        str(tmp_path / "land2" / "x.avro"), schema, [{"id": 1}]
    )
    with pytest.raises(CopyIntoError, match="required columns"):
        copy_into(spark, target, str(tmp_path / "land2"), file_format="avro")


def test_copy_into_avro_schema_drift_fails_loudly(spark, tmp_path):
    """The ingest schema comes from the first file's header; a later file
    missing one of those fields must fail the job, not null-fill."""
    target = str(tmp_path / "t_drift")
    write_deltalake(
        spark, spark.createDataFrame([], "id bigint, v bigint"), target
    )
    _write_avro(
        str(tmp_path / "drift" / "a.avro"), _AVRO_SCHEMA, [{"id": 1, "v": 2}]
    )
    _write_avro(
        str(tmp_path / "drift" / "b.avro"),
        {"type": "record", "name": "row", "fields": [{"name": "id", "type": "long"}]},
        [{"id": 9}],
    )
    with pytest.raises(Exception, match="lacks ingested column"):
        copy_into(spark, target, str(tmp_path / "drift"), file_format="avro")


def test_copy_into_avro_type_drift_fails_loudly(spark, tmp_path):
    """A later file whose column changed TYPE (here timestamp-micros →
    timestamp-millis) would be silently decoded 1000x off under the first
    file's logical-type map — the per-file check must reject it like the
    missing-column case."""
    target = str(tmp_path / "t_tdrift")
    write_deltalake(
        spark, spark.createDataFrame([], "id bigint, ts timestamp"), target
    )

    def _schema(logical):
        return {
            "type": "record",
            "name": "row",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "ts", "type": {"type": "long", "logicalType": logical}},
            ],
        }

    _write_avro(
        str(tmp_path / "tdrift" / "a.avro"),
        _schema("timestamp-micros"),
        [{"id": 1, "ts": 1704110400000000}],
    )
    _write_avro(
        str(tmp_path / "tdrift" / "b.avro"),
        _schema("timestamp-millis"),
        [{"id": 2, "ts": 1704110400000}],
    )
    with pytest.raises(Exception, match="type.*drifted"):
        copy_into(spark, target, str(tmp_path / "tdrift"), file_format="avro")


def test_copy_into_avro_timestamp_is_utc_instant_in_any_session_zone(
    spark, tmp_path
):
    """Avro timestamp-micros is a UTC instant; ingesting from a session
    pinned to a non-UTC zone must preserve the INSTANT (unix micros), not
    reinterpret the naive wall time in the session zone (a silent shift)."""
    target = str(tmp_path / "t_tz")
    write_deltalake(
        spark, spark.createDataFrame([], "id bigint, ts timestamp"), target
    )
    micros = 1704110400000000  # 2024-01-01 12:00:00 UTC
    _write_avro(
        str(tmp_path / "tz" / "x.avro"),
        {
            "type": "record",
            "name": "row",
            "fields": [
                {"name": "id", "type": "long"},
                {
                    "name": "ts",
                    "type": {"type": "long", "logicalType": "timestamp-micros"},
                },
            ],
        },
        [{"id": 1, "ts": micros}],
    )
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        copy_into(spark, target, str(tmp_path / "tz"), file_format="avro")
        got = (
            DeltaTable(target)
            .to_df(spark)
            .selectExpr("unix_micros(ts) AS um")
            .collect()[0]
            .um
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert got == micros


def test_copy_into_avro_numeric_widening_is_not_drift(spark, tmp_path):
    """Avro-legal promotions (int->long here, in EITHER file order) decode
    correctly file-by-file — read_container uses each file's own embedded
    schema — so they must load, not fail the drift check, as long as the
    table column is the wide type."""
    target = str(tmp_path / "t_widen")
    write_deltalake(
        spark, spark.createDataFrame([], "id bigint, v bigint"), target
    )

    def _schema(vtype):
        return {
            "type": "record",
            "name": "row",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "v", "type": vtype},
            ],
        }

    # wide file first, narrow file second: the non-directional case
    _write_avro(
        str(tmp_path / "widen" / "a.avro"), _schema("long"), [{"id": 1, "v": 10}]
    )
    _write_avro(
        str(tmp_path / "widen" / "b.avro"), _schema("int"), [{"id": 2, "v": 20}]
    )
    res = copy_into(spark, target, str(tmp_path / "widen"), file_format="avro")
    assert res["num_inserted_rows"] == 2
    rows = {r.id: r.v for r in DeltaTable(target).to_df(spark).collect()}
    assert rows == {1: 10, 2: 20}


def test_copy_into_avro_nested_item_drift_fails_loudly(spark, tmp_path):
    """An array column whose ITEM type drifted is a decode change just like
    a top-level drift — the recursive canonical identity must catch it at
    the check (clearly), not later at Arrow conversion (opaquely)."""
    target = str(tmp_path / "t_ndrift")
    write_deltalake(
        spark, spark.createDataFrame([], "id bigint, xs array<bigint>"), target
    )

    def _schema(items):
        return {
            "type": "record",
            "name": "row",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "xs", "type": {"type": "array", "items": items}},
            ],
        }

    _write_avro(
        str(tmp_path / "ndrift" / "a.avro"),
        _schema("long"),
        [{"id": 1, "xs": [1, 2]}],
    )
    _write_avro(
        str(tmp_path / "ndrift" / "b.avro"),
        _schema("string"),
        [{"id": 2, "xs": ["a"]}],
    )
    with pytest.raises(Exception, match="drifted"):
        copy_into(spark, target, str(tmp_path / "ndrift"), file_format="avro")
