"""Identity columns (public Delta ``identityColumns`` writer feature).

System-assigned BIGINT values: unique, strictly past the high-water mark,
on the start + k*step progression — assigned shuffle-free via
monotonically_increasing_id, with the water mark read back from footer
stats and committed in the same version's metaData.
"""

import os

import pytest

from delta_rs_spark import DeltaTable, write_deltalake
from delta_rs_spark.protocol import identity as idc


@pytest.fixture()
def src(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "region.parquet"))


def _ids(t, spark, col="id"):
    return [r[0] for r in t.to_df(spark, columns=[col]).collect()]


def test_create_assigns_and_records_hwm(spark, tmp_path, src):
    uri = str(tmp_path / "t")
    write_deltalake(
        spark, src, uri, identity_columns={"id": {"start": 10, "step": 5}}
    )
    t = DeltaTable(uri)
    ids = _ids(t, spark)
    assert len(ids) == len(set(ids)) == src.count()
    assert all(i >= 10 and (i - 10) % 5 == 0 for i in ids)
    spec = idc.specs(t.schema())["id"]
    assert spec.high_water_mark == max(ids)
    # protocol floor: legacy writer 6
    assert t.protocol_versions()[1] >= idc.MIN_WRITER


def test_appends_advance_past_hwm(spark, tmp_path, src):
    uri = str(tmp_path / "t")
    write_deltalake(spark, src, uri, identity_columns={"id": {}})
    first = set(_ids(DeltaTable(uri), spark))
    write_deltalake(spark, src.limit(3), uri, mode="append")
    t = DeltaTable(uri)
    all_ids = _ids(t, spark)
    assert len(all_ids) == len(set(all_ids))
    new = set(all_ids) - first
    assert len(new) == 3
    assert min(new) > max(first)
    assert idc.specs(t.schema())["id"].high_water_mark == max(all_ids)


def test_generated_always_rejects_explicit(spark, tmp_path, src):
    uri = str(tmp_path / "t")
    write_deltalake(spark, src, uri, identity_columns={"id": {}})
    from pyspark.sql import functions as F

    with_id = src.withColumn("id", F.lit(999).cast("long"))
    with pytest.raises(idc.IdentityColumnError, match="GENERATED ALWAYS"):
        write_deltalake(spark, with_id, uri, mode="append")


def test_by_default_passthrough_and_sync(spark, tmp_path, src):
    uri = str(tmp_path / "t")
    write_deltalake(
        spark,
        src,
        uri,
        identity_columns={"id": {"allow_explicit_insert": True}},
    )
    t = DeltaTable(uri)
    hwm0 = idc.specs(t.schema())["id"].high_water_mark
    from pyspark.sql import functions as F

    explicit = src.limit(2).withColumn("id", F.lit(1_000_000).cast("long"))
    write_deltalake(spark, explicit, uri, mode="append")
    t.update()
    # explicit values do not move the mark...
    assert idc.specs(t.schema())["id"].high_water_mark == hwm0
    # ...until SYNC IDENTITY reconciles it from per-file stats
    marks = t.sync_identity()
    assert marks == {"id": 1_000_000}
    assert idc.specs(t.schema())["id"].high_water_mark == 1_000_000
    # and the next system assignment jumps past it
    write_deltalake(spark, src.limit(1), uri, mode="append")
    t.update()
    assert max(_ids(t, spark)) > 1_000_000


def test_descending_step(spark, tmp_path, src):
    uri = str(tmp_path / "t")
    write_deltalake(
        spark, src, uri, identity_columns={"id": {"start": 0, "step": -3}}
    )
    write_deltalake(spark, src.limit(2), uri, mode="append")
    t = DeltaTable(uri)
    ids = _ids(t, spark)
    assert len(ids) == len(set(ids))
    assert all(i <= 0 and i % 3 == 0 for i in ids)
    assert idc.specs(t.schema())["id"].high_water_mark == min(ids)


def test_dml_rejects_identity_assignment(spark, tmp_path, src):
    uri = str(tmp_path / "t")
    write_deltalake(spark, src, uri, identity_columns={"id": {}})
    t = DeltaTable(uri)
    with pytest.raises(idc.IdentityColumnError):
        t.update_where(spark, "r_regionkey = 0", {"id": "123"})


def test_merge_insert_rejects_explicit_generated_always(spark, tmp_path, src):
    uri = str(tmp_path / "t")
    write_deltalake(spark, src, uri, identity_columns={"id": {}})
    t = DeltaTable(uri)
    from delta_rs_spark.dml import DMLError
    from pyspark.sql import functions as F

    source = src.limit(1).withColumn("id", F.lit(77).cast("long"))
    with pytest.raises(DMLError, match="GENERATED ALWAYS"):
        t.merge(
            spark,
            source,
            "t.r_regionkey = s.r_regionkey",
            when_not_matched_insert={c: f"s.{c}" for c in source.columns},
        )


def test_merge_insert_assigns_identity(spark, tmp_path, src):
    """A source that OMITS a GENERATED ALWAYS identity column gets fresh
    system-assigned values, and the water mark advances in the same
    commit — both copy-on-write and merge-on-read paths."""
    for dv in (False, True):
        uri = str(tmp_path / f"t_{dv}")
        cfg = {"delta.enableDeletionVectors": "true"} if dv else None
        write_deltalake(
            spark, src, uri, identity_columns={"id": {}}, configuration=cfg
        )
        t = DeltaTable(uri)
        before = set(_ids(t, spark))
        hwm0 = idc.specs(t.schema())["id"].high_water_mark

        source = spark.createDataFrame(
            [(90, "n90"), (91, "n91")], src.schema
        )
        res = t.merge(
            spark, source, "t.r_regionkey = s.r_regionkey",
            when_not_matched_insert=True,
        )
        assert res["numTargetRowsInserted"] == 2
        t.update()
        after = _ids(t, spark)
        assert len(after) == len(set(after))  # globally unique
        fresh = set(after) - before
        assert len(fresh) == 2 and min(fresh) > hwm0
        assert idc.specs(t.schema())["id"].high_water_mark == max(after)


def test_concurrent_hwm_guard(spark, tmp_path, src):
    """A commit racing another identity write must fail, not duplicate ids."""
    uri = str(tmp_path / "t")
    write_deltalake(spark, src, uri, identity_columns={"id": {}})

    # simulate: a concurrent writer advanced the water mark between this
    # write's staging and its commit — bump the mark via sync-like commit
    t = DeltaTable(uri)
    from delta_rs_spark.protocol.schema import (
        schema_string_to_spark,
        spark_to_schema_string,
    )
    from delta_rs_spark.transactions import ConcurrentModificationError

    real_update = DeltaTable.update
    bumped = {"done": False}

    def hostile_update(self):
        if not bumped["done"] and self.log.table_root == t.log.table_root:
            bumped["done"] = True
            other = DeltaTable(uri)
            meta = other.metadata()
            sch = idc.schema_with_water_marks(
                schema_string_to_spark(meta.schema_string), {"id": 10_000}
            )
            new_meta = type(meta)(
                id=meta.id,
                schema_string=spark_to_schema_string(sch),
                partition_columns=meta.partition_columns,
                name=meta.name,
                description=meta.description,
                created_time=meta.created_time,
                configuration=dict(meta.configuration or {}),
            )
            txn = other.begin()
            txn.add_action(new_meta)
            txn.commit(operation="SYNC IDENTITY")
        return real_update(self)

    DeltaTable.update = hostile_update
    try:
        with pytest.raises(ConcurrentModificationError, match="metadata"):
            write_deltalake(spark, src.limit(2), uri, mode="append")
    finally:
        DeltaTable.update = real_update


def test_sync_identity_sql(spark, tmp_path, src):
    from delta_rs_spark.sql import sql
    from pyspark.sql import functions as F

    uri = str(tmp_path / "t")
    write_deltalake(
        spark, src, uri, identity_columns={"id": {"allow_explicit_insert": True}}
    )
    explicit = src.limit(1).withColumn("id", F.lit(5_000).cast("long"))
    write_deltalake(spark, explicit, uri, mode="append")
    row = sql(spark, f"ALTER TABLE delta.`{uri}` SYNC IDENTITY").collect()[0]
    assert row["syncedColumns"] == '["id"]'  # _one_row JSON-encodes lists
    t = DeltaTable(uri)
    assert idc.specs(t.schema())["id"].high_water_mark == 5_000


def test_restore_preserves_hwm(spark, tmp_path, src):
    """RESTORE never rolls back the identity water mark — post-restore
    writes must not re-issue ids the pre-restore timeline handed out."""
    uri = str(tmp_path / "t")
    write_deltalake(spark, src, uri, identity_columns={"id": {}})
    t = DeltaTable(uri)
    hwm_v0 = idc.specs(t.schema())["id"].high_water_mark
    write_deltalake(spark, src.limit(4), uri, mode="append")  # v1 advances hwm
    t.update()
    hwm_v1 = idc.specs(t.schema())["id"].high_water_mark
    assert hwm_v1 > hwm_v0
    t.restore(0)
    t.update()
    assert idc.specs(t.schema())["id"].high_water_mark == hwm_v1
    # ids issued after the restore start past the preserved mark
    write_deltalake(spark, src.limit(2), uri, mode="append")
    t.update()
    assert min(
        i for i in _ids(t, spark) if i > hwm_v0
    ) > hwm_v1


def test_validation_errors(spark, tmp_path, src):
    uri = str(tmp_path / "t")
    with pytest.raises(idc.IdentityColumnError, match="nonzero"):
        write_deltalake(spark, src, uri, identity_columns={"id": {"step": 0}})
    write_deltalake(spark, src, uri, identity_columns={"id": {}})
    with pytest.raises(ValueError, match="CREATE-time"):
        write_deltalake(
            spark, src, uri, mode="append", identity_columns={"id": {}}
        )


def test_concurrent_property_change_guard(spark, tmp_path, src):
    """An identity write racing a PROPERTY commit must fail, not silently
    revert the property via its stale water-mark metaData."""
    uri = str(tmp_path / "t")
    write_deltalake(spark, src, uri, identity_columns={"id": {}})
    t = DeltaTable(uri)

    from delta_rs_spark.transactions import ConcurrentModificationError

    real_update = DeltaTable.update
    done = {"x": False}

    def hostile_update(self):
        if not done["x"] and self.log.table_root == t.log.table_root:
            done["x"] = True
            DeltaTable(uri).set_properties({"owner": "someone-else"})
        return real_update(self)

    DeltaTable.update = hostile_update
    try:
        with pytest.raises(ConcurrentModificationError, match="metadata"):
            write_deltalake(spark, src.limit(2), uri, mode="append")
    finally:
        DeltaTable.update = real_update
    # the property survives (nothing clobbered it)
    t2 = DeltaTable(uri)
    assert t2.metadata().configuration.get("owner") == "someone-else"


def test_sync_identity_on_column_mapped_table(spark, tmp_path, src):
    """Stats are keyed physically under column mapping — SYNC IDENTITY must
    translate or it silently no-ops and later re-issues explicit ids."""
    from pyspark.sql import functions as F

    uri = str(tmp_path / "t")
    write_deltalake(
        spark,
        src,
        uri,
        identity_columns={"id": {"allow_explicit_insert": True}},
        configuration={"delta.columnMapping.mode": "name"},
    )
    explicit = src.limit(1).withColumn("id", F.lit(50_000).cast("long"))
    write_deltalake(spark, explicit, uri, mode="append")
    t = DeltaTable(uri)
    assert t.sync_identity() == {"id": 50_000}
    assert idc.specs(t.schema())["id"].high_water_mark == 50_000
