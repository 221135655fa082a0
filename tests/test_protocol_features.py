"""vacuumProtocolCheck + checkpointProtection (public Delta table features).

Both are pure protocol features: no schema or file traces, semantics are
obligations on maintenance operations. vacuumProtocolCheck forces a full
protocol-support check before vacuum touches files; checkpointProtection
pins checkpoints below a boundary version so metadata cleanup cannot strand
readers that replay from them.
"""

import os
import time
import uuid

import pytest

from delta_rs_spark import DeltaTable, write_deltalake
from delta_rs_spark.maintenance import (
    VacuumError,
    cleanup_expired_logs,
    create_checkpoint,
)


@pytest.fixture()
def table(spark, tmp_path, sf_dir):
    uri = str(tmp_path / "t")
    src = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    write_deltalake(spark, src, uri)
    return DeltaTable(uri)


def test_enable_vacuum_protocol_check_via_property(table):
    v = table.set_properties({"delta.feature.vacuumProtocolCheck": "supported"})
    assert v == table.version
    st = table.snapshot.state
    assert "vacuumProtocolCheck" in (st.reader_features or [])
    assert "vacuumProtocolCheck" in (st.writer_features or [])
    assert len(st.writer_features) == len(set(st.writer_features))
    assert st.min_reader_version == 3 and st.min_writer_version == 7
    # we support the feature: vacuum proceeds normally
    assert table.vacuum(retention_hours=168, dry_run=True) == []


def test_vacuum_refuses_unknown_writer_feature(table):
    """A table advertising a writer feature this engine does not know may
    still be READ, but vacuum must refuse (it cannot know what files the
    unknown feature references) — the vacuumProtocolCheck contract."""
    log = table.log
    actions_json = (
        '{"protocol":{"minReaderVersion":1,"minWriterVersion":7,'
        '"writerFeatures":["someFutureFeature"]}}'
    )
    tmp = log.backend.join(log.log_dir, f"_commit_{uuid.uuid4().hex}.json.tmp")
    log.backend.put_obj(tmp, actions_json.encode())
    log.try_commit(tmp, table.version + 1)
    t2 = DeltaTable(table.table_uri)  # readable: feature is writer-only
    with pytest.raises(VacuumError, match="someFutureFeature"):
        t2.vacuum(retention_hours=168, dry_run=True)


def test_drop_feature_truncate_adds_checkpoint_protection(spark, table):
    table.widen_column_type("r_regionkey", "bigint")
    table.unset_properties(["delta.enableTypeWidening"])
    # zorder rewrite touches every file (plain compaction can skip a
    # single-file table), leaving no narrow physical types behind
    table.optimize(spark, zorder_by=["r_regionkey"])
    table.update()
    table.drop_feature("typeWidening", truncate_history=True)
    table.update()
    st = table.snapshot.state
    assert "checkpointProtection" in (st.writer_features or [])
    cfg = table.metadata().configuration
    boundary = int(cfg["delta.requireCheckpointProtectionBeforeVersion"])
    assert boundary == table.version  # drop commit version

    # cleanup below the boundary is a no-op: the truncation checkpoint
    # (below the boundary) must survive
    before = set(os.listdir(os.path.join(table.table_uri, "_delta_log")))
    assert cleanup_expired_logs(table, retention_ms=0) == []
    assert set(os.listdir(os.path.join(table.table_uri, "_delta_log"))) == before

    # a NEW checkpoint at/above the boundary lifts the restriction
    create_checkpoint(table)
    removed = cleanup_expired_logs(table, retention_ms=0)
    assert removed  # pre-boundary files now cleanable
    t3 = DeltaTable(table.table_uri)  # still loads from the new checkpoint
    assert t3.version == table.version


def test_checkpoint_protection_drop_requires_boundary_unset(spark, table):
    """checkpointProtection must not drop while the boundary property still
    points at protected history."""
    from delta_rs_spark.maintenance import FeatureDropError

    table.widen_column_type("r_regionkey", "bigint")
    table.unset_properties(["delta.enableTypeWidening"])
    table.optimize(spark, zorder_by=["r_regionkey"])
    table.update()
    table.drop_feature("typeWidening", truncate_history=True)
    table.update()
    assert "checkpointProtection" in (table.snapshot.state.writer_features or [])
    with pytest.raises(FeatureDropError, match="requireCheckpointProtection"):
        table.drop_feature("checkpointProtection")
    # lift the restriction: new checkpoint at/above boundary + cleanup,
    # then unset the property - the drop goes through
    create_checkpoint(table)
    cleanup_expired_logs(table, retention_ms=0)
    table.unset_properties(["delta.requireCheckpointProtectionBeforeVersion"])
    table.drop_feature("checkpointProtection")
    table.update()
    assert "checkpointProtection" not in (table.snapshot.state.writer_features or [])
