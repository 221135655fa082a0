"""Commit-time conflict detection: the public Delta concurrency-control
matrix (docs.delta.io concurrency-control) over recorded read sets and
isolation levels. The reference's retry loop is a blind re-commit with the
conflict checker left unimplemented (``rust/src/delta.rs:1309-1322``), so
these semantics come from the public spec: protocol/metadata changes always
conflict; delete-vs-read and delete-vs-delete conflict; append-vs-read
conflicts per the isolation level (Serializable checks every winner add,
WriteSerializable exempts the winner's blind appends, SnapshotIsolation
skips the append check for dataChange=false commits like OPTIMIZE)."""

import os

import pytest

from delta_rs_spark import DeltaTable, write_deltalake
from delta_rs_spark.protocol.actions import (
    AddAction,
    ProtocolAction,
    RemoveAction,
    TxnAction,
)
from delta_rs_spark.transactions import (
    ConcurrentAppendError,
    ConcurrentDeleteDeleteError,
    ConcurrentDeleteReadError,
    ConcurrentTransactionError,
    MetadataChangedError,
    ProtocolChangedError,
)


@pytest.fixture()
def table_uri(spark, tmp_path, sf_dir):
    df = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    uri = str(tmp_path / "t")
    write_deltalake(spark, df, uri)
    return uri


def _blind_append(uri, partition_values=None, path="w.parquet"):
    """A winning commit shaped like a concurrent blind append."""
    t = DeltaTable(uri)
    txn = t.begin()
    txn.add_action(
        AddAction(path=path, size=1, partition_values=partition_values or {})
    )
    return txn.commit(operation="WRITE")


def _nonblind_add(uri, add_path="nb.parquet", remove_path="gone.parquet",
                  partition_values=None):
    """A winning commit shaped like a concurrent rewrite (not a blind
    append: it removes a file, so isBlindAppend=false)."""
    t = DeltaTable(uri)
    txn = t.begin()
    txn.add_action(
        AddAction(path=add_path, size=1, partition_values=partition_values or {})
    )
    txn.add_action(RemoveAction(path=remove_path, data_change=True))
    return txn.commit(operation="UPDATE")


def test_blind_appends_never_conflict_with_each_other(table_uri):
    tA = DeltaTable(table_uri)
    txn = tA.begin()
    txn.add_action(AddAction(path="a.parquet", size=1))
    _blind_append(table_uri, path="b.parquet")  # winner lands first
    v = txn.commit(operation="WRITE")
    assert v == 2  # retried past the winner, no conflict
    assert "a.parquet" in tA.files() and "b.parquet" in tA.files()


def test_commit_info_carries_blind_append_flag(table_uri):
    import json

    t = DeltaTable(table_uri)
    _blind_append(table_uri, path="b.parquet")
    line = json.loads(
        open(os.path.join(table_uri, "_delta_log", f"{1:020d}.json")).readline()
    )
    assert line["commitInfo"]["isBlindAppend"] is True
    txn = t.begin()
    txn.record_reads(whole_table=True)
    txn.add_action(AddAction(path="c.parquet", size=1))
    v = txn.commit(operation="MERGE")
    line = json.loads(
        open(os.path.join(table_uri, "_delta_log", f"{v:020d}.json")).readline()
    )
    assert line["commitInfo"]["isBlindAppend"] is False


def test_write_serializable_exempts_winner_blind_append(table_uri):
    """Default isolation: a winner blind append into our read domain is
    allowed (the documented WriteSerializable anomaly)."""
    tA = DeltaTable(table_uri)
    txn = tA.begin()
    txn.record_reads(whole_table=True, files=["r0.parquet"])
    txn.add_action(AddAction(path="merged.parquet", size=1))
    _blind_append(table_uri)
    assert txn.commit(operation="MERGE") == 2


def test_write_serializable_conflicts_with_winner_rewrite(table_uri):
    """A winner that is NOT a blind append (an UPDATE-shaped rewrite)
    conflicts with our whole-table read even under WriteSerializable."""
    tA = DeltaTable(table_uri)
    txn = tA.begin()
    txn.record_reads(whole_table=True)
    txn.add_action(AddAction(path="merged.parquet", size=1))
    _nonblind_add(table_uri)
    with pytest.raises(ConcurrentAppendError):
        txn.commit(operation="MERGE")


def test_serializable_conflicts_with_winner_blind_append(table_uri):
    tA = DeltaTable(table_uri)
    tA.set_properties({"delta.isolationLevel": "Serializable"})
    tA.update()
    txn = tA.begin()
    txn.record_reads(whole_table=True)
    txn.add_action(AddAction(path="merged.parquet", size=1))
    _blind_append(table_uri)
    with pytest.raises(ConcurrentAppendError):
        txn.commit(operation="MERGE")


def test_partition_disjoint_append_never_conflicts(table_uri):
    """Serializable, but the winner appended into a partition our read
    predicate excludes — no conflict (partition-domain matching)."""
    tA = DeltaTable(table_uri)
    tA.set_properties({"delta.isolationLevel": "Serializable"})
    tA.update()
    txn = tA.begin()
    txn.record_reads(partition_filters=[("p", "=", "1")])
    txn.add_action(AddAction(path="d.parquet", size=1,
                             partition_values={"p": "1"}))
    _blind_append(table_uri, partition_values={"p": "2"})
    v = txn.commit(operation="DELETE")
    assert v >= 3


def test_partition_overlapping_append_conflicts(table_uri):
    tA = DeltaTable(table_uri)
    tA.set_properties({"delta.isolationLevel": "Serializable"})
    tA.update()
    txn = tA.begin()
    txn.record_reads(partition_filters=[("p", "=", "1")])
    txn.add_action(AddAction(path="d.parquet", size=1,
                             partition_values={"p": "1"}))
    _blind_append(table_uri, partition_values={"p": "1"})
    with pytest.raises(ConcurrentAppendError):
        txn.commit(operation="DELETE")


def test_concurrent_metadata_change_conflicts(table_uri):
    tA = DeltaTable(table_uri)
    txn = tA.begin()
    txn.add_action(AddAction(path="a.parquet", size=1))
    tB = DeltaTable(table_uri)
    tB.set_properties({"delta.custom": "x"})  # winner carries metaData
    with pytest.raises(MetadataChangedError):
        txn.commit(operation="WRITE")


def test_concurrent_protocol_change_conflicts(table_uri):
    tA = DeltaTable(table_uri)
    txn = tA.begin()
    txn.add_action(AddAction(path="a.parquet", size=1))
    tB = DeltaTable(table_uri)
    up = tB.begin()
    up.add_action(ProtocolAction(1, 2))
    up.commit(operation="UPGRADE")
    with pytest.raises(ProtocolChangedError):
        txn.commit(operation="WRITE")


def test_concurrent_txn_watermark_conflicts(table_uri):
    """Two exactly-once writers for the SAME app id racing the same epoch:
    the loser must abort instead of double-committing the batch."""
    tA = DeltaTable(table_uri)
    txn = tA.begin()
    txn.add_action(AddAction(path="a.parquet", size=1))
    txn.add_action(TxnAction(app_id="stream-q1", version=7))
    tB = DeltaTable(table_uri)
    other = tB.begin()
    other.add_action(AddAction(path="b.parquet", size=1))
    other.add_action(TxnAction(app_id="stream-q1", version=7))
    other.commit(operation="STREAMING UPDATE")
    with pytest.raises(ConcurrentTransactionError):
        txn.commit(operation="STREAMING UPDATE")


def test_unrelated_txn_watermark_does_not_conflict(table_uri):
    tA = DeltaTable(table_uri)
    txn = tA.begin()
    txn.add_action(AddAction(path="a.parquet", size=1))
    txn.add_action(TxnAction(app_id="stream-q1", version=7))
    tB = DeltaTable(table_uri)
    other = tB.begin()
    other.add_action(AddAction(path="b.parquet", size=1))
    other.add_action(TxnAction(app_id="stream-q2", version=3))
    other.commit(operation="STREAMING UPDATE")
    assert txn.commit(operation="STREAMING UPDATE") >= 2


def test_concurrent_delete_of_read_file_conflicts(table_uri):
    """The winner removed a file we READ (but do not rewrite) — the result
    we computed from it is stale."""
    tA = DeltaTable(table_uri)
    read_file = tA.files()[0]
    txn = tA.begin()
    txn.record_reads(files=[read_file])
    txn.add_action(AddAction(path="out.parquet", size=1))
    _nonblind_add(table_uri, remove_path=read_file)
    with pytest.raises(ConcurrentDeleteReadError):
        txn.commit(operation="MERGE")


def test_concurrent_delete_delete_conflicts(table_uri):
    tA = DeltaTable(table_uri)
    victim = tA.files()[0]
    txn = tA.begin()
    txn.add_action(RemoveAction(path=victim, data_change=True))
    _nonblind_add(table_uri, remove_path=victim)
    with pytest.raises(ConcurrentDeleteDeleteError):
        txn.commit(operation="DELETE")


def test_optimize_snapshot_isolation_ignores_appends(table_uri):
    """dataChange=false commits run under SnapshotIsolation: a concurrent
    append never conflicts with a compaction of other files."""
    tA = DeltaTable(table_uri)
    victim = tA.files()[0]
    txn = tA.begin()
    txn.record_reads(files=[victim], whole_table=True)
    txn.add_action(RemoveAction(path=victim, data_change=False))
    txn.add_action(AddAction(path="compact.parquet", size=1, data_change=False))
    _blind_append(table_uri)
    assert txn.commit(operation="OPTIMIZE") == 2


def test_real_optimize_survives_concurrent_append(spark, table_uri, sf_dir):
    """End-to-end: OPTIMIZE races a real append and retries cleanly."""
    df = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    write_deltalake(spark, df.limit(2), table_uri, mode="append")
    t = DeltaTable(table_uri)
    # stale handle + a winner landing before OPTIMIZE commits
    write_deltalake(spark, df.limit(1), table_uri, mode="append")
    res = t.optimize(spark)
    assert res["numFilesRemoved"] >= 2
    t.update()
    total = t.to_pandas()
    assert len(total) == 5 + 2 + 1


def test_invalid_isolation_level_rejected(table_uri):
    from delta_rs_spark.transactions import TransactionError

    tA = DeltaTable(table_uri)
    txn = tA.begin()
    txn.isolation_level = "ReadCommitted"
    txn.add_action(AddAction(path="a.parquet", size=1))
    with pytest.raises(TransactionError, match="isolation"):
        txn.commit(operation="WRITE")


# ---------------------------------------------------------------------------
# real multi-writer DML races (threads share the Spark session; each worker
# gets its own DeltaTable handle — the log's conditional-create is the only
# coordination, exactly as on a multi-writer cluster)
# ---------------------------------------------------------------------------

def _partitioned_table(spark, tmp_path, n=400, parts=4):
    uri = str(tmp_path / "races")
    df = spark.range(n).selectExpr("id", f"cast(id % {parts} as string) as p")
    write_deltalake(spark, df, uri, partition_by=["p"])
    return uri


def test_disjoint_partition_deletes_all_succeed(spark, tmp_path):
    """Four writers deleting from FOUR DIFFERENT partitions concurrently:
    partition-bounded read domains are disjoint, so every writer retries
    past the others without conflict — no serialization needed."""
    from concurrent.futures import ThreadPoolExecutor

    uri = _partitioned_table(spark, tmp_path)

    def worker(i: int):
        t = DeltaTable(uri)
        return t.delete(spark, f"p = '{i}' and id < 200")

    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(worker, range(4)))

    assert all(r["numDeletedRows"] == 50 for r in results)
    t = DeltaTable(uri)
    assert t.to_df(spark).count() == 200
    assert t.to_df(spark).filter("id < 200").count() == 0


def test_overlapping_deletes_each_row_deleted_exactly_once(spark, tmp_path):
    """Three writers deleting the SAME rows concurrently: the conflict
    checker guarantees no lost updates and no double deletes — the sum of
    reported numDeletedRows across successful writers equals the matching
    row count exactly (a loser either aborts with a Concurrent* error or
    re-plans against the new state and no-ops)."""
    from concurrent.futures import ThreadPoolExecutor

    from delta_rs_spark.transactions import ConcurrentModificationError

    uri = _partitioned_table(spark, tmp_path)
    expected = DeltaTable(uri).to_df(spark).filter("p = '0' and id < 200").count()

    def worker(_i: int):
        t = DeltaTable(uri)
        try:
            return t.delete(spark, "p = '0' and id < 200")
        except ConcurrentModificationError as e:
            return {"err": type(e).__name__, "numDeletedRows": 0}

    with ThreadPoolExecutor(max_workers=3) as ex:
        results = list(ex.map(worker, range(3)))

    assert sum(r["numDeletedRows"] for r in results) == expected
    t = DeltaTable(uri)
    assert t.to_df(spark).filter("p = '0' and id < 200").count() == 0
    assert t.to_df(spark).count() == 400 - expected
