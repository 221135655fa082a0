"""Transaction protocol tests, incl. the reference's concurrency scenario
(rust/tests/concurrent_writes_test.rs: N workers x M commits -> gapless
unique versions)."""

import json
import os
from concurrent.futures import ThreadPoolExecutor

import pytest

from delta_rs_spark import DeltaTable, write_deltalake
from delta_rs_spark.protocol.actions import AddAction, TxnAction
from delta_rs_spark.protocol.log import DeltaLog, FileAlreadyExistsError


@pytest.fixture()
def small_table(spark, tmp_path, sf_dir):
    df = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    uri = str(tmp_path / "t")
    write_deltalake(spark, df, uri)
    return uri


def test_sequential_commits(small_table):
    t = DeltaTable(small_table)
    txn = t.begin()
    txn.add_action(AddAction(path="fake-1.parquet", size=1))
    assert txn.commit(operation="WRITE") == 1
    txn2 = t.begin()
    txn2.add_action(AddAction(path="fake-2.parquet", size=1))
    assert txn2.commit(operation="WRITE") == 2
    assert "fake-1.parquet" in t.files()


def test_commit_version_conflict_low_level(small_table):
    log = DeltaLog(small_table)
    tmp1 = log.write_tmp_commit([TxnAction(app_id="a", version=1)], "t1")
    tmp2 = log.write_tmp_commit([TxnAction(app_id="b", version=1)], "t2")
    log.try_commit(tmp1, 1)
    with pytest.raises(FileAlreadyExistsError):
        log.try_commit(tmp2, 1)


def test_txn_app_versions(small_table):
    t = DeltaTable(small_table)
    txn = t.begin()
    txn.add_action(TxnAction(app_id="stream-1", version=5))
    txn.commit(operation="STREAMING UPDATE")
    t.update()
    assert t.get_app_transaction_version("stream-1") == 5
    assert t.get_app_transaction_version("nope") is None


def test_concurrent_writers_gapless(small_table):
    """5 workers x 3 commits each -> versions 1..15, unique and gapless."""
    workers, commits = 5, 3

    def work(w: int) -> list[int]:
        table = DeltaTable(small_table)
        got = []
        for i in range(commits):
            txn = table.begin()
            txn.add_action(AddAction(path=f"w{w}-c{i}.parquet", size=1))
            got.append(txn.commit(operation="WRITE"))
        return got

    with ThreadPoolExecutor(max_workers=workers) as ex:
        all_versions = [v for vs in ex.map(work, range(workers)) for v in vs]

    assert sorted(all_versions) == list(range(1, workers * commits + 1))
    t = DeltaTable(small_table)
    assert t.version == workers * commits
    for w in range(workers):
        for i in range(commits):
            assert f"w{w}-c{i}.parquet" in t.files()


def _process_worker(args):
    """Module-level so it pickles for multiprocessing spawn."""
    table_uri, w, commits = args
    from delta_rs_spark import DeltaTable
    from delta_rs_spark.protocol.actions import AddAction

    table = DeltaTable(table_uri)
    got = []
    for i in range(commits):
        txn = table.begin()
        txn.add_action(AddAction(path=f"p{w}-c{i}.parquet", size=1))
        got.append(txn.commit(operation="WRITE"))
    return got


def test_concurrent_writers_across_processes(small_table):
    """E9 at full strength: 5 separate OS processes x 3 commits — the atomic
    create-if-absent must hold across process boundaries, not just threads
    (reference runs separate workers, concurrent_writes_test.rs:27-75)."""
    import multiprocessing as mp

    workers, commits = 5, 3
    ctx = mp.get_context("spawn")
    with ctx.Pool(workers) as pool:
        results = pool.map(
            _process_worker, [(small_table, w, commits) for w in range(workers)]
        )
    versions = sorted(v for vs in results for v in vs)
    assert versions == list(range(1, workers * commits + 1))
    t = DeltaTable(small_table)
    assert t.version == workers * commits
    for w in range(workers):
        for i in range(commits):
            assert f"p{w}-c{i}.parquet" in t.files()


def test_memory_backend_log_protocol():
    """The commit protocol runs unchanged over the in-memory object-store
    model (atomic conditional put) — the contract a real object-store
    backend must meet (reference rust/src/storage/mod.rs:416-423)."""
    import threading
    import uuid

    from delta_rs_spark import DeltaTable
    from delta_rs_spark.protocol.actions import (
        AddAction,
        MetaDataAction,
        ProtocolAction,
    )
    from delta_rs_spark.protocol.log import DeltaLog

    uri = f"memory://t/{uuid.uuid4().hex}"
    log = DeltaLog(uri)
    meta = MetaDataAction(
        id="m1",
        schema_string='{"type":"struct","fields":[{"name":"id","type":"long","nullable":true,"metadata":{}}]}',
        partition_columns=[],
    )
    tmp = log.write_tmp_commit(
        [ProtocolAction(1, 2), meta, AddAction(path="f0.parquet", size=1)], "t0"
    )
    log.try_commit(tmp, 0)

    t = DeltaTable(uri)
    assert t.version == 0
    assert t.files() == ["f0.parquet"]

    # 4 threads x 3 commits: gapless versions via conditional-put retries
    def worker(wid):
        table = DeltaTable(uri)
        for i in range(3):
            txn = table.begin()
            txn.add_action(AddAction(path=f"w{wid}-{i}.parquet", size=1))
            txn.commit(operation="WRITE")

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    final = DeltaTable(uri)
    assert final.version == 12  # 1 create + 12 worker commits, gapless
    assert len(final.files()) == 13
    # time travel works over the memory log too
    assert len(DeltaTable.for_version(uri, 0).files()) == 1


def test_concurrent_dml_same_file_raises(spark, tmp_path):
    """Two writers DML the same file from the same base version: the loser
    must raise ConcurrentModificationError instead of silently clobbering
    the winner's swap (v0 blind retry is kept only for pure appends)."""
    import pytest

    from delta_rs_spark import DeltaTable, write_deltalake
    from delta_rs_spark.transactions import ConcurrentModificationError

    uri = str(tmp_path / "c")
    df = spark.range(0, 100).selectExpr("id", "id % 4 AS g")
    write_deltalake(spark, df.coalesce(1), uri)  # ONE file: any DML touches it

    t1 = DeltaTable(uri)
    t2 = DeltaTable(uri)  # same base version, independent handle
    t1.delete(spark, "g = 0")
    with pytest.raises(ConcurrentModificationError):
        t2.delete(spark, "g = 1")
    # winner's state intact, loser applied nothing
    t3 = DeltaTable(uri)
    assert t3.to_df(spark).filter("g = 0").count() == 0
    assert t3.to_df(spark).filter("g = 1").count() == 25


def test_concurrent_dml_disjoint_files_retries_fine(spark, tmp_path):
    """DML on DISJOINT files from the same base retries cleanly (no false
    conflicts): partitioned table, each delete touches its own partition."""
    from delta_rs_spark import DeltaTable, write_deltalake

    uri = str(tmp_path / "d")
    df = spark.range(0, 100).selectExpr("id", "id % 2 AS p")
    write_deltalake(spark, df, uri, partition_by=["p"])

    t1 = DeltaTable(uri)
    t2 = DeltaTable(uri)
    t1.delete(spark, "p = 0 AND id < 10")
    res = t2.delete(spark, "p = 1 AND id < 10")  # different partition's files
    assert res["numDeletedRows"] == 5
    t3 = DeltaTable(uri)
    assert t3.to_df(spark).count() == 100 - 5 - 5


def test_concurrent_appends_still_blind_retry(spark, tmp_path):
    """Pure appends keep the reference's v0 blind retry: both commits land."""
    from delta_rs_spark import DeltaTable, write_deltalake

    uri = str(tmp_path / "a")
    df = spark.range(0, 10).selectExpr("id")
    write_deltalake(spark, df, uri)
    t1 = DeltaTable(uri)
    t2 = DeltaTable(uri)
    write_deltalake(spark, df, uri, mode="append")
    write_deltalake(spark, df, uri, mode="append")
    assert DeltaTable(uri).to_df(spark).count() == 30
