"""Merge-on-read DELETE via deletion vectors.

The reference (delta-rs v0) predates the public Delta deletionVector
feature; this engine adds it Spark-first: a DELETE under table property
``delta.enableDeletionVectors=true`` finds the matching rows' (file,
row_index) positions through the scan's ``_metadata`` columns (no UDF) and
re-commits the same data files with SPEC-format descriptors — RoaringBitmap
DVs per the public Delta protocol (``protocol/dv.py``: storageType u/i/p,
z85 pathOrInlineDv, framed .bin files), so the table and its
``deletionVectors`` feature token are foreign-readable. Readers anti-join
positions (broadcast when small); OPTIMIZE materializes; stats fold
subtracts cardinality; the pre-round-3 parquet-dir format still decodes
(legacy fixture test below).
"""

import pytest
from pyspark.sql import functions as F

from delta_rs_spark import DeltaTable
from delta_rs_spark.writer import write_deltalake


def _make_table(spark, path, enable_dv=True, enable_cdf=False, nfiles=4, rows=400):
    cfg = {}
    if enable_dv:
        cfg["delta.enableDeletionVectors"] = "true"
    if enable_cdf:
        cfg["delta.enableChangeDataFeed"] = "true"
    df = spark.range(0, rows).selectExpr(
        "id", "id % 10 as k", "concat('v', id) as v"
    )
    write_deltalake(
        spark, df.repartition(nfiles), path, configuration=cfg or None
    )
    return DeltaTable.for_path(path)


def test_dv_delete_keeps_files_and_hides_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _make_table(spark, path)
    files_before = sorted(t.files())

    res = t.delete(spark, "k = 3")
    assert res["numDeletedRows"] == 40
    assert res["numAddedFiles"] == 0  # no data rewrite — that's the point
    assert res["numDeletionVectorsAdded"] >= 1

    t2 = DeltaTable.for_path(path)
    assert sorted(t2.files()) == files_before
    assert all(a.deletion_vector for a in t2.add_actions() if a.dv_cardinality)
    out = t2.to_df(spark)
    assert out.count() == 360
    assert out.filter("k = 3").count() == 0
    # metadata-only count subtracts cardinality, no scan
    assert t2.count_rows() == 360
    # min/max fast path refuses (deleted rows may have held the extremum)
    assert t2.column_min_max("id") is None


def test_dv_protocol_bump_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _make_table(spark, path)
    res = t.delete(spark, "k = 0")
    t2 = DeltaTable.for_path(path)
    assert t2.protocol_versions() == (3, 7)
    # the spec's own feature token: descriptors are the public RoaringBitmap
    # format now (protocol/dv.py), so a conformant foreign DV reader can
    # actually read the table — advertising the real feature is correct
    state = t2.snapshot.state
    assert state.reader_features == ["deletionVectors"]
    # writer 7's list is exhaustive: the legacy writer-2 features the table
    # was created with (appendOnly/invariants) are enumerated alongside
    assert "deletionVectors" in state.writer_features
    assert {"appendOnly", "invariants"} <= set(state.writer_features)
    for a in t2.add_actions():
        if a.deletion_vector:
            assert a.deletion_vector["storageType"] in ("u", "i", "p")
    # the pre-delete version still reads every row under its own state
    t_old = DeltaTable.for_version(path, res["version"] - 1)
    assert t_old.to_df(spark).count() == 400


def test_dv_second_delete_merges_descriptors(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _make_table(spark, path)
    t.delete(spark, "k = 3")
    t2 = DeltaTable.for_path(path)
    t2.delete(spark, "k = 5")
    t3 = DeltaTable.for_path(path)
    assert t3.to_df(spark).count() == 320
    assert t3.count_rows() == 320
    # merged descriptor: one DV'd add per file, ONE bitmap holding the union
    # of both deletes (no artifact chaining — repeated deletes stay O(1)
    # descriptors per file), cardinality summed
    from delta_rs_spark.protocol.dv import add_positions

    dv_adds = [a for a in t3.add_actions() if a.deletion_vector]
    assert sum(a.dv_cardinality for a in dv_adds) == 80
    for a in dv_adds:
        positions = add_positions(t3.log, a)
        assert len(positions) == a.dv_cardinality
        assert positions == sorted(set(positions))


def test_dv_full_file_delete_emits_plain_tombstone(spark, tmp_path):
    path = str(tmp_path / "t")
    # partition by k so one partition == one file; deleting k=2 empties it
    df = spark.range(0, 100).selectExpr("id", "id % 5 as k")
    write_deltalake(
        spark,
        df,
        path,
        partition_by=["k"],
        configuration={"delta.enableDeletionVectors": "true"},
    )
    t = DeltaTable.for_path(path)
    # `k = 2` is partition-exact: the NEW fast path tombstones the whole
    # partition with no scan (and, a fortiori, no DV)
    res = t.delete(spark, "k = 2")
    assert res["numRemovedFiles"] >= 1
    assert res["numAddedFiles"] == 0
    t2 = DeltaTable.for_path(path)
    assert t2.to_df(spark).count() == 80
    assert not any(a.deletion_vector for a in t2.add_actions())

    # the SAME rows addressed by a non-partition expression go down the
    # merge-on-read path; a file whose every row dies must get a plain
    # tombstone, never a 100%-dead deletion vector
    res2 = t2.delete(spark, "id % 5 = 3")
    assert res2["numDeletionVectorsAdded"] == 0
    t3 = DeltaTable.for_path(path)
    assert t3.to_df(spark).count() == 60
    assert not any(a.deletion_vector for a in t3.add_actions())


def test_dv_partitioned_table_positions(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 300).selectExpr("id", "id % 3 as p", "id * 2 as val")
    write_deltalake(
        spark,
        df,
        path,
        partition_by=["p"],
        configuration={"delta.enableDeletionVectors": "true"},
    )
    t = DeltaTable.for_path(path)
    # predicate on a non-partition column inside one partition
    res = t.delete(spark, "p = 1 AND val < 100")
    t2 = DeltaTable.for_path(path)
    got = {r.id for r in t2.to_df(spark).collect()}
    expected = {i for i in range(300) if not (i % 3 == 1 and i * 2 < 100)}
    assert got == expected
    assert res["numDeletedRows"] == 300 - len(expected)


def test_dv_update_merge_on_read(spark, tmp_path):
    """UPDATE on a DV-enabled table: matched rows move to small new files,
    old positions get DV'd — unmatched rows are never rewritten."""
    path = str(tmp_path / "t")
    t = _make_table(spark, path)
    files_before = set(t.file_uris())
    res = t.update_where(spark, "k = 4", {"v": "'updated'"})
    assert res["numUpdatedRows"] == 40
    assert res["numDeletionVectorsAdded"] >= 1
    t2 = DeltaTable.for_path(path)
    # original files all still present (DV'd, not rewritten) + new small adds
    assert files_before <= set(t2.file_uris())
    out = t2.to_df(spark)
    assert out.count() == 400  # row count invariant under UPDATE
    assert out.filter("v = 'updated'").count() == 40
    assert out.filter("k = 4 AND v != 'updated'").count() == 0
    # updated rows are not double-visible
    assert out.select("id").distinct().count() == 400


def test_dv_update_after_delete_honors_positions(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _make_table(spark, path)
    t.delete(spark, "k = 3")
    t2 = DeltaTable.for_path(path)
    t2.update_where(spark, "k = 4", {"v": "'updated'"})
    t3 = DeltaTable.for_path(path)
    out = t3.to_df(spark)
    assert out.count() == 360  # update did not resurrect deleted rows
    assert out.filter("v = 'updated'").count() == 40
    assert out.filter("k = 3").count() == 0


def test_dv_update_cdf_pre_and_postimage(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _make_table(spark, path, enable_cdf=True)
    res = t.update_where(spark, "id = 17", {"v": "'new17'"})
    t2 = DeltaTable.for_path(path)
    rows = t2.load_cdf(
        spark, starting_version=res["version"], ending_version=res["version"]
    ).collect()
    kinds = sorted(r["_change_type"] for r in rows)
    assert kinds == ["update_postimage", "update_preimage"]
    post = next(r for r in rows if r["_change_type"] == "update_postimage")
    assert post.v == "new17"


def test_dv_optimize_materializes(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _make_table(spark, path)
    t.delete(spark, "k IN (3, 5)" if False else "k = 3")
    t2 = DeltaTable.for_path(path)
    t2.optimize(spark)
    t3 = DeltaTable.for_path(path)
    assert not any(a.deletion_vector for a in t3.add_actions())
    assert t3.to_df(spark).count() == 360
    # once materialized the metadata min/max fast path works again
    assert t3.column_min_max("k") is not None


def test_dv_checkpoint_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _make_table(spark, path)
    t.delete(spark, "k = 7")
    t2 = DeltaTable.for_path(path)
    t2.create_checkpoint()
    t3 = DeltaTable.for_path(path)  # loads from checkpoint + empty tail
    dv_adds = [a for a in t3.add_actions() if a.deletion_vector]
    assert sum(a.dv_cardinality for a in dv_adds) == 40
    assert t3.to_df(spark).count() == 360


def test_dv_checkpoint_mixed_descriptor_shapes(spark, tmp_path):
    """Inline ("i") and filed ("u") descriptors in ONE checkpoint: pyarrow
    unifies them into a superset struct with None-filled gaps (offset only
    exists for "u"), and the decode must strip those back out — offset=None
    on an inline descriptor used to poison DV reads after a checkpoint."""
    import os

    from delta_rs_spark.writer import write_deltalake

    path = str(tmp_path / "t")
    t = _make_table(spark, path, rows=40000)  # 10k rows x 4 files
    t.delete(spark, "k = 1")  # 4k positions/file -> filed "u" descriptors
    write_deltalake(
        spark,
        spark.range(100000, 100100).selectExpr("id", "id % 10 as k", "concat('v', id) as v").coalesce(1),
        path,
        mode="append",
    )
    t2 = DeltaTable.for_path(path)
    t2.delete(spark, "id >= 100000 and id % 2 = 0")  # 50 positions -> inline "i"
    t3 = DeltaTable.for_path(path)
    kinds = {
        a.deletion_vector["storageType"]
        for a in t3.add_actions()
        if a.deletion_vector
    }
    assert kinds == {"u", "i"}
    expected = 40000 + 100 - 4000 - 50

    t3.create_checkpoint()
    t4 = DeltaTable.for_path(path)  # checkpoint + empty tail
    for a in t4.add_actions():
        if a.deletion_vector:
            assert all(v is not None for v in a.deletion_vector.values())
    assert t4.count_rows() == expected
    assert t4.to_df(spark).count() == expected
    assert t4.to_df(spark).filter("k = 1 and id < 100000").count() == 0


def test_dv_pyarrow_read_paths(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _make_table(spark, path)
    t.delete(spark, "k = 9")
    t2 = DeltaTable.for_path(path)
    # driver-only (Spark-free) read honors positions
    pt = t2.to_pyarrow_table()
    assert pt.num_rows == 360
    assert len(t2.to_pandas()) == 360
    # a raw Dataset cannot express position deletes → explicit refusal
    with pytest.raises(ValueError, match="deletion vectors"):
        t2.to_pyarrow_dataset()


def test_dv_vacuum_keeps_position_files(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _make_table(spark, path)
    t.delete(spark, "k = 1")
    t2 = DeltaTable.for_path(path)
    listed = t2.vacuum(retention_hours=168, dry_run=True)
    assert not any("_deletion_vectors" in p for p in listed)


def test_dv_vacuum_reaps_orphaned_position_files(spark, tmp_path):
    """DV .bin files age on a REMOVAL-time clock, not file mtime: after
    OPTIMIZE materializes the deletes, the tombstones carry the DV
    descriptor, so the file stays protected while they are unexpired
    (pre-OPTIMIZE versions are still time-travel-readable and need it) —
    even if its mtime is ancient. Once the tombstones expire, the file is
    reaped immediately."""
    import json
    import os
    import time

    path = str(tmp_path / "t")
    # big enough that per-file bitmaps exceed the inline threshold and a
    # shared deletion_vector_<uuid>.bin is written (storageType "u")
    t = _make_table(spark, path, rows=40000)
    t.delete(spark, "k = 1")
    t2 = DeltaTable.for_path(path)
    assert any(
        a.deletion_vector and a.deletion_vector["storageType"] == "u"
        for a in t2.add_actions()
    )
    dv_bins = [
        f for f in os.listdir(path) if f.startswith("deletion_vector_")
    ]
    assert dv_bins
    t2.optimize(spark)
    t3 = DeltaTable.for_path(path)
    assert not any(a.deletion_vector for a in t3.add_actions())

    # unexpired tombstones protect the file even with aged mtimes — the
    # pre-fix behavior (reap on creation mtime) broke time travel
    old = time.time() - 200 * 3600
    for f in dv_bins:
        os.utime(os.path.join(path, f), (old, old))
    assert not any("deletion_vector_" in p for p in t3.vacuum(dry_run=True))

    # expire every tombstone by rewriting its deletionTimestamp in the log
    old_ms = int(old * 1000)
    log_dir = os.path.join(path, "_delta_log")
    for fname in os.listdir(log_dir):
        if not fname.endswith(".json"):
            continue
        fp = os.path.join(log_dir, fname)
        lines = []
        with open(fp) as fh:
            for line in fh:
                if not line.strip():
                    continue
                obj = json.loads(line)
                if "remove" in obj:
                    obj["remove"]["deletionTimestamp"] = old_ms
                lines.append(json.dumps(obj, separators=(",", ":")))
        with open(fp, "w") as fh:
            fh.write("\n".join(lines))

    t4 = DeltaTable.for_path(path)
    listed = t4.vacuum(retention_hours=168, dry_run=True)
    assert any("deletion_vector_" in p for p in listed)
    t4.vacuum(retention_hours=168, dry_run=False)
    assert not [f for f in os.listdir(path) if f.startswith("deletion_vector_")]


def test_legacy_parquet_dir_descriptor_still_reads(spark, tmp_path):
    """Tables written by pre-round-3 builds carry
    ``{storageType:'d', paths:[...position-parquet dirs]}`` descriptors;
    the reader must keep honoring them (and a follow-up delete merges them
    into a spec bitmap). Fixture built by hand — current code never writes
    the legacy format anymore."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "legacy")
    t = _make_table(spark, path, nfiles=1, rows=100)
    add = t.add_actions()[0]

    # hand-write the legacy positions dir: rows 0,1,2 of the file are dead
    dv_dir = os.path.join(path, "_deletion_vectors", "fixture")
    os.makedirs(dv_dir)
    pq.write_table(
        pa.table({"path": [add.path] * 3, "row_index": [0, 1, 2]}),
        os.path.join(dv_dir, "part-0.parquet"),
    )
    # and the swap commit, exactly as round-2 builds emitted it
    commit = [
        {"remove": {"path": add.path, "deletionTimestamp": 1, "dataChange": True}},
        {
            "add": {
                "path": add.path,
                "size": add.size,
                "partitionValues": {},
                "modificationTime": 1,
                "dataChange": True,
                "stats": add.stats,
                "deletionVector": {
                    "storageType": "d",
                    "paths": ["_deletion_vectors/fixture"],
                    "cardinality": 3,
                    "sizeInBytes": 200,
                },
            }
        },
    ]
    with open(os.path.join(path, "_delta_log", f"{1:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(o) for o in commit) + "\n")

    t2 = DeltaTable.for_path(path)
    assert t2.count_rows() == 97
    out = t2.to_df(spark)
    assert out.count() == 97
    assert sorted(r.id for r in out.orderBy("id").limit(3).collect()) == [3, 4, 5]
    # pyarrow path honors legacy descriptors too
    assert t2.to_pyarrow_table().num_rows == 97

    # a NEW delete on the legacy table merges old dir positions + new hits
    # into one spec-format bitmap
    t2.delete(spark, "id >= 95")
    t3 = DeltaTable.for_path(path)
    dv_add = next(a for a in t3.add_actions() if a.deletion_vector)
    assert dv_add.deletion_vector["storageType"] in ("u", "i")
    assert dv_add.dv_cardinality == 8  # 3 legacy + 5 new
    assert t3.to_df(spark).count() == 92


def test_dv_cdf_records_row_level_deletes(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _make_table(spark, path, enable_cdf=True)
    res = t.delete(spark, "k = 6")
    t2 = DeltaTable.for_path(path)
    cdf = t2.load_cdf(spark, starting_version=res["version"], ending_version=res["version"])
    rows = cdf.collect()
    assert len(rows) == 40
    assert all(r["_change_type"] == "delete" for r in rows)
    assert all(r.k == 6 for r in rows)


def test_dv_load_cdf_without_change_files_synthesizes(spark, tmp_path):
    """A DV commit with no change files still yields a correct feed: the
    newly-recorded positions ARE the deleted rows (no rewrite to read)."""
    path = str(tmp_path / "t")
    t = _make_table(spark, path, enable_cdf=False)
    res = t.delete(spark, "k = 6")
    t2 = DeltaTable.for_path(path)
    rows = t2.load_cdf(
        spark, starting_version=res["version"], ending_version=res["version"]
    ).collect()
    assert len(rows) == 40
    assert all(r["_change_type"] == "delete" for r in rows)
    assert all(r.k == 6 for r in rows)
    assert all(r["_commit_version"] == res["version"] for r in rows)


def test_dv_load_cdf_no_phantom_deletes(spark, tmp_path):
    """MoR delete of k=1 (v1, DV), then MoR delete of every remaining row of
    the same files (v2, tombstone-only commit): the v2 feed must NOT re-emit
    the k=1 rows deleted in v1."""
    path = str(tmp_path / "t")
    t = _make_table(spark, path, enable_cdf=False)
    r1 = t.delete(spark, "k = 1")
    t2 = DeltaTable.for_path(path)
    r2 = t2.delete(spark, "k <> 1")  # kills every remaining row
    t3 = DeltaTable.for_path(path)
    v2 = t3.load_cdf(
        spark, starting_version=r2["version"], ending_version=r2["version"]
    ).collect()
    assert all(r["_change_type"] == "delete" for r in v2)
    assert not any(r.k == 1 for r in v2), "phantom delete of already-deleted rows"
    assert len(v2) == 400 - r1["numDeletedRows"]
    # and the union of both feeds covers the table exactly once
    v1 = t3.load_cdf(
        spark, starting_version=r1["version"], ending_version=r1["version"]
    ).collect()
    assert len(v1) + len(v2) == 400


def test_dv_disabled_table_stays_copy_on_write(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _make_table(spark, path, enable_dv=False)
    res = t.delete(spark, "k = 3")
    assert res["numAddedFiles"] > 0  # rewrite happened
    t2 = DeltaTable.for_path(path)
    assert not any(a.deletion_vector for a in t2.add_actions())
    assert t2.to_df(spark).count() == 360


def test_dv_stream_partitions_filter_positions(spark, tmp_path):
    """A DV re-add streamed under ignoreChanges emits only live rows — the
    executor-side reader drops the file's deleted positions."""
    path = str(tmp_path / "t")
    t = _make_table(spark, path, nfiles=2, rows=100)
    t.delete(spark, "k = 4")

    from delta_rs_spark.streaming.source import DeltaStreamReader

    reader = DeltaStreamReader(None, {"path": path, "startingversion": "0"})
    with pytest.raises(RuntimeError, match="ignoreChanges"):
        reader.partitions({"version": 0}, {"version": 1})

    reader2 = DeltaStreamReader(
        None, {"path": path, "startingversion": "0", "ignorechanges": "true"}
    )
    parts = reader2.partitions({"version": 0}, {"version": 1})
    # spec DVs ship as descriptors and decode executor-side in read()
    assert parts and all(
        p.dv_descriptor is not None or p.dv_positions for p in parts
    )
    import pyarrow as pa

    tbl = pa.Table.from_batches([b for p in parts for b in reader2.read(p)])
    assert tbl.num_rows == 90
    assert 4 not in set(tbl.column("k").to_pylist())


def test_dv_read_plan_broadcasts_positions(spark, tmp_path):
    """The DV anti join must broadcast the (small) positions side — a
    shuffled anti join on a 100 TB scan would move the table to move
    kilobytes of positions."""
    path = str(tmp_path / "t")
    t = _make_table(spark, path)
    t.delete(spark, "k = 2")
    t2 = DeltaTable.for_path(path)
    plan = t2.to_df(spark)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Broadcast" in plan  # BroadcastHashJoin / BroadcastExchange


def test_dv_merge_does_not_resurrect_deleted_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _make_table(spark, path)
    t.delete(spark, "id = 7")  # k=7 row, single-row DV delete
    t2 = DeltaTable.for_path(path)
    src = spark.createDataFrame([(7, 99, "upserted")], "id LONG, k LONG, v STRING")
    t2.merge(spark, src, "t.id = s.id")
    t3 = DeltaTable.for_path(path)
    rows = t3.to_df(spark).filter("id = 7").collect()
    # the deleted row is NOT matched (it's logically gone) → source row inserts
    assert len(rows) == 1
    assert rows[0].v == "upserted"
    assert t3.to_df(spark).count() == 400


def test_dv_merge_upsert_merge_on_read(spark, tmp_path):
    """MERGE on a DV-enabled table: matched rows are DV'd out of their files
    and re-written (updated) into small new files, inserts appended — the
    original data files are never rewritten."""
    path = str(tmp_path / "t")
    t = _make_table(spark, path)
    files_before = set(t.file_uris())
    src = spark.createDataFrame(
        [(10, 0, "m10"), (20, 0, "m20"), (9999, 1, "new")],
        "id LONG, k LONG, v STRING",
    )
    res = t.merge(spark, src, "t.id = s.id")
    assert res["numTargetRowsUpdated"] == 2
    assert res["numTargetRowsInserted"] == 1
    assert res["numDeletionVectorsAdded"] >= 1
    t2 = DeltaTable.for_path(path)
    assert files_before <= set(t2.file_uris())  # originals intact, DV'd
    out = t2.to_df(spark)
    assert out.count() == 401
    assert out.filter("id = 10").first().v == "m10"
    assert out.filter("id = 9999").first().v == "new"
    assert out.select("id").distinct().count() == 401  # no double-visibility


def test_dv_merge_matched_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _make_table(spark, path)
    src = spark.createDataFrame([(i,) for i in range(0, 50)], "id LONG")
    res = t.merge(
        spark, src, "t.id = s.id",
        when_matched_delete=True, when_not_matched_insert=False,
    )
    assert res["numTargetRowsDeleted"] == 50
    assert res["numAddedFiles"] == 0  # pure delete — no new files at all
    t2 = DeltaTable.for_path(path)
    out = t2.to_df(spark)
    assert out.count() == 350
    assert out.filter("id < 50").count() == 0


def test_dv_merge_full_sync_mirror(spark, tmp_path):
    """when_not_matched_by_source_delete under DVs: source-unmatched rows
    are DV'd (not rewritten) and the table mirrors the source exactly."""
    path = str(tmp_path / "t")
    t = _make_table(spark, path, rows=100)
    src = spark.range(0, 60).selectExpr("id", "id % 10 as k", "concat('s', id) as v")
    res = t.merge(
        spark, src, "t.id = s.id", when_not_matched_by_source_delete=True
    )
    assert res["numTargetRowsDeleted"] == 40
    assert res["numTargetRowsUpdated"] == 60
    t2 = DeltaTable.for_path(path)
    got = {(r.id, r.v) for r in t2.to_df(spark).collect()}
    assert got == {(i, f"s{i}") for i in range(60)}


def test_dv_merge_cdf_changes(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _make_table(spark, path, enable_cdf=True, rows=50)
    src = spark.createDataFrame(
        [(5, 0, "m5"), (777, 0, "new")], "id LONG, k LONG, v STRING"
    )
    res = t.merge(spark, src, "t.id = s.id")
    t2 = DeltaTable.for_path(path)
    rows = t2.load_cdf(
        spark, starting_version=res["version"], ending_version=res["version"]
    ).collect()
    kinds = sorted(r["_change_type"] for r in rows)
    assert kinds == ["insert", "update_postimage", "update_preimage"]


def test_dv_update_cdf_synthesizes_delete_plus_insert(spark, tmp_path):
    """A MoR UPDATE without change files synthesizes as delete(old rows) +
    insert(new rows): the swap add's new DV positions are the preimages,
    the commit's fresh data file carries the postimages."""
    path = str(tmp_path / "t")
    t = _make_table(spark, path, enable_cdf=False)
    res = t.update_where(spark, "k = 2", {"v": "'upd'"})
    t2 = DeltaTable.for_path(path)
    rows = t2.load_cdf(
        spark, starting_version=res["version"], ending_version=res["version"]
    ).collect()
    deletes = [r for r in rows if r["_change_type"] == "delete"]
    inserts = [r for r in rows if r["_change_type"] == "insert"]
    assert len(deletes) == res["numUpdatedRows"]
    assert len(inserts) == res["numUpdatedRows"]
    assert all(r.k == 2 for r in deletes + inserts)
    # postimages carry the updated value; preimages the original
    assert all(r.v == "upd" for r in inserts)
    assert all(r.v != "upd" for r in deletes)
