"""Persisted PQ index: build-once / CDF-incremental-maintain / search-many.

The exact-certification surface lives in the catalog
(`similarity_pq_index_lifecycle` — incremental build + MoR delete + postimage
re-encode vs the one-shot oracle; `similarity_pq_index_search` — exhaustive
search ≡ brute force). These tests pin the contracts the driver rows cannot:
search/pq_topk equivalence at a PRODUCTION oversample with trained books, the
auto-oversample derivation from the index's log-level row count, watermark
no-op semantics, and the self-describing-index error contract.

The index fixtures are parametrized over BOTH certification scales
(VERDICT r7 item #2): the flat PQ family's r6 knobs cleared their floors at
sf0.01 and decayed at sf0.1, so single-SF floors provably hide scale decay —
and the persisted index is the serving path a real user runs. Every search
contract (recall floors, auto-oversample, probe-all ≡ flat, pruning) runs at
sf0.01 AND sf0.1; the protocol-machinery tests (fuzz, race, zero-norm) build
their own small corpora and stay single-scale — their logic is
scale-independent DML folding, not recall."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from delta_rs_spark import DeltaTable, write_deltalake
from delta_rs_spark.operators import similarity
from delta_rs_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"
_BOTH_SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


@pytest.fixture(scope="module", params=_BOTH_SFS, ids=["sf0.01", "sf0.1"])
def idx_sf_dir(request):
    return request.param


@pytest.fixture(scope="module")
def emb(spark, idx_sf_dir):
    return load_table(spark, idx_sf_dir, "embeddings").select("vec_id", "embedding")


@pytest.fixture(scope="module")
def emb001(spark):
    """sf0.01 corpus for the scale-independent protocol tests: their DML
    net-change folding doesn't vary with corpus size, so they skip the
    two-SF parametrization the search contracts pay."""
    return load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")


@pytest.fixture(scope="module")
def trained_index(spark, emb, idx_sf_dir, tmp_path_factory):
    """One full-corpus index with TRAINED codebooks (shared via the session
    training cache, like the catalog rows)."""
    from delta_rs_spark.pipeline_queries import _cached_pq_books

    root = tmp_path_factory.mktemp("pqidx")
    src, idx = str(root / "src"), str(root / "idx")
    write_deltalake(
        spark, emb, src, configuration={"delta.enableChangeDataFeed": "true"}
    )
    books = _cached_pq_books(spark, idx_sf_dir)
    res = similarity.update_pq_index(spark, DeltaTable(src), idx, books=books)
    assert res["upserts"] == emb.count() and res["deletes"] == 0
    return src, idx, books


@pytest.mark.slow  # builder tier: see pyproject [tool.pytest.ini_options]
def test_index_search_equals_pq_topk_at_production_oversample(
    spark, emb, trained_index
):
    """Searching the persisted index is SEMANTICALLY pq_topk (same books,
    same ADC screen, same exact rerank, same tiebreak) — the two must agree
    row for row at a production oversample, so the persisted path can never
    silently drift from the certified in-memory one."""
    _, idx, books = trained_index
    q = emb.filter(F.col("vec_id") < 5)
    direct = [
        tuple(r)
        for r in similarity.pq_topk(emb, q, k=10, oversample=8, books=books).collect()
    ]
    via_index = [
        tuple(r)
        for r in similarity.pq_index_search(
            spark, idx, emb, q, k=10, oversample=8
        ).collect()
    ]
    assert via_index == direct


def test_index_search_auto_oversample_from_log_count(spark, emb, trained_index):
    """oversample=None derives from DeltaTable.count_rows() — the log-level
    numRecords fold, zero data I/O — and the result clears the pq_topk
    recall floor (trained books, pool-fraction rule)."""
    _, idx, _ = trained_index
    assert DeltaTable(idx).count_rows() == emb.count()
    q = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, q, k=10).collect()
    }
    got_df = similarity.pq_index_search(spark, idx, emb, q, k=10)
    got = {(r.query_id, r.neighbor_id) for r in got_df.collect()}
    assert len(got) == len(exact)
    recall = len(got & exact) / len(exact)
    assert recall >= 0.85, f"index-search auto-oversample recall {recall}"


def test_refresh_is_watermarked_noop_and_books_are_invariant(
    spark, emb, trained_index
):
    """A refresh with nothing new is a watermark-check no-op (no commit, no
    jobs over the corpus), and the index's codebooks are an invariant: the
    stored books win over whatever a refresh caller passes."""
    src, idx, books = trained_index
    v_before = DeltaTable(idx).version
    wrong_books = similarity.pq_random_codebooks(16, 4, 16, seed=99)
    res = similarity.update_pq_index(
        spark, DeltaTable(src), idx, books=wrong_books
    )
    assert res == {
        "processed_versions": 0,
        "upserts": 0,
        "deletes": 0,
        "corpus_version": DeltaTable(src).version,
        "compacted": False,
    }
    assert DeltaTable(idx).version == v_before


def test_non_index_table_is_rejected(spark, emb001, tmp_path):
    """Self-describing contract: a Delta table without the codebook
    configuration is not a PQ index — both refresh and search must refuse
    it loudly instead of silently mis-scoring."""
    plain = str(tmp_path / "plain")
    write_deltalake(
        spark,
        emb001.limit(10),
        plain,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    with pytest.raises(ValueError, match="deltars.pq.codebooks"):
        similarity.pq_index_search(spark, plain, emb001, emb001.limit(2))
    # an existing table at the index uri that is NOT an index: refresh must
    # not silently re-encode into it
    src = str(tmp_path / "src")
    write_deltalake(
        spark, emb001.limit(10), src, configuration={"delta.enableChangeDataFeed": "true"}
    )
    with pytest.raises(ValueError, match="not a PQ index"):
        similarity.update_pq_index(spark, DeltaTable(src), plain)


@pytest.mark.slow  # builder tier: see pyproject [tool.pytest.ini_options]
def test_incremental_matches_one_shot_rebuild(spark, emb001, tmp_path):
    """Two-batch incremental build + MoR delete + postimage re-encode must
    equal the one-shot encode of the final corpus (the pytest twin of the
    certified similarity_pq_index_lifecycle row, on md5 books)."""
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    books = similarity.pq_random_codebooks(16, 4, 16)
    write_deltalake(
        spark,
        emb001.filter(F.col("vec_id") % 2 == 0),
        src,
        configuration={
            "delta.enableChangeDataFeed": "true",
            "delta.enableDeletionVectors": "true",
        },
    )
    similarity.update_pq_index(spark, DeltaTable(src), idx, books=books)
    write_deltalake(spark, emb001.filter(F.col("vec_id") % 2 == 1), src, mode="append")
    t = DeltaTable(src)
    t.delete(spark, "vec_id % 5 = 0")
    t.update()
    t.update_where(
        spark, "vec_id % 7 = 2", {"embedding": "transform(embedding, x -> -x)"}
    )
    res = similarity.update_pq_index(spark, DeltaTable(src), idx)
    assert res["processed_versions"] == 3

    got = {tuple(r) for r in DeltaTable(idx).to_df(spark).collect()}
    final = emb001.filter(F.col("vec_id") % 5 != 0).select(
        "vec_id",
        F.when(
            F.col("vec_id") % 7 == 2,
            F.transform("embedding", lambda x: -x),
        )
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    want = {tuple(r) for r in similarity.pq_codes(final, books).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# IVF-partitioned index: probing = Delta partition pruning
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def partitioned_index(spark, emb, idx_sf_dir, tmp_path_factory):
    """Full-corpus index with the IVF tier on (8 trained lists, partitioned
    by list_id) and trained codebooks from the session cache."""
    from delta_rs_spark.pipeline_queries import _cached_pq_books

    root = tmp_path_factory.mktemp("ivfpqidx")
    src, idx = str(root / "src"), str(root / "idx")
    write_deltalake(
        spark, emb, src, configuration={"delta.enableChangeDataFeed": "true"}
    )
    books = _cached_pq_books(spark, idx_sf_dir)
    similarity.update_pq_index(
        spark, DeltaTable(src), idx, books=books, n_list=8
    )
    return idx


def test_partitioned_index_probe_prunes_files(spark, emb, partitioned_index):
    """The probe must be REAL pruning: reading the index under a probed-list
    partition filter touches strictly fewer files than the full snapshot —
    the log-level file skip a 100 TB deployment banks on (unprobed lists'
    files are never opened)."""
    t = DeltaTable(partitioned_index)
    assert t.metadata().partition_columns == ["list_id"]
    all_files = t.to_df(spark).inputFiles()
    pruned = t.to_df(
        spark, partition_filters=[("list_id", "in", ["0", "1"])]
    ).inputFiles()
    assert 0 < len(pruned) < len(all_files)


def test_partitioned_probe_all_equals_flat_search(
    spark, emb, trained_index, partitioned_index
):
    """n_probe = n_list passes every partition, so the probing search must
    equal the flat-index search row for row at the same oversample (same
    books, same ADC scores, same tiebreaks) — partitioning may never change
    WHAT is computed, only WHICH files are read."""
    _, flat_idx, _ = trained_index
    q = emb.filter(F.col("vec_id") < 5)
    flat = [
        tuple(r)
        for r in similarity.pq_index_search(
            spark, flat_idx, emb, q, k=10, oversample=8
        ).collect()
    ]
    probed = [
        tuple(r)
        for r in similarity.pq_index_search(
            spark, partitioned_index, emb, q, k=10, n_probe=8, oversample=8
        ).collect()
    ]
    assert probed == flat


def test_partitioned_probing_search_recall_floor(spark, emb, partitioned_index):
    """Production knobs (auto n_probe = held ratio, auto oversample over the
    probed fraction): the probing search clears the ivf_pq_topk floor."""
    q = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, q, k=10).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in similarity.pq_index_search(
            spark, partitioned_index, emb, q, k=10
        ).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.8, f"partitioned probing search recall {recall}"


def test_index_rerank_join_is_size_adaptive(
    spark, emb, trained_index, partitioned_index
):
    """VERDICT r7 #1: the survivor float-fetch join must carry NO forced
    broadcast hint. The pool-fraction oversample makes the candidate pool a
    constant FRACTION of the scanned candidates — corpus-sized at the 100×
    the rule targets — so a forced F.broadcast there is a driver-OOM plan;
    strategy choice belongs to AQE's runtime sizes (broadcast while small,
    shuffled equi-join on c_id once it isn't). Exactly ONE hint may remain
    in each search plan: the query-side ADC frame, bounded by the
    small-query-batch contract. The rerank join — the equi-join whose key
    is (c_id = c_id) — must be unhinted in both the flat and the
    partitioned path. Asserted on the OPTIMIZED logical plan, where a
    forced hint is a static property independent of runtime sizes."""
    import re

    _, flat_idx, _ = trained_index
    q = emb.filter(F.col("vec_id") < 5)
    for df in (
        similarity.pq_index_search(spark, flat_idx, emb, q, k=10, oversample=8),
        similarity.pq_index_search(
            spark, partitioned_index, emb, q, k=10, n_probe=8, oversample=8
        ),
    ):
        txt = df._jdf.queryExecution().optimizedPlan().toString()
        rerank = [
            line.strip()
            for line in txt.splitlines()
            if "Join" in line and re.search(r"\(c_id#\d+L? = c_id#\d+", line)
        ]
        assert rerank, "rerank c_id equi-join not found in the optimized plan"
        assert all("strategy=" not in line for line in rerank), (
            f"rerank join must be unhinted: {rerank}"
        )
        hinted = [
            line.strip() for line in txt.splitlines() if "strategy=broadcast" in line
        ]
        assert len(hinted) == 1, f"expected only the query-side hint: {hinted}"


@pytest.mark.slow  # builder tier: see pyproject [tool.pytest.ini_options]
def test_optimize_compacts_index_without_changing_search(
    spark, emb, partitioned_index
):
    """Incremental MERGE refreshes accumulate small files (copy-on-write
    rewrites); periodic OPTIMIZE is the operational answer. Compaction must
    shrink the file count and leave search results bit-identical — the
    index's content is its codes, not its layout."""
    q = emb.filter(F.col("vec_id") < 5)
    before = [
        tuple(r)
        for r in similarity.pq_index_search(
            spark, partitioned_index, emb, q, k=10, n_probe=8, oversample=8
        ).collect()
    ]
    t = DeltaTable(partitioned_index)
    files_before = len(t.to_df(spark).inputFiles())
    t.optimize(spark, target_file_size=1 << 30)
    t2 = DeltaTable(partitioned_index)
    files_after = len(t2.to_df(spark).inputFiles())
    assert files_after < files_before
    after = [
        tuple(r)
        for r in similarity.pq_index_search(
            spark, partitioned_index, emb, q, k=10, n_probe=8, oversample=8
        ).collect()
    ]
    assert after == before


@pytest.mark.slow  # builder tier: see pyproject [tool.pytest.ini_options]
def test_index_creation_auto_n_list_uses_sqrt_rule(spark, emb001, tmp_path):
    """VERDICT r7 #5: the persisted index — the long-lived artifact — gets
    the same FAISS-shape sqrt rule as the ad-hoc ivf_pq_topk path:
    n_list="auto" derives max(8, ceil(sqrt(n))) from the corpus log-level
    count, and the created index passes the same invariants as a
    hand-knobbed one (partitioned by list_id, centroid count stored,
    probe-all search ≡ exhaustive brute force at exhaustive oversample)."""
    import json
    import math

    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    books = similarity.pq_random_codebooks(16, 4, 16)
    write_deltalake(
        spark, emb001, src, configuration={"delta.enableChangeDataFeed": "true"}
    )
    similarity.update_pq_index(
        spark, DeltaTable(src), idx, books=books, n_list="auto"
    )
    t = DeltaTable(idx)
    n = emb001.count()
    want_lists = max(8, math.ceil(math.sqrt(n)))
    cents = json.loads(t.metadata().configuration[similarity._PQ_CENTS_KEY])
    assert len(cents) == want_lists
    assert t.metadata().partition_columns == ["list_id"]

    q = emb001.filter(F.col("vec_id") < 3)
    exact = [tuple(r) for r in similarity.cosine_topk(emb001, q, k=5).collect()]
    got = [
        tuple(r)
        for r in similarity.pq_index_search(
            spark, idx, emb001, q, k=5, n_probe=want_lists, oversample=1_000_000
        ).collect()
    ]
    assert got == exact


@pytest.mark.slow  # builder tier: see pyproject [tool.pytest.ini_options]
def test_index_drift_metric_baseline_and_degradation(spark, emb001, tmp_path):
    """The documented rebuild trigger (VERDICT r7 #5): creation stores the
    corpus's mean quantization error (deltars.pq.mse0, DECIMAL mean —
    deterministic under any partitioning); pq_index_drift re-measures
    against a live corpus. Against the unchanged corpus the ratio is
    EXACTLY 1.0 (same deterministic pass); against a distribution-shifted
    corpus (trained books, vectors dragged toward a constant direction the
    training never saw) the ratio must rise — the signal a caller
    thresholds to schedule a retrain-into-new-uri rebuild."""
    from delta_rs_spark.pipeline_queries import _cached_pq_books

    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    books = _cached_pq_books(spark, SF_DIR)
    write_deltalake(
        spark, emb001, src, configuration={"delta.enableChangeDataFeed": "true"}
    )
    similarity.update_pq_index(spark, DeltaTable(src), idx, books=books)

    same = similarity.pq_index_drift(spark, idx, emb001)
    assert same["baseline_mse"] > 0
    assert same["current_mse"] == same["baseline_mse"]
    assert same["ratio"] == 1.0

    drifted = emb001.select(
        "vec_id",
        F.transform(
            "embedding", lambda x, i: F.when(i == 0, x + F.lit(10.0)).otherwise(x)
        ).alias("embedding"),
    )
    moved = similarity.pq_index_drift(spark, idx, drifted)
    assert moved["ratio"] > 1.05, (
        f"distribution shift must raise quantization error: {moved}"
    )

    # a plain table (no mse0) fails loudly, not with a silent None ratio
    plain = str(tmp_path / "plain")
    write_deltalake(spark, emb001.limit(5), plain)
    with pytest.raises(ValueError, match="deltars.pq.codebooks"):
        similarity.pq_index_drift(spark, plain, emb001)


import random


@pytest.mark.slow  # builder tier: see pyproject [tool.pytest.ini_options]
@pytest.mark.parametrize("seed", [5, 17])
def test_pq_index_matches_rebuild_under_fuzz(spark, tmp_path, seed):
    """The incremental index, driven by a RANDOM DML sequence with
    refreshes at random points, must always equal the one-shot encode of
    the live corpus — the integration net under the certified
    similarity_pq_index_lifecycle row (which pins ONE fixed sequence).

    Ops: append fresh ids, MoR delete a modular slice, negate a slice's
    vectors (postimage re-encode), and REINSERT previously-deleted ids —
    the case that exercises the per-id net-change fold across a window
    (delete at v_k then insert at v_j > k must net to an upsert, and the
    reverse order to a delete). After every refresh: the index's codes
    equal `pq_codes` over the model's live rows, and every row's stored
    list_id equals the stored-centroid assignment (partition placement
    never drifts from the configuration that search will probe with)."""
    import json

    from delta_rs_spark.operators.similarity import (
        _PQ_CENTS_KEY,
        _assign_lists,
        _with_norm,
        pq_random_codebooks,
    )

    rng = random.Random(seed)
    src = str(tmp_path / f"pqfuzz{seed}-src")
    idx = str(tmp_path / f"pqfuzz{seed}-idx")
    books = pq_random_codebooks(4, 2, 4)  # dim 8, 4 subspaces, 4 codes

    def _vec(i: int) -> list[float]:
        return [float(((i * 31 + j * 7) % 17) / 17.0 - 0.5) for j in range(8)]

    def _frame(rows: dict[int, list[float]]):
        return spark.createDataFrame(
            [(i, v) for i, v in sorted(rows.items())],
            "vec_id long, embedding array<float>",
        )

    model: dict[int, list[float]] = {i: _vec(i) for i in range(80)}
    deleted: set[int] = set()
    next_id = 80
    write_deltalake(
        spark,
        _frame(model),
        src,
        configuration={
            "delta.enableChangeDataFeed": "true",
            "delta.enableDeletionVectors": "true",
        },
    )
    similarity.update_pq_index(
        spark, DeltaTable(src), idx, books=books, n_list=4
    )
    history = ["seed(80)", "bootstrap"]

    def _check():
        t = DeltaTable(idx)
        got = {
            (r.vec_id, tuple(r)[1:])
            for r in t.to_df(spark).drop("list_id").collect()
        }
        want = {
            (r.vec_id, tuple(r)[1:])
            for r in similarity.pq_codes(_frame(model), books).collect()
        }
        assert got == want, f"codes diverged after {history}"
        # partition placement: stored list_id == stored-centroid assignment
        cents = json.loads(t.metadata().configuration[_PQ_CENTS_KEY])
        assigned = _assign_lists(
            _with_norm(_frame(model), "vec_id", "embedding", "c"), cents, "c", 1
        ).select(F.col("c_id").alias("vec_id"), F.col("list_id").alias("want_list"))
        bad = (
            t.to_df(spark)
            .join(assigned, "vec_id")
            .filter(F.col("list_id") != F.col("want_list"))
            .count()
        )
        assert bad == 0, f"partition drift after {history}"

    for step in range(6):
        op = rng.choice(["append", "delete", "negate", "reinsert"])
        t = DeltaTable(src)
        if op == "append":
            n = rng.randrange(10, 25)
            fresh = {i: _vec(i) for i in range(next_id, next_id + n)}
            write_deltalake(spark, _frame(fresh), src, mode="append")
            model.update(fresh)
            next_id += n
            history.append(f"append({n})")
        elif op == "delete":
            k, r = rng.choice([(7, 3), (5, 1), (9, 0)])
            t.delete(spark, f"vec_id % {k} = {r}")
            gone = [i for i in model if i % k == r]
            for i in gone:
                deleted.add(i)
                del model[i]
            history.append(f"delete(%{k}={r})")
        elif op == "negate":
            k, r = rng.choice([(4, 1), (6, 5)])
            t.update_where(
                spark,
                f"vec_id % {k} = {r}",
                {"embedding": "transform(embedding, x -> -x)"},
            )
            for i in list(model):
                if i % k == r:
                    model[i] = [-x for x in model[i]]
            history.append(f"negate(%{k}={r})")
        else:
            back = sorted(deleted)[: rng.randrange(1, 12)] if deleted else []
            if back:
                rows = {i: _vec(i) for i in back}
                write_deltalake(spark, _frame(rows), src, mode="append")
                model.update(rows)
                deleted.difference_update(back)
            history.append(f"reinsert({len(back)})")

        if rng.random() < 0.5 or step == 5:
            similarity.update_pq_index(spark, DeltaTable(src), idx)
            history.append("refresh")
            _check()


@pytest.mark.slow  # builder tier: see pyproject [tool.pytest.ini_options]
def test_concurrent_refreshes_converge(spark, emb001, tmp_path):
    """Two racing incremental refreshes of the same window must converge:
    the txn watermark + MERGE conflict detection serialize them (the loser
    either retries into a watermark no-op or double-applies a window that
    is idempotent by construction — upserts re-assert identical codes,
    deletes of absent rows match nothing). Final index == recompute, and
    the watermark lands exactly at the corpus head."""
    import threading

    from delta_rs_spark.transactions import ConcurrentModificationError

    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    books = similarity.pq_random_codebooks(16, 4, 16)
    write_deltalake(
        spark,
        emb001.filter(F.col("vec_id") % 2 == 0),
        src,
        configuration={
            "delta.enableChangeDataFeed": "true",
            "delta.enableDeletionVectors": "true",
        },
    )
    similarity.update_pq_index(spark, DeltaTable(src), idx, books=books)
    write_deltalake(spark, emb001.filter(F.col("vec_id") % 2 == 1), src, mode="append")
    DeltaTable(src).delete(spark, "vec_id % 5 = 0")

    errors: list[Exception] = []

    def refresh():
        try:
            for _ in range(20):
                try:
                    similarity.update_pq_index(spark, DeltaTable(src), idx)
                    return
                except ConcurrentModificationError:
                    continue
            raise AssertionError("refresh retry budget exhausted")
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    threads = [threading.Thread(target=refresh) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    got = {tuple(r) for r in DeltaTable(idx).to_df(spark).collect()}
    want = {
        tuple(r)
        for r in similarity.pq_codes(
            emb001.filter(F.col("vec_id") % 5 != 0), books
        ).collect()
    }
    assert got == want
    assert DeltaTable(idx).get_app_transaction_version("pq-index") == DeltaTable(src).version


def test_vector_zeroed_by_update_leaves_the_index(spark, tmp_path):
    """A vector UPDATEd to zero norm is unindexable (every encode path
    excludes zero vectors) — the refresh must DROP its row rather than
    keep stale codes a search could still surface; updating it back to a
    real vector re-indexes it."""
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    books = similarity.pq_random_codebooks(4, 2, 4)
    rows = spark.createDataFrame(
        [(i, [float(j + i) for j in range(8)]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    write_deltalake(
        spark,
        rows,
        src,
        configuration={
            "delta.enableChangeDataFeed": "true",
            "delta.enableDeletionVectors": "true",
        },
    )
    similarity.update_pq_index(spark, DeltaTable(src), idx, books=books)
    assert DeltaTable(idx).to_df(spark).count() == 20

    DeltaTable(src).update_where(
        spark, "vec_id = 3", {"embedding": "transform(embedding, x -> float(0))"}
    )
    res = similarity.update_pq_index(spark, DeltaTable(src), idx)
    assert res["deletes"] == 1 and res["upserts"] == 0
    got = {r.vec_id for r in DeltaTable(idx).to_df(spark).collect()}
    assert got == set(range(20)) - {3}

    DeltaTable(src).update_where(
        spark, "vec_id = 3", {"embedding": "transform(embedding, x -> float(9))"}
    )
    res = similarity.update_pq_index(spark, DeltaTable(src), idx)
    assert res["upserts"] == 1 and res["deletes"] == 0
    assert DeltaTable(idx).to_df(spark).count() == 20


@pytest.mark.slow  # builder tier: see pyproject [tool.pytest.ini_options]
def test_auto_compaction_bounds_refresh_file_accumulation(spark, tmp_path):
    """compact_threshold_files: copy-on-write MERGE refreshes accumulate
    small files; with the knob set, a refresh that leaves more files than
    the threshold runs OPTIMIZE in the same call — the file count stays
    bounded across many refreshes and the index content is invariant
    (compaction never changes codes, only layout)."""
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    books = similarity.pq_random_codebooks(4, 2, 4)  # dim 8

    def frame(lo: int, hi: int):
        return spark.createDataFrame(
            [
                (i, [float((i * 11 + j * 3) % 9 - 4) for j in range(8)])
                for i in range(lo, hi)
            ],
            "vec_id long, embedding array<float>",
        )

    write_deltalake(
        spark,
        frame(0, 40).repartition(4),
        src,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    similarity.update_pq_index(spark, DeltaTable(src), idx, books=books, n_list=4)

    compacted_any = False
    for b in range(4):
        write_deltalake(
            spark, frame(40 + b * 10, 50 + b * 10).repartition(3), src, mode="append"
        )
        res = similarity.update_pq_index(
            spark, DeltaTable(src), idx, compact_threshold_files=6
        )
        compacted_any = compacted_any or res["compacted"]

    assert compacted_any, "threshold 6 must trigger at least one OPTIMIZE"
    t = DeltaTable(idx)
    assert len(t.files()) <= 6
    got = {tuple(r) for r in t.to_df(spark).drop("list_id").collect()}
    want = {tuple(r) for r in similarity.pq_codes(frame(0, 80), books).collect()}
    assert got == want


@pytest.mark.slow  # builder tier: see pyproject [tool.pytest.ini_options]
def test_rebuild_entry_point_retrains_only_past_threshold(spark, emb001, tmp_path):
    """The scheduled maintenance arc of the drift policy: rebuild_pq_index
    with max_ratio no-ops while quantization holds (ratio 1.0 on the
    unchanged corpus), retrains into a NEW uri once the corpus drifts past
    the threshold — fresh books at the old (m, k_codes) shape, the IVF tier
    re-derived by the sqrt rule at the current size, mse0 re-baselined so
    the NEW index's drift reads 1.0 against the corpus it serves. The old
    index is untouched (reader swap is a pointer update)."""
    from delta_rs_spark.pipeline_queries import _cached_pq_books

    src, idx, idx2 = (
        str(tmp_path / "src"),
        str(tmp_path / "idx"),
        str(tmp_path / "idx2"),
    )
    books = _cached_pq_books(spark, SF_DIR)
    write_deltalake(
        spark,
        emb001,
        src,
        configuration={
            "delta.enableChangeDataFeed": "true",
            "delta.enableDeletionVectors": "true",
        },
    )
    similarity.update_pq_index(
        spark, DeltaTable(src), idx, books=books, n_list=8
    )

    res = similarity.rebuild_pq_index(
        spark, DeltaTable(src), idx, idx2, max_ratio=1.05
    )
    assert res == {"rebuilt": False, "ratio": 1.0, "index_uri": idx}

    # drift the corpus: drag every vector toward a direction the trained
    # books never saw (same shift the drift-metric test uses)
    DeltaTable(src).update_where(
        spark,
        "true",
        {
            "embedding": (
                "transform(embedding, (x, i) -> "
                "IF(i = 0, x + float(10.0), x))"
            )
        },
    )
    similarity.update_pq_index(spark, DeltaTable(src), idx)  # refresh ≠ retrain
    res = similarity.rebuild_pq_index(
        spark, DeltaTable(src), idx, idx2, max_ratio=1.05
    )
    assert res["rebuilt"] is True and res["ratio"] > 1.05
    assert res["index_uri"] == idx2
    assert res["upserts"] == emb001.count()

    new_t = DeltaTable(idx2)
    import json

    new_books = json.loads(new_t.metadata().configuration[similarity._PQ_BOOKS_KEY])
    assert (len(new_books), len(new_books[0])) == (16, 16)  # shape preserved
    assert new_books != books  # retrained on the drifted corpus
    assert similarity._PQ_CENTS_KEY in new_t.metadata().configuration  # tier kept
    # the new index serves the corpus it was trained on: drift resets to 1.0
    drifted = DeltaTable(src).to_df(spark)
    assert similarity.pq_index_drift(spark, idx2, drifted)["ratio"] == 1.0
    # old index untouched and still serveable during cutover
    assert DeltaTable(idx).version == 1


def test_zero_baseline_drift_is_one_not_inf(spark, tmp_path):
    """Degenerate-but-legal edge found by driving the rebuild entry point:
    a corpus whose few distinct patterns quantize PERFECTLY at creation
    stores mse0 = 0. Unchanged corpus must read ratio 1.0 (inf here would
    spin a rebuild loop on a corpus that never drifted); any nonzero
    current error on a zero baseline is infinite drift — rebuild."""
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    rows = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 5 - 2) for j in range(8)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    write_deltalake(
        spark, rows, src, configuration={"delta.enableChangeDataFeed": "true"}
    )
    books = similarity.train_pq_codebooks(rows, m=4, k_codes=8, iters=1)
    similarity.update_pq_index(spark, DeltaTable(src), idx, books=books)
    same = similarity.pq_index_drift(spark, idx, rows)
    assert same["baseline_mse"] == 0.0 and same["ratio"] == 1.0
    drifted = rows.select(
        "vec_id",
        F.transform(
            "embedding", lambda x, i: F.when(i == 0, x + F.lit(10.0)).otherwise(x)
        ).alias("embedding"),
    )
    moved = similarity.pq_index_drift(spark, idx, drifted)
    assert moved["ratio"] == float("inf")


@pytest.mark.slow  # builder tier: see pyproject [tool.pytest.ini_options]
def test_residual_index_lifecycle_and_invariants(spark, emb001, tmp_path):
    """Round-9 residual (IVFADC) index, the full invariant set in one
    lifecycle: creation stores the deltars.pq.residual marker next to the
    books/centroids; a DML refresh re-encodes through the STORED residual
    geometry and converges to the one-shot residual encode of the final
    corpus; exhaustive search equals brute force (the encoding-agnostic
    rerank contract, pytest twin of the similarity_ivfpq_residual driver
    row); the drift metric measures the RESIDUAL domain (ratio 1.0 on an
    unchanged corpus, not a raw/residual apples-to-oranges ratio); and a
    rebuild preserves the residual marker into the new uri."""
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    write_deltalake(
        spark,
        emb001.filter(F.col("vec_id") % 2 == 0),
        src,
        configuration={
            "delta.enableChangeDataFeed": "true",
            "delta.enableDeletionVectors": "true",
        },
    )
    similarity.update_pq_index(
        spark, DeltaTable(src), idx, n_list=8, residual=True, m=16, k_codes=16
    )
    conf = DeltaTable(idx).metadata().configuration
    assert conf[similarity._PQ_RESIDUAL_KEY] == "true"
    import json

    books = json.loads(conf[similarity._PQ_BOOKS_KEY])
    cents = json.loads(conf[similarity._PQ_CENTS_KEY])

    write_deltalake(
        spark, emb001.filter(F.col("vec_id") % 2 == 1), src, mode="append"
    )
    t = DeltaTable(src)
    t.delete(spark, "vec_id % 5 = 0")
    t.update()
    t.update_where(
        spark, "vec_id % 7 = 2", {"embedding": "transform(embedding, x -> -x)"}
    )
    res = similarity.update_pq_index(spark, DeltaTable(src), idx)
    assert res["processed_versions"] == 3

    final = emb001.filter(F.col("vec_id") % 5 != 0).select(
        "vec_id",
        F.when(
            F.col("vec_id") % 7 == 2,
            F.transform("embedding", lambda x: -x),
        )
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    got = {
        tuple(r) for r in DeltaTable(idx).to_df(spark).drop("list_id").collect()
    }
    want = {
        tuple(r) for r in similarity.pq_codes(final, books, cents=cents).collect()
    }
    assert got == want

    # exhaustive search over the residual index ≡ brute force
    q = final.filter(F.col("vec_id") < 5)
    search = similarity.pq_index_search(
        spark, idx, final, q, k=10, n_probe=8, oversample=1_000_000
    )
    brute = similarity.cosine_topk(final, q, k=10)
    assert [tuple(r) for r in search.collect()] == [
        tuple(r) for r in brute.collect()
    ]

    # drift on the unchanged corpus compares residual-to-residual: the
    # corpus HAS drifted since creation (odds appended, deletes, re-embeds)
    # but the metric must be finite and the zero-change rebuild gate honest
    drift = similarity.pq_index_drift(spark, idx, final.limit(0).union(final))
    assert drift["ratio"] == drift["current_mse"] / drift["baseline_mse"]

    # rebuild preserves the residual marker (encoding is an invariant)
    idx2 = str(tmp_path / "idx2")
    out = similarity.rebuild_pq_index(spark, DeltaTable(src), idx, idx2)
    assert out["rebuilt"] and out["index_uri"] == idx2
    assert (
        DeltaTable(idx2).metadata().configuration[similarity._PQ_RESIDUAL_KEY]
        == "true"
    )


def test_residual_marker_without_cents_is_rejected(spark, tmp_path):
    """A deltars.pq.residual marker with no centroid configuration is a
    corrupt index (residual codes are meaningless without the coarse
    quantizer) — search must refuse loudly, not score garbage."""
    df = spark.createDataFrame(
        [(i, [float(i % 3), 1.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    write_deltalake(
        spark, df, src, configuration={"delta.enableChangeDataFeed": "true"}
    )
    books = similarity.pq_random_codebooks(2, 1, 4)
    similarity.update_pq_index(spark, DeltaTable(src), idx, books=books)
    # simulate the corruption: marker set, centroids absent (metadata
    # recommit, the same shape as drop_constraint's config edit)
    import dataclasses as _dc

    t = DeltaTable(idx)
    meta = t.metadata()
    cfg = dict(meta.configuration or {})
    cfg[similarity._PQ_RESIDUAL_KEY] = "true"
    txn = t.begin()
    txn.add_action(_dc.replace(meta, configuration=cfg))
    txn.commit(operation="SET TBLPROPERTIES", operation_parameters={})
    with pytest.raises(ValueError, match="corrupt index configuration"):
        similarity.pq_index_search(spark, idx, df, df.limit(1), k=3)
    # drift shares the error contract for the same corruption (ADVICE r9:
    # it used to leak a bare KeyError from the configuration dict)
    with pytest.raises(ValueError, match="corrupt index configuration"):
        similarity.pq_index_drift(spark, idx, df)


def test_pq_codes_emit_list_id_single_assignment(spark):
    """ADVICE r9: the persisted residual index must partition by the SAME
    list assignment its residuals were encoded against. pq_codes
    (emit_list_id=True) returns that internal assignment; it must equal
    the unit-vector assignment (the residual-encode domain) and the codes
    must be identical to the emit-free call. emit without cents is a
    contract error."""
    df = spark.createDataFrame(
        [(i, [float(i % 5 - 2), float(i % 3), 1.0, 0.5]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    cents = similarity.train_ivf_centroids(df, n_list=4, iters=1)
    books = similarity.train_pq_codebooks(
        df, m=2, k_codes=4, iters=1, cents=cents
    )
    with_list = similarity.pq_codes(
        df, books, cents=cents, emit_list_id=True
    ).collect()
    plain = {
        r.vec_id: (r.code_0, r.code_1)
        for r in similarity.pq_codes(df, books, cents=cents).collect()
    }
    # unit-vector assignment — the domain the residual was taken in
    unit = df.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(x AS DOUBLE) / "
            "sqrt(aggregate(embedding, 0.0D, (a, x) -> a + x * x)))"
        ).alias("embedding"),
    )
    assigned = {
        r.vec_id: r.list_id
        for r in similarity._assign_lists(
            similarity._with_norm(unit, "vec_id", "embedding", "c"),
            cents,
            "c",
            1,
        )
        .select(F.col("c_id").alias("vec_id"), "list_id")
        .collect()
    }
    assert len(with_list) == 40
    for r in with_list:
        assert (r.code_0, r.code_1) == plain[r.vec_id]
        assert r.list_id == assigned[r.vec_id]
    with pytest.raises(ValueError, match="emit_list_id"):
        similarity.pq_codes(df, books, emit_list_id=True)


def test_update_pq_index_default_residual_resolution(spark, tmp_path):
    """Round 10 (VERDICT r9 #1): update_pq_index's residual default is
    None = 'residual IVFADC when the index trains its own books under an
    IVF tier'. Pinned through the observable marker: self-trained + n_list
    creates a deltars.pq.residual index; a flat index (no tier to take
    residuals against) stays raw; explicit books keep their raw training
    domain unless the caller opts in."""
    df = spark.createDataFrame(
        [(i, [float(i % 5 - 2), float(i % 3), 1.0, 0.5]) for i in range(24)],
        "vec_id long, embedding array<float>",
    )
    src = str(tmp_path / "src")
    write_deltalake(
        spark, df, src, configuration={"delta.enableChangeDataFeed": "true"}
    )

    def marker(uri):
        return (
            DeltaTable(uri)
            .metadata()
            .configuration.get(similarity._PQ_RESIDUAL_KEY)
        )

    auto = str(tmp_path / "auto")
    similarity.update_pq_index(
        spark, DeltaTable(src), auto, n_list=4, m=2, k_codes=4
    )
    assert marker(auto) == "true", "self-trained IVF index must default residual"

    flat = str(tmp_path / "flat")
    similarity.update_pq_index(spark, DeltaTable(src), flat, m=2, k_codes=4)
    assert marker(flat) is None, "flat index has no tier — must stay raw"

    books = similarity.pq_random_codebooks(2, 2, 4)
    explicit = str(tmp_path / "explicit")
    similarity.update_pq_index(
        spark, DeltaTable(src), explicit, books=books, n_list=4
    )
    assert marker(explicit) is None, "explicit books carry their raw domain"

    # the residual default round-trips: exhaustive search over the
    # self-trained index still equals brute force (encoding-agnostic rerank)
    got = similarity.pq_index_search(
        spark, auto, df, df.filter(F.col("vec_id") < 2), k=3,
        n_probe=4, oversample=1_000_000,
    )
    want = similarity.cosine_topk(df, df.filter(F.col("vec_id") < 2), k=3)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_rebuild_can_migrate_raw_index_to_residual(spark, tmp_path):
    """Round 10: the rebuild is the natural migration point for a
    pre-flip raw index — it retrains everything anyway. residual=None
    preserves the old encoding (existing contract); residual=True on a
    tiered raw index produces a residual new artifact whose exhaustive
    search still equals brute force; a flat index has no coarse tier to
    take residuals against and the upgrade refuses."""
    df = spark.createDataFrame(
        [(i, [float(i % 5 - 2), float(i % 3), 1.0, 0.5]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    src = str(tmp_path / "src")
    write_deltalake(
        spark, df, src, configuration={"delta.enableChangeDataFeed": "true"}
    )
    books = similarity.pq_random_codebooks(2, 2, 4)
    raw = str(tmp_path / "raw")
    similarity.update_pq_index(
        spark, DeltaTable(src), raw, books=books, n_list=4
    )
    assert (
        DeltaTable(raw).metadata().configuration.get(similarity._PQ_RESIDUAL_KEY)
        is None
    )

    up = str(tmp_path / "up")
    res = similarity.rebuild_pq_index(
        spark, DeltaTable(src), raw, up, residual=True
    )
    assert res["rebuilt"] is True
    assert (
        DeltaTable(up).metadata().configuration[similarity._PQ_RESIDUAL_KEY]
        == "true"
    )
    got = similarity.pq_index_search(
        spark, up, df, df.filter(F.col("vec_id") < 2), k=3,
        n_probe=1000, oversample=1_000_000,
    )
    want = similarity.cosine_topk(df, df.filter(F.col("vec_id") < 2), k=3)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # preserve-by-default still holds (residual index rebuilds residual)
    keep = str(tmp_path / "keep")
    similarity.rebuild_pq_index(spark, DeltaTable(src), up, keep)
    assert (
        DeltaTable(keep).metadata().configuration[similarity._PQ_RESIDUAL_KEY]
        == "true"
    )

    flat = str(tmp_path / "flat")
    similarity.update_pq_index(spark, DeltaTable(src), flat, books=books)
    with pytest.raises(ValueError, match="flat"):
        similarity.rebuild_pq_index(
            spark, DeltaTable(src), flat, str(tmp_path / "x"), residual=True
        )


def test_creation_defers_on_empty_corpus_then_bootstraps(spark, tmp_path):
    """Round 11: creation over an EMPTY corpus is a no-op (a streaming
    sink's first micro-batch can be empty — crashing inside k-means would
    kill the query), the watermark stays unset, and the first non-empty
    refresh bootstraps over the whole log. Training entry points raise a
    CLEAR contract error on a seedless corpus instead of the old bare
    TypeError."""
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    write_deltalake(
        spark, empty, src, configuration={"delta.enableChangeDataFeed": "true"}
    )
    res = similarity.update_pq_index(
        spark, DeltaTable(src), idx, n_list=4, m=4, k_codes=4
    )
    assert res["processed_versions"] == 0 and res["upserts"] == 0
    from delta_rs_spark.protocol.snapshot import NotATableError

    with pytest.raises(NotATableError):
        DeltaTable(idx)

    rows = [(i, [float(i == j) for j in range(8)]) for i in range(8)]
    write_deltalake(
        spark,
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        src,
        mode="append",
    )
    res = similarity.update_pq_index(
        spark, DeltaTable(src), idx, n_list=4, m=4, k_codes=4
    )
    # deferred creation: the bootstrap covers BOTH versions (0 and 1)
    assert res["processed_versions"] == 2 and res["upserts"] == 8
    assert DeltaTable(idx).to_df(spark).count() == 8

    # the ad-hoc trainers state the contract instead of TypeError
    with pytest.raises(ValueError, match="finite nonzero"):
        similarity.train_ivf_centroids(empty, 4)
    with pytest.raises(ValueError, match="finite nonzero"):
        similarity.train_pq_codebooks(empty, m=4, k_codes=4)
    with pytest.raises(ValueError, match="finite nonzero"):
        similarity.train_pq_codebooks(empty, m=4, k_codes=4, dim=8)


def test_l2_argmin_sql_equals_column_reference_form(spark):
    """Round 12: pq_codes/train_pq_codebooks build the argmin as SQL text
    (_l2_argmin_sql — construction + k-fold execution fix). The SQL form
    must pick the IDENTICAL code as the reference struct-sort Column form
    on every row — including rounded exact ties (which must break to the
    SMALLEST code) — for both rounded and unrounded variants."""
    import random

    rnd = random.Random(12)
    dim = 8
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(dim)]) for i in range(300)
    ]
    # adversarial tie rows: vector equidistant from two mirrored centroids
    rows += [(1000 + i, [0.0] * dim) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cents = [[rnd.uniform(-1, 1) for _ in range(dim)] for _ in range(7)]
    cents.append(list(cents[0]))  # duplicated centroid: guaranteed tie
    for digits in (9, None):
        ref = similarity._l2_argmin_expr(cents, F.col("v"), digits)
        got = F.expr(similarity._l2_argmin_sql(cents, "v", digits))
        bad = df.select(
            "vec_id", ref.alias("ref"), got.alias("got")
        ).filter("ref <> got OR (ref IS NULL) <> (got IS NULL)")
        assert bad.count() == 0, bad.limit(5).collect()
