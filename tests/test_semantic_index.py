"""Persisted semantic-dedup index: IVF-partitioned probe assignments + an
incrementally maintained verified near-dup PAIR table (round 8, NOTES r7
lead 3c — the PQ-index design applied to SemDeDup's expensive half).

Reference semantics: `dedup.semantic_pairs_snapshot` — all pairs sharing at
least one of their top-n_probe stored-centroid lists, exactly round-4
cosine-verified. The incremental index must equal that frame over the live
corpus after ANY DML + refresh schedule; at n_probe = n_list it provably
equals `embedding_cosine_pairs` (the exhaustive-certification hook the
queued driver row `dedup_semantic_index_lifecycle` hashes via the
all-pairs SQL oracle)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from delta_rs_spark import DeltaTable, write_deltalake
from delta_rs_spark.operators import dedup, similarity
from delta_rs_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")


def _pairs(df) -> set:
    return {tuple(r) for r in df.select("id_a", "id_b", "cosine").collect()}


def _stored_cents(assign_uri: str):
    import json

    return json.loads(
        DeltaTable(assign_uri).metadata().configuration[dedup._SEM_CENTS_KEY]
    )


def test_bootstrap_exhaustive_probe_equals_all_pairs(spark, emb, tmp_path):
    """n_probe = n_list at creation: the pair table must equal the corpus-
    wide exact pair set (embedding_cosine_pairs), cosine for cosine — the
    property the queued driver row hashes against the all-pairs oracle."""
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    write_deltalake(
        spark, emb, src, configuration={"delta.enableChangeDataFeed": "true"}
    )
    res = dedup.update_semantic_index(
        spark, DeltaTable(src), idx, threshold=0.4, n_list=4, n_probe=4
    )
    assert res["upserts"] == emb.count()
    got = _pairs(DeltaTable(f"{idx}/pairs").to_df(spark))
    want = _pairs(dedup.embedding_cosine_pairs(emb, threshold=0.4))
    assert got == want
    assert res["pairs_added"] == len(want)


def test_incremental_dml_equals_one_shot(spark, emb, tmp_path):
    """Seed evens → bootstrap → append odds → MoR delete → re-embed update
    → ONE refresh: the pair table equals the exhaustive recompute over the
    corpus as the DML left it (the pytest twin of the queued driver row)."""
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    write_deltalake(
        spark,
        emb.filter(F.col("vec_id") % 2 == 0),
        src,
        configuration={
            "delta.enableChangeDataFeed": "true",
            "delta.enableDeletionVectors": "true",
        },
    )
    dedup.update_semantic_index(
        spark, DeltaTable(src), idx, threshold=0.4, n_list=4, n_probe=4
    )
    write_deltalake(spark, emb.filter(F.col("vec_id") % 2 == 1), src, mode="append")
    t = DeltaTable(src)
    t.delete(spark, "vec_id % 5 = 0")
    t.update()
    t.update_where(
        spark, "vec_id % 7 = 2", {"embedding": "transform(embedding, x -> -x)"}
    )
    res = dedup.update_semantic_index(spark, DeltaTable(src), idx)
    assert res["processed_versions"] == 3

    final = emb.filter(F.col("vec_id") % 5 != 0).select(
        "vec_id",
        F.when(F.col("vec_id") % 7 == 2, F.transform("embedding", lambda x: -x))
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    got = _pairs(DeltaTable(f"{idx}/pairs").to_df(spark))
    want = _pairs(dedup.embedding_cosine_pairs(final, threshold=0.4))
    assert got == want
    # invariants stored once, read back on refresh
    cents = _stored_cents(f"{idx}/assignments")
    assert len(cents) == 4


def test_partial_probe_refresh_matches_snapshot_semantics(spark, emb, tmp_path):
    """At n_probe < n_list the index's contract is semantic_pairs_snapshot
    under the STORED invariants — the incremental path must reproduce it
    exactly after DML (boundary pairs outside shared probed lists are out
    of contract for both sides, so the comparison is exact, not a recall
    bound)."""
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    write_deltalake(
        spark,
        emb.filter(F.col("vec_id") < 400),
        src,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    dedup.update_semantic_index(
        spark, DeltaTable(src), idx, threshold=0.4, n_list=8, n_probe=3
    )
    write_deltalake(
        spark, emb.filter(F.col("vec_id") >= 400), src, mode="append"
    )
    dedup.update_semantic_index(spark, DeltaTable(src), idx)

    cents = _stored_cents(f"{idx}/assignments")
    got = _pairs(DeltaTable(f"{idx}/pairs").to_df(spark))
    want = _pairs(dedup.semantic_pairs_snapshot(emb, cents, 3, 0.4))
    assert got == want
    # probe rows live in their list partitions (log-pruned reads)
    at = DeltaTable(f"{idx}/assignments")
    assert at.metadata().partition_columns == ["list_id"]
    assert at.to_df(spark).count() == emb.count() * 3


def test_watermark_noop_and_non_index_rejected(spark, emb, tmp_path):
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    write_deltalake(
        spark,
        emb.limit(50),
        src,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    dedup.update_semantic_index(
        spark, DeltaTable(src), idx, threshold=0.4, n_list=4, n_probe=2
    )
    v = DeltaTable(f"{idx}/pairs").version
    res = dedup.update_semantic_index(spark, DeltaTable(src), idx)
    assert res["processed_versions"] == 0 and res["pairs_added"] == 0
    assert DeltaTable(f"{idx}/pairs").version == v
    # creation without geometry is an error, not a silent default
    with pytest.raises(ValueError, match="n_list"):
        dedup.update_semantic_index(
            spark, DeltaTable(src), str(tmp_path / "idx2"), threshold=0.4
        )


def test_keeplist_from_index_equals_exact_keeplist(spark, emb, tmp_path):
    """The read half: components over the persisted pair table must give
    the same keeplist as the one-shot exact path when the pair sets agree
    (exhaustive probe)."""
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    write_deltalake(
        spark, emb, src, configuration={"delta.enableChangeDataFeed": "true"}
    )
    dedup.update_semantic_index(
        spark, DeltaTable(src), idx, threshold=0.4, n_list=4, n_probe=4
    )
    keep = dedup.semantic_keeplist_from_index(spark, idx, emb)
    # VERDICT r8 #1 gate, from_index variant: the anti join's losers frame
    # scales with duplicates (∝ corpus at a fixed dup rate), so the plan
    # must carry no forced join hint — AQE picks the strategy at runtime.
    txt = keep._jdf.queryExecution().optimizedPlan().toString()
    hinted = [ln.strip() for ln in txt.splitlines() if "strategy=" in ln]
    assert not hinted, f"keeplist-from-index plan must be unhinted: {hinted}"
    got = {r.vec_id for r in keep.collect()}
    want = {
        r.vec_id for r in dedup.semantic_keeplist(emb, threshold=0.4).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed", [11])
def test_semantic_index_matches_snapshot_under_fuzz(spark, tmp_path, seed):
    """Random DML schedule (append / MoR delete / re-embed / reinsert) with
    refreshes at random points: after every refresh the pair table equals
    semantic_pairs_snapshot over the live corpus under the stored
    invariants — the integration net under the lifecycle row, exercising
    the per-id net fold (delete-then-reinsert, update postimages) and the
    delete-then-reappend pair maintenance."""
    rng = random.Random(seed)
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")

    def _vec(i: int) -> list[float]:
        return [float(((i * 37 + j * 11) % 19) / 19.0 - 0.5) for j in range(8)]

    def _frame(rows: dict[int, list[float]]):
        return spark.createDataFrame(
            [(i, v) for i, v in sorted(rows.items())],
            "vec_id long, embedding array<float>",
        )

    model: dict[int, list[float]] = {i: _vec(i) for i in range(60)}
    deleted: set[int] = set()
    next_id = 60
    write_deltalake(
        spark,
        _frame(model),
        src,
        configuration={
            "delta.enableChangeDataFeed": "true",
            "delta.enableDeletionVectors": "true",
        },
    )
    dedup.update_semantic_index(
        spark, DeltaTable(src), idx, threshold=0.6, n_list=4, n_probe=2
    )
    cents = _stored_cents(f"{idx}/assignments")
    history = ["seed(60)", "bootstrap"]

    def _check():
        got = _pairs(DeltaTable(f"{idx}/pairs").to_df(spark))
        want = _pairs(
            dedup.semantic_pairs_snapshot(_frame(model), cents, 2, 0.6)
        )
        assert got == want, f"pairs diverged after {history}"

    _check()
    for step in range(5):
        op = rng.choice(["append", "delete", "negate", "reinsert"])
        t = DeltaTable(src)
        if op == "append":
            n = rng.randrange(5, 15)
            fresh = {i: _vec(i) for i in range(next_id, next_id + n)}
            write_deltalake(spark, _frame(fresh), src, mode="append")
            model.update(fresh)
            next_id += n
            history.append(f"append({n})")
        elif op == "delete":
            k, r = rng.choice([(7, 3), (5, 1)])
            t.delete(spark, f"vec_id % {k} = {r}")
            for i in [i for i in model if i % k == r]:
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
            back = sorted(deleted)[: rng.randrange(1, 8)] if deleted else []
            if back:
                rows = {i: _vec(i) for i in back}
                write_deltalake(spark, _frame(rows), src, mode="append")
                model.update(rows)
                deleted.difference_update(back)
            history.append(f"reinsert({len(back)})")

        if rng.random() < 0.5 or step == 4:
            dedup.update_semantic_index(spark, DeltaTable(src), idx)
            history.append("refresh")
            _check()


def test_deletes_only_window_drops_pairs_and_advances_watermark(
    spark, emb, tmp_path
):
    """A refresh window containing ONLY deletes must still advance the
    watermark (it rides an empty pairs append — no upserts to carry it),
    drop every pair touching the deleted ids, and leave the next refresh a
    true no-op. Explicitly pins the deletes-only branch the fuzz only hits
    probabilistically."""
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    write_deltalake(
        spark,
        emb,
        src,
        configuration={
            "delta.enableChangeDataFeed": "true",
            "delta.enableDeletionVectors": "true",
        },
    )
    dedup.update_semantic_index(
        spark, DeltaTable(src), idx, threshold=0.4, n_list=4, n_probe=4
    )
    before = _pairs(DeltaTable(f"{idx}/pairs").to_df(spark))
    assert before, "fixture regression: bootstrap found no pairs"
    doomed = sorted({a for a, _, _ in before} | {b for _, b, _ in before})[:3]

    DeltaTable(src).delete(spark, f"vec_id IN ({', '.join(map(str, doomed))})")
    res = dedup.update_semantic_index(spark, DeltaTable(src), idx)
    assert res["deletes"] == len(doomed) and res["upserts"] == 0
    assert res["pairs_added"] == 0

    after = _pairs(DeltaTable(f"{idx}/pairs").to_df(spark))
    assert after == {
        p for p in before if p[0] not in doomed and p[1] not in doomed
    }
    # the docstring's pair-churn metric: MERGE-deleted rows, both sides
    assert res["pairs_dropped"] == len(before) - len(after)
    # assignments dropped too, and the watermark sits at the corpus head
    at = DeltaTable(f"{idx}/assignments").to_df(spark)
    assert at.filter(F.col("vec_id").isin(doomed)).count() == 0
    assert (
        DeltaTable(f"{idx}/pairs").get_app_transaction_version("semantic-index")
        == DeltaTable(src).version
    )
    noop = dedup.update_semantic_index(spark, DeltaTable(src), idx)
    assert noop["processed_versions"] == 0


def test_crash_between_creation_commits(spark, emb, tmp_path):
    """ADVICE r8: creation is TWO commits (assignments, then pairs carrying
    the watermark). A crash between them leaves assignments existing with
    pairs missing — the retry must NOT take the creation path (which would
    re-train centroids and append a second full copy of every probe row,
    mixing geometries if the corpus moved between crash and retry). It must
    MERGE into the existing assignments under the STORED invariants and
    bootstrap only the missing pairs half."""
    import shutil

    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    sub = emb.filter(F.col("vec_id") < 400)
    write_deltalake(
        spark, sub, src, configuration={"delta.enableChangeDataFeed": "true"}
    )
    dedup.update_semantic_index(
        spark, DeltaTable(src), idx, threshold=0.4, n_list=4, n_probe=4
    )
    cents_before = _stored_cents(f"{idx}/assignments")
    # simulate the crash state: pairs commit never happened
    shutil.rmtree(f"{idx}/pairs")

    # the corpus moves between crash and retry — the mixed-geometry risk
    write_deltalake(
        spark, emb.filter(F.col("vec_id") >= 400), src, mode="append"
    )
    # retry passes DIFFERENT creation args: the stored config must win
    res = dedup.update_semantic_index(
        spark, DeltaTable(src), idx, threshold=0.9, n_list=7, n_probe=2
    )
    assert _stored_cents(f"{idx}/assignments") == cents_before
    assert res["upserts"] == emb.count()  # full window: watermark was lost

    # no duplicated probe rows: one (vec_id, list_id) row per assignment
    at = DeltaTable(f"{idx}/assignments").to_df(spark)
    assert at.count() == at.distinct().count() == emb.count() * 4

    # pair table converges to the exhaustive contract at the STORED θ=0.4
    got = _pairs(DeltaTable(f"{idx}/pairs").to_df(spark))
    want = _pairs(dedup.embedding_cosine_pairs(emb, threshold=0.4))
    assert got == want


def test_degenerate_cluster_guard(spark, tmp_path):
    """VERDICT r8 missing #2: the pair table is Θ(c²) in residual duplicate-
    cluster size — a 10³-member identical-vector cluster would materialize
    ~5·10⁵ pairs (at 100 TB one boilerplate cluster's pairs dwarf the
    corpus). The refresh must report the per-list candidate pressure and,
    when capped, FAIL before materializing the blow-up, pointing at the
    exact-dup pre-collapse contract."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(1000)] + [
        (1000 + i, [float(i == j) for j in range(4)]) for i in range(1, 4)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    write_deltalake(
        spark, df, src, configuration={"delta.enableChangeDataFeed": "true"}
    )
    with pytest.raises(ValueError, match="degenerate duplicate cluster"):
        dedup.update_semantic_index(
            spark,
            DeltaTable(src),
            idx,
            threshold=0.9,
            n_list=4,
            n_probe=1,
            max_list_candidates=100_000,
        )

    # uncapped on a small clone of the same shape: the metric is reported
    # and quantifies exactly the quadratic pressure (c new rows × c members)
    small = df.filter((F.col("vec_id") < 50) | (F.col("vec_id") >= 1000))
    src2, idx2 = str(tmp_path / "src2"), str(tmp_path / "idx2")
    write_deltalake(
        spark, small, src2, configuration={"delta.enableChangeDataFeed": "true"}
    )
    res = dedup.update_semantic_index(
        spark, DeltaTable(src2), idx2, threshold=0.9, n_list=4, n_probe=1
    )
    assert res["max_list_candidates"] >= 50 * 50
    assert res["pairs_added"] >= 50 * 49 // 2


# ---------------------------------------------------------------------------
# Round 10: collapse_exact — the index absorbs exact-duplicate clusters
# (VERDICT r9 missing #2 / next-round #3)
# ---------------------------------------------------------------------------


def _keep(spark, idx, corpus):
    return sorted(
        r.vec_id
        for r in dedup.semantic_keeplist_from_index(
            spark, idx, corpus
        ).collect()
    )


@pytest.mark.slow  # builder tier: see pyproject [tool.pytest.ini_options]
def test_collapse_exact_absorbs_degenerate_cluster(spark, tmp_path):
    """The 10³-identical-vector cluster that fires the uncollapsed cap
    (test_degenerate_cluster_guard) must sail through a collapse_exact
    index under the SAME low cap: the cluster costs one group and one
    indexed keeper, so per-list candidate pressure stays reps-sized. The
    derived keeplist equals the one-shot semantic_keeplist over the same
    corpus, and the groups/pairs tables stay keeper-sized."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(1000)] + [
        (1000 + i, [float(i == j) for j in range(4)]) for i in range(1, 4)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    write_deltalake(
        spark, df, src, configuration={"delta.enableChangeDataFeed": "true"}
    )
    res = dedup.update_semantic_index(
        spark,
        DeltaTable(src),
        idx,
        threshold=0.9,
        n_list=4,
        n_probe=1,
        max_list_candidates=100_000,  # fires uncollapsed (>= 10^6 there)
        collapse_exact=True,
    )
    assert res["collapse"] is True
    assert res["upserts"] == 1003  # corpus-level metric unchanged
    assert res["rep_upserts"] == 4  # 1 clone keeper + 3 singletons
    assert res["max_list_candidates"] <= 16
    # pairs hold keepers only; the 10^3-clique never materializes
    assert DeltaTable(f"{idx}/pairs").to_df(spark).count() <= 6
    want = sorted(
        r.vec_id for r in dedup.semantic_keeplist(df, threshold=0.9).collect()
    )
    assert _keep(spark, idx, df) == want == [0, 1001, 1002, 1003]


@pytest.mark.slow  # builder tier: see pyproject [tool.pytest.ini_options]
def test_collapse_exact_incremental_copies_and_keeper_promotion(
    spark, tmp_path
):
    """Incremental semantics of the collapsed index: (a) appending more
    byte-identical copies touches one group and re-verifies ONE keeper
    (rep_upserts == 1 however many copies landed); (b) deleting the
    current keeper promotes the next-smallest member — the index must
    re-key its assignment and pair rows to the new keeper; (c) appending
    a copy with a SMALLER id than the keeper outranks it. After every
    step the derived keeplist equals the one-shot semantic_keeplist over
    the live corpus."""

    def vec(kind):
        return {
            "a": [1.0, 0.0, 0.0, 0.0],
            "b": [0.0, 1.0, 0.0, 0.0],
            "near_a": [2.0, 0.1, 0.0, 0.0],
        }[kind]

    schema = "vec_id long, embedding array<float>"
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    seed = spark.createDataFrame(
        [(10, vec("a")), (20, vec("b")), (30, vec("near_a"))], schema
    )
    write_deltalake(
        spark, seed, src, configuration={"delta.enableChangeDataFeed": "true"}
    )
    dedup.update_semantic_index(
        spark,
        DeltaTable(src),
        idx,
        threshold=0.9,
        n_list=2,
        n_probe=2,
        collapse_exact=True,
    )

    def check():
        live = DeltaTable(src).to_df(spark).select("vec_id", "embedding")
        want = sorted(
            r.vec_id
            for r in dedup.semantic_keeplist(live, threshold=0.9).collect()
        )
        assert _keep(spark, idx, live) == want
        # invariant: assignments/pairs only ever hold group keepers
        groups = DeltaTable(f"{idx}/groups").to_df(spark)
        keepers = {
            r.vec_id
            for r in groups.groupBy("ghash")
            .agg(F.min("vec_id").alias("vec_id"))
            .collect()
        }
        assigned = {
            r.vec_id
            for r in DeltaTable(f"{idx}/assignments").to_df(spark).collect()
        }
        assert assigned <= keepers

    check()

    # (a) 50 more copies of 'a': one touched group, one keeper re-verified
    copies = spark.createDataFrame(
        [(100 + i, vec("a")) for i in range(50)], schema
    )
    write_deltalake(spark, copies, src, mode="append")
    res = dedup.update_semantic_index(spark, DeltaTable(src), idx)
    assert res["collapse"] is True and res["rep_upserts"] == 1
    assert res["upserts"] == 50 and res["members_touched"] == 51
    assert res["max_list_candidates"] <= 4
    check()

    # (b) delete the keeper (10): 100 is promoted, pairs re-key to it
    DeltaTable(src).delete(spark, "vec_id = 10")
    res = dedup.update_semantic_index(spark, DeltaTable(src), idx)
    assert res["rep_upserts"] == 1 and res["deletes"] == 1
    check()

    # (c) a smaller-id copy (5) outranks the promoted keeper
    write_deltalake(
        spark,
        spark.createDataFrame([(5, vec("a"))], schema),
        src,
        mode="append",
    )
    res = dedup.update_semantic_index(spark, DeltaTable(src), idx)
    assert res["rep_upserts"] == 1
    check()
    # the near-dup pair must now be keyed (5, 30)
    got = {
        (r.id_a, r.id_b)
        for r in DeltaTable(f"{idx}/pairs").to_df(spark).collect()
    }
    assert got == {(5, 30)}


def test_collapse_noop_refresh_reports_collapse_metrics(spark, tmp_path):
    """ADVICE r10: every collapse-mode return — including the watermark-
    current and empty-net-window no-ops — carries rep_upserts and
    members_touched, so a cadence-driven consumer (the streaming sink)
    can read them unconditionally without KeyError."""
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    write_deltalake(
        spark, df, src, configuration={"delta.enableChangeDataFeed": "true"}
    )
    dedup.update_semantic_index(
        spark,
        DeltaTable(src),
        idx,
        threshold=0.9,
        n_list=2,
        n_probe=2,
        collapse_exact=True,
    )
    # watermark current: zero versions to process
    res = dedup.update_semantic_index(spark, DeltaTable(src), idx)
    assert res["processed_versions"] == 0 and res["collapse"] is True
    assert res["rep_upserts"] == 0 and res["members_touched"] == 0
    # a commit that nets to nothing (empty append): window advances, no work
    write_deltalake(spark, df.limit(0), src, mode="append")
    res = dedup.update_semantic_index(spark, DeltaTable(src), idx)
    assert res["processed_versions"] == 1 and res["collapse"] is True
    assert res["rep_upserts"] == 0 and res["members_touched"] == 0


def test_keeplist_from_index_filtered_corpus_stays_subset(spark, tmp_path):
    """ADVICE r10: the collapse path's survivors come from the GROUPS
    table, which spans the whole indexed corpus — a caller passing a
    FILTERED corpus must still get output ⊆ corpus, exactly like the
    uncollapsed path (keepers outside the filter drop out; their in-filter
    group members stay losers by the clique argument)."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(5)] + [
        (10 + i, [float(i == j) for j in range(4)]) for i in range(1, 4)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    write_deltalake(
        spark, df, src, configuration={"delta.enableChangeDataFeed": "true"}
    )
    dedup.update_semantic_index(
        spark,
        DeltaTable(src),
        idx,
        threshold=0.9,
        n_list=2,
        n_probe=2,
        collapse_exact=True,
    )
    # full corpus: clone keeper 0 + the three singletons
    assert _keep(spark, idx, df) == [0, 11, 12, 13]
    # filtered corpus excludes keeper 0: output must stay inside the filter
    sub = df.filter(F.col("vec_id") >= 1)
    got = _keep(spark, idx, sub)
    assert 0 not in got
    assert set(got) <= {r.vec_id for r in sub.collect()}
    # clones 1..4 remain losers (their group's keeper decision is index-
    # level); the singletons pass through
    assert got == [11, 12, 13]


def test_collapse_exact_is_a_creation_invariant(spark, tmp_path):
    """The marker rides the index, not the call: a refresh of a collapsed
    index without the flag keeps collapsing, and a refresh of an
    UNCOLLAPSED index passing collapse_exact=True does not silently
    restructure it."""
    df = spark.createDataFrame(
        [(i, [float(i % 2), 1.0]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    src = str(tmp_path / "src")
    write_deltalake(
        spark, df, src, configuration={"delta.enableChangeDataFeed": "true"}
    )
    col_idx, raw_idx = str(tmp_path / "c"), str(tmp_path / "r")
    dedup.update_semantic_index(
        spark, DeltaTable(src), col_idx, n_list=2, collapse_exact=True
    )
    dedup.update_semantic_index(spark, DeltaTable(src), raw_idx, n_list=2)
    write_deltalake(
        spark,
        spark.createDataFrame([(100, [1.0, 1.0])], "vec_id long, embedding array<float>"),
        src,
        mode="append",
    )
    res = dedup.update_semantic_index(spark, DeltaTable(src), col_idx)
    assert res["collapse"] is True
    res = dedup.update_semantic_index(
        spark, DeltaTable(src), raw_idx, collapse_exact=True
    )
    assert res["collapse"] is False
    from delta_rs_spark.protocol.snapshot import NotATableError

    with pytest.raises(NotATableError):
        DeltaTable(f"{raw_idx}/groups")


def test_collapse_buckets_auto_uses_sqrt_rule(spark, emb, tmp_path):
    """collapse_buckets='auto' derives the groups partition count with the
    same sqrt rule as n_list='auto' — the long-lived artifact gets a
    growth-appropriate geometry without hand-knobbing."""
    import math

    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    write_deltalake(
        spark, emb, src, configuration={"delta.enableChangeDataFeed": "true"}
    )
    dedup.update_semantic_index(
        spark,
        DeltaTable(src),
        idx,
        n_list=4,
        collapse_exact=True,
        collapse_buckets="auto",
    )
    want = max(16, math.ceil(math.sqrt(emb.count())))
    stored = int(
        DeltaTable(f"{idx}/groups")
        .metadata()
        .configuration[dedup._SEM_GBUCKETS_KEY]
    )
    assert stored == want


def test_collapse_groups_refresh_reads_are_bucket_pruned(spark, tmp_path):
    """The groups table's bucket partitioning must be REAL pruning: a
    refresh whose window touches one group reads only that group's bucket
    partition (log-level file skip — the property that keeps the
    membership read ∝ touched groups at 100 TB, not ∝ corpus)."""
    rows = [
        (i, [float(i), 1.0, 0.0, 0.0]) for i in range(40)  # 40 distinct
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    write_deltalake(
        spark,
        df.repartition(4),
        src,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    dedup.update_semantic_index(
        spark,
        DeltaTable(src),
        idx,
        n_list=2,
        collapse_exact=True,
        collapse_buckets=8,
    )
    gt = DeltaTable(f"{idx}/groups")
    assert gt.metadata().partition_columns == ["gbucket"]
    all_files = gt.to_df(spark).inputFiles()
    # the read the refresh performs for a one-bucket touch
    pruned = gt.to_df(
        spark, partition_filters=[("gbucket", "in", ["0"])]
    ).inputFiles()
    assert 0 < len(pruned) < len(all_files)


def test_collapse_partial_probe_equals_keeper_snapshot(spark, emb, tmp_path):
    """Reference semantics under collapse at PARTIAL probe: the pair table
    must equal `semantic_pairs_snapshot` evaluated over the exact-dup
    KEEPERS under the stored invariants — the collapsed index is the
    uncollapsed index of the keeper corpus, nothing more."""
    import json

    # duplicate a slice of the corpus under higher ids: keepers = originals
    dup = emb.filter(F.col("vec_id") < 40).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(dup)
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    write_deltalake(
        spark, corpus, src, configuration={"delta.enableChangeDataFeed": "true"}
    )
    dedup.update_semantic_index(
        spark,
        DeltaTable(src),
        idx,
        threshold=0.4,
        n_list=4,
        n_probe=2,  # PARTIAL probe
        collapse_exact=True,
    )
    cents = _stored_cents(f"{idx}/assignments")
    got = _pairs(DeltaTable(f"{idx}/pairs").to_df(spark))
    # keepers: min id per byte-identical vector = the original corpus here
    want = _pairs(
        dedup.semantic_pairs_snapshot(emb, cents, n_probe=2, threshold=0.4)
    )
    assert got == want


@pytest.mark.slow  # builder tier: see pyproject [tool.pytest.ini_options]
def test_collapse_crash_between_groups_and_assignments(spark, emb, tmp_path):
    """Creation is THREE commits under collapse (groups, assignments,
    pairs); a crash after the groups table exists but before assignments
    must retry safely: the surviving groups table pins collapse ON (even
    without the flag) and its content is geometry-free, so the retry may
    retrain centroids without mixing geometries. Simulated by deleting the
    assignments/pairs halves after a full creation — exactly the
    filesystem state such a crash leaves."""
    import shutil

    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    write_deltalake(
        spark,
        emb,
        src,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    dedup.update_semantic_index(
        spark,
        DeltaTable(src),
        idx,
        threshold=0.4,
        n_list=4,
        n_probe=4,
        collapse_exact=True,
        collapse_buckets=8,
    )
    want = _pairs(DeltaTable(f"{idx}/pairs").to_df(spark))
    shutil.rmtree(f"{idx}/assignments")
    shutil.rmtree(f"{idx}/pairs")

    # retry WITHOUT the flag: groups presence must pin collapse on
    res = dedup.update_semantic_index(
        spark, DeltaTable(src), idx, threshold=0.4, n_list=4, n_probe=4
    )
    assert res["collapse"] is True
    assert _pairs(DeltaTable(f"{idx}/pairs").to_df(spark)) == want
    # groups content converged too (merge-delete + re-append is idempotent)
    n_groups = DeltaTable(f"{idx}/groups").to_df(spark).count()
    assert n_groups == emb.count()


def test_semantic_index_auto_compaction_bounds_files(spark, tmp_path):
    """compact_threshold_files: repeated MERGE refreshes accumulate small
    files on every index table; with the threshold set a refresh that
    leaves any table over it runs OPTIMIZE in the same call, and the pair
    semantics are invariant under compaction — same contract as the PQ
    index's auto-compaction."""

    def frame(lo, hi):
        return spark.createDataFrame(
            [(i, [float(i % 7 - 3), float(i % 5), 1.0, 0.0]) for i in range(lo, hi)],
            "vec_id long, embedding array<float>",
        )

    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    write_deltalake(
        spark,
        frame(0, 30).repartition(3),
        src,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    dedup.update_semantic_index(
        spark, DeltaTable(src), idx, threshold=0.9, n_list=2, n_probe=2
    )
    compacted_any = []
    for b in range(4):
        write_deltalake(
            spark, frame(30 + b * 10, 40 + b * 10).repartition(3), src, mode="append"
        )
        res = dedup.update_semantic_index(
            spark, DeltaTable(src), idx, compact_threshold_files=6
        )
        compacted_any += res["compacted"]
    assert compacted_any, "threshold 6 must trigger at least one OPTIMIZE"
    assert len(DeltaTable(f"{idx}/assignments").files()) <= 6

    # semantics invariant under compaction: pairs equal the one-shot set
    live = DeltaTable(src).to_df(spark).select("vec_id", "embedding")
    cents = _stored_cents(f"{idx}/assignments")
    got = _pairs(DeltaTable(f"{idx}/pairs").to_df(spark))
    want = _pairs(
        dedup.semantic_pairs_snapshot(live, cents, n_probe=2, threshold=0.9)
    )
    assert got == want


def test_semantic_creation_defers_on_empty_corpus_then_bootstraps(
    spark, tmp_path
):
    """Round 11: the semantic index's empty-corpus creation deferral is an
    explicit contract (it used to work only by early-return accident —
    train_ivf_centroids now raises on a seedless corpus, so the guard
    must fire first). No tables, no watermark; the first non-empty
    refresh bootstraps the whole log. The deferral stores NOTHING, so the
    retry re-passes the creation knobs — which is exactly what the
    streaming sink does on every flush."""
    from delta_rs_spark.protocol.snapshot import NotATableError

    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    write_deltalake(
        spark, empty, src, configuration={"delta.enableChangeDataFeed": "true"}
    )
    res = dedup.update_semantic_index(
        spark,
        DeltaTable(src),
        idx,
        threshold=0.9,
        n_list=2,
        n_probe=2,
        collapse_exact=True,
    )
    assert res["processed_versions"] == 0
    assert res["rep_upserts"] == 0 and res["members_touched"] == 0
    with pytest.raises(NotATableError):
        DeltaTable(f"{idx}/assignments")

    rows = [(1, [1.0, 0.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0, 0.0]),
            (3, [0.0, 1.0, 0.0, 0.0])]
    write_deltalake(
        spark,
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        src,
        mode="append",
    )
    res = dedup.update_semantic_index(
        spark,
        DeltaTable(src),
        idx,
        threshold=0.9,
        n_list=2,
        n_probe=2,
        collapse_exact=True,
    )
    assert res["processed_versions"] == 2 and res["collapse"] is True
    assert res["rep_upserts"] == 2  # keeper 1 + singleton 3
    live = DeltaTable(src).to_df(spark).select("vec_id", "embedding")
    assert _keep(spark, idx, live) == [1, 3]


@pytest.mark.slow  # builder tier: see pyproject [tool.pytest.ini_options]
@pytest.mark.parametrize("seed", [23])
def test_collapse_index_matches_one_shot_under_fuzz(spark, tmp_path, seed):
    """Round 11: random DML schedule over a CLONE-HEAVY corpus (ids drawn
    from a small pool of distinct vectors, so exact groups dominate) with
    refreshes at random points — after every refresh the collapsed
    index's derived keeplist equals the one-shot `semantic_keeplist` over
    the live corpus. Exercises keeper death (deletes hitting group
    minima), group splits (negating a subset of a group's copies), group
    extinction, reinsertion into a different group, and the groups-table
    MERGE idempotency — the integration net under the
    `stream_semantic_index_pipeline` / `dedup_semantic_index_collapsed`
    driver rows, at exhaustive probe where the keeper-level pair table
    provably equals the exhaustive keeper pair set."""
    rng = random.Random(seed)
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")

    def _gvec(g: int) -> list[float]:
        return [float(((g * 29 + j * 13) % 17) / 17.0 - 0.5) for j in range(8)]

    def _frame(rows: dict[int, list[float]]):
        return spark.createDataFrame(
            [(i, v) for i, v in sorted(rows.items())],
            "vec_id long, embedding array<float>",
        )

    # 40 ids over 5 distinct vectors: every group starts as an 8-clone
    model: dict[int, list[float]] = {i: _gvec(i % 5) for i in range(40)}
    deleted: set[int] = set()
    next_id = 40
    write_deltalake(
        spark,
        _frame(model),
        src,
        configuration={
            "delta.enableChangeDataFeed": "true",
            "delta.enableDeletionVectors": "true",
        },
    )
    dedup.update_semantic_index(
        spark,
        DeltaTable(src),
        idx,
        threshold=0.6,
        n_list=4,
        n_probe=4,
        collapse_exact=True,
    )
    history = ["seed(40x5groups)", "bootstrap"]

    def _check():
        want = sorted(
            r.vec_id
            for r in dedup.semantic_keeplist(
                _frame(model), threshold=0.6
            ).collect()
        )
        got = _keep(spark, idx, _frame(model))
        assert got == want, f"keeplist diverged after {history}"
        # the collapse invariant: assignments only ever hold group keepers
        by_vec: dict[tuple, int] = {}
        for i, v in model.items():
            tv = tuple(v)
            by_vec[tv] = min(by_vec.get(tv, i), i)
        keepers = set(by_vec.values())
        assigned = {
            r.vec_id
            for r in DeltaTable(f"{idx}/assignments").to_df(spark).collect()
        }
        assert assigned <= keepers, f"non-keeper indexed after {history}"

    _check()
    for step in range(5):
        op = rng.choice(["clones", "delete", "negate", "reinsert"])
        t = DeltaTable(src)
        if op == "clones":
            g = rng.randrange(7)  # groups 5,6 are born mid-fuzz
            n = rng.randrange(4, 10)
            fresh = {i: _gvec(g) for i in range(next_id, next_id + n)}
            write_deltalake(spark, _frame(fresh), src, mode="append")
            model.update(fresh)
            next_id += n
            history.append(f"clones(g{g},{n})")
        elif op == "delete":
            k, r = rng.choice([(7, 0), (5, 0), (3, 1)])
            t.delete(spark, f"vec_id % {k} = {r}")
            for i in [i for i in model if i % k == r]:
                deleted.add(i)
                del model[i]
            history.append(f"delete(%{k}={r})")
        elif op == "negate":
            k, r = rng.choice([(4, 1), (6, 2)])
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
            back = sorted(deleted)[: rng.randrange(1, 6)] if deleted else []
            if back:
                rows = {i: _gvec((i + 1) % 5) for i in back}  # NEW group
                write_deltalake(spark, _frame(rows), src, mode="append")
                model.update(rows)
                deleted.difference_update(back)
            history.append(f"reinsert({len(back)})")

        if rng.random() < 0.5 or step == 4:
            dedup.update_semantic_index(spark, DeltaTable(src), idx)
            history.append("refresh")
            _check()
