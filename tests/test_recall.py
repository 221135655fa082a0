"""Recall contracts for the approximate operators.

The rows-only catalog queries (minhash LSH dedup, LSH / IVF / quantized /
PQ / IVF-PQ top-k) are approximate by design — no SQL oracle can pin their
output. These tests bound HOW approximate they are: recall against the
exact operator on the same data, with floors asserted at sf0.01 (the
driver's certification scale) and — for the auto-scaled PQ family, whose
r6 fixed knobs decayed with corpus size — at sf0.1 as well. The operators
are fully deterministic (md5-seeded hyperplanes/permutations,
deterministic k-means seeds), so the measured values are stable run to
run; floors leave margin only for parameter-neutral refactors.

Measured at sf0.01 (the full per-SF ladder, including the auto-scaled PQ
family after the r7 knob work, lives in QUERIES.md — single source of
truth; highlights: lsh 0.90, ivf 0.90, quantized 1.00, pq auto 0.96,
ivf-pq auto 0.92, minhash 1.00/1.00, clustered pairs (8,3) 0.949,
clustered keeplist Jaccard 0.9955 — and at sf0.1 every value holds or
improves: pq 0.94, ivf-pq 0.92).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_rs_spark.operators import dedup, similarity
from delta_rs_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def exact_topk(spark, emb):
    q = emb.filter(F.col("vec_id") < 5)
    return {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, q, k=10).collect()
    }


def _recall(got_df, exact: set) -> float:
    got = {(r.query_id, r.neighbor_id) for r in got_df.collect()}
    return len(got & exact) / len(exact)


def test_lsh_topk_recall_floor(spark, emb, exact_topk):
    q = emb.filter(F.col("vec_id") < 5)
    r = _recall(similarity.lsh_topk(emb, q, k=10, n_planes=4, n_tables=16), exact_topk)
    assert r >= 0.85, f"lsh_topk recall@10 dropped to {r}"


def test_ivf_topk_recall_floor(spark, emb, exact_topk):
    q = emb.filter(F.col("vec_id") < 5)
    r = _recall(similarity.ivf_topk(emb, q, k=10, n_list=8, n_probe=6), exact_topk)
    assert r >= 0.85, f"ivf_topk recall@10 dropped to {r}"


def test_quantized_topk_recall_floor(spark, emb, exact_topk):
    q = emb.filter(F.col("vec_id") < 5)
    r = _recall(similarity.quantized_topk(emb, q, k=10), exact_topk)
    assert r >= 0.95, f"quantized_topk recall@10 dropped to {r}"


def test_minhash_lsh_pair_recall_and_precision(spark):
    """MinHash banding must find (recall) essentially every true
    Jaccard>=0.8 pair, and its exact-verify step makes precision exact —
    any reported pair must BE a true pair."""
    docs = load_table(spark, SF_DIR, "documents")
    true_pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.8, n=3).collect()
    }
    mh = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_dedup(docs, threshold=0.8).collect()
    }
    assert true_pairs, "fixture regression: no true near-dup pairs at sf0.01"
    recall = len(mh & true_pairs) / len(true_pairs)
    assert recall >= 0.95, f"minhash pair recall dropped to {recall}"
    assert mh <= true_pairs, f"false positives slipped past verify: {mh - true_pairs}"


def test_ivf_exhaustive_probe_equals_brute_force(spark, emb):
    """n_probe = n_list makes IVF probing exhaustive: the full output —
    ids, exact-rerank cosines, ranks — must equal cosine_topk row for row
    (the property the certified companion similarity_ivf_exact hashes
    against the brute-force oracle)."""
    q = emb.filter(F.col("vec_id") < 5)
    exact = [tuple(r) for r in similarity.cosine_topk(emb, q, k=10).collect()]
    ivf = [
        tuple(r)
        for r in similarity.ivf_topk(emb, q, k=10, n_list=8, n_probe=8).collect()
    ]
    assert ivf == exact


@pytest.fixture(scope="module")
def pq_books(spark, emb):
    """The per-session trained-codebook cache (pipeline_queries._TRAIN_CACHE,
    VERDICT r6 item #7) — shared across every PQ test here exactly as the
    catalog rows share it in a driver window. Training is deterministic, so
    cache-vs-retrain equality is pinned by the exhaustive-equals-brute-force
    tests below: wrong cached books could not reproduce brute force."""
    from delta_rs_spark.pipeline_queries import _cached_pq_books

    return _cached_pq_books(spark, SF_DIR)


def test_pq_exhaustive_oversample_equals_brute_force(spark, emb, pq_books):
    """oversample >= corpus/k keeps every ADC candidate, so the PQ output —
    trained codebooks, encode, ADC lookup, exact rerank — must equal
    cosine_topk row for row (the property the certified companion
    similarity_pq_exact hashes against the brute-force oracle)."""
    q = emb.filter(F.col("vec_id") < 5)
    exact = [tuple(r) for r in similarity.cosine_topk(emb, q, k=10).collect()]
    pq = [
        tuple(r)
        for r in similarity.pq_topk(
            emb, q, k=10, oversample=1_000_000, books=pq_books
        ).collect()
    ]
    assert pq == exact


@pytest.mark.slow  # builder tier: see pyproject [tool.pytest.ini_options]
def test_ivfpq_exhaustive_equals_brute_force(spark, emb, pq_books):
    """n_probe = n_list AND exhaustive oversample makes both IVF-PQ tiers
    exhaustive: the composed output must equal cosine_topk row for row
    (the property similarity_ivfpq_exact hashes against the oracle)."""
    q = emb.filter(F.col("vec_id") < 5)
    exact = [tuple(r) for r in similarity.cosine_topk(emb, q, k=10).collect()]
    got = [
        tuple(r)
        for r in similarity.ivf_pq_topk(
            emb, q, k=10, n_list=8, n_probe=8, oversample=1_000_000, books=pq_books
        ).collect()
    ]
    assert got == exact


# ---------------------------------------------------------------------------
# PQ-family floors at BOTH scales (VERDICT r6 item #2): the r6 fixed knobs
# (oversample=8, n_list=8) decayed recall 0.94 → 0.74 (PQ) and 0.88 → 0.74
# (IVF-PQ) from sf0.01 to sf0.1 — the exact failure mode a 100× scale-up
# hits. The auto-scaled defaults (pool-fraction oversample, probe-ratio-held
# n_list/n_probe — see similarity.pq_topk / ivf_pq_topk docstrings) must
# clear the same floors at BOTH certification scales.
# ---------------------------------------------------------------------------

_BOTH_SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


@pytest.fixture(scope="module", params=_BOTH_SFS, ids=["sf0.01", "sf0.1"])
def scaled_sf_dir(request):
    return request.param


@pytest.fixture(scope="module")
def scaled_emb(spark, scaled_sf_dir):
    return load_table(spark, scaled_sf_dir, "embeddings")


@pytest.fixture(scope="module")
def scaled_exact_topk(spark, scaled_emb):
    q = scaled_emb.filter(F.col("vec_id") < 5)
    return {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(scaled_emb, q, k=10).collect()
    }


@pytest.fixture(scope="module")
def scaled_pq_setup(spark, scaled_sf_dir):
    from delta_rs_spark.pipeline_queries import _cached_n_rows, _cached_pq_books

    return (
        _cached_pq_books(spark, scaled_sf_dir),
        _cached_n_rows(spark, scaled_sf_dir, "embeddings"),
    )


@pytest.mark.slow  # builder tier: see pyproject [tool.pytest.ini_options]
def test_pq_topk_recall_floor_auto_scaled(
    spark, scaled_emb, scaled_exact_topk, scaled_pq_setup
):
    books, n = scaled_pq_setup
    q = scaled_emb.filter(F.col("vec_id") < 5)
    r = _recall(
        similarity.pq_topk(scaled_emb, q, k=10, books=books, n_rows=n),
        scaled_exact_topk,
    )
    assert r >= 0.85, f"pq_topk auto-scaled recall@10 dropped to {r} at n={n}"


@pytest.mark.slow  # builder tier: see pyproject [tool.pytest.ini_options]
def test_ivfpq_topk_recall_floor_auto_scaled(
    spark, scaled_emb, scaled_exact_topk, scaled_pq_setup
):
    """Explicit raw-trained books (the pre-r10 configuration, still
    reachable: explicit books resolve residual=None to raw) keep their
    auto-scaled floor at both SFs."""
    books, n = scaled_pq_setup
    q = scaled_emb.filter(F.col("vec_id") < 5)
    r = _recall(
        similarity.ivf_pq_topk(scaled_emb, q, k=10, books=books, n_rows=n),
        scaled_exact_topk,
    )
    assert r >= 0.8, f"ivf_pq_topk auto-scaled recall@10 dropped to {r} at n={n}"


@pytest.mark.slow  # builder tier: see pyproject [tool.pytest.ini_options]
def test_ivfpq_default_residual_recall_floor_auto_scaled(
    spark, scaled_emb, scaled_exact_topk, scaled_pq_setup
):
    """Round 10: the DEFAULT path — no books, residual IVFADC trained
    internally — clears the same floor at BOTH certification scales
    (measured 0.88 at n=500, 0.98 at n=2000; the driver twin is the
    'ivf_pq_topk@10 auto-scaled residual-default' recall contract)."""
    _, n = scaled_pq_setup
    q = scaled_emb.filter(F.col("vec_id") < 5)
    r = _recall(
        similarity.ivf_pq_topk(scaled_emb, q, k=10, n_rows=n),
        scaled_exact_topk,
    )
    assert r >= 0.8, f"default residual ivf_pq recall@10 dropped to {r} at n={n}"


@pytest.mark.slow  # builder tier: see pyproject [tool.pytest.ini_options]
def test_knn_graph_recall_floor_auto_scaled(spark, scaled_emb, scaled_pq_setup):
    """The kNN graph SemDeDup would actually consume (VERDICT r7 #4): a
    CORPUS-SIZED query side at the auto-scaled production knobs, recalled
    against the exact all-pairs graph. The certified similarity_knn_graph
    row pins exhaustive knobs ≡ brute force; this floor pins what the
    production knobs recall at both certification scales. Round 10: the
    graph runs the DEFAULT residual path (measured 0.94 at sf0.01 n=500,
    0.96 at sf0.1 n=2000; raw books measured 0.93/0.96 — the near-uniform
    corpus doesn't separate the encodings, the clustered ladder does)."""
    _, n = scaled_pq_setup
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(scaled_emb, scaled_emb, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_pq_topk(
            scaled_emb, scaled_emb, k=5, n_rows=n
        ).collect()
    }
    r = len(got & exact) / len(exact)
    assert r >= 0.8, f"knn-graph auto-scaled recall@5 dropped to {r} at n={n}"


def test_pq_codebook_training_is_deterministic(spark, emb):
    """Per-subspace Lloyd codebooks must not vary with shuffle reduction
    order (DECIMAL means, xxhash64 seeds) — identical books from
    differently-partitioned input, bit for bit."""
    b1 = similarity.train_pq_codebooks(emb.repartition(3), m=4, k_codes=8, iters=1)
    b2 = similarity.train_pq_codebooks(emb.repartition(7), m=4, k_codes=8, iters=1)
    assert b1 == b2


def test_clustered_pairs_probe_all_equals_exact(spark, emb):
    """n_probe = n_list puts every vector in every cluster, so the
    within-cluster GEMM sees every pair: clustered_exact_pairs must equal
    blocked_exact_pairs row for row — ids AND cosines (the property the
    certified companion dedup_semantic_clustered hashes against the exact
    recursive-CTE oracle)."""
    exact = {
        tuple(r)
        for r in similarity.blocked_exact_pairs(
            emb, threshold=0.4, id_col="vec_id", vec_col="embedding"
        ).collect()
    }
    clus = {
        tuple(r)
        for r in similarity.clustered_exact_pairs(
            emb, threshold=0.4, n_list=4, n_probe=4, id_col="vec_id", vec_col="embedding"
        ).collect()
    }
    assert clus == exact


def test_clustered_pairs_recall_floor_and_exact_precision(spark, emb):
    """The scale path trades pair RECALL (a qualifying pair split across
    clusters is missed), never precision: every emitted pair is scored by
    the same exact GEMM kernel, so the output must be a strict subset of
    the exact pair set. Measured at sf0.01: recall 0.949 at (n_list=8,
    n_probe=3), 0.78 at (8, 2) — deterministic k-means seeds make the
    values stable run to run."""
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.blocked_exact_pairs(
            emb, threshold=0.4, id_col="vec_id", vec_col="embedding"
        ).collect()
    }
    clus = {
        (r.id_a, r.id_b)
        for r in similarity.clustered_exact_pairs(
            emb, threshold=0.4, n_list=8, n_probe=3, id_col="vec_id", vec_col="embedding"
        ).collect()
    }
    assert clus <= exact, f"false positives: {clus - exact}"
    r = len(clus & exact) / len(exact)
    assert r >= 0.9, f"clustered pair recall dropped to {r}"


def test_clustered_keeplist_agreement_floor(spark, emb):
    """End-to-end contract for method='clustered' semantic dedup at the
    DEFAULT probe (n_list=8, n_probe=3): the survivor set must stay in
    high agreement with the exact keeplist (measured Jaccard 0.9955 at
    sf0.01, 0.9654 at sf0.1 — missed cross-cluster pairs only ever let a
    few extra near-duplicates survive; nothing unique is ever dropped,
    pinned by the superset check). probe 2 was rejected as the default:
    its agreement decays with corpus size (0.974 at sf0.01 -> 0.822 at
    sf0.1), while probe 3's pair recall holds ~0.95 at both."""
    exact = {r.vec_id for r in dedup.semantic_keeplist(emb, threshold=0.4).collect()}
    clus = {
        r.vec_id
        for r in dedup.semantic_keeplist(emb, threshold=0.4, method="clustered").collect()
    }
    assert clus >= exact, "clustered keeplist dropped a vector the exact path keeps"
    j = len(exact & clus) / len(exact | clus)
    assert j >= 0.95, f"keeplist agreement dropped to {j}"


def test_ivf_centroid_training_is_deterministic(spark, emb):
    """Centroid training must not vary with shuffle reduction order: the
    Lloyd means are exact decimal sums, and the seeds are xxhash64-picked —
    identical centroids from differently-partitioned input, bit for bit."""
    c1 = similarity.train_ivf_centroids(emb.repartition(3), n_list=8)
    c2 = similarity.train_ivf_centroids(emb.repartition(7), n_list=8)
    assert c1 == c2
