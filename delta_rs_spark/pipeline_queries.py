"""Pipeline-operator queries: dedup / similarity / text / multimodal entries
for the certified catalog (each pairs the Spark operator with a DuckDB oracle
where SQL can express it; approximate/hash-bucketed ops are rows-only)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import (
    clustering,
    corpus,
    dedup,
    multimodal,
    profiling,
    similarity,
    text,
    timeseries,
)
from .queries import query
from .sources.tables import load_table


# ---------------------------------------------------------------------------
# Per-session training cache (VERDICT r6 item #7): the explicit-books PQ
# catalog rows (pq_topk / pq_exact / ivfpq_exact) all
# need the SAME trained artifacts over the same (sf_dir, params) corpus —
# retraining per row cost ~4 min of driver-window time at sf0.01. Training is
# DETERMINISTIC (xxhash64 seeds + order-insensitive DECIMAL means, pinned by
# tests/test_recall.py's determinism tests), so a cache hit is bit-identical
# to a retrain; entries are driver-held literals (KB of centroids/codebooks,
# one int per table count). Keyed on the sf_dir string — the driver and the
# tests address a corpus by path, and a changed path is a changed key.
# ---------------------------------------------------------------------------

_TRAIN_CACHE: dict[tuple, object] = {}


def _cached_n_rows(spark: SparkSession, sf_dir: str, table: str) -> int:
    """Row count of a testdata table, one bounded job per (sf_dir, table)
    per session — the ``n_rows`` hint the auto-scaled ANN knobs derive
    from (the same role a Delta source's log-level ``numRecords`` sum
    plays in production; see `similarity.blocked_exact_pairs`)."""
    key = (sf_dir, "n_rows", table)
    if key not in _TRAIN_CACHE:
        _TRAIN_CACHE[key] = load_table(spark, sf_dir, table).count()
    return _TRAIN_CACHE[key]


def _cached_pq_books(
    spark: SparkSession, sf_dir: str, m: int = 16, k_codes: int = 16, iters: int = 2
) -> list:
    """RAW-trained PQ codebooks shared across the flat-PQ rows in a session
    (pq_topk has no coarse tier to take residuals against) and the
    explicit-books exact companions. The IVF-PQ default-path rows train
    their own IVFADC residual books in-call since round 10."""
    key = (sf_dir, "pq_books", m, k_codes, iters)
    if key not in _TRAIN_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        _TRAIN_CACHE[key] = similarity.train_pq_codebooks(
            emb, m=m, k_codes=k_codes, iters=iters
        )
    return _TRAIN_CACHE[key]


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

@query(
    "dedup_exact",
    """
    SELECT min(doc_id) AS doc_id, md5(text) AS key_hash
    FROM documents GROUP BY text ORDER BY doc_id
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs, ["text"]).orderBy("doc_id")


_JACCARD_ORACLE = """
WITH words AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)])) AS shingle
  FROM words
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= {threshold}
ORDER BY doc_a, doc_b
"""


@query("dedup_ngram_jaccard", _JACCARD_ORACLE.format(threshold=0.8), headline=True)
def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # no final orderBy: a dedup pair list is a set — globally sorting it adds a
    # range-partition exchange (plus its sampling job) for presentation only,
    # and at 100 TB that sort is pure wasted shuffle. The driver's correctness
    # compare is order-insensitive by design.
    return dedup.ngram_jaccard_pairs(docs, threshold=0.8, n=3)


@query("dedup_minhash_lsh", None, headline=True)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_dedup(docs, threshold=0.8)  # unordered pair set (see above)


@query("dedup_minhash_verified", _JACCARD_ORACLE.format(threshold=0.8))
def q_dedup_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-oracle companion to the rows-only ``dedup_minhash_lsh``: the
    banding is a candidate GENERATOR and every candidate is verified with
    exact Jaccard, so when banding recall is 1.0 (this corpus — floor
    pinned in tests/test_recall.py, and deterministic: xxhash64 band
    hashes over fixed data) the output equals the exact n-gram Jaccard
    pair set, hashable against the same independent SQL oracle. A banding
    regression (wrong signature slice, permutation bug) that silently
    dropped a true near-dup pair turns this row red instead of just
    nudging an unchecked recall number."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_dedup(docs, threshold=0.8)


_SIMHASH_ORACLE = r"""
WITH words AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '')) AS w
  FROM documents
),
wh AS (SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 16)) AS UBIGINT) AS h FROM words),
votes AS (
  SELECT doc_id, t.b AS b, SUM(CASE WHEN (h >> t.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM wh CROSS JOIN range(64) t(b)
  GROUP BY doc_id, t.b
),
fp AS (
  SELECT doc_id,
         BIT_OR(CASE WHEN v > 0 THEN (CAST(1 AS UBIGINT) << b) ELSE CAST(0 AS UBIGINT) END) AS ufp
  FROM votes GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.ufp, b.ufp)) AS INTEGER) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.ufp, b.ufp)) <= 3
ORDER BY doc_a, doc_b
"""


@query("dedup_simhash", _SIMHASH_ORACLE)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs are EXACT for hamming <= k (pigeonhole banding
    with k+1 bands misses nothing), so the md5-derived fingerprints are
    oracle-checkable bit-for-bit: the SQL recomputes the same word hashes,
    bit votes, and popcounts."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_pairs(docs, max_hamming=3).orderBy("doc_a", "doc_b")


@query(
    "dedup_embedding_cosine",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 4) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 4) >= 0.4
    ORDER BY id_a, id_b
    """,
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the synthetic embeddings are near-orthogonal (max pairwise cosine ~0.5),
    # so the "near-duplicate" threshold here is 0.4 to exercise the operator
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.embedding_cosine_pairs(emb, threshold=0.4).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

# Brute-force cosine top-10 for queries vec_id < 5 — the shared oracle for
# the exact path (similarity_topk) and every approximate path whose
# deterministic configuration provably reduces to brute force
# (similarity_quantized_rerank: lossless int8 screen at oversample=4;
# similarity_ivf_exact: exhaustive probing at n_probe = n_list).
def _brute_force_topk_sql(k: int, query_where: str | None) -> str:
    """All-pairs brute-force cosine top-k oracle — ONE body shared by every
    exact ANN companion (bounded-probe and corpus-wide), so the ranking
    contract (round-6 cosine, id tiebreak) cannot drift between rows."""
    where = f"WHERE {query_where}" if query_where else ""
    return f"""
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])), 6) AS cosine,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                     CAST(c.embedding AS DOUBLE[])), 6) DESC,
                        c.vec_id
             ) AS rank
      FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
      {where}
    ) WHERE rank <= {k}
    ORDER BY query_id, rank
    """


_BRUTE_FORCE_TOPK_ORACLE = _brute_force_topk_sql(10, "q.vec_id < 5")


@query(
    "similarity_topk",
    _BRUTE_FORCE_TOPK_ORACLE,
    headline=True,
)
def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)


_KNN_GRAPH_ORACLE = _brute_force_topk_sql(5, None)


@query("similarity_knn_graph", _KNN_GRAPH_ORACLE)
def q_similarity_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN GRAPH construction — every corpus vector gets its top-5
    neighbors, the primitive under SemDeDup / kNN-graph clustering /
    link-based curation. The point being certified: the IVF-PQ candidate
    join takes a CORPUS-SIZED query side (no broadcast of the probe set —
    the list_id equi-join shuffles both sides by list, so 10⁹ queries
    partition exactly like 5), unlike the brute-force baseline whose
    broadcast query block must stay driver-bounded. Exhaustive knobs
    (probe all 8 lists, keep every ADC candidate) make the output provably
    equal the all-pairs brute-force oracle; at production knobs the same
    call is the scale path (n·n_probe/n_list scanned per query). Round 10:
    books are no longer pinned to the shared raw-trained cache — the row
    runs the DEFAULT path, which now trains IVFADC residual books
    (exhaustive knobs keep the brute-force equality: the exact rerank is
    encoding-agnostic, so this row certifies the residual-default
    composition end to end)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_pq_topk(
        emb,
        emb,
        k=5,
        n_list=8,
        n_probe=8,
        oversample=1_000_000,
    )


@query("similarity_quantized_topk", None)
def q_similarity_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    # int8 candidate scoring + exact rerank of the 4k oversampled survivors;
    # approximate by design (quantization error) → rows-only check
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.quantized_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)


@query("similarity_lsh_topk", None)
def q_similarity_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 4 hyperplanes × 16 independent tables: near-orthogonal synthetic
    # vectors need coarse buckets AND multi-table voting for recall
    # (measured recall@10 = 0.90 vs exact cosine_topk at sf0.01 — pinned in
    # tests/test_recall.py); real clustered embeddings tolerate more planes
    # and fewer tables (= smaller candidate sets)
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10, n_planes=4, n_tables=16
    )


@query(
    "similarity_lsh_buckets",
    similarity.lsh_bucket_assignments_oracle_sql(n_planes=8, n_tables=2),
)
def q_similarity_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-oracle companion to the rows-only ``similarity_lsh_topk``:
    certifies the deterministic core of the LSH path — every vector's
    (table, bucket) assignment through the same codegen expression — by
    hash against DuckDB evaluating the identical literal sign matrix in
    the identical addition order. A silent sign flip / plane-slice / bit
    -order bug would degrade LSH recall without failing any rows-only
    check; this row makes it a hard mismatch."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_bucket_assignments(emb, n_planes=8, n_tables=2)


@query("similarity_quantized_rerank", _BRUTE_FORCE_TOPK_ORACLE)
def q_similarity_quantized_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-oracle companion to the rows-only ``similarity_quantized_topk``:
    the int8 screen at oversample=4 retains every true neighbor on this
    corpus (recall 1.00, floor pinned in tests/test_recall.py) and the
    final scores come from the exact float rerank, so the full output —
    ids, cosines, ranks — must hash-equal the brute-force oracle. A
    quantization or oversampling regression that silently dropped a true
    neighbor would flip this row red."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.quantized_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)


@query("similarity_ivf_topk", None)
def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF coarse quantizer (k-means is iterative — rows-only check); the
    # near-orthogonal synthetic vectors spread neighbors across lists, so
    # recall needs a wide probe (measured recall@10 = 0.90 at n_probe=6,
    # pinned in tests/test_recall.py); clustered real embeddings reach the
    # same recall probing far fewer lists
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10, n_list=8, n_probe=6
    )


@query("similarity_ivf_exact", _BRUTE_FORCE_TOPK_ORACLE)
def q_similarity_ivf_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-oracle companion to the rows-only ``similarity_ivf_topk``: at
    ``n_probe = n_list`` every query probes every list, so the IVF output —
    centroid train (order-insensitive decimal means), norm-invariant list
    assignment, probe join, exact rerank — must equal brute force row for
    row, cosine for cosine (the rerank shares ``cosine_topk``'s exact
    scoring expression). A centroid-train or assignment regression that
    silently dropped a candidate list flips this row red; recall at the
    production probe width stays pinned in tests/test_recall.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10, n_list=8, n_probe=8
    )


# The recall FLOORS pinned in tests/test_recall.py, as oracle literals:
# the query measures recall distributively and hashes measured >= floor,
# so the row is scale-independent (raw recall is a corpus-dependent
# measurement — 0.90 at sf0.01, 0.96 at sf0.1 for IVF — but the floor
# contract holds at every scale). A parameter or kernel change that drops
# any operator under its floor flips this row red on the driver, the same
# way tests/test_recall.py flips locally.
_RECALL_CONTRACTS_ORACLE = """
    SELECT * FROM (VALUES
      ('clustered_pairs_precision 8 lists probe 3 t=0.4', CAST(1.0 AS DOUBLE), true),
      ('clustered_pairs_recall 8 lists probe 3 t=0.4', CAST(0.9 AS DOUBLE), true),
      ('ivf_pq_topk@10 auto-scaled residual-default', CAST(0.8 AS DOUBLE), true),
      ('ivf_topk@10 8 lists probe 6', CAST(0.85 AS DOUBLE), true),
      ('knn_graph@5 ivf-pq auto-scaled residual-default', CAST(0.8 AS DOUBLE), true),
      ('lsh_topk@10 4 planes x 16 tables', CAST(0.85 AS DOUBLE), true),
      ('minhash_pair_precision t=0.8', CAST(1.0 AS DOUBLE), true),
      ('minhash_pair_recall t=0.8', CAST(0.95 AS DOUBLE), true),
      ('pq_topk@10 auto-scaled', CAST(0.85 AS DOUBLE), true),
      ('quantized_topk@10 int8 oversample 4', CAST(0.95 AS DOUBLE), true)
    ) AS t(contract, floor, passes)
    ORDER BY contract
    """


@query("recall_contracts", _RECALL_CONTRACTS_ORACLE)
def q_recall_contracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall contracts as a driver-hashable row: each approximate
    operator's recall (and minhash precision) measured DISTRIBUTIVELY
    against the exact baseline computed in the same job — semi-join hit
    counts over the (query, neighbor) / (doc_a, doc_b) pair sets, ratios
    as 1-row broadcast crosses — then compared to the floor pinned in
    tests/test_recall.py. The hashed columns are (contract, floor, passes):
    floors are scale-independent where the raw measurements are not."""
    from .caching import persist_tracked

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    q = emb.filter(F.col("vec_id") < 5)

    exact = persist_tracked(
        similarity.cosine_topk(emb, q, k=10).select("query_id", "neighbor_id")
    )
    # the all-pairs exact graph (every vector's true top-5) — the baseline
    # for the production-knob kNN-graph contract; the same brute force the
    # similarity_knn_graph oracle evaluates, computed distributively here
    exact_graph = persist_tracked(
        similarity.cosine_topk(emb, emb, k=5).select("query_id", "neighbor_id")
    )

    def _ratio(contract: str, floor: float, num_df, den_df) -> DataFrame:
        num = num_df.agg(F.count(F.lit(1)).alias("num"))
        den = den_df.agg(F.count(F.lit(1)).alias("den"))
        return num.crossJoin(den).select(
            F.lit(contract).alias("contract"),
            F.lit(float(floor)).alias("floor"),
            (F.col("num") / F.col("den") >= floor).alias("passes"),
        )

    def _topk_recall(
        contract: str, floor: float, approx: DataFrame, exact: DataFrame = exact
    ) -> DataFrame:
        hits = approx.select("query_id", "neighbor_id").join(
            exact, ["query_id", "neighbor_id"], "left_semi"
        )
        return _ratio(contract, floor, hits, exact)

    true_pairs = persist_tracked(
        dedup.ngram_jaccard_pairs(docs, threshold=0.8, n=3).select("doc_a", "doc_b")
    )
    mh_pairs = persist_tracked(
        dedup.minhash_lsh_dedup(docs, threshold=0.8).select("doc_a", "doc_b")
    )
    # persisted like the other shared frames: feeds BOTH the recall and the
    # precision ratio, and the semi-join would otherwise run twice
    mh_hits = persist_tracked(
        mh_pairs.join(true_pairs, ["doc_a", "doc_b"], "left_semi")
    )

    # cluster-first semantic dedup: pair recall vs the corpus-wide exact
    # GEMM at the DEFAULT probe, and precision (exact scoring makes the
    # clustered output a strict subset — floor 1.0 is a hard invariant)
    exact_pairs = persist_tracked(
        similarity.blocked_exact_pairs(
            emb, threshold=0.4, id_col="vec_id", vec_col="embedding"
        ).select("id_a", "id_b")
    )
    clus_pairs = persist_tracked(
        similarity.clustered_exact_pairs(
            emb, threshold=0.4, n_list=8, n_probe=3, id_col="vec_id", vec_col="embedding"
        ).select("id_a", "id_b")
    )
    clus_hits = persist_tracked(
        clus_pairs.join(exact_pairs, ["id_a", "id_b"], "left_semi")
    )

    return (
        _topk_recall(
            "ivf_topk@10 8 lists probe 6",
            0.85,
            similarity.ivf_topk(emb, q, k=10, n_list=8, n_probe=6),
        )
        .unionAll(
            _topk_recall(
                "lsh_topk@10 4 planes x 16 tables",
                0.85,
                similarity.lsh_topk(emb, q, k=10, n_planes=4, n_tables=16),
            )
        )
        .unionAll(
            _topk_recall(
                "quantized_topk@10 int8 oversample 4",
                0.95,
                similarity.quantized_topk(emb, q, k=10),
            )
        )
        .unionAll(
            _topk_recall(
                "pq_topk@10 auto-scaled",
                0.85,
                similarity.pq_topk(
                    emb,
                    q,
                    k=10,
                    books=_cached_pq_books(spark, sf_dir),
                    n_rows=_cached_n_rows(spark, sf_dir, "embeddings"),
                ),
            )
        )
        .unionAll(
            # round 10: the ivf-pq contracts measure the DEFAULT path —
            # internally trained IVFADC residual books, the encoding the
            # two-size ladder proved scale-stable (measured 0.88 @ n=500,
            # 0.98 @ n=2000; floor 0.8 at both)
            _topk_recall(
                "ivf_pq_topk@10 auto-scaled residual-default",
                0.8,
                similarity.ivf_pq_topk(
                    emb,
                    q,
                    k=10,
                    n_rows=_cached_n_rows(spark, sf_dir, "embeddings"),
                ),
            )
        )
        .unionAll(
            # the kNN GRAPH SemDeDup would actually consume (VERDICT r7 #4):
            # corpus-sized query side at AUTO knobs — the certified
            # similarity_knn_graph row pins exhaustive knobs ≡ brute force;
            # this contract pins what production knobs actually recall
            # (residual default: 0.94 @ n=500, 0.96 @ n=2000)
            _topk_recall(
                "knn_graph@5 ivf-pq auto-scaled residual-default",
                0.8,
                similarity.ivf_pq_topk(
                    emb,
                    emb,
                    k=5,
                    n_rows=_cached_n_rows(spark, sf_dir, "embeddings"),
                ),
                exact=exact_graph,
            )
        )
        .unionAll(_ratio("minhash_pair_recall t=0.8", 0.95, mh_hits, true_pairs))
        .unionAll(_ratio("minhash_pair_precision t=0.8", 1.0, mh_hits, mh_pairs))
        .unionAll(
            _ratio(
                "clustered_pairs_recall 8 lists probe 3 t=0.4",
                0.9,
                clus_hits,
                exact_pairs,
            )
        )
        .unionAll(
            _ratio(
                "clustered_pairs_precision 8 lists probe 3 t=0.4",
                1.0,
                clus_hits,
                clus_pairs,
            )
        )
        .orderBy("contract")
    )


# Small-probe-ratio floors on the CLUSTERED corpus (VERDICT r7 #3), as
# oracle literals: the pruning regime the IVF design targets, measured on
# data that actually clusters. The third row is a CEILING, not a floor —
# the same knobs on the near-uniform corpus must stay BELOW 0.7, so the
# demonstration (clustered data supports small ratios, uniform data does
# not) is itself driver-certified and cannot silently rot.
_RECALL_CLUSTERED_ORACLE = """
    SELECT * FROM (VALUES
      ('clustered ivf_pq_topk@10 probe 2/16', CAST(0.9 AS DOUBLE), true),
      ('clustered ivf_topk@10 probe 2/16', CAST(0.9 AS DOUBLE), true),
      ('uniform-contrast ivf_topk@10 probe 2/16 stays below', CAST(0.7 AS DOUBLE), true)
    ) AS t(contract, floor, passes)
    ORDER BY contract
    """


@query("recall_clustered_contracts", _RECALL_CLUSTERED_ORACLE)
def q_recall_clustered_contracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustered-regime recall contracts, driver-hashed (VERDICT r7 #3).

    `/root/testdata`'s embeddings are near-uniform on the sphere — the
    regime where IVF pruning is weakest and the ladder's probe ratio had to
    sit at 0.75. This row measures the regime the index DESIGN targets: a
    deterministic mixture-of-Gaussians corpus (`similarity.clustered_corpus`
    — md5-keyed, partitioning-invariant, sf-independent by construction; the
    sf_dir tables aren't used) at probe ratio 2/16 = 0.125. Measured recall
    is 1.00 for both IVF and IVF-PQ at sep=4 (QUERIES.md ladder); floors sit
    at 0.9. The contrast row inverts the comparison: the SAME knobs on the
    sep=0 near-uniform twin measure 0.32 and must stay BELOW 0.7 — pinning
    that the clustered floors demonstrate a data regime, not an easy knob.
    Recall is computed distributively (semi-join hit counts, 1-row
    broadcast ratios), exactly like `recall_contracts`."""
    from .caching import persist_tracked

    clustered = persist_tracked(
        similarity.clustered_corpus(spark, n=2000, dim=16, n_clusters=25, sep=4.0)
    )
    q = clustered.filter(F.col("vec_id") < 5)
    exact = persist_tracked(
        similarity.cosine_topk(clustered, q, k=10).select("query_id", "neighbor_id")
    )
    books = similarity.train_pq_codebooks(clustered, m=8, k_codes=16, iters=2)

    uni = persist_tracked(
        similarity.clustered_corpus(spark, n=2000, dim=16, n_clusters=25, sep=0.0)
    )
    uq = uni.filter(F.col("vec_id") < 5)
    exact_u = persist_tracked(
        similarity.cosine_topk(uni, uq, k=10).select("query_id", "neighbor_id")
    )

    def _ratio_row(contract: str, bound: float, num_df, den_df, below: bool):
        num = num_df.agg(F.count(F.lit(1)).alias("num"))
        den = den_df.agg(F.count(F.lit(1)).alias("den"))
        ratio = F.col("num") / F.col("den")
        return num.crossJoin(den).select(
            F.lit(contract).alias("contract"),
            F.lit(float(bound)).alias("floor"),
            (ratio < bound if below else ratio >= bound).alias("passes"),
        )

    def _recall_row(contract, bound, approx, exact_df, below=False):
        hits = approx.select("query_id", "neighbor_id").join(
            exact_df, ["query_id", "neighbor_id"], "left_semi"
        )
        return _ratio_row(contract, bound, hits, exact_df, below)

    return (
        _recall_row(
            "clustered ivf_topk@10 probe 2/16",
            0.9,
            similarity.ivf_topk(clustered, q, k=10, n_list=16, n_probe=2),
            exact,
        )
        .unionAll(
            _recall_row(
                "clustered ivf_pq_topk@10 probe 2/16",
                0.9,
                similarity.ivf_pq_topk(
                    clustered, q, k=10, n_list=16, n_probe=2, books=books, n_rows=2000
                ),
                exact,
            )
        )
        .unionAll(
            _recall_row(
                "uniform-contrast ivf_topk@10 probe 2/16 stays below",
                0.7,
                similarity.ivf_topk(uni, uq, k=10, n_list=16, n_probe=2),
                exact_u,
                below=True,
            )
        )
        .orderBy("contract")
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

@query("text_lang_id", text.lang_id_oracle_sql())
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.lang_id(docs).orderBy("doc_id")


@query("text_quality_score", text.QUALITY_ORACLE_SQL_TEMPLATE.format(table="documents"))
def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.quality_score(docs).orderBy("doc_id")


@query(
    "text_token_count",
    """
    SELECT doc_id,
           len(string_split_regex(text, '\\s+')) AS ws_tokens,
           len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS regex_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS approx_bpe_tokens
    FROM documents ORDER BY doc_id
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.token_count(docs).orderBy("doc_id")


@query(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
    FROM documents ORDER BY doc_id
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.fingerprint(docs).select("doc_id", "fingerprint").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------

@query("multimodal_features", multimodal.MULTIMODAL_ORACLE_SQL)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.attach_binary_payload(docs)
    return (
        multimodal.extract_features(payloads)
        .select("doc_id", "n_bytes", "fake_width", "fake_height")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Time series
# ---------------------------------------------------------------------------

@query(
    "asof_join_events",
    """
    SELECT l.event_id, l.user_id, l.ts, l.value,
           r.ts AS ts_right, r.value AS value_right
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    ORDER BY l.event_id
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach the most recent prior 'error' event to every 'click' per user —
    DuckDB's native ASOF JOIN is the oracle; our operator is the union +
    single-window formulation (one shuffle on user_id)."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts", "value")
    errors = e.filter(F.col("event_type") == "error").select("user_id", "ts", "value")
    return (
        timeseries.asof_join(clicks, errors, on="ts", by="user_id", right_cols=["value"])
        .select("event_id", "user_id", "ts", "value", "ts_right", "value_right")
        .orderBy("event_id")
    )


@query(
    "range_join_error_windows",
    """
    SELECT e.ts AS w_start, COUNT(v.ts) AS n_views
    FROM (SELECT ts FROM events WHERE event_type = 'error') e
    LEFT JOIN (SELECT ts FROM events WHERE event_type = 'view') v
      ON v.ts >= e.ts AND v.ts < e.ts + INTERVAL '5 minutes'
    GROUP BY e.ts
    ORDER BY w_start
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Views falling inside the 5-minute window after each error — an
    interval join with NO equi key. Naive Spark = BroadcastNestedLoopJoin
    (points x intervals); the bucketed range_join makes it an equi-join on
    5-minute time buckets. Left semantics (empty windows count 0) compose as
    inner range_join + counts joined back onto all intervals."""
    e = load_table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select("ts")
    windows = (
        e.filter(F.col("event_type") == "error")
        .select(F.col("ts").alias("w_start"))
        .withColumn("w_end", F.col("w_start") + F.expr("INTERVAL 5 MINUTES"))
    )
    matched = timeseries.range_join(
        views, windows, on="ts", start_col="w_start", end_col="w_end", bucket_width=300.0
    )
    counts = matched.groupBy("w_start").agg(F.count(F.lit(1)).alias("n_views"))
    return (
        windows.join(counts, "w_start", "left")
        .select("w_start", F.coalesce("n_views", F.lit(0)).alias("n_views"))
        .orderBy("w_start")
    )


# ---------------------------------------------------------------------------
# Skew handling
# ---------------------------------------------------------------------------

@query(
    "skew_salted_count_distinct",
    """
    SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_salted_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) under an extreme-skew grouping key (l_returnflag has
    3 values → 3 reducers in the naive plan, each seeing ~n/3 rows). The
    salted variant spreads each hot key over 64 value-hash buckets and sums
    the disjoint partial distinct counts — exact, and verified against the
    naive SQL here."""
    from .operators.skew import salted_count_distinct

    l = load_table(spark, sf_dir, "lineitem")
    return salted_count_distinct(
        l, ["l_returnflag"], "l_suppkey", alias="n_supp"
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Sampling / dataset splitting
# ---------------------------------------------------------------------------

@query(
    "split_train_val_test",
    """
    SELECT doc_id,
           CASE
             WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  < CAST(0.8 * 4294967296 AS BIGINT) THEN 'train'
             WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  < CAST(0.9 * 4294967296 AS BIGINT) THEN 'val'
             ELSE 'test'
           END AS split
    FROM documents
    ORDER BY doc_id
    """,
)
def q_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split by md5(id) hash-range — identical row
    assignment in both engines, any partitioning, any corpus size."""
    from .operators.sampling import train_val_test_split

    docs = load_table(spark, sf_dir, "documents")
    return train_val_test_split(docs).select("doc_id", "split").orderBy("doc_id")


# ---------------------------------------------------------------------------
# End-to-end corpus curation (the operators composed, as a pipeline would)
# ---------------------------------------------------------------------------

@query(
    "pipeline_corpus_curation",
    """
    WITH kept AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
    docs AS (SELECT d.* FROM documents d JOIN kept USING (doc_id)),
    feats AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len(string_split_regex(text, '\\s+')) AS n_words,
             length(text) - length(regexp_replace(text, '\\s', '', 'g')) AS n_spaces,
             length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
             len(list_distinct(string_split_regex(lower(text), '\\s+'))) AS n_distinct
      FROM docs
    ),
    good AS (
      SELECT doc_id FROM feats
      WHERE (CASE WHEN n_words >= 20 THEN 1 ELSE 0 END)
          + (CASE WHEN CAST(CAST(n_chars - n_spaces AS DECIMAL(18,6)) / n_words AS DOUBLE)
                  BETWEEN 3 AND 12 THEN 1 ELSE 0 END)
          + (CASE WHEN CAST(CAST(n_distinct AS DECIMAL(18,6)) / n_words AS DOUBLE) >= 0.3
                  THEN 1 ELSE 0 END)
          + (CASE WHEN CAST(CAST(n_punct AS DECIMAL(18,6)) / n_chars AS DOUBLE) <= 0.1
                  THEN 1 ELSE 0 END) >= 3
    ),
    final AS (
      SELECT d.doc_id,
             len(string_split_regex(d.text, '\\s+')) AS toks,
             CASE
               WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                    < CAST(0.8 * 4294967296 AS BIGINT) THEN 'train'
               WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                    < CAST(0.9 * 4294967296 AS BIGINT) THEN 'val'
               ELSE 'test'
             END AS split
      FROM docs d JOIN good USING (doc_id)
    )
    SELECT split, COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS total_tokens
    FROM final GROUP BY split ORDER BY split
    """,
)
def q_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data pipeline end to end: exact dedup → quality filter
    (score ≥ 3) → deterministic train/val/test split → per-split document
    and token counts. Every stage is the certified operator; the oracle
    recomputes the whole pipeline in SQL."""
    from .caching import persist_tracked

    from .operators.sampling import train_val_test_split

    docs = load_table(spark, sf_dir, "documents")
    # survivor id-lists are persisted (doc_id-only, tiny): `deduped` feeds
    # both the quality scorer and the final join, and without the persist
    # its lineage would re-run the dedup hash-shuffle per consumer. The
    # corpus-sized `deduped` itself is deliberately NOT persisted — caching
    # the full corpus is the wrong trade at scale; re-joining ids against
    # the base scan is the cheap side.
    kept = (
        dedup.exact_dedup(docs, ["text"])
        .select("doc_id")
        .transform(persist_tracked)
    )
    deduped = docs.join(kept, "doc_id")
    good = (
        text.quality_score(deduped)
        .filter(F.col("quality_score") >= 3)
        .select("doc_id")
        .transform(persist_tracked)
    )
    final = train_val_test_split(deduped.join(good, "doc_id"))
    return (
        final.withColumn("toks", F.size(F.split(F.col("text"), r"\s+")))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("toks").alias("total_tokens"))
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# Near-dup clustering, contamination, corpus stats, repetition
# ---------------------------------------------------------------------------

_TRIGRAM_SH_CTE = r"""
words AS (
  SELECT doc_id, source, string_split_regex(lower(text), '\s+') AS w FROM documents
),
sh AS (
  SELECT doc_id, source,
         unnest(list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)])) AS shingle
  FROM words
)
"""

_CLUSTERS_ORACLE = (
    "WITH RECURSIVE "
    + _TRIGRAM_SH_CTE
    + r""",
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b FROM common
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.8
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach(node, lab) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t(u)
  UNION
  SELECT e.u, r.lab FROM edges e JOIN reach r ON e.v = r.node
)
SELECT node AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY node ORDER BY doc_id
"""
)


@query("dedup_clusters", _CLUSTERS_ORACLE)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate groups: exact Jaccard pairs (threshold 0.8) folded into
    connected components by iterative min-label propagation — similarity made
    transitive, one cluster id (= min member doc_id) per dup group. The
    oracle recomputes reachability with a recursive CTE, so the component
    assignment is verified exactly."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.8, n=3)
    return (
        clustering.connected_components(pairs)
        .select(F.col("node").alias("doc_id"), "cluster_id")
        .orderBy("doc_id")
    )


_CONTAMINATION_ORACLE = (
    "WITH "
    + _TRIGRAM_SH_CTE
    + r""",
bench AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
docsh AS (SELECT doc_id, shingle FROM sh WHERE source <> 'src0')
SELECT d.doc_id,
       count(*) AS n_shingles,
       count(b.shingle) AS n_contaminated,
       round(CAST(CAST(count(b.shingle) AS DECIMAL(18,6)) / count(*) AS DOUBLE), 6)
         AS contamination_rate
FROM docsh d LEFT JOIN bench b ON d.shingle = b.shingle
GROUP BY d.doc_id ORDER BY d.doc_id
"""
)


@query("text_contamination", _CONTAMINATION_ORACLE)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per-document fraction of distinct trigrams
    that appear anywhere in the benchmark subset (source = 'src0')."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.contamination_rates(docs, F.col("source") == "src0").orderBy("doc_id")


@query(
    "text_char_entropy",
    text.CHAR_ENTROPY_ORACLE_SQL_TEMPLATE.format(
        table="documents", id_col="doc_id", text_col="text"
    ),
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the gibberish /
    boilerplate pretraining quality signal. Integer-count log arguments +
    per-term decimal quantization make the value engine-invariant."""
    docs = load_table(spark, sf_dir, "documents")
    return text.char_entropy(docs).orderBy("doc_id")


@query("text_contamination_bloom", _CONTAMINATION_ORACLE)
def q_contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontamination scale path: broadcast Bloom prefilter (bitset as
    one array literal, probes in codegen) + exact semi-join verify. Same
    oracle as the exact form — the Bloom filter only prunes, never decides,
    so the output is bit-identical while the shuffle carries only
    Bloom-passing candidates instead of every corpus shingle."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.contamination_rates_bloom(
        spark, docs, F.col("source") == "src0"
    ).orderBy("doc_id")


_TOP_NGRAMS_ORACLE = r"""
WITH words AS (
  SELECT string_split_regex(lower(text), '\s+') AS w FROM documents
),
sh AS (
  SELECT unnest([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) AS shingle
  FROM words
)
SELECT shingle, count(*) AS occurrences
FROM sh GROUP BY shingle
ORDER BY occurrences DESC, shingle LIMIT 20
"""


@query("corpus_top_ngrams", _TOP_NGRAMS_ORACLE)
def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide trigram frequency top-20 (occurrences, not per-doc
    distinct), tie-broken by the n-gram string."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.top_ngrams(docs, n=3, k=20)


@query("text_repetition", text.REPETITION_ORACLE_SQL_TEMPLATE.format(table="documents"))
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-repetition quality features per document (top-word dominance and
    type-token ratio via explode + two-level aggregation)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.repetition_score(docs).orderBy("doc_id")


_TFIDF_ORACLE = r"""
WITH words AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM words GROUP BY doc_id, term),
dfw AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfw.df,
         round(tf.tf * ln((n.n + 1) * 1.0 / (dfw.df + 1)), 6) AS tfidf
  FROM tf JOIN dfw USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, tf, df, tfidf, rank FROM ranked WHERE rank <= 3
ORDER BY doc_id, rank
"""


@query("text_tfidf_topk", _TFIDF_ORACLE)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms: tf and df by map-side-combinable
    aggregation, smoothed idf against a 1-row broadcast document count,
    windowed top-k ordered by the 6-decimal-rounded score."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.tfidf_top_terms(docs, k=3).orderBy("doc_id", "rank")


# ---------------------------------------------------------------------------
# Data profiling
# ---------------------------------------------------------------------------

@query(
    "profile_price_histogram",
    """
    WITH binned AS (
      SELECT CAST(greatest(0, least(floor((l_extendedprice - 0.0) / 3000.0), 19)) AS INTEGER) AS bin
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    )
    SELECT bin, 0.0 + bin * 3000.0 AS bin_lo, 0.0 + (bin + 1) * 3000.0 AS bin_hi,
           count(*) AS n
    FROM binned GROUP BY bin ORDER BY bin
    """,
)
def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width 20-bin histogram of lineitem extended price — one
    map-side-combinable aggregation, bin math bit-identical across engines."""
    from .operators import profiling

    l = load_table(spark, sf_dir, "lineitem")
    return profiling.numeric_histogram(l, "l_extendedprice", 0.0, 60000.0, 20).orderBy("bin")


@query(
    "profile_lineitem_columns",
    """
    WITH wide AS (
      SELECT count(l_quantity) AS q_count,
             sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS q_nulls,
             count(DISTINCT l_quantity) AS q_ndv,
             CAST(min(l_quantity) AS DOUBLE) AS q_min, CAST(max(l_quantity) AS DOUBLE) AS q_max,
             count(l_discount) AS d_count,
             sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS d_nulls,
             count(DISTINCT l_discount) AS d_ndv,
             CAST(min(l_discount) AS DOUBLE) AS d_min, CAST(max(l_discount) AS DOUBLE) AS d_max,
             count(l_tax) AS t_count,
             sum(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) AS t_nulls,
             count(DISTINCT l_tax) AS t_ndv,
             CAST(min(l_tax) AS DOUBLE) AS t_min, CAST(max(l_tax) AS DOUBLE) AS t_max
      FROM lineitem
    )
    SELECT 'l_quantity' AS "column", q_count AS n_rows, CAST(q_nulls AS BIGINT) AS n_nulls,
           q_ndv AS n_distinct, q_min AS min_value, q_max AS max_value FROM wide
    UNION ALL
    SELECT 'l_discount', d_count, CAST(d_nulls AS BIGINT), d_ndv, d_min, d_max FROM wide
    UNION ALL
    SELECT 'l_tax', t_count, CAST(t_nulls AS BIGINT), t_ndv, t_min, t_max FROM wide
    ORDER BY "column"
    """,
)
def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan multi-column profile (count / nulls / exact NDV / min /
    max) unpivoted to one row per column."""
    from .operators import profiling

    l = load_table(spark, sf_dir, "lineitem")
    return profiling.column_profile(l, ["l_quantity", "l_discount", "l_tax"]).orderBy("column")


_GROUPED_SPLIT_ORACLE = """
WITH assigned AS (
  SELECT source,
         CASE
           WHEN CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT)
                < CAST(0.8 * 4294967296 AS BIGINT) THEN 'train'
           WHEN CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT)
                < CAST(0.9 * 4294967296 AS BIGINT) THEN 'val'
           ELSE 'test'
         END AS split
  FROM documents
)
SELECT source, split, COUNT(*) AS n_docs
FROM assigned GROUP BY source, split ORDER BY source, split
"""


@query("split_grouped_by_source", _GROUPED_SPLIT_ORACLE)
def q_grouped_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-proof split: the GROUP key (source) is hashed, so every
    document of a source lands in one split — near-dups and same-domain
    documents never straddle train/eval. Still a narrow map."""
    from .operators.sampling import grouped_split

    docs = load_table(spark, sf_dir, "documents")
    return (
        grouped_split(docs, "source")
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source", "split")
    )


_MIXTURE_ORACLE = """
WITH kept AS (
  SELECT source FROM documents
  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        < CASE source
            WHEN 'src0' THEN CAST(1.0 * 4294967296 AS BIGINT)
            WHEN 'src1' THEN CAST(0.5 * 4294967296 AS BIGINT)
            WHEN 'src2' THEN CAST(0.25 * 4294967296 AS BIGINT)
            ELSE CAST(0.1 * 4294967296 AS BIGINT)
          END
)
SELECT source, COUNT(*) AS n_kept FROM kept GROUP BY source ORDER BY source
"""


@query("sample_source_mixture", _MIXTURE_ORACLE)
def q_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-mixture sampling: per-source keep rates (curated sources up,
    crawl down) via id-hash thresholds compiled to one CASE expression —
    deterministic, growth-stable, zero shuffles before the count."""
    from .operators.sampling import mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    kept = mixture_sample(
        docs, {"src0": 1.0, "src1": 0.5, "src2": 0.25}, default_rate=0.1
    )
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept")).orderBy("source")


_RESAMPLE_ORACLE = """
WITH spine AS (
  SELECT u.user_id, g.bucket_ts
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN (
    SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                  TIMESTAMP '2024-01-01 02:00:00',
                                  INTERVAL 5 MINUTE)) AS bucket_ts
  ) g
),
in_window AS (
  SELECT user_id, ts, value,
         make_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) * 1000000) AS bucket_ts
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts <= TIMESTAMP '2024-01-01 02:00:00'
),
ranked AS (
  SELECT user_id, bucket_ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, bucket_ts
                            ORDER BY ts DESC, value DESC) AS rn
  FROM in_window
),
lastobs AS (SELECT user_id, bucket_ts, value FROM ranked WHERE rn = 1),
joined AS (
  SELECT s.user_id, s.bucket_ts, o.value AS obs
  FROM spine s LEFT JOIN lastobs o
    ON s.user_id = o.user_id AND s.bucket_ts = o.bucket_ts
)
SELECT user_id, bucket_ts,
       last_value(obs IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY bucket_ts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       obs IS NOT NULL AS observed
FROM joined ORDER BY user_id, bucket_ts
"""


@query("ts_resample_locf", _RESAMPLE_ORACLE)
def q_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling resample: per-user 5-minute grid over a 2-hour window,
    bucket last-observation + carried-forward values (hypertable rollup
    primitive — generated spine, key-partitioned shuffles only)."""
    ev = load_table(spark, sf_dir, "events")
    return timeseries.resample_locf(
        ev,
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        step_seconds=300,
        start_ts="2024-01-01 00:00:00",
        end_ts="2024-01-01 02:00:00",
    ).orderBy("user_id", "bucket_ts")


_CHUNK_ORACLE = r"""
WITH words AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents
),
chunks AS (
  SELECT doc_id, w,
         greatest(1, CAST(ceil((len(w) - 16) * 1.0 / 48) AS INTEGER)) AS n_chunks
  FROM words
),
e AS (
  SELECT doc_id, w, unnest(range(n_chunks)) AS chunk_id FROM chunks
)
SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
       array_to_string(w[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ') AS chunk_text,
       least(64, len(w) - chunk_id * 48) AS n_tokens
FROM e ORDER BY doc_id, chunk_id
"""


@query("text_chunking", _CHUNK_ORACLE)
def q_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: 64-token windows, 16-token overlap — pure
    codegen posexplode + slice, no UDF, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return text.chunk_documents(docs, chunk_tokens=64, overlap=16).orderBy(
        "doc_id", "chunk_id"
    )


_PACKING_ORACLE = r"""
WITH words AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents
),
chunks AS (
  SELECT doc_id, w,
         greatest(1, CAST(ceil((len(w) - 16) * 1.0 / 48) AS INTEGER)) AS n_chunks
  FROM words
),
e AS (
  SELECT doc_id, CAST(unnest(range(n_chunks)) AS INTEGER) AS chunk_id,
         least(64, len(w) - unnest(range(n_chunks)) * 48) AS n_tokens
  FROM chunks
),
b AS (
  SELECT doc_id, chunk_id, n_tokens,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS bucket
  FROM e
),
c AS (
  SELECT *,
         SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id, chunk_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS cum_before
  FROM b
)
SELECT bucket, CAST(floor(cum_before / 256) AS INTEGER) AS seq_in_bucket,
       COUNT(*) AS n_chunks, CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens
FROM c GROUP BY bucket, seq_in_bucket ORDER BY bucket, seq_in_bucket
"""


@query("text_sequence_packing", _PACKING_ORACLE)
def q_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk → pack: 64/16 chunking feeding deterministic cumulative-fill
    packing into 256-token sequences over 8 hash buckets; per-sequence chunk
    and token counts."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = text.chunk_documents(docs, chunk_tokens=64, overlap=16)
    packed = text.pack_sequences(chunks, token_budget=256, n_buckets=8)
    return (
        packed.groupBy("bucket", "seq_in_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("seq_tokens"),
        )
        .orderBy("bucket", "seq_in_bucket")
    )


@query(
    "sample_stratified_exact",
    """
    WITH ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT),
                        doc_id
             ) AS rk
      FROM documents
    )
    SELECT doc_id, source FROM ranked WHERE rk <= 5 ORDER BY source, doc_id
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 5 docs per source, deterministically chosen by id-hash rank —
    the exact-count stratified sample a mixture-balanced training set needs.
    Same rows on any engine / partitioning / corpus growth order."""
    from .operators import sampling

    docs = load_table(spark, sf_dir, "documents")
    return (
        sampling.stratified_take(docs, "source", 5, id_col="doc_id")
        .select("doc_id", "source")
        .orderBy("source", "doc_id")
    )


@query(
    "embedding_centroid_norms",
    """
    WITH comps AS (
      SELECT label, generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS x
      FROM embeddings
    ),
    sums AS (
      SELECT label, pos,
             CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(30,12))) AS DOUBLE) AS s
      FROM comps GROUP BY label, pos
    ),
    norms AS (
      SELECT label, SUM(CAST(s * s AS DECIMAL(30,12))) AS sum_sq
      FROM sums GROUP BY label
    )
    SELECT n.label,
           cnt.n_vecs,
           CAST(CAST(sqrt(CAST(n.sum_sq AS DOUBLE)) / cnt.n_vecs AS DECIMAL(25,8)) AS DOUBLE) AS centroid_norm
    FROM norms n
    JOIN (SELECT label, COUNT(*) AS n_vecs FROM embeddings GROUP BY label) cnt
      ON n.label = cnt.label
    ORDER BY n.label
    """,
)
def q_embedding_centroid_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid L2 norm — a cluster-coherence diagnostic (unit
    vectors pointing the same way give ||centroid|| near 1; random directions
    near 0). Componentwise sums are decimal-quantized so the reduction is
    order-insensitive and oracle-exact; the heavy step (posexplode -> partial
    agg on (label, pos)) shuffles one row per (label, dim), independent of
    corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    comps = emb.select("label", F.posexplode("embedding").alias("pos", "x"))
    sums = comps.groupBy("label", "pos").agg(
        F.sum(F.col("x").cast("double").cast("decimal(30,12)")).cast("double").alias("s")
    )
    norms = sums.groupBy("label").agg(
        F.sum((F.col("s") * F.col("s")).cast("decimal(30,12)")).alias("sum_sq")
    )
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    return (
        norms.join(counts, "label")
        .select(
            "label",
            "n_vecs",
            (F.sqrt(F.col("sum_sq").cast("double")) / F.col("n_vecs"))
            .cast("decimal(25,8)")
            .cast("double")
            .alias("centroid_norm"),
        )
        .orderBy("label")
    )


@query(
    "text_normalize",
    text.NORMALIZE_ORACLE_SQL_TEMPLATE.format(
        table="documents", id_col="doc_id", text_col="text"
    ),
)
def q_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical normalization (lowercase, punctuation strip, whitespace
    collapse) with md5 fingerprint + token count — the preprocessing front
    door of every dedup/fingerprint pipeline, oracle-checked byte-for-byte."""
    docs = load_table(spark, sf_dir, "documents")
    return text.normalize_text(docs).orderBy("doc_id")


@query(
    "text_pii_redact",
    """
    WITH seeded AS (
      SELECT doc_id,
             text || ' reach user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.7, tel +1 555 123 4567.' AS text_pii
      FROM documents
    )
    """
    + text.PII_ORACLE_SQL_TEMPLATE.format(
        table="seeded", id_col="doc_id", text_col="text_pii"
    ),
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass: emails / IPv4 / phone shapes → typed placeholders,
    pure regexp codegen (no UDF). The synthetic corpus carries no real PII,
    so the query seeds each document with a deterministic email+IP+phone
    suffix — the oracle reproduces the seeding and the redaction
    byte-for-byte, proving each pattern actually fires."""
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7, tel +1 555 123 4567."),
        ).alias("text_pii"),
    )
    return (
        text.pii_redact(seeded, text_col="text_pii")
        .select("doc_id", "text_redacted")
        .orderBy("doc_id")
    )


@query(
    "corpus_dup_rate_by_source",
    """
    WITH freq AS (
      SELECT md5(text) AS h, COUNT(*) AS c FROM documents GROUP BY md5(text)
    )
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE c > 1) AS n_dup_docs,
           CAST(COUNT(*) FILTER (WHERE c > 1) AS DOUBLE) / COUNT(*) AS dup_rate
    FROM (SELECT source, md5(text) AS h FROM documents) d
    JOIN freq USING (h)
    GROUP BY source ORDER BY source
    """,
)
def q_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate exposure: which ingestion sources are
    feeding the corpus copies. Corpus-wide text frequency is computed on
    md5 hashes (the shuffle carries 32-byte keys, never document bodies —
    the same scale rule as exact_dedup), then joined back and aggregated
    per source. The dup definition is corpus-wide (a doc duplicated across
    two sources counts in both), which is what source-quality triage
    needs."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.md5(F.col("text").cast("binary")).alias("h")
    )
    freq = docs.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    return (
        docs.join(freq, "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("c") > 1, 1)).alias("n_dup_docs"),
        )
        .select(
            "source",
            "n_docs",
            "n_dup_docs",
            (F.col("n_dup_docs").cast("double") / F.col("n_docs")).alias("dup_rate"),
        )
        .orderBy("source")
    )


@query(
    "embedding_quantize_int8",
    """
    WITH vecs AS (
      SELECT label, embedding,
             list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS m
      FROM embeddings
    ),
    comps AS (
      SELECT label, m, CAST(unnest(embedding) AS DOUBLE) AS x FROM vecs WHERE m > 0
    ),
    errs AS (
      SELECT label,
             abs(x - GREATEST(-127, LEAST(127, FLOOR(x / m * 127 + 0.5)))
                     * (m / CAST(127 AS DOUBLE))) AS e
      FROM comps
    )
    SELECT label,
           COUNT(*) AS n_comps,
           CAST(SUM(CAST(FLOOR(e * 1e15) AS BIGINT)) AS DOUBLE) / 1e15 / COUNT(*)
             AS mean_abs_err,
           MAX(e) AS max_abs_err
    FROM errs GROUP BY label ORDER BY label
    """,
)
def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (max-abs scale, the standard
    embedding-compression scheme) with per-label reconstruction error — the
    go/no-go metric before swapping a float index for an int8 one. Every
    step is elementwise codegen over the exploded components (no UDF, no
    extra shuffle beyond the final label agg); rounding is floor(x+0.5),
    which is bit-deterministic on both engines, and the error sum
    accumulates floor-scaled integers (floor has no rounding ties, unlike
    decimal HALF_UP-vs-HALF_EVEN casts) so the label reduction is
    order-insensitive and engine-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "label",
        "embedding",
        F.array_max(
            F.transform("embedding", lambda v: F.abs(v.cast("double")))
        ).alias("m"),
    ).filter(F.col("m") > 0)
    comps = vecs.select(
        "label", "m", F.explode("embedding").alias("xf")
    ).select("label", "m", F.col("xf").cast("double").alias("x"))
    x, m = F.col("x"), F.col("m")
    q = F.greatest(
        F.lit(-127.0), F.least(F.lit(127.0), F.floor(x / m * 127 + 0.5))
    )
    e = F.abs(x - q * (m / F.lit(127.0)))
    return (
        comps.select("label", e.alias("e"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_comps"),
            (
                F.sum(F.floor(F.col("e") * F.lit(1e15))).cast("double")
                / F.lit(1e15)
                / F.count(F.lit(1))
            ).alias("mean_abs_err"),
            F.max("e").alias("max_abs_err"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Round-3 additions: corpus vocabulary health, metadata QA, token-budget
# mixture, dedup keep-list
# ---------------------------------------------------------------------------

@query(
    "corpus_vocab_stats",
    r"""
    WITH words AS (
      SELECT source,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                    w -> w <> '')) AS w
      FROM documents
    ),
    freq AS (SELECT source, w, count(*) AS cnt FROM words GROUP BY source, w)
    SELECT source,
           CAST(SUM(cnt) AS BIGINT) AS total_tokens,
           count(*) AS distinct_tokens,
           CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hapax_tokens,
           round(CAST(count(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6)
             AS type_token_ratio
    FROM freq GROUP BY source ORDER BY source
    """,
)
def q_corpus_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return corpus.vocab_stats(docs)


@query("text_lang_mismatch", text.lang_mismatch_oracle_sql())
def q_text_lang_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.lang_mismatch(docs)


@query(
    "sample_token_budget",
    """
    WITH toks AS (
      SELECT doc_id, source,
             CAST(ceil(length(text) / 4.0) AS BIGINT) AS doc_tokens
      FROM documents
    ),
    cum AS (
      SELECT doc_id, source, doc_tokens,
             CAST(SUM(doc_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS cum_tokens
      FROM toks
    )
    SELECT * FROM cum WHERE cum_tokens <= 3000 ORDER BY source, doc_id
    """,
)
def q_sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import sampling

    docs = load_table(spark, sf_dir, "documents")
    return sampling.token_budget_sample(docs, budget_tokens=3000)


_KEEPLIST_ORACLE = (
    "WITH RECURSIVE "
    + _TRIGRAM_SH_CTE
    + r""",
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b FROM common
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.8
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach(node, lab) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t(u)
  UNION
  SELECT e.u, r.lab FROM edges e JOIN reach r ON e.v = r.node
),
dropped AS (
  SELECT node FROM (
    SELECT node, MIN(lab) AS cluster_id FROM reach GROUP BY node
  ) WHERE node <> cluster_id
)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT node FROM dropped)
ORDER BY doc_id
"""
)


@query("dedup_keeplist", _KEEPLIST_ORACLE)
def q_dedup_keeplist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end product of the dedup pipeline: the document ids that SURVIVE
    near-duplicate removal — each dup cluster keeps its canonical member
    (min doc_id), everything unclustered passes through. Pairs from the
    prefix-filtered Jaccard join, clusters from min-label propagation, and
    one size-adaptive (unhinted — losers scales with duplicates, i.e. with
    the corpus) anti join to subtract the losers; the oracle recomputes
    the whole chain (recursive CTE reachability) exactly."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.8, n=3)
    comp = clustering.connected_components(pairs)
    losers = comp.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    return docs.select("doc_id").join(
        losers, "doc_id", "left_anti"
    ).orderBy("doc_id")


@query("corpus_bpe_pairs", corpus.bpe_pair_counts_oracle_sql())
def q_corpus_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed inner loop of BPE tokenizer training: exact
    corpus-wide counts of adjacent character pairs within words, top-50
    with lexicographic tie-break — the winning pair IS the next merge, so
    determinism across engines/cluster sizes is the contract. Character
    adjacency, not word adjacency (corpus_pmi_bigrams / corpus_top_ngrams
    cover words)."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.bpe_pair_counts(docs, top_k=50)


@query("corpus_bpe_train", corpus.bpe_train_oracle_sql(n_merges=8))
def q_corpus_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL BPE tokenizer training (Sennrich) certified end to end: 8
    learned merges, each round a vocabulary-frame pair census + a
    boundary-safe wrapped-symbol replace; the oracle re-runs the entire
    iterative loop as 8 chained census->winner->replace CTE layers, so a
    wrong winner, tie-break divergence, or a merge applied across a
    symbol/word boundary at ANY round cascades into a hash mismatch."""
    docs = load_table(spark, sf_dir, "documents")
    merges = corpus.bpe_train(docs, n_merges=8)
    return spark.createDataFrame(
        [(i + 1, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "step int, left string, right string, cnt long",
    ).orderBy("step")


@query("corpus_bpe_encode", corpus.bpe_encode_oracle_sql(n_merges=8))
def q_corpus_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-encode certified end to end: the 8 learned merges applied
    to every document in rank order (sequential full application — the
    exact segmentation training produced), emitting per-doc token count +
    the space-joined token sequence. Pure codegen replace chain, zero
    shuffles on the encode side; the oracle recomputes training AND
    encoding, so train/encode disagreement is itself a certified failure
    mode."""
    docs = load_table(spark, sf_dir, "documents")
    merges = corpus.bpe_train(docs, n_merges=8)
    return corpus.bpe_encode(docs, merges).orderBy("doc_id")


@query(
    "corpus_bpe_encode_arrow",
    corpus.bpe_encode_oracle_sql(n_merges=8),
    # promoted to the timed bench in round 12 (VERDICT r11 #3): the biggest
    # Arrow-UDF surface in the catalog, never driver-wall-clocked before
    headline=True,
)
def q_corpus_bpe_encode_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION encode path — the Arrow-batched rank-priority kernel
    (`method="arrow"`, the one a real 32k-100k merge list runs, where a
    codegen replace chain cannot compile) — under the same exact oracle as
    the codegen row: on a TRAINED merge list rank-priority merging equals
    sequential rank-order application (see `bpe_encode`'s precondition),
    and this list is trained by construction, so the mapInPandas kernel
    must hash-match the chained-CTE train-then-encode oracle token for
    token. Closes the round-6 gap where the arrow kernel was only
    fuzz-pinned locally (VERDICT r6 item #4, upgraded from the suggested
    rows-only row to a full exact-hash row)."""
    docs = load_table(spark, sf_dir, "documents")
    merges = corpus.bpe_train(docs, n_merges=8)
    return corpus.bpe_encode(docs, merges, method="arrow").orderBy("doc_id")


_KEEPLIST_LONGEST_ORACLE = (
    "WITH RECURSIVE "
    + _TRIGRAM_SH_CTE
    + r""",
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b FROM common
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.8
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach(node, lab) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t(u)
  UNION
  SELECT e.u, r.lab FROM edges e JOIN reach r ON e.v = r.node
),
comp AS (SELECT node, MIN(lab) AS cluster_id FROM reach GROUP BY node),
scored AS (
  SELECT c.node, c.cluster_id, length(d.text) AS s
  FROM comp c JOIN documents d ON d.doc_id = c.node
),
winners AS (
  SELECT node FROM (
    SELECT node, ROW_NUMBER() OVER (
      PARTITION BY cluster_id ORDER BY s DESC, node ASC
    ) AS rn FROM scored
  ) WHERE rn = 1
),
dropped AS (
  SELECT node FROM scored WHERE node NOT IN (SELECT node FROM winners)
)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT node FROM dropped)
ORDER BY doc_id
"""
)


@query("dedup_keeplist_longest", _KEEPLIST_LONGEST_ORACLE)
def q_dedup_keeplist_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep-BEST dedup policy: each near-dup cluster keeps its longest
    member (ties to the smallest id) instead of the minimum id — min-id
    keeps whichever shard arrived first, score-keep preserves the most
    complete copy. Same pair graph and clustering as dedup_keeplist; the
    per-cluster argmax runs as one max(struct) aggregate, not a corpus
    window. The oracle recomputes reachability plus the argmax exactly."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.8, n=3)
    return dedup.keeplist_by_score(
        docs, pairs, score=F.length("text")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Round-3 (late) additions: heuristic quality rules, boilerplate detection,
# semantic dedup keep-list. Registered AFTER the certification window —
# catalog._ROTATION pins the driver's 50 slots.
# ---------------------------------------------------------------------------

@query(
    "text_gopher_rules",
    text.gopher_rules_oracle_sql(),
    # promoted to the timed bench in round 12 (VERDICT r11 #3): the text.*
    # family's full-corpus per-doc expression trees were never driver-timed
    headline=True,
)
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style heuristic quality gate (word-count window, mean word
    length, alphabetic-word fraction, stopword hits) — the standard
    pre-model filter pass of a web-scale curation pipeline. Pure codegen,
    one narrow map."""
    docs = load_table(spark, sf_dir, "documents")
    return text.gopher_rules(docs).orderBy("doc_id")


@query("text_boilerplate_ratio", text.boilerplate_ratio_oracle_sql())
def q_boilerplate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of each doc's distinct 3-gram shingles that are corpus-hot
    (df > 50) — CCNet's duplicated-line filter lifted to shingles. The
    oracle recomputes the ratios from shingle STRINGS (hash-agnostic
    metric), pinning the hash-based Spark plan to exact values."""
    docs = load_table(spark, sf_dir, "documents")
    return text.boilerplate_ratio(docs, n=3, max_doc_freq=50).orderBy("doc_id")


_LINE_DEDUP_ORACLE = """
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    multiline AS (
      SELECT doc_id,
             array_to_string(
               list_transform(range(0, CAST(ceil(len(ws)/3.0) AS INT)),
                              i -> array_to_string(ws[i*3+1 : i*3+3], ' ')),
               chr(10)) AS text
      FROM docs
    ),
    lines AS (
      SELECT doc_id, u.s.pos AS pos, u.s.line AS line
      FROM multiline,
           UNNEST(list_transform(string_split(text, chr(10)),
                                 (x, i) -> {'pos': i, 'line': x})) AS u(s)
    ),
    hot AS (
      SELECT lower(trim(line)) AS line_key FROM lines
      WHERE lower(trim(line)) <> ''
      GROUP BY 1 HAVING COUNT(*) >= 2
    ),
    kept AS (
      SELECT doc_id, pos, line FROM lines
      WHERE lower(trim(line)) = ''
         OR lower(trim(line)) NOT IN (SELECT line_key FROM hot)
    ),
    kept_agg AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_dedup,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT m.doc_id,
           COALESCE(k.text_dedup, '') AS text_dedup,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_lines_kept,
           CAST(len(string_split(m.text, chr(10))) - COALESCE(k.n_kept, 0)
                AS BIGINT) AS n_lines_removed
    FROM multiline m LEFT JOIN kept_agg k USING (doc_id)
    ORDER BY doc_id
    """


@query("text_line_dedup", _LINE_DEDUP_ORACLE)
def q_text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-wide line dedup, certified end to end. The
    synthetic corpus has no newlines, so the query first manufactures a
    deterministic multi-line corpus (3-word chunks joined by newlines —
    1400+ corpus-hot lines at sf0.01), then removes every line whose
    normalized form repeats corpus-wide and reassembles each document in
    original line order. The oracle reproduces chunking, hot-line census,
    removal, and reassembly, so a lost line, broken ordering, or an
    off-by-one in the hot threshold all hash-mismatch."""
    from .caching import persist_tracked

    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(ws) / F.lit(3.0)).cast("int")
    # persisted: line_dedup consumes its input three times (census,
    # anti-join, line count) — without this the chunking transform and the
    # parquet scan would run three times per execution
    multiline = persist_tracked(
        docs.select(
            "doc_id",
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.array_join(F.slice(ws, i * 3 + 1, 3), " "),
                ),
                "\n",
            ).alias("text"),
        )
    )
    return text.line_dedup(multiline, min_count=2).orderBy("doc_id")


@query("dedup_semantic_keeplist", dedup.semantic_keeplist_oracle_sql())
def q_semantic_keeplist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style survivors over the embedding table: cosine ≥ 0.4
    pairs (banded sign-LSH + exact verify) → connected components → keep
    min id per cluster. Oracle: exact pair graph + recursive reachability."""
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.semantic_keeplist(emb, threshold=0.4).orderBy("vec_id")


@query("dedup_semantic_collapsed", dedup.semantic_keeplist_oracle_sql())
def q_semantic_keeplist_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The degeneracy-safe SemDeDup path (round 9): exact-duplicate vectors
    collapse to their min-id keeper BEFORE pair enumeration, so a 10⁷-copy
    boilerplate cluster costs one shuffle group instead of Θ(c²) pairs —
    and the result is provably identical to `dedup_semantic_keeplist`
    (identical vectors are cliques whose only possible survivor is the
    keeper; the keeper graph is the exact quotient of the full pair graph).
    Certified against the SAME recursive-CTE oracle as the uncollapsed row:
    equality is the contract, hashed by the driver."""
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.semantic_keeplist_collapsed(emb, threshold=0.4).orderBy("vec_id")


@query("similarity_pq_topk", None)
def q_similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization top-k (Jégou et al. ADC): 16 subspaces x 16
    trained codewords (16 bytes/vector — 16x fewer candidate-scan bytes
    than float32), query-side ADC tables in codegen, exact float rerank.
    ``oversample`` is AUTO-SCALED from the corpus row count (r7: the fixed
    oversample=8 default decayed recall 0.94 → 0.74 from sf0.01 → sf0.1 as
    the pool saturated; the pool-fraction rule holds ≥ 0.94 at both SFs,
    floors pinned at BOTH scales in tests/test_recall.py). Rows-only
    (k-means trained codebooks are data-dependent); the deterministic
    machinery is certified exactly by similarity_pq_codes +
    similarity_pq_exact. Codebooks come from the per-session training
    cache — one training pass serves the whole PQ family in a window."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.pq_topk(
        emb,
        emb.filter(F.col("vec_id") < 5),
        k=10,
        books=_cached_pq_books(spark, sf_dir),
        n_rows=_cached_n_rows(spark, sf_dir, "embeddings"),
    )


@query("similarity_pq_exact", _BRUTE_FORCE_TOPK_ORACLE)
def q_similarity_pq_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-oracle companion to the rows-only ``similarity_pq_topk``: at
    an exhaustive oversample the ADC screen keeps every candidate, so the
    output — codebook train, encode, ADC scoring plumbing, exact rerank —
    must equal brute force row for row, cosine for cosine. An encode or
    table-lookup bug that silently dropped candidates flips this row red;
    recall at the production oversample stays pinned in
    tests/test_recall.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.pq_topk(
        emb,
        emb.filter(F.col("vec_id") < 5),
        k=10,
        oversample=1_000_000,
        books=_cached_pq_books(spark, sf_dir),
    )


@query("similarity_ivfpq_topk", None)
def q_similarity_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (the FAISS IVFPQ composition): IVF lists prune WHICH vectors
    are scanned (bucketed equi-join on list_id, n·n_probe/n_list rows), PQ
    codes compress the cost of each scanned vector (m table lookups),
    exact rerank on top. All three knobs AUTO-SCALED from the corpus row
    count (r7: fixed (n_list=8, oversample=8) decayed recall 0.88 → 0.74
    from sf0.01 → sf0.1 — the rerank pool saturated; the auto rule holds
    the probe RATIO and scales the pool, floors pinned at BOTH scales in
    tests/test_recall.py). Rows-only (both tiers train k-means); the
    composed plumbing is certified exactly by similarity_ivfpq_exact (raw
    books) and similarity_ivfpq_residual (residual books). Round 10: this
    row takes the FULL default path — internally trained IVFADC residual
    books, the encoding the two-size ladder proved scale-stable — so the
    rows-only signal tracks exactly what a default-knob caller gets."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_pq_topk(
        emb,
        emb.filter(F.col("vec_id") < 5),
        k=10,
        n_rows=_cached_n_rows(spark, sf_dir, "embeddings"),
    )


@query("similarity_ivfpq_exact", _BRUTE_FORCE_TOPK_ORACLE)
def q_similarity_ivfpq_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-oracle companion to ``similarity_ivfpq_topk``: probing every
    list AND keeping every ADC candidate makes both tiers exhaustive, so
    centroid train + list assignment + PQ encode + ADC scoring + exact
    rerank must equal brute force row for row against the shared oracle —
    a dropped list, a code off-by-one, or a lookup-offset bug flips this
    row red. n_list/n_probe pinned explicitly (not auto) so exhaustiveness
    is a property of the query, not of the corpus size it runs at."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_pq_topk(
        emb,
        emb.filter(F.col("vec_id") < 5),
        k=10,
        n_list=8,
        n_probe=8,
        oversample=1_000_000,
        books=_cached_pq_books(spark, sf_dir),
    )


@query("similarity_ivfpq_residual", _BRUTE_FORCE_TOPK_ORACLE)
def q_similarity_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-oracle certification of the IVFADC RESIDUAL path (round 9):
    residual-trained codebooks, residual encode, and the two-term
    q·cent[l] + ADC(q, residual) score, driven exhaustively (every list
    probed, every candidate kept) so the exact rerank must equal brute
    force row for row against the shared oracle. A sign flip in the
    residual subtraction, a centroid-frame join mismatch, or a missing
    q·cent term reorders the candidate pool and flips this row red. The
    growth motivation (probe-ratio-0.125 recall 0.70 raw → ≥0.9 residual
    at n=20k) is pinned in tests/test_clustered_recall.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_pq_topk(
        emb,
        emb.filter(F.col("vec_id") < 5),
        k=10,
        n_list=8,
        n_probe=8,
        oversample=1_000_000,
        residual=True,
    )


@query("similarity_pq_codes", similarity.pq_codes_oracle_sql())
def q_similarity_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-oracle certification of the PQ encode path: every vector's 16
    subspace codewords against md5-derived (engine-reproducible) codebooks,
    hash-matched against DuckDB evaluating the identical centroid literals
    in the identical addition order with the identical 1e-9 distance
    quantization and first-index tie-break. A subspace-slice off-by-one or
    argmin divergence — the bugs that silently degrade PQ recall without
    failing a rows-only check — is a hard mismatch here."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = similarity.pq_random_codebooks(16, 4, 16)
    return similarity.pq_codes(emb, books).orderBy("vec_id")


# Exact-substring dedup (Lee et al. ExactSubstr): the oracle recomputes the
# window census from gram STRINGS (hash-agnostic), pinning the xxhash64-keyed
# Spark plan to exact values — same pattern as the shingle-hash operators.
_SUBSTRING_DEDUP_ORACLE = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(COALESCE(text, ''), '\\s+'),
                         w -> w <> '') AS t
      FROM documents
    ),
    pos AS (
      SELECT doc_id, r.i AS p,
             array_to_string(t[r.i + 1 : r.i + 10], ' ') AS g
      FROM toks, UNNEST(range(0, greatest(len(t) - 9, 0))) AS r(i)
    ),
    hot AS (
      SELECT g FROM pos GROUP BY g HAVING COUNT(*) >= 2
    ),
    dup AS (
      SELECT doc_id, p FROM pos WHERE g IN (SELECT g FROM hot)
    ),
    tok_rows AS (
      SELECT doc_id, r.i AS j, t[r.i + 1] AS tok
      FROM toks, UNNEST(range(0, len(t))) AS r(i)
    ),
    kept AS (
      SELECT k.doc_id, k.j, k.tok FROM tok_rows k
      WHERE NOT EXISTS (
        SELECT 1 FROM dup d
        WHERE d.doc_id = k.doc_id AND d.p <= k.j AND k.j < d.p + 10
      )
    ),
    kept_agg AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY j) AS text_dedup,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           COALESCE(k.text_dedup, '') AS text_dedup,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_tokens_kept,
           CAST(len(t.t) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_tokens_removed
    FROM toks t LEFT JOIN kept_agg k USING (doc_id)
    ORDER BY doc_id
    """


@query("text_substring_dedup", _SUBSTRING_DEDUP_ORACLE)
def q_text_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup (Lee et al. ExactSubstr) certified end to end:
    every span covered by a 10-token window occurring >= 2 times
    corpus-wide is removed from every document (first occurrences and
    within-doc self-repeats included), remainder reassembled in token
    order. The synthetic corpus carries real duplicated spans (969 hot
    10-grams across 47 docs at sf0.01), so census, interval merge, and
    splice are all exercised; a missed window, broken merge, or off-by-one
    in the cover test hash-mismatches."""
    docs = load_table(spark, sf_dir, "documents")
    return text.substring_dedup(docs, min_count=2, window=10).orderBy("doc_id")


@query("dedup_semantic_clustered", dedup.semantic_keeplist_oracle_sql())
def q_semantic_keeplist_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-first SemDeDup — the recipe that survives 100 TB where the
    corpus-wide exact path cannot run: k-means partition the corpus
    (`similarity.train_ivf_centroids`), enumerate exact cosine pairs only
    within clusters (`clustered_exact_pairs`), min-label components, min-id
    keeplist. Certified at ``n_probe = n_list``, where multi-probing is
    exhaustive and the pair set — hence the keeplist — provably equals the
    exact path, so the same recursive-CTE oracle hash-matches; the
    realistic-probe recall contract (n_list=8, n_probe=3 — the default)
    is pinned in tests/test_recall.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.semantic_keeplist(
        emb, threshold=0.4, method="clustered", n_list=4, n_probe=4
    ).orderBy("vec_id")


@query("corpus_unigram_lm", corpus.unigram_lm_oracle_sql())
def q_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scores: mean token log-probability under a
    unigram LM trained on the corpus itself (CCNet-style cheap filter).
    Oracle recomputes the model and scores with the same DECIMAL-quantized
    term sums, so values match exactly at 6 decimals."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.unigram_lm_scores(docs).orderBy("doc_id")


@query("events_rolling_zscore", profiling.rolling_zscore_oracle_sql())
def q_events_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-feed QA: per-event-type rolling z-score anomaly flags over
    a 100-row trailing window — DECIMAL-exact window sums make the moments
    engine-invariant; one key shuffle, single ordered pass, pure codegen.
    Oracle recomputes the identical windows in DuckDB."""
    ev = load_table(spark, sf_dir, "events")
    return profiling.rolling_zscore(ev).orderBy("event_type", "ts", "event_id")


@query(
    "corpus_dsir_importance",
    corpus.dsir_importance_oracle_sql(target_pred="source IN ('src0', 'src1')"),
)
def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style domain-importance weights: mean log-likelihood ratio of
    each raw document under a target-domain unigram LM vs the raw-corpus
    LM (add-one smoothed over the joint vocabulary) — the public
    importance-resampling recipe for domain-matched pretraining data.
    Oracle recomputes both LMs with the same DECIMAL-quantized term sums."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.dsir_importance(
        docs, F.col("source").isin("src0", "src1")
    ).orderBy("doc_id")


from .operators import sampling as _sampling
from .operators import similarity as _similarity


@query("sample_global_shuffle", _sampling.global_shuffle_oracle_sql(num_shards=8))
def q_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training export:
    md5-bucketed shard, within-shard rank by the full hash. Oracle computes
    the identical hash order, so the permutation is engine-exact."""
    docs = load_table(spark, sf_dir, "documents")
    return _sampling.global_shuffle_shards(docs, num_shards=8).orderBy("shard", "pos")


@query(
    "embedding_random_projection",
    _similarity.random_projection_oracle_sql(in_dim=64, out_dim=16),
)
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random projection 64 -> 16 dims with a deterministic ±1 literal
    matrix — shuffle-free codegen narrow map; oracle evaluates the same
    multiply-add chains on the same literal coefficients."""
    emb = load_table(spark, sf_dir, "embeddings")
    return _similarity.random_projection(emb, in_dim=64, out_dim=16).orderBy("vec_id")


@query("corpus_pmi_bigrams", corpus.pmi_bigrams_oracle_sql(min_count=5, top_k=50))
def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-50 adjacent bigrams by PMI with a count
    floor of 5 — count-floor filter runs before the vocab joins, totals
    ride as 1-row broadcasts, top-k is TakeOrdered not a global sort.
    Oracle recomputes the same counts and fixed-order log expression."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.pmi_bigrams(docs, min_count=5, top_k=50)


@query("corpus_source_overlap", corpus.source_vocab_overlap_oracle_sql())
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources: distinct (source,
    word) pass, word-keyed self-join for intersections, broadcast size
    join — provenance QA before choosing mixture weights."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.source_vocab_overlap(docs)


@query("text_hash_classifier", text.hashed_classifier_oracle_sql())
def q_hash_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed linear classifier scores (fastText hashing-trick
    shape): md5-addressed token weights, exact BIGINT per-document sum,
    sign label — pure codegen, no vocabulary table, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    return text.hashed_classifier(docs).orderBy("doc_id")
