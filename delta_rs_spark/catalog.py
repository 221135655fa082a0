"""Full query catalog: importing this module registers both the relational
surface (queries.py) and the pipeline operators (pipeline_queries.py).

Registration order matters: the driver certifies the first 50 names returned
by ``queries()``. The window rotates per round so no surface's driver signal
goes stale: rounds 1-2 certified the 50 relational queries, round 3 rotated
in the LLM-pipeline surface, round 4 the queued + new concurrency/companion
rows, and round 5 rotates the relational surface back in alongside the new
IVF/incremental certifications. ``_ROTATION`` lists the current window
explicitly; everything else keeps its original registration order after it.
"""

from . import lifecycle_queries as _lifecycle_queries  # noqa: F401  (registers)
from . import pipeline_queries as _pipeline_queries  # noqa: F401  (registers)
from .queries import QUERIES, headline_queries, oracle_sql, queries

# Round-10 window (stalest-first, VERDICT r9 items #1-2): (1) the row BORN
# this round (the collapse_exact semantic-index lifecycle — born rows
# certify in their birth round) plus every row whose CODE PATH or ORACLE
# changed with the residual-default flip and the advice fixes:
# recall_contracts (two contracts renamed '...residual-default', both now
# measuring the no-books default path), similarity_ivfpq_topk (rows-only;
# now the pure default path), similarity_knn_graph (dropped the raw-book
# cache — also in the r7-stale block), dedup_semantic_collapsed (NULL-
# embedding pass-through fix), dedup_clusters (two-seed convergence
# fingerprint); (2) all 43 rows whose last driver-green round is 7 — the
# freshness gate forces them in the moment CORRECTNESS_r10 lands; (3) two
# r8 rows fronted a round early to free r11 slack: recall_clustered_
# contracts (the residual story's other half) and similarity_index_drift
# (its corrupt-marker guard changed this round). After this window nothing
# oracle-bearing is older than r8.
_ROTATION = [
    # -- (1) born round 10 / code-or-oracle changed round 10 ------------------
    "dedup_semantic_index_collapsed",
    "recall_contracts",
    "similarity_ivfpq_topk",
    "dedup_semantic_collapsed",
    "dedup_clusters",
    # -- (3) r8 rows fronted early (residual-family + changed guard) ----------
    "recall_clustered_contracts",
    "similarity_index_drift",
    # -- (2) last certified round 7 (43 rows; includes similarity_knn_graph,
    #        whose oracle path also changed this round) -----------------------
    "asof_join_events",
    "cdf_changes_window",
    "clone_lifecycle",
    "concurrent_lifecycle",
    "corpus_bpe_encode_arrow",
    "corpus_dsir_importance",
    "corpus_pmi_bigrams",
    "corpus_source_overlap",
    "corpus_unigram_lm",
    "corpus_vocab_stats",
    "dedup_embedding_cosine",
    "dedup_simhash",
    "embedding_centroid_norms",
    "embedding_quantize_int8",
    "embedding_random_projection",
    "events_rolling_zscore",
    "features_lifecycle",
    "multimodal_features",
    "pipeline_corpus_curation",
    "profile_price_histogram",
    "q_zorder_pruned_scan",
    "range_join_error_windows",
    "sample_global_shuffle",
    "sample_stratified_exact",
    "similarity_knn_graph",
    "similarity_lsh_buckets",
    "similarity_pq_index_lifecycle",
    "similarity_quantized_rerank",
    "similarity_topk",
    "skew_salted_count_distinct",
    "stream_dedup_events",
    "stream_delta_sink_pipeline",
    "stream_events_hourly",
    "stream_hourly_watermark",
    "stream_stream_join",
    "stream_user_totals",
    "text_boilerplate_ratio",
    "text_gopher_rules",
    "text_hash_classifier",
    "text_lang_id",
    "text_quality_score",
    "ts_resample_locf",
    "widening_uniform_lifecycle",
]


# the driver certifies exactly this many names off the front of queries()
WINDOW = 50


def _apply_rotation() -> None:
    # A typo or a renamed query in _ROTATION would silently shrink the
    # certification window and promote an arbitrary registration-order row
    # into it, defeating the rotation promise test_rotation_freshness.py
    # enforces — fail loudly at import instead (ADVICE r9). Real exceptions,
    # not asserts: `python -O` strips asserts, and a stripped guard is the
    # exact silent-shrink failure mode it exists to prevent (ADVICE r10).
    unknown = [n for n in _ROTATION if n not in QUERIES]
    if unknown:
        raise RuntimeError(
            f"_ROTATION names not registered in QUERIES: {unknown}"
        )
    if len(_ROTATION) != len(set(_ROTATION)):
        raise RuntimeError("_ROTATION has duplicates")
    if len(_ROTATION) != WINDOW:
        raise RuntimeError(
            f"_ROTATION must list exactly the {WINDOW}-row window,"
            f" got {len(_ROTATION)}"
        )
    ordered = list(_ROTATION)
    rest = [n for n in QUERIES if n not in set(ordered)]
    snapshot = dict(QUERIES)
    QUERIES.clear()
    for n in ordered + rest:
        QUERIES[n] = snapshot[n]


_apply_rotation()

__all__ = ["QUERIES", "queries", "oracle_sql", "headline_queries"]
