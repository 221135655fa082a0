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

# Round-7 window (stalest-first, VERDICT r6 item #3): (1) all 42 rows whose
# last driver-green round is 4 — now the stalest in the catalog, including
# the lifecycle/streaming rows that exercise the most protocol machinery;
# (2) the queries NEW or RE-PARAMETRIZED this round (the arrow BPE encoder's
# first driver row, the PQ-family rows re-certified under auto-scaled knobs
# + the extended recall_contracts — unregistered names are skipped by
# _apply_rotation until they land); (3) round-5 rows to fill the 50. After
# this window no query's last-green round is older than 5.
_ROTATION = [
    # -- (1) last certified round 4 (42 rows) ---------------------------------
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "similarity_topk",
    "embedding_centroid_norms",
    "embedding_quantize_int8",
    "text_lang_id",
    "text_quality_score",
    "multimodal_features",
    "asof_join_events",
    "range_join_error_windows",
    "ts_resample_locf",
    "skew_salted_count_distinct",
    "sample_stratified_exact",
    "profile_price_histogram",
    "pipeline_corpus_curation",
    "features_lifecycle",
    "cdf_changes_window",
    "q_zorder_pruned_scan",
    "stream_events_hourly",
    "corpus_vocab_stats",
    "dedup_keeplist",
    "widening_uniform_lifecycle",
    "corpus_unigram_lm",
    "sample_global_shuffle",
    "embedding_random_projection",
    "text_gopher_rules",
    "text_boilerplate_ratio",
    "corpus_dsir_importance",
    "stream_user_totals",
    "clone_lifecycle",
    "events_rolling_zscore",
    "corpus_pmi_bigrams",
    "corpus_source_overlap",
    "text_hash_classifier",
    "stream_hourly_watermark",
    "stream_delta_sink_pipeline",
    "stream_dedup_events",
    "stream_stream_join",
    "concurrent_lifecycle",
    "similarity_lsh_buckets",
    "similarity_quantized_rerank",
    # -- (2) new / re-parametrized in round 7 ---------------------------------
    "corpus_bpe_encode_arrow",
    "similarity_pq_index_lifecycle",
    "similarity_pq_index_search",
    "similarity_ivfpq_index_search",
    "similarity_knn_graph",
    "similarity_pq_topk",
    "similarity_ivfpq_topk",
    "recall_contracts",
]


def _apply_rotation() -> None:
    ordered = [n for n in _ROTATION if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(ordered)]
    snapshot = dict(QUERIES)
    QUERIES.clear()
    for n in ordered + rest:
        QUERIES[n] = snapshot[n]


_apply_rotation()

__all__ = ["QUERIES", "queries", "oracle_sql", "headline_queries"]
