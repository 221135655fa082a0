"""Full query catalog: importing this module registers both the relational
surface (queries.py) and the pipeline operators (pipeline_queries.py).

Registration order matters: the driver certifies the first 50 names returned
by ``queries()``. Rounds 1-2 certified the 50 relational queries (green both
rounds); round 3 rotates the LLM-pipeline surface into the certification
window so every operator family gets a hard driver signal. ``_ROTATION``
lists the window explicitly — pipeline/dedup/similarity/text/multimodal
queries first, then a handful of previously-certified relational canaries to
fill the 50 slots. Everything else keeps its original registration order
after the window.
"""

from . import lifecycle_queries as _lifecycle_queries  # noqa: F401  (registers)
from . import pipeline_queries as _pipeline_queries  # noqa: F401  (registers)
from .queries import QUERIES, headline_queries, oracle_sql, queries

# Round-4 window: (1) the round-3 red row first; (2) the 18 queries queued
# since round 3 with no driver row yet; (3) the new round-4 queries
# (concurrent-transactions surface + exact-oracle companions to the
# approximate paths); (4) the 4 recall-contract rows-only entries (kept in
# every window so their rows-only signal stays current); (5) round-3-green
# rows filling the remaining slots for a second green. After round 4, every
# one of the catalog queries has >=1 green driver row across rounds 1-4.
_ROTATION = [
    # -- (1) round-3 red row (executor task death; now Arrow-batch read +
    # bounded in-query retry) ----------------------------------------------
    "stream_events_hourly",
    # -- (2) queued since round 3, never driver-certified -------------------
    "widening_uniform_lifecycle",
    "corpus_unigram_lm",
    "sample_global_shuffle",
    "embedding_random_projection",
    "text_gopher_rules",
    "text_boilerplate_ratio",
    "dedup_semantic_keeplist",
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
    # -- (3) new in round 4 --------------------------------------------------
    "concurrent_lifecycle",
    "similarity_lsh_buckets",
    "similarity_quantized_rerank",
    "dedup_minhash_verified",
    # -- (4) recall-contract rows-only entries (floors pinned in
    # tests/test_recall.py; deterministic projections certified by the
    # companions above) ------------------------------------------------------
    "dedup_minhash_lsh",
    "similarity_quantized_topk",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
    # -- (5) round-3 greens re-certifying for a second green ----------------
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "dedup_keeplist",
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
    "corpus_vocab_stats",
    # -- beyond the 50-window (all have green driver rows from rounds 1-3;
    # kept registered in their original order below) -------------------------
    "q1_pricing_summary",
    "q3_shipping_priority",
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
