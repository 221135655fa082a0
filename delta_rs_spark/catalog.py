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

# The 41 queries with no driver CORRECTNESS row after rounds 1-2, followed by
# new round-3 certified queries, followed by relational canaries (certified
# green in both prior rounds) filling the remaining slots of the 50-window.
_ROTATION = [
    # -- pipeline surface (uncertified through round 2) --------------------
    "q_daily_revenue_ma7",
    "q_customer_value_deciles",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "similarity_topk",
    "similarity_quantized_topk",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
    "embedding_centroid_norms",
    "embedding_quantize_int8",
    "text_lang_id",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "text_normalize",
    "text_pii_redact",
    "text_char_entropy",
    "text_contamination",
    "text_contamination_bloom",
    "text_repetition",
    "text_tfidf_topk",
    "text_chunking",
    "text_sequence_packing",
    "corpus_top_ngrams",
    "corpus_dup_rate_by_source",
    "multimodal_features",
    "asof_join_events",
    "range_join_error_windows",
    "ts_resample_locf",
    "skew_salted_count_distinct",
    "split_train_val_test",
    "split_grouped_by_source",
    "sample_source_mixture",
    "sample_stratified_exact",
    "profile_price_histogram",
    "profile_lineitem_columns",
    "pipeline_corpus_curation",
    # -- round-3 additions (registered by queries/pipeline_queries) --------
    "features_lifecycle",
    "cdf_changes_window",
    "q_zorder_pruned_scan",
    "stream_events_hourly",
    "corpus_vocab_stats",
    "text_lang_mismatch",
    "sample_token_budget",
    "dedup_keeplist",
    "events_variant_props",
    # -- beyond the 50-window this round; first in line for the round-4
    # rotation (locally oracle-certified + pytest-pinned meanwhile) --------
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
    # -- relational canaries (certified green rounds 1-2; the window is 50,
    # so these certify only if earlier entries shrink — harmless either way)
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
