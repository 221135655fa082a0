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

# Round-6 window (stalest-first): (1) the 4 catalog queries that have NEVER
# had a driver row — registered after the round-5 window froze; (2) the 7
# relational rows deferred from round 5 (last driver-green round 2); (3) the
# queries NEW this round (cluster-first semantic dedup + companions —
# unregistered names are skipped by _apply_rotation until they land); (4) the
# 4 recall-contract rows-only entries (kept in every window so their
# rows-only signal stays current); (5) all 22 rows last certified round 3;
# (6) the stalest round-4 rows to fill the 50. Everything else keeps its
# original registration order after the window.
_ROTATION = [
    # -- (1) never driver-certified ------------------------------------------
    "recall_contracts",
    "text_line_dedup",
    "dedup_keeplist_longest",
    "corpus_bpe_pairs",
    # -- (2) relational rows deferred from round 5 (last green round 2) ------
    "q_union_except",
    "q_cube_status_priority",
    "q_events_funnel",
    "q_events_pivot",
    "q_events_retention",
    "q_events_value_stats",
    "q_part_cooccurrence",
    # -- (3) new in round 6 (skipped until registered) -----------------------
    "dedup_semantic_clustered",
    "text_substring_dedup",
    "similarity_pq_codes",
    "similarity_pq_exact",
    "similarity_pq_topk",
    "similarity_ivfpq_exact",
    "similarity_ivfpq_topk",
    "corpus_bpe_train",
    "corpus_bpe_encode",
    # -- (4) recall-contract rows-only entries (floors pinned in
    # tests/test_recall.py; deterministic cores certified by the exact
    # companions similarity_ivf_exact / similarity_quantized_rerank /
    # similarity_lsh_buckets / dedup_minhash_verified) ------------------------
    "dedup_minhash_lsh",
    "similarity_quantized_topk",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
    # -- (5) last certified round 3 ------------------------------------------
    "events_variant_props",
    "q_daily_revenue_ma7",
    "q_customer_value_deciles",
    "text_token_count",
    "text_fingerprint",
    "split_train_val_test",
    "text_contamination",
    "text_char_entropy",
    "text_contamination_bloom",
    "corpus_top_ngrams",
    "text_repetition",
    "text_tfidf_topk",
    "profile_lineitem_columns",
    "split_grouped_by_source",
    "sample_source_mixture",
    "text_chunking",
    "text_sequence_packing",
    "text_normalize",
    "text_pii_redact",
    "corpus_dup_rate_by_source",
    "text_lang_mismatch",
    "sample_token_budget",
    # -- (6) stalest round-4 rows (2 rounds) to fill the window --------------
    "dedup_semantic_keeplist",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_verified",
    "similarity_lsh_buckets",
    "cdf_changes_window",
    "clone_lifecycle",
    "q_zorder_pruned_scan",
    "features_lifecycle",
    "widening_uniform_lifecycle",
    "concurrent_lifecycle",
    "text_gopher_rules",
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
