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

# Round-9 window (stalest-first, VERDICT r8 item #3): (1) the only two
# catalog rows never driver-certified — born in round 8, swept exact in
# session logs but without a committed CORRECTNESS row; (2) rows whose
# CODE PATH changed this round: dedup_clusters (connected_components now
# pointer-jumps and raises on non-convergence) and dedup_keeplist (its
# forced-broadcast anti join dropped — values provably identical, but the
# honest signal is re-certification in the window of the plan change);
# the other keeplist consumers (dedup_keeplist_longest,
# dedup_semantic_keeplist, dedup_semantic_clustered, text_line_dedup) are
# already in block (3); plus similarity_pq_index_search, whose r8 rerank
# plan change was only sweep-covered — both persisted-index search rows
# now have a windowed artifact (ADVICE r8); (3) all 43 rows whose last
# driver-green round is 6 — the corpus_*/dedup_*/text_* operator block —
# now the stalest in the catalog; (4) two related round-7 fillers (the
# semantic pair source and the kNN-graph consumer of the changed ANN
# family). After this window nothing's last-green round is older than 7.
_ROTATION = [
    # -- (1) never certified (new in round 8) ---------------------------------
    "dedup_semantic_index_lifecycle",
    "stream_ann_index_pipeline",
    # -- (2) code path changed in round 9 --------------------------------------
    "dedup_clusters",
    "dedup_keeplist",
    "similarity_pq_index_search",
    # -- (3) last certified round 6 (43 rows) ----------------------------------
    "q_cube_status_priority",
    "events_variant_props",
    "q_events_funnel",
    "q_events_retention",
    "q_events_pivot",
    "q_union_except",
    "q_part_cooccurrence",
    "q_events_value_stats",
    "q_daily_revenue_ma7",
    "q_customer_value_deciles",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_verified",
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
    "corpus_bpe_pairs",
    "corpus_bpe_train",
    "corpus_bpe_encode",
    "dedup_keeplist_longest",
    "text_line_dedup",
    "dedup_semantic_keeplist",
    "similarity_pq_exact",
    "similarity_ivfpq_exact",
    "similarity_pq_codes",
    "text_substring_dedup",
    "dedup_semantic_clustered",
    # -- (4) born round 9 (certified in their birth round, unlike the two
    #        round-8 rows above that had to wait a round) --------------------
    "dedup_semantic_collapsed",
    "similarity_ivfpq_residual",
]


# the driver certifies exactly this many names off the front of queries()
WINDOW = 50


def _apply_rotation() -> None:
    # A typo or a renamed query in _ROTATION would silently shrink the
    # certification window and promote an arbitrary registration-order row
    # into it, defeating the rotation promise test_rotation_freshness.py
    # enforces — fail loudly at import instead (ADVICE r9).
    unknown = [n for n in _ROTATION if n not in QUERIES]
    assert not unknown, f"_ROTATION names not registered in QUERIES: {unknown}"
    assert len(_ROTATION) == len(set(_ROTATION)), "_ROTATION has duplicates"
    assert len(_ROTATION) == WINDOW, (
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
