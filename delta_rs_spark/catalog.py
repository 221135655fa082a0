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

# Round-5 window: (1) the queries NEW this round (the exact-oracle IVF
# companion and the two incremental-maintenance lifecycle rows — the last
# operator family without driver visibility); (2) the 4 recall-contract
# rows-only entries (kept in every window so their rows-only signal stays
# current); (3) 43 of the 50 relational queries certified in rounds 1-2 —
# by round 5 they are the stalest driver signal in the repo (3 rounds),
# while the pipeline surface just re-greened in round 4. Seven relational
# rows whose operator class is covered by an in-window sibling wait for
# round 6 (q_union_except ~ q_set_ops; q_cube_status_priority ~
# q_rollup_status/q_grouping_sets; q_events_funnel/pivot/retention/
# value_stats ~ q_events_hourly/json_props/sessions; q_part_cooccurrence ~
# q_self_join_parts) — the window holds 50 and 3 + 4 + 43 fills it.
_ROTATION = [
    # -- (1) new in round 5 --------------------------------------------------
    "similarity_ivf_exact",
    "incremental_rollup_lifecycle",
    "dedup_index_lifecycle",
    # -- (2) recall-contract rows-only entries (floors pinned in
    # tests/test_recall.py; deterministic cores certified by the exact
    # companions similarity_ivf_exact / similarity_quantized_rerank /
    # similarity_lsh_buckets / dedup_minhash_verified) ------------------------
    "dedup_minhash_lsh",
    "similarity_quantized_topk",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
    # -- (3) relational surface, last certified round 2 ----------------------
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_nation_revenue",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q12_priority_class",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q20_promo_volume_suppliers",
    "q21_returned_not_accepted",
    "q22_idle_customers",
    "q_minmax_agg",
    "q_filter_sort_project",
    "q_semi_join",
    "q_anti_join",
    "q_outer_join_nulls",
    "q_self_join_parts",
    "q_window_topk_orders",
    "q_window_running_revenue",
    "q_window_lag_events",
    "q_rollup_status",
    "q_grouping_sets",
    "q_set_ops",
    "q_scalar_subquery",
    "q_string_functions",
    "q_date_functions",
    "q_percentiles",
    "q_array_functions",
    "q_referential_integrity",
    "q_events_hourly",
    "q_events_json_props",
    "q_events_sessions",
    # -- beyond the 50-window: the 7 deferred relational rows lead round 6,
    # followed by everything else in original registration order ------------
    "q_union_except",
    "q_cube_status_priority",
    "q_events_funnel",
    "q_events_pivot",
    "q_events_retention",
    "q_events_value_stats",
    "q_part_cooccurrence",
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
