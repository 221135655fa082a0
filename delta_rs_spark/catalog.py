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

# Round-8 window (stalest-first, VERDICT r7 item #6): (1) all 46 rows whose
# last driver-green round is 5 — the relational TPC-H surface plus the
# q_* operator rows, similarity_ivf_exact and the two incremental-index
# lifecycles, now the stalest in the catalog; (2) the queries NEW or
# CHANGED this round: recall_contracts (10th contract — production-knob
# kNN-graph recall — changes its oracle literal, so it MUST re-certify),
# recall_clustered_contracts + similarity_index_drift (new rows), and the
# two persisted-index search rows whose rerank join strategy changed
# (forced broadcast dropped — values provably identical, but the honest
# signal is a re-certification in the same window as the plan change).
# After this window nothing's last-green round is older than 6.
_ROTATION = [
    # -- (1) last certified round 5 (46 rows) ---------------------------------
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
    "q_anti_join",
    "q_array_functions",
    "q_date_functions",
    "q_events_hourly",
    "q_events_json_props",
    "q_events_sessions",
    "q_filter_sort_project",
    "q_grouping_sets",
    "q_minmax_agg",
    "q_outer_join_nulls",
    "q_percentiles",
    "q_referential_integrity",
    "q_rollup_status",
    "q_scalar_subquery",
    "q_self_join_parts",
    "q_semi_join",
    "q_set_ops",
    "q_string_functions",
    "q_window_lag_events",
    "q_window_running_revenue",
    "q_window_topk_orders",
    "similarity_ivf_exact",
    "dedup_index_lifecycle",
    "incremental_rollup_lifecycle",
    # -- (2) new / changed in round 8 ------------------------------------------
    "recall_contracts",
    "recall_clustered_contracts",
    "similarity_index_drift",
    "similarity_ivfpq_index_search",
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
