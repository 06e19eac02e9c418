"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` maps
every implemented operator (SURVEY.md §2) to a (spark, sf_dir) callable;
``oracle_sql()`` gives the DuckDB-equivalent SQL with matching column names.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from mini_data_platform_spark.plans import analytics, kpi, llm, multimodal_q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: KPI revenue-by-day over sf0.001 (SURVEY.md §7 M0)."""
    return kpi.revenue_by_day(spark, "/root/testdata/sf0.001")


#: ROUND the current window targets (bump each round).
CURRENT_ROUND = 13

#: Last round each query had a slot in the driver's 50-row correctness
#: window, as recorded in CORRECTNESS_r0{N}.json — the MECHANICAL input
#: to the rotation policy (round-8 verdict item 2: comments don't
#: enforce invariants; this dict + tests/test_entry.py's staleness
#: assertion do). Maintained per round by `tools/advance_round.py
#: --write`, which regenerates it from the CORRECTNESS_r*.json
#: artifacts at the CURRENT_ROUND bump — entries reflect RECORDED
#: rounds only (a test pins the dict to the artifacts), never the
#: not-yet-recorded current window.
#: INVARIANT (tested): a query NOT in this round's window must have
#: been windowed within the previous two rounds (age <= 2), so every
#: query gets a driver-recorded check at least every third round —
#: the tightest bound 127 queries and 50 slots admit.
_LAST_WINDOWED = {
    # never windowed
    "doc_bm25_takedown_serve": 0, "doc_phrase_search": 0,
    "doc_phrase_serve": 0,
    # last windowed in round 9
    "emb_dedup_final": 9, "emb_dup_clusters": 9, "emb_knn": 9,
    "emb_near_dups_exact": 9, "emb_norms": 9, "events_approx_users": 9,
    "events_distinct_users": 9, "events_funnel": 9, "events_hourly": 9,
    "events_json_value": 9, "events_kmv_overlap": 9, "events_kmv_users": 9,
    "events_session_funnel": 9, "events_sessionize": 9,
    "kpi_failed_events_trend": 9, "kpi_product_performance": 9,
    "kpi_revenue_by_day": 9, "kpi_rolling_7d_revenue": 9,
    "kpi_top_customers": 9, "lineitem_unpivot_stats": 9,
    "nation_top_customer_names": 9, "order_grouping_sets": 9,
    "order_moments": 9, "order_priority_pivot": 9, "order_stats_distinct": 9,
    "orders_bloom_lookup": 9, "orders_dq_report": 9,
    "orders_join_view_serve": 9, "price_quantiles": 9,
    "price_quantiles_approx": 9, "priority_status_matrix": 9,
    "promo_revenue_share": 9, "quantity_price_corr": 9,
    "revenue_by_day_dense": 9,
    # last windowed in round 11
    "asset_binary_stats": 11, "asset_features": 11, "asset_frame_samples": 11,
    "click_before_purchase": 11, "customer_rank_in_nation": 11,
    "customers_with_orders": 11, "customers_without_orders": 11,
    "daily_revenue_delta": 11, "doc_bm25_serve": 11, "doc_chunks": 11,
    "doc_contamination": 11, "doc_curated_incremental": 11,
    "doc_dup_clusters": 11, "doc_dup_clusters_star": 11,
    "doc_epoch_shuffle": 11, "doc_hash_embedding": 11,
    "doc_language_guess": 11, "doc_neardup_delete": 11,
    "doc_neardup_delete_serve": 11, "doc_neardup_incremental": 11,
    "doc_neardup_serve": 11, "doc_packing": 11, "doc_pii_scan": 11,
    "doc_quality": 11, "doc_quality_model": 11, "doc_quality_model_serve": 11,
    "doc_repetition": 11, "doc_segment_dups": 11, "doc_simhash": 11,
    "doc_split_assign": 11, "doc_stratified_sample": 11,
    "doc_token_stats": 11, "doc_window_dups": 11, "emb_ann_ivfpq_serve": 11,
    "emb_ann_pq_serve": 11, "emb_neardup_serve": 11, "errors_near_click": 11,
    "events_cms_users": 11, "events_heavy_users": 11,
    "kpi_revenue_by_customer": 11, "latest_order_per_customer": 11,
    "lineitem_bloom_semijoin": 11, "monthly_running_revenue": 11,
    "orders_join_view": 11, "pricing_summary": 11, "region_nation_rollup": 11,
    "regional_revenue": 11, "status_priority_cube": 11,
    "top_building_orders": 11, "wealthy_active_customers": 11,
    # last windowed in round 12
    "big_orders": 12, "cheapest_supplier_per_part": 12,
    "customer_deciles": 12, "customer_segment_impute": 12,
    "customer_spend_distribution": 12, "doc_bm25": 12,
    "doc_bpe_token_counts": 12, "doc_bpe_vocab": 12, "doc_chunk_knn": 12,
    "doc_contamination_fuzzy": 12, "doc_curated_corpus": 12,
    "doc_dedup_final": 12, "doc_exact_dedup": 12,
    "doc_exact_dedup_incremental": 12, "doc_exact_dedup_serve": 12,
    "doc_fingerprint": 12, "doc_longest_repeat": 12,
    "doc_minhash_candidates": 12, "doc_near_dups": 12,
    "doc_repeat_coverage": 12, "doc_source_mix": 12, "doc_suffix_dedup": 12,
    "doc_title_editjoin": 12, "doc_title_editjoin_freq": 12,
    "doc_unigram_lm": 12, "doc_weighted_sample": 12, "emb_ann_ivf": 12,
    "emb_ann_ivf_trained": 12, "emb_ann_ivfpq": 12, "emb_ann_knn": 12,
    "emb_ann_pq": 12, "emb_ann_sq8": 12, "emb_near_dups_lsh": 12,
    "emb_neardup_incremental": 12, "emb_semdedup": 12,
    "events_cohort_retention": 12, "events_hourly_anomalies": 12,
    "events_purchase_join_salted": 12, "events_user_stats_salted": 12,
    "kpi_distinct_customers_ivm": 12, "kpi_price_quantiles_ivm": 12,
    "kpi_revenue_by_day_ivm": 12, "kpi_top_customers_ivm": 12,
    "orders_interpolated_revenue": 12, "orders_merge_table": 12,
    "orders_merge_view": 12, "orders_merge_view_serve": 12,
    "orders_price_outliers": 12, "orders_scd2_revenue": 12,
    "partsupp_pagerank": 12,
}

#: ROTATION POLICY (the driver's correctness harness records only the
#: FIRST 50 entries; 129 queries exist, so 79 sit outside any given
#: round):
#:   1. MECHANICAL staleness bound (tests/test_entry.py): every query
#:      not in this round's window must have been windowed within the
#:      previous two rounds — i.e. every query gets a driver row at
#:      least every THIRD round, the tightest bound 129 queries and 50
#:      slots admit. _LAST_WINDOWED above is the enforced record
#:      (tools/advance_round.py regenerates it from the artifacts;
#:      a second test pins the dict TO the artifacts).
#:   2. Queries whose code path is touched by this round's diffs are
#:      forced INTO the window where slots allow; any touched query
#:      that cannot fit is re-verified exact-multiset with
#:      tools/verify_local.py before the round closes (recorded in
#:      SURVEY §6).
#:   3. The rotated-out remainder must be all green in a previous
#:      round's CORRECTNESS file and re-verified locally if touched.
#: Rotation rule 2's mechanical form: queries this round's diff touched
#: that must be FORCED into the window ahead of the staleness rule.
#: tools/advance_round.build_window places these first, and the
#: window-matches-rule test pins the declared window to
#: build_window(..., forced=_WINDOW_FORCED) — a hand swap without a
#: matching entry here fails the suite, so rule-2 deviations are
#: always visible in the diff. Round 13 forces nothing: every
#: diff-touched query this round is already in the must-set.
_WINDOW_FORCED: tuple[str, ...] = ()

#: Round 13 window — the HEAL round planned when round 12's overflow
#: was accepted: the must-set (age > 2) is exactly the 34 r9-last
#: overflow queries plus the 3 queries added in round 12 that have
#: never held a driver slot (doc_phrase_search, doc_phrase_serve,
#: doc_bm25_takedown_serve — exact-multiset rows in
#: VERIFY_LOCAL_r12.json until now). That is 37 <= 50, so NO overflow
#: clause is needed this round; the remaining 13 slots go to the
#: stalest cohort (r11-last, alphabetical). Selection stays purely
#: mechanical: must-set first, then stalest by (last_windowed, name).
_ROUND13_WINDOW = [
    # never driver-windowed (added in r12) — must-set
    "doc_bm25_takedown_serve", "doc_phrase_search", "doc_phrase_serve",
    # all 34 r9-last queries (the r12 overflow) — must-set
    "emb_dedup_final", "emb_dup_clusters", "emb_knn",
    "emb_near_dups_exact", "emb_norms", "events_approx_users",
    "events_distinct_users", "events_funnel", "events_hourly",
    "events_json_value", "events_kmv_overlap", "events_kmv_users",
    "events_session_funnel", "events_sessionize",
    "kpi_failed_events_trend", "kpi_product_performance",
    "kpi_revenue_by_day", "kpi_rolling_7d_revenue", "kpi_top_customers",
    "lineitem_unpivot_stats", "nation_top_customer_names",
    "order_grouping_sets", "order_moments", "order_priority_pivot",
    "order_stats_distinct", "orders_bloom_lookup", "orders_dq_report",
    "orders_join_view_serve", "price_quantiles", "price_quantiles_approx",
    "priority_status_matrix", "promo_revenue_share",
    "quantity_price_corr", "revenue_by_day_dense",
    # stalest fill: first 13 of the 50 r11-last queries (alphabetical)
    "asset_binary_stats", "asset_features", "asset_frame_samples",
    "click_before_purchase", "customer_rank_in_nation",
    "customers_with_orders", "customers_without_orders",
    "daily_revenue_delta", "doc_bm25_serve", "doc_chunks",
    "doc_contamination", "doc_curated_incremental", "doc_dup_clusters",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    full: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    full.update(kpi.QUERIES)
    full.update(llm.QUERIES)
    full.update(multimodal_q.QUERIES)
    full.update(analytics.QUERIES)
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _ROUND13_WINDOW:
        out[name] = full[name]
    for name, fn in full.items():
        out.setdefault(name, fn)
    return out


def oracle_sql() -> dict[str, str]:
    """Oracle SQL per query. Values in the source ORACLE dicts may be
    CALLABLES (oracles that must probe the fixture to fold constants,
    e.g. doc_bm25's corpus stats) — those are evaluated here, lazily, so
    importing this module never touches duckdb or fixture files. A
    callable that fails (fixture missing in this environment) drops its
    entry: that query degrades to the driver's rows-only check instead
    of breaking every query's import."""
    merged: dict[str, object] = {}
    merged.update(kpi.ORACLE)
    merged.update(llm.ORACLE)
    merged.update(multimodal_q.ORACLE)
    merged.update(analytics.ORACLE)
    out: dict[str, str] = {}
    for name, sql in merged.items():
        if callable(sql):
            try:
                out[name] = sql()
            except Exception:
                continue
        else:
            out[name] = sql
    return out
