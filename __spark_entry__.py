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
CURRENT_ROUND = 9

#: Last round each query had a slot in the driver's 50-row correctness
#: window, as recorded in CORRECTNESS_r0{N}.json — the MECHANICAL input
#: to the rotation policy (round-8 verdict item 2: comments don't
#: enforce invariants; this dict + tests/test_entry.py's staleness
#: assertion do). Maintained per round: after choosing the window,
#: every windowed query's entry becomes CURRENT_ROUND.
#: INVARIANT (tested): a query NOT in this round's window must have
#: been windowed within the previous two rounds (age <= 2), so every
#: query gets a driver-recorded check at least every third round —
#: the tightest bound 127 queries and 50 slots admit.
_LAST_WINDOWED = {
    # never windowed before round 9 (the r8 verdict's policy breach;
    # doc_neardup_delete_serve and doc_curated_incremental are NEW in
    # round 9)
    "doc_bpe_token_counts": 0,
    "doc_neardup_delete_serve": 0,
    "doc_curated_incremental": 0,
    # last windowed in round 6
    "kpi_revenue_by_day": 6, "kpi_top_customers": 6,
    "kpi_product_performance": 6, "kpi_rolling_7d_revenue": 6,
    "kpi_failed_events_trend": 6, "doc_fingerprint": 6,
    "doc_exact_dedup": 6, "emb_norms": 6, "emb_knn": 6,
    "emb_ann_knn": 6, "emb_ann_ivf": 6, "emb_near_dups_exact": 6,
    "emb_dedup_final": 6, "order_stats_distinct": 6,
    "priority_status_matrix": 6, "price_quantiles": 6,
    "price_quantiles_approx": 6, "order_priority_pivot": 6,
    "lineitem_unpivot_stats": 6, "customer_deciles": 6,
    "order_moments": 6, "quantity_price_corr": 6,
    "nation_top_customer_names": 6, "order_grouping_sets": 6,
    "big_orders": 6, "promo_revenue_share": 6,
    "cheapest_supplier_per_part": 6, "orders_dq_report": 6,
    "events_distinct_users": 6, "events_hourly": 6,
    "events_json_value": 6, "events_approx_users": 6,
    "revenue_by_day_dense": 6,
    # last windowed in round 7
    "kpi_revenue_by_customer": 7, "doc_token_stats": 7,
    "doc_language_guess": 7, "doc_quality": 7, "doc_hash_embedding": 7,
    "doc_chunks": 7, "doc_window_dups": 7, "doc_segment_dups": 7,
    "doc_packing": 7, "doc_epoch_shuffle": 7,
    "doc_minhash_candidates": 7, "doc_near_dups": 7, "doc_simhash": 7,
    "doc_dup_clusters": 7, "doc_dup_clusters_star": 7,
    "doc_dedup_final": 7, "doc_curated_corpus": 7,
    "doc_split_assign": 7, "doc_stratified_sample": 7,
    "doc_contamination": 7, "doc_repetition": 7, "doc_pii_scan": 7,
    "asset_binary_stats": 7, "asset_features": 7,
    "asset_frame_samples": 7, "pricing_summary": 7,
    "regional_revenue": 7, "top_building_orders": 7,
    "region_nation_rollup": 7, "status_priority_cube": 7,
    "customer_rank_in_nation": 7, "daily_revenue_delta": 7,
    "monthly_running_revenue": 7, "latest_order_per_customer": 7,
    "customers_with_orders": 7, "customers_without_orders": 7,
    "wealthy_active_customers": 7, "events_sessionize": 7,
    "click_before_purchase": 7, "errors_near_click": 7,
    "lineitem_bloom_semijoin": 7, "events_heavy_users": 7,
    "events_cms_users": 7,
    # last windowed in round 8
    "emb_ann_ivf_trained": 8, "emb_near_dups_lsh": 8,
    "emb_dup_clusters": 8, "orders_interpolated_revenue": 8,
    "events_user_stats_salted": 8, "events_funnel": 8,
    "events_cohort_retention": 8, "partsupp_pagerank": 8,
    "orders_price_outliers": 8, "orders_merge_view_serve": 8,
    "orders_join_view_serve": 8, "customer_spend_distribution": 8,
    "customer_segment_impute": 8, "events_kmv_users": 8,
    "events_kmv_overlap": 8, "events_session_funnel": 8,
    "events_hourly_anomalies": 8, "doc_neardup_delete": 8,
    "kpi_price_quantiles_ivm": 8, "kpi_top_customers_ivm": 8,
    "doc_weighted_sample": 8, "doc_bpe_vocab": 8, "emb_ann_sq8": 8,
    "kpi_distinct_customers_ivm": 8, "orders_bloom_lookup": 8,
    "doc_contamination_fuzzy": 8, "doc_longest_repeat": 8,
    "doc_repeat_coverage": 8, "doc_suffix_dedup": 8,
    "doc_neardup_serve": 8, "doc_title_editjoin_freq": 8,
    "doc_exact_dedup_serve": 8, "emb_neardup_serve": 8,
    "doc_unigram_lm": 8, "doc_source_mix": 8, "emb_semdedup": 8,
    "kpi_revenue_by_day_ivm": 8, "events_purchase_join_salted": 8,
    "doc_chunk_knn": 8, "orders_merge_table": 8,
    "orders_merge_view": 8, "orders_join_view": 8,
    "orders_scd2_revenue": 8, "doc_neardup_incremental": 8,
    "doc_exact_dedup_incremental": 8, "emb_neardup_incremental": 8,
    "doc_title_editjoin": 8, "doc_bm25": 8, "emb_ann_pq": 8,
    "emb_ann_ivfpq": 8,
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
#: Round 9 window: the full stale cohort first — doc_bpe_token_counts
#: (never windowed; the r8 policy breach this mechanical check now
#: prevents) plus the 33 queries last windowed in r6 — then the queries
#: touched by round-9 diffs (emb_ann_pq / emb_ann_ivfpq flipped to
#: oracle-exact parity plans; orders_bloom_lookup over the sharded
#: manifest; events_kmv_* over the persisted synopsis; events_funnel /
#: events_session_funnel over the checkpointed step chain;
#: orders_join_view_serve over the multi-fixture cache key;
#: emb_dup_clusters after the creep profile), then the TWO queries new
#: this round (doc_neardup_delete_serve — the takedown read path;
#: doc_curated_incremental — the incremental curation capstone), then
#: stale-first picks from the r7 cohort.
_ROUND9_WINDOW = [
    # (1) stale cohort: never windowed / last windowed r6
    "doc_bpe_token_counts",
    "kpi_revenue_by_day", "kpi_top_customers", "kpi_product_performance",
    "kpi_rolling_7d_revenue", "kpi_failed_events_trend",
    "doc_fingerprint", "doc_exact_dedup", "emb_norms", "emb_knn",
    "emb_ann_knn", "emb_ann_ivf", "emb_near_dups_exact",
    "emb_dedup_final", "order_stats_distinct", "priority_status_matrix",
    "price_quantiles", "price_quantiles_approx", "order_priority_pivot",
    "lineitem_unpivot_stats", "customer_deciles", "order_moments",
    "quantity_price_corr", "nation_top_customer_names",
    "order_grouping_sets", "big_orders", "promo_revenue_share",
    "cheapest_supplier_per_part", "orders_dq_report",
    "events_distinct_users", "events_hourly", "events_json_value",
    "events_approx_users", "revenue_by_day_dense",
    # (2) touched by round-9 diffs
    "emb_ann_pq", "emb_ann_ivfpq", "orders_bloom_lookup",
    "events_kmv_users", "events_kmv_overlap", "events_funnel",
    "events_session_funnel", "orders_join_view_serve",
    "emb_dup_clusters",
    # (2b) NEW this round (debut with a driver row, rule 2)
    "doc_neardup_delete_serve", "doc_curated_incremental",
    # (3) stale-first from the r7 cohort (asset_binary_stats and
    # lineitem_bloom_semijoin, both age 2, ceded their slots to the two
    # new queries and lead the r10 window)
    "doc_minhash_candidates", "doc_near_dups", "doc_dedup_final",
    "doc_curated_corpus", "events_sessionize",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    full: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    full.update(kpi.QUERIES)
    full.update(llm.QUERIES)
    full.update(multimodal_q.QUERIES)
    full.update(analytics.QUERIES)
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _ROUND9_WINDOW:
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
