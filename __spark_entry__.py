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


#: ROTATION POLICY (the driver's correctness harness records only the
#: FIRST 50 entries; 71 queries exist, so 21 sit outside any given round):
#:   1. Queries that went LONGEST without a driver row come first — every
#:      query gets a driver-recorded check at least every other round.
#:   2. Any query whose code path is touched by this round's diffs is
#:      forced INTO the window regardless of staleness, so an infra
#:      regression can never hide in a rotated-out query.
#:   3. The rotated-out remainder must be all green in the PREVIOUS
#:      round's CORRECTNESS file and untouched by the current diff.
#: Round 6 window: the 21 analytics queries stale since r4 (rows 1-21),
#: then every query over dedup_fuzzy/graph/similarity/llm-plan code
#: touched this round (near-dup lifecycle, max_bucket, simhash, lazy
#: block sizing), then kpi/multimodal fill, then the three queries NEW in
#: round 6 (bloom semi-join, PQ ANN, heavy hitters — rule 2). Rotated
#: out: 24 r5-green queries whose code paths have no r6 changes
#: (doc text/curation set, 12 analytics, events trio).
_ROUND6_WINDOW_FIRST = [
    # (1) stale since round 4 — driver-unrecorded for 2 rounds
    "order_stats_distinct", "priority_status_matrix", "price_quantiles",
    "price_quantiles_approx", "order_priority_pivot", "lineitem_unpivot_stats",
    "customer_deciles", "order_moments", "quantity_price_corr",
    "nation_top_customer_names", "order_grouping_sets", "big_orders",
    "promo_revenue_share", "cheapest_supplier_per_part", "orders_dq_report",
    "events_distinct_users", "events_user_stats_salted", "events_hourly",
    "events_json_value", "events_approx_users", "revenue_by_day_dense",
    # (2) touched by round-6 diffs (dedup_fuzzy / graph / similarity / llm)
    "doc_minhash_candidates", "doc_near_dups", "doc_simhash",
    "doc_dup_clusters", "doc_dedup_final", "doc_curated_corpus",
    "emb_near_dups_exact", "emb_near_dups_lsh", "emb_dup_clusters",
    "emb_dedup_final", "doc_exact_dedup", "doc_fingerprint",
    "emb_knn", "emb_ann_knn", "emb_ann_ivf", "emb_ann_ivf_trained",
    "emb_norms",
    # (3) flagship + cheap fill to 50
    "kpi_revenue_by_day", "kpi_top_customers", "kpi_product_performance",
    "kpi_rolling_7d_revenue", "kpi_failed_events_trend",
    # (4) NEW this round (rotation rule 2: new/touched code must be in
    # the window on the round it lands)
    "lineitem_bloom_semijoin", "emb_ann_pq", "events_heavy_users",
    "doc_dup_clusters_star", "doc_packing", "doc_epoch_shuffle",
    "events_cms_users",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    full: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    full.update(kpi.QUERIES)
    full.update(llm.QUERIES)
    full.update(multimodal_q.QUERIES)
    full.update(analytics.QUERIES)
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _ROUND6_WINDOW_FIRST:
        out[name] = full[name]
    for name, fn in full.items():
        out.setdefault(name, fn)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(kpi.ORACLE)
    out.update(llm.ORACLE)
    out.update(multimodal_q.ORACLE)
    out.update(analytics.ORACLE)
    return out
