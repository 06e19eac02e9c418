"""Driver-contract smoke: entry() runs on sf0.001, queries()/oracle_sql()
keys line up, every query returns a DataFrame with stable schema."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod

from tests.conftest import SF_SMOKE


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "revenue" in df.columns


def test_queries_and_oracles_align(spark):
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert q, "queries() must not be empty"
    unknown = set(o) - set(q)
    assert not unknown, f"oracle keys without queries: {unknown}"
    # deliberately oracle-free: the HLL sketch and the PQ/IVF-PQ ANN
    # paths (engine-specific approximations; their exact twins
    # events_distinct_users / emb_knn ARE oracle-checked, and recall is
    # pinned in tests/test_pq.py)
    assert set(q) - set(o) == {
        "events_approx_users", "emb_ann_pq", "emb_ann_ivfpq",
    }


def test_no_silent_name_collisions_between_plan_modules():
    """queries() merges four module dicts; a repeated name would silently
    drop a query from the driver contract."""
    from mini_data_platform_spark.plans import analytics, kpi, llm, multimodal_q

    parts = [kpi.QUERIES, analytics.QUERIES, llm.QUERIES, multimodal_q.QUERIES]
    total = sum(len(p) for p in parts)
    assert len(entry_mod.queries()) == total


def test_all_queries_run_at_smoke_sf(spark):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, SF_SMOKE)
        assert df.columns, name
        df.limit(5).collect()


def test_approx_users_error_bound(spark):
    """The HLL sketch has no cross-engine oracle; pin its accuracy against
    the exact distinct count instead (rsd=0.02 -> generous 3x bound)."""
    rows = entry_mod.queries()["events_approx_users"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert abs(r["approx_users"] - r["exact_users"]) <= max(
            3, 0.06 * r["exact_users"]
        ), r
