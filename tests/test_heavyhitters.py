"""Heavy hitters: exact equality with GROUP BY HAVING, MG coverage
guarantee enforced, nulls excluded, candidate set bounded."""

import pytest

from pyspark.sql import functions as F

from mini_data_platform_spark.operators.heavyhitters import (
    _mg_partition_summaries,
    heavy_hitters,
)


def _skewed(spark):
    # 3 hot keys (1200/800/400 rows) over a 200-key uniform tail of 2000
    hot = (
        spark.range(1200).select(F.lit("h1").alias("k"))
        .unionByName(spark.range(800).select(F.lit("h2").alias("k")))
        .unionByName(spark.range(400).select(F.lit("h3").alias("k")))
    )
    tail = spark.range(2000).select(
        F.concat(F.lit("t"), F.col("id") % 200).alias("k")
    )
    return hot.unionByName(tail).repartition(8)


class TestHeavyHitters:
    def test_equals_group_by_having(self, spark):
        df = _skewed(spark)
        s = 300
        expected = {
            (r["k"], r["n"])
            for r in df.groupBy("k")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") >= s)
            .collect()
        }
        got = {
            (r["k"], r["n"])
            for r in heavy_hitters(df, "k", min_count=s, k_counters=64).collect()
        }
        assert got == expected
        assert {"h1", "h2", "h3"} == {k for k, _ in got}

    def test_borderline_threshold_still_exact(self, spark):
        # min_count just above the tail's per-key count (10): every hot
        # key qualifies, no tail key does, and counts are exact
        df = _skewed(spark)
        got = {
            (r["k"], r["n"])
            for r in heavy_hitters(df, "k", min_count=11, k_counters=512).collect()
        }
        assert got == {("h1", 1200), ("h2", 800), ("h3", 400)}

    def test_guarantee_violation_refused(self, spark):
        df = _skewed(spark)  # 4400 rows
        with pytest.raises(ValueError, match="cannot guarantee"):
            heavy_hitters(df, "k", min_count=100, k_counters=16)

    def test_nulls_excluded(self, spark):
        df = spark.range(100).select(
            F.when(F.col("id") % 2 == 0, F.lit("a")).alias("k")
        )
        got = heavy_hitters(df, "k", min_count=10, k_counters=32).collect()
        assert [(r["k"], r["n"]) for r in got] == [("a", 50)]

    def test_candidates_bounded_per_partition(self, spark):
        df = _skewed(spark)
        k = 16
        per_part = (
            _mg_partition_summaries(df, "k", k)
            .groupBy(F.spark_partition_id().alias("p"))
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        assert per_part <= k

class TestAutoSizing:
    """k_counters=None sizes the sketch from the observed n (round-6
    verdict: hard-coded constants made declared queries sf-fragile)."""

    def test_auto_equals_group_by_having(self, spark):
        from pyspark.sql import functions as F

        df = (
            spark.range(5_000)
            .select((F.col("id") % 37).alias("k"))
            .unionByName(
                spark.range(400).select(F.lit(999).alias("k"))
            )
            .repartition(8)
        )
        want = {
            (r["k"], r["n"])
            for r in df.groupBy("k")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") >= 200)
            .collect()
        }
        got = {
            (r["k"], r["n"])
            for r in heavy_hitters(df, "k", min_count=200).collect()
        }
        assert got == want

    def test_auto_survives_million_rows(self, spark):
        """The round-6 failure mode: fixed k_counters=2048 refused once
        n/k ≥ min_count. Auto mode must run green at ~1M rows."""
        from pyspark.sql import functions as F

        df = spark.range(1_000_000).select(
            (F.col("id") % 50_000).alias("k")
        )
        # every key occurs exactly 20 times; threshold 25 -> empty result
        assert heavy_hitters(df, "k", min_count=25).count() == 0
        # threshold 20 -> all 50k keys qualify
        df2 = spark.range(1_000_000).select(
            F.when(F.col("id") < 500_000, F.col("id") % 1000)
            .otherwise(F.col("id"))
            .alias("k")
        )
        got = heavy_hitters(df2, "k", min_count=400).count()
        assert got == 1000

    def test_explicit_k_still_refuses(self, spark):
        import pytest as _pytest
        from pyspark.sql import functions as F

        df = spark.range(10_000).select((F.col("id") % 5).alias("k"))
        with _pytest.raises(ValueError):
            heavy_hitters(df, "k", min_count=100, k_counters=16)
