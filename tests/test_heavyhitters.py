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