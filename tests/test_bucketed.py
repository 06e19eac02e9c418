"""Bucketed tables: co-bucketed joins and aggregations plan without a
shuffle on the bucketed key — the property that makes fact-fact joins
viable at scale."""

import pytest

from pyspark.sql import functions as F

from mini_data_platform_spark.explain import count_exchanges, explain_str
from mini_data_platform_spark.sinks.bucketed import read_table, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.range(10_000).select(
        F.col("id").alias("o_key"),
        (F.col("id") % 100).cast("double").alias("o_price"),
    )
    items = spark.range(30_000).select(
        (F.col("id") % 10_000).alias("l_key"),
        (F.col("id") % 7).cast("double").alias("l_qty"),
    )
    write_bucketed(orders, "b_orders", ["o_key"], n_buckets=8)
    write_bucketed(items, "b_items", ["l_key"], n_buckets=8)
    yield "b_orders", "b_items"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")


class TestBucketedJoin:
    def test_cobucketed_join_has_no_exchange(self, spark, bucketed_tables):
        t1, t2 = bucketed_tables
        joined = read_table(spark, t1).join(
            read_table(spark, t2), F.col("o_key") == F.col("l_key")
        )
        assert count_exchanges(joined) == 0, explain_str(joined, "simple")

    def test_unbucketed_join_needs_exchanges(self, spark, bucketed_tables):
        # control: same join shape, unbucketed side, broadcast disabled via
        # merge hint -> the unbucketed side must shuffle
        t1, _ = bucketed_tables
        plain = spark.range(30_000).select(
            (F.col("id") % 10_000).alias("l_key"),
            F.lit(1.0).alias("l_qty"),
        )
        joined = read_table(spark, t1).join(
            plain.hint("merge"), F.col("o_key") == F.col("l_key")
        )
        assert count_exchanges(joined) >= 1

    def test_groupby_on_bucket_key_has_no_exchange(self, spark, bucketed_tables):
        _, t2 = bucketed_tables
        agg = read_table(spark, t2).groupBy("l_key").agg(F.sum("l_qty"))
        assert count_exchanges(agg) == 0

    def test_join_results_correct(self, spark, bucketed_tables):
        t1, t2 = bucketed_tables
        n = (
            read_table(spark, t1)
            .join(read_table(spark, t2), F.col("o_key") == F.col("l_key"))
            .count()
        )
        assert n == 30_000  # every item key hits exactly one order
