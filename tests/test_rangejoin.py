"""Bucketed range join equals the naive theta-join on random data,
including half-open boundary semantics and bucket-straddling intervals."""

import random

import pytest

from pyspark.sql import Row, functions as F

from mini_data_platform_spark.operators.rangejoin import range_join_point_interval


@pytest.fixture(scope="module")
def data(spark):
    rng = random.Random(3)
    points = [
        Row(k=rng.randint(0, 4), pid=i, t=rng.randint(0, 1000)) for i in range(200)
    ]
    intervals = []
    for i in range(80):
        s = rng.randint(0, 950)
        intervals.append(
            Row(k=rng.randint(0, 4), iid=i, s=s, e=s + rng.randint(1, 120))
        )
    return spark.createDataFrame(points), spark.createDataFrame(intervals)


def _naive(left, right):
    return (
        left.join(right.withColumnRenamed("k", "k2"),
                  (F.col("k") == F.col("k2"))
                  & (F.col("s") <= F.col("t")) & (F.col("t") < F.col("e")))
        .select("k", "pid", "iid")
    )


class TestRangeJoin:
    @pytest.mark.parametrize("bucket_width", [7, 64, 128, 1000])
    def test_matches_naive(self, spark, data, bucket_width):
        left, right = data
        got = {
            (r["k"], r["pid"], r["iid"])
            for r in range_join_point_interval(
                left, right, on=["k"], point="t", start="s", end="e",
                bucket_width=bucket_width,
            ).collect()
        }
        expect = {tuple(r) for r in _naive(left, right).collect()}
        assert got == expect

    def test_half_open_boundaries(self, spark):
        left = spark.createDataFrame([Row(k=1, pid=0, t=10), Row(k=1, pid=1, t=20)])
        right = spark.createDataFrame([Row(k=1, iid=0, s=10, e=20)])
        got = {
            r["pid"]
            for r in range_join_point_interval(
                left, right, on=["k"], point="t", start="s", end="e", bucket_width=5
            ).collect()
        }
        assert got == {0}  # start inclusive, end exclusive

    def test_left_join_keeps_matchless(self, spark):
        left = spark.createDataFrame([Row(k=1, pid=0, t=10), Row(k=2, pid=1, t=10)])
        right = spark.createDataFrame([Row(k=1, iid=7, s=0, e=100)])
        rows = {
            r["pid"]: r["iid"]
            for r in range_join_point_interval(
                left, right, on=["k"], point="t", start="s", end="e",
                bucket_width=50, how="left",
            ).collect()
        }
        assert rows == {0: 7, 1: None}
