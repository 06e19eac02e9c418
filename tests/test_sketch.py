"""Count-min sketch: overcount-only estimates, exactness without
collisions, partition invariance, and cell-wise mergeability."""

from pyspark.sql import functions as F

from mini_data_platform_spark.operators.sketch import (
    cms_estimate,
    cms_table,
)

DEPTH, WIDTH = 4, 64


def _skewed(spark):
    return (
        spark.range(300).select(F.lit("hot").alias("k"))
        .unionByName(
            spark.range(900).select(
                F.concat(F.lit("t"), F.col("id") % 90).alias("k")
            )
        )
        .repartition(8)
    )


class TestCountMin:
    def _cells(self, df):
        return [
            (r["row"], r["bucket"], r["n"])
            for r in cms_table(df, "k", DEPTH, WIDTH).collect()
        ]

    def test_estimates_never_undercount(self, spark):
        df = _skewed(spark)
        truth = {
            r["k"]: r["n"]
            for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()
        }
        cells = self._cells(df)
        for k, n in truth.items():
            assert cms_estimate(cells, k, DEPTH, WIDTH) >= n

    def test_hot_key_estimate_tight(self, spark):
        # 1200 rows over width 64: expected collision mass per cell
        # ~ 900/64 ~ 14; the min-over-4-rows estimate of the 300-count
        # hot key must land within that slack
        df = _skewed(spark)
        cells = self._cells(df)
        est = cms_estimate(cells, "hot", DEPTH, WIDTH)
        assert 300 <= est <= 300 + 60

    def test_exact_when_no_collisions(self, spark):
        df = spark.createDataFrame(
            [("a",)] * 7 + [("b",)] * 3, "k string"
        )
        cells = self._cells(df)
        # width 64 >> 2 keys: any collision in all 4 rows is ~impossible
        assert cms_estimate(cells, "a", DEPTH, WIDTH) == 7
        assert cms_estimate(cells, "b", DEPTH, WIDTH) == 3
        assert cms_estimate(cells, "absent", DEPTH, WIDTH) >= 0

    def test_partition_invariant(self, spark):
        df = _skewed(spark)
        a = sorted(self._cells(df.repartition(1)))
        b = sorted(self._cells(df.repartition(16)))
        assert a == b

    def test_mergeable_cellwise(self, spark):
        df = _skewed(spark)
        half1 = df.where(F.xxhash64("k") % 2 == 0)
        half2 = df.where(F.xxhash64("k") % 2 != 0)
        merged: dict = {}
        for part in (half1, half2):
            for r, b, n in self._cells(part):
                merged[(r, b)] = merged.get((r, b), 0) + n
        whole = {(r, b): n for r, b, n in self._cells(df)}
        assert merged == whole

    def test_mass_conserved_per_row(self, spark):
        df = _skewed(spark)
        total = df.count()
        cells = self._cells(df)
        for d in range(DEPTH):
            assert sum(n for r, _, n in cells if r == d) == total


class TestEstimateKeyTypes:
    """cms_estimate's driver-side hash must match Spark's
    CAST(key AS STRING); types whose Python repr diverges are refused
    (advice r6)."""

    def test_bool_matches_spark_lowercase(self, spark):
        df = spark.createDataFrame([(True,)] * 7 + [(False,)] * 3, "k boolean")
        cells = [
            (r["row"], r["bucket"], r["n"])
            for r in cms_table(df, "k", DEPTH, WIDTH).collect()
        ]
        assert cms_estimate(cells, True, DEPTH, WIDTH) >= 7
        assert cms_estimate(cells, False, DEPTH, WIDTH) >= 3

    def test_float_key_refused(self):
        import pytest as _pytest

        with _pytest.raises(TypeError):
            cms_estimate([], 5.0, DEPTH, WIDTH)
