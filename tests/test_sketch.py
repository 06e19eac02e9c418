"""Count-min sketch: overcount-only estimates, exactness without
collisions, partition invariance, and cell-wise mergeability."""

import pytest

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


class TestKMV:
    def test_merge_closure(self, spark):
        """kmv_merge(syn(A), syn(B)) must equal syn(A ∪ B) exactly —
        the KMV closure property that makes union estimates free."""
        from pyspark.sql import functions as F

        from mini_data_platform_spark.operators.sketch import (
            kmv_merge,
            kmv_synopsis,
        )

        a = spark.range(0, 400).select(F.lit("g").alias("g"), F.col("id"))
        b = spark.range(300, 700).select(F.lit("g").alias("g"), F.col("id"))
        u = a.unionByName(b)
        k = 32
        syn_a = kmv_synopsis(a, ["g"], "id", k).collect()[0]["kmv"]
        syn_b = kmv_synopsis(b, ["g"], "id", k).collect()[0]["kmv"]
        syn_u = kmv_synopsis(u, ["g"], "id", k).collect()[0]["kmv"]
        merged = (
            spark.createDataFrame([(syn_a, syn_b)], "a array<long>, b array<long>")
            .select(kmv_merge(F.col("a"), F.col("b"), k).alias("m"))
            .collect()[0]["m"]
        )
        assert merged == syn_u

    def test_small_set_branch_exact(self, spark):
        from pyspark.sql import functions as F

        from mini_data_platform_spark.operators.sketch import (
            kmv_estimate,
            kmv_synopsis,
        )

        df = spark.range(0, 10).select(F.lit("g").alias("g"), F.col("id"))
        est = kmv_estimate(kmv_synopsis(df, ["g"], "id", 64), 64).collect()
        assert est[0]["est_distinct"] == 10.0

    def test_estimate_within_error_band(self, spark):
        from pyspark.sql import functions as F

        from mini_data_platform_spark.operators.sketch import (
            kmv_estimate,
            kmv_synopsis,
        )

        n, k = 5000, 64
        df = spark.range(0, n).select(F.lit("g").alias("g"), F.col("id"))
        est = kmv_estimate(kmv_synopsis(df, ["g"], "id", k), k).collect()[0][
            "est_distinct"
        ]
        # std error ~ n/sqrt(k-2) ≈ 12.7%; allow 4 sigma
        assert abs(est - n) < 4 * n / (k - 2) ** 0.5

    def test_partition_invariance(self, spark):
        from pyspark.sql import functions as F

        from mini_data_platform_spark.operators.sketch import kmv_synopsis

        df = spark.range(0, 300).select(
            (F.col("id") % 3).cast("string").alias("g"), F.col("id")
        )
        a = sorted(
            (r["g"], r["kmv"], r["n_values"])
            for r in kmv_synopsis(df.repartition(1), ["g"], "id", 16).collect()
        )
        b = sorted(
            (r["g"], r["kmv"], r["n_values"])
            for r in kmv_synopsis(df.repartition(7), ["g"], "id", 16).collect()
        )
        assert a == b

    def test_k_guard(self, spark):
        from pyspark.sql import functions as F

        import pytest as _pytest

        from mini_data_platform_spark.operators.sketch import kmv_synopsis

        df = spark.range(3).select(F.lit("g").alias("g"), F.col("id"))
        with _pytest.raises(ValueError, match="k must be"):
            kmv_synopsis(df, ["g"], "id", 1)

    def test_overlap_small_sets_exact(self, spark):
        from pyspark.sql import functions as F

        from mini_data_platform_spark.operators.sketch import kmv_overlap

        # A = 0..19, B = 10..29: union 30, intersection 10 — all < k,
        # so every estimate must be EXACT
        a = spark.range(0, 20).select(F.lit("a").alias("g"), F.col("id"))
        b = spark.range(10, 30).select(F.lit("b").alias("g"), F.col("id"))
        row = kmv_overlap(
            a.unionByName(b), ["g"], "id", "a", "b", k=64
        ).collect()[0]
        assert row["est_a"] == 20.0 and row["est_b"] == 20.0
        assert row["est_union"] == 30.0
        assert row["est_intersection"] == pytest.approx(10.0)
        assert row["jaccard"] == pytest.approx(10 / 30)

    def test_overlap_estimates_within_band(self, spark):
        from pyspark.sql import functions as F

        from mini_data_platform_spark.operators.sketch import kmv_overlap

        # A = 0..3999, B = 2000..5999: union 6000, intersection 2000
        k = 64
        a = spark.range(0, 4000).select(F.lit("a").alias("g"), F.col("id"))
        b = spark.range(2000, 6000).select(F.lit("b").alias("g"), F.col("id"))
        row = kmv_overlap(
            a.unionByName(b), ["g"], "id", "a", "b", k=k
        ).collect()[0]
        assert abs(row["est_union"] - 6000) < 4 * 6000 / (k - 2) ** 0.5
        # intersection compounds union + ratio error: generous 5 sigma
        assert abs(row["est_intersection"] - 2000) < 5 * 6000 / (k - 2) ** 0.5
