"""Corpus-curation operators (operators/corpus.py, functions/pii.py):
split stability, stratified sampling, decontamination, repetition
metrics, PII scrubbing."""

from pyspark.sql import Row, functions as F

from mini_data_platform_spark.functions import pii
from mini_data_platform_spark.operators.corpus import (
    contamination,
    repetition_metrics,
    split_assign,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows], "doc_id long, text string"
    )


class TestSplitAssign:
    def test_partitioning_invariant(self, spark):
        docs = spark.range(500).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"]: r["split"] for r in split_assign(docs, "doc_id").collect()}
        b = {
            r["doc_id"]: r["split"]
            for r in split_assign(docs.repartition(7), "doc_id").collect()
        }
        assert a == b

    def test_growth_never_moves_existing_rows(self, spark):
        small = spark.range(200).withColumnRenamed("id", "doc_id")
        big = spark.range(1000).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"]: r["split"] for r in split_assign(small, "doc_id").collect()}
        b = {r["doc_id"]: r["split"] for r in split_assign(big, "doc_id").collect()}
        assert all(b[k] == v for k, v in a.items())

    def test_proportions_roughly_80_10_10(self, spark):
        docs = spark.range(5000).withColumnRenamed("id", "doc_id")
        counts = {
            r["split"]: r["n"]
            for r in split_assign(docs, "doc_id").groupBy("split").agg(
                F.count("*").alias("n")
            ).collect()
        }
        assert sum(counts.values()) == 5000
        assert 0.75 < counts["train"] / 5000 < 0.85
        assert 0.07 < counts["val"] / 5000 < 0.13
        assert 0.07 < counts["test"] / 5000 < 0.13


class TestStratifiedSample:
    def _classed(self, spark):
        return spark.createDataFrame(
            [Row(doc_id=i, cat="a" if i % 2 else "b") for i in range(400)],
            "doc_id long, cat string",
        )

    def test_rate_100_keeps_all_rate_0_drops_all(self, spark):
        df = self._classed(spark)
        out = stratified_sample(df, "doc_id", "cat", {"a": 100}).collect()
        assert {r["cat"] for r in out} == {"a"}
        assert len(out) == 200  # every 'a' kept, every 'b' (absent) dropped

    def test_lower_rate_is_subset_of_higher(self, spark):
        df = self._classed(spark)
        lo = {r["doc_id"] for r in stratified_sample(df, "doc_id", "cat", {"a": 20}).collect()}
        hi = {r["doc_id"] for r in stratified_sample(df, "doc_id", "cat", {"a": 60}).collect()}
        assert lo <= hi
        assert len(lo) < len(hi)


class TestContamination:
    def test_benchmark_docs_fully_contaminated(self, spark):
        docs = _docs(spark, [(1, "w x y z"), (2, "p q r s t")])
        bench = _docs(spark, [(10, "w x y z")])
        out = {r["doc_id"]: r for r in contamination(docs, bench, "doc_id", "text").collect()}
        assert out[1]["contamination"] == 1.0
        assert out[2]["contamination"] == 0.0
        assert out[2]["n_ngrams"] == 3  # 5 tokens -> 3 distinct 3-grams

    def test_short_doc_zero_ngrams(self, spark):
        docs = _docs(spark, [(1, "one two")])  # shorter than shingle_n
        bench = _docs(spark, [(10, "a b c")])
        row = contamination(docs, bench, "doc_id", "text").collect()[0]
        assert row["n_ngrams"] == 0 and row["contamination"] == 0.0


class TestRepetition:
    def test_hand_counts(self, spark):
        docs = _docs(spark, [(1, "a a a b"), (2, "x y x y")])
        out = {r["doc_id"]: r for r in repetition_metrics(docs, "doc_id", "text").collect()}
        # "a a a b": bigrams [a a, a a, a b] -> top 2, adjacent repeats 2
        assert out[1]["n_bigrams"] == 3
        assert out[1]["top_bigram_n"] == 2
        assert out[1]["n_adjacent_repeats"] == 2
        # "x y x y": bigrams [x y, y x, x y] -> top 2, no adjacent repeats
        assert out[2]["top_bigram_n"] == 2
        assert out[2]["n_adjacent_repeats"] == 0

    def test_single_token_doc(self, spark):
        row = repetition_metrics(_docs(spark, [(1, "solo")]), "doc_id", "text").collect()[0]
        assert row["n_bigrams"] == 0
        assert row["top_bigram_n"] == 0
        assert row["top_bigram_frac"] == 0.0


class TestPII:
    def test_counts_and_redaction(self, spark):
        text = (
            "mail a@b.com and c.d+x@e.org, see https://ex.com/p?q=1"
            " or call +14155551234 now"
        )
        df = _docs(spark, [(1, text)]).select(
            pii.email_count(F.col("text")).alias("e"),
            pii.url_count(F.col("text")).alias("u"),
            pii.phone_count(F.col("text")).alias("p"),
            pii.redact(F.col("text")).alias("red"),
        )
        row = df.collect()[0]
        assert (row["e"], row["u"], row["p"]) == (2, 1, 1)
        assert "@" not in row["red"].replace("<EMAIL>", "")
        assert "<URL>" in row["red"] and "<PHONE>" in row["red"]

    def test_clean_text_untouched(self, spark):
        row = _docs(spark, [(1, "nothing sensitive here")]).select(
            pii.redact(F.col("text")).alias("red")
        ).collect()[0]
        assert row["red"] == "nothing sensitive here"


class TestEpochShuffle:
    def test_valid_permutation_and_deterministic(self, spark):
        from mini_data_platform_spark.operators.corpus import (
            epoch_shuffle_ranks,
        )

        df = spark.range(500).select(F.col("id").alias("doc_id"))
        a = {
            r["doc_id"]: r["epoch_rank"]
            for r in epoch_shuffle_ranks(df, "doc_id", seed=1).collect()
        }
        assert sorted(a.values()) == list(range(1, 501))
        again = {
            r["doc_id"]: r["epoch_rank"]
            for r in epoch_shuffle_ranks(df, "doc_id", seed=1).collect()
        }
        assert again == a

    def test_seeds_give_different_orders(self, spark):
        from mini_data_platform_spark.operators.corpus import (
            epoch_shuffle_ranks,
        )

        df = spark.range(200).select(F.col("id").alias("doc_id"))
        a = {
            r["doc_id"]: r["epoch_rank"]
            for r in epoch_shuffle_ranks(df, "doc_id", seed=1).collect()
        }
        b = {
            r["doc_id"]: r["epoch_rank"]
            for r in epoch_shuffle_ranks(df, "doc_id", seed=2).collect()
        }
        moved = sum(1 for k in a if a[k] != b[k])
        assert moved > 150  # a reseed must reshuffle nearly everything

    def test_partition_invariant(self, spark):
        from mini_data_platform_spark.operators.corpus import (
            epoch_shuffle_ranks,
        )

        df = spark.range(300).select(F.col("id").alias("doc_id"))
        a = sorted(
            map(tuple, epoch_shuffle_ranks(df, "doc_id", 3, 1).collect())
        )
        b = sorted(
            map(tuple, epoch_shuffle_ranks(df, "doc_id", 3, 16).collect())
        )
        assert a == b


class TestSourceMixture:
    def _corpus(self, spark, per_source):
        rows = []
        i = 0
        for src, n in per_source.items():
            for _ in range(n):
                rows.append((i, src))
                i += 1
        return spark.createDataFrame(rows, "doc_id long, source string")

    def test_binding_source_keeps_all_and_mix_approximates_target(
        self, spark
    ):
        import pytest

        from mini_data_platform_spark.operators.corpus import (
            mixture_thresholds,
            source_mixture,
        )

        # src_a scarce relative to its weight -> binding (keeps 100%)
        df = self._corpus(spark, {"a": 400, "b": 4000, "c": 4000})
        weights = {"a": 2.0, "b": 1.0, "c": 1.0}
        out, thr = source_mixture(df, "doc_id", "source", weights)
        assert thr["a"] == 65536  # binding source: threshold = full range
        # scale = 400/0.5 = 800 -> b,c keep 0.25*800/4000 = 5%
        assert thr["b"] == thr["c"] == round(0.05 * 65536)
        got = {
            r["source"]: r["cnt"]
            for r in out.groupBy("source").agg(
                F.count("*").alias("cnt")
            ).collect()
        }
        assert got["a"] == 400                      # all of the binder
        assert got["b"] == pytest.approx(200, rel=0.25)
        assert got["c"] == pytest.approx(200, rel=0.25)

    def test_unweighted_sources_dropped_and_stability(self, spark):
        from mini_data_platform_spark.operators.corpus import source_mixture

        df = self._corpus(spark, {"a": 200, "b": 200, "zz": 100})
        out, _ = source_mixture(df, "doc_id", "source", {"a": 1.0, "b": 1.0})
        assert out.filter(F.col("source") == "zz").count() == 0
        kept1 = {r["doc_id"] for r in out.collect()}
        # appending MORE b rows never evicts previously kept a/b rows of
        # unchanged threshold... thresholds change with counts, so pin
        # the weaker (but real) guarantee: rerun on identical input is
        # identical
        out2, _ = source_mixture(df, "doc_id", "source", {"a": 1.0, "b": 1.0})
        assert {r["doc_id"] for r in out2.collect()} == kept1

    def test_threshold_math_and_guards(self, spark):
        import pytest

        from mini_data_platform_spark.operators.corpus import (
            mixture_thresholds,
        )

        thr = mixture_thresholds(
            {"x": 4.0, "y": 2.0, "z": 1.0, "w": 1.0},
            {"x": 25, "y": 25, "z": 25, "w": 25},
        )
        assert thr == {"x": 65536, "y": 32768, "z": 16384, "w": 16384}
        # missing source -> threshold 0, never binds
        thr = mixture_thresholds({"x": 1.0, "gone": 1.0}, {"x": 10})
        assert thr["gone"] == 0 and thr["x"] == 65536
        with pytest.raises(ValueError):
            mixture_thresholds({"x": 0.0}, {"x": 10})
        with pytest.raises(ValueError):
            mixture_thresholds({"x": 1.0}, {})


class TestWeightedSample:
    """weighted_sample: Efraimidis–Spirakis via the libm-free
    max-of-w-uniforms identity — exact vs a Python reference,
    consistent under corpus changes, weight-monotone in distribution."""

    @staticmethod
    def _py_key(salt, doc_id, w):
        import hashlib

        return max(
            int(
                hashlib.md5(
                    f"{salt}#{doc_id}#{j}".encode()
                ).hexdigest()[:15],
                16,
            )
            for j in range(1, w + 1)
        )

    def _frame(self, spark, n=120):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 5 + 1).cast("int").alias("wt"),
        )

    def test_matches_python_reference(self, spark):
        from mini_data_platform_spark.operators.corpus import (
            WSAMPLE_SALT,
            weighted_sample,
        )

        df = self._frame(spark)
        got = [
            (r["doc_id"], r["skey"])
            for r in weighted_sample(df, "doc_id", "wt", 20).collect()
        ]
        keys = {
            i: self._py_key(WSAMPLE_SALT, i, i % 5 + 1) for i in range(120)
        }
        want = sorted(keys.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        assert [(i, k) for i, k in want] == got

    def test_consistent_under_removal_of_unsampled(self, spark):
        from mini_data_platform_spark.operators.corpus import (
            weighted_sample,
        )

        df = self._frame(spark)
        sample = {
            r["doc_id"]
            for r in weighted_sample(df, "doc_id", "wt", 15).collect()
        }
        # drop half the NON-sampled rows: the sample is unchanged
        keep = df.where(
            F.col("doc_id").isin(*sample) | (F.col("doc_id") % 2 == 0)
        )
        again = {
            r["doc_id"]
            for r in weighted_sample(keep, "doc_id", "wt", 15).collect()
        }
        assert again == sample

    def test_zero_null_weights_excluded_and_guard(self, spark):
        import pytest

        from mini_data_platform_spark.operators.corpus import (
            weighted_sample,
        )

        df = spark.createDataFrame(
            [(1, 3), (2, 0), (3, None), (4, 1)],
            "doc_id long, wt int",
        )
        got = {
            r["doc_id"]
            for r in weighted_sample(df, "doc_id", "wt", 10).collect()
        }
        assert got == {1, 4}
        with pytest.raises(ValueError):
            weighted_sample(
                spark.createDataFrame([(1, 1000)], "doc_id long, wt int"),
                "doc_id", "wt", 5,
            )

    def test_weight_monotone_inclusion(self, spark):
        """Across salts, weight-5 rows must be sampled far more often
        than weight-1 rows (distributional sanity of the A-ES keys)."""
        from mini_data_platform_spark.operators.corpus import (
            weighted_sample,
        )

        df = spark.range(200).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 100, 5).otherwise(1).alias("wt"),
        )
        heavy = light = 0
        for s in range(8):
            got = weighted_sample(
                df, "doc_id", "wt", 40, salt=f"s{s}", validate=False
            ).collect()
            heavy += sum(1 for r in got if r["doc_id"] < 100)
            light += sum(1 for r in got if r["doc_id"] >= 100)
        # expected inclusion ratio ~5:1 at small k/n; demand >= 2:1
        assert heavy > 2 * light
