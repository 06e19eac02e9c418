"""Property-based invariants (SURVEY.md §5.4) over the cleaning/dedup
pipeline: idempotence, key uniqueness, row conservation. Few examples,
arbitrary-ish data — each example is a real Spark job, so the budget is
spent on input diversity, not example count."""

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import types as T

from mini_data_platform_spark.operators.clean import clean_sales
from mini_data_platform_spark.operators.dedup import dedup_keep_latest, with_ingest_order

_CELL = st.one_of(
    st.none(),
    st.just("nan"),
    st.just(""),
    st.just("  padded  "),
    st.just("2024-03-04 05:06:07"),
    st.just("not a date"),
    st.just("12.5"),
    st.just("-3"),
    st.text(alphabet="abc123 .", max_size=8),
)

_ROW = st.tuples(
    st.one_of(st.none(), st.just("nan"), st.sampled_from(["k1", "k2", "k3", " k1 "])),
    _CELL,  # sale_date
    _CELL,  # customer_id
    _CELL,  # product_id
    _CELL,  # quantity
    _CELL,  # amount
)

_RAW_SCHEMA = T.StructType(
    [
        T.StructField(c, T.StringType(), True)
        for c in ("sale_id", "sale_date", "customer_id", "product_id", "quantity", "amount")
    ]
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _df(spark, rows):
    return spark.createDataFrame(rows, _RAW_SCHEMA)


class TestCleanProperties:
    @given(rows=st.lists(_ROW, min_size=0, max_size=15))
    @_SETTINGS
    def test_clean_is_idempotent(self, spark, rows):
        once = clean_sales(_df(spark, rows))
        # re-cleaning the (stringified) cleaned output changes nothing
        restrung = once.selectExpr(
            "sale_id",
            "date_format(sale_date, 'yyyy-MM-dd HH:mm:ss') AS sale_date",
            "customer_id", "product_id",
            "CAST(quantity AS STRING) AS quantity",
            "CAST(amount AS STRING) AS amount",
        )
        twice = clean_sales(restrung)
        from collections import Counter

        assert Counter(map(tuple, once.collect())) == Counter(map(tuple, twice.collect()))

    @given(rows=st.lists(_ROW, min_size=0, max_size=15))
    @_SETTINGS
    def test_no_null_keys_and_types(self, spark, rows):
        out = clean_sales(_df(spark, rows))
        collected = out.collect()
        assert all(r["sale_id"] is not None for r in collected)
        assert all(r["quantity"] is not None for r in collected)  # default 1
        assert all(r["amount"] is not None for r in collected)    # default 0.0
        assert dict(out.dtypes)["quantity"] == "int"
        assert dict(out.dtypes)["amount"] == "double"


class TestDedupProperties:
    @given(rows=st.lists(_ROW, min_size=0, max_size=20))
    @_SETTINGS
    def test_dedup_unique_keys_and_conservation(self, spark, rows):
        cleaned = with_ingest_order(clean_sales(_df(spark, rows)))
        out = dedup_keep_latest(cleaned).collect()
        keys = [r["sale_id"] for r in out]
        assert len(keys) == len(set(keys))
        distinct_in = {r["sale_id"] for r in cleaned.select("sale_id").collect()}
        assert set(keys) == distinct_in

    @given(rows=st.lists(_ROW, min_size=1, max_size=20))
    @_SETTINGS
    def test_survivor_is_from_input(self, spark, rows):
        cleaned = clean_sales(_df(spark, rows))
        inputs = {tuple(r) for r in cleaned.collect()}
        out = dedup_keep_latest(cleaned)
        assert all(tuple(r) in inputs for r in out.collect())


class TestAsofDifferential:
    """asof_join vs pandas merge_asof — an independent reference
    implementation of the backward-inclusive contract (the reference
    repo's own engine, pandas, arbitrating our Spark operator)."""

    _TS = st.integers(min_value=0, max_value=20)
    _KEY = st.sampled_from(["u1", "u2"])

    @given(
        left=st.lists(st.tuples(_KEY, _TS), min_size=1, max_size=10),
        right=st.lists(
            st.tuples(_KEY, _TS, st.one_of(st.none(), st.integers(0, 99))),
            min_size=0,
            max_size=10,
        ),
    )
    @_SETTINGS
    def test_matches_pandas_merge_asof(self, spark, left, right):
        import pandas as pd

        from mini_data_platform_spark.operators.asof import asof_join

        # unique (key, ts) per side: merge_asof tie order within equal ts
        # is positional, ours is unspecified — dedupe to compare exactly
        left = list({(k, t): None for k, t in left})
        right_d = {(k, t): v for k, t, v in right}
        right = [(k, t, v) for (k, t), v in right_d.items()]

        ldf = spark.createDataFrame(
            [(k, t, i) for i, (k, t) in enumerate(left)],
            "key string, ts long, lid long",
        )
        if right:
            rdf = spark.createDataFrame(right, "key string, rts long, payload long")
        else:
            rdf = spark.createDataFrame([], "key string, rts long, payload long")
        got = {
            r["lid"]: (r["rts"], r["payload"])
            for r in asof_join(
                ldf, rdf, on=["key"], left_ts="ts", right_ts="rts"
            ).collect()
        }

        lpd = pd.DataFrame(
            [(k, t, i) for i, (k, t) in enumerate(left)],
            columns=["key", "ts", "lid"],
        ).sort_values("ts", kind="stable")
        rpd = pd.DataFrame(
            {
                "key": pd.Series([k for k, _, _ in right], dtype=object),
                "rts": pd.Series([t for _, t, _ in right], dtype="int64"),
                "payload": pd.Series(
                    [v for _, _, v in right], dtype="float64"
                ),
            }
        ).sort_values("rts", kind="stable")
        merged = pd.merge_asof(
            lpd, rpd, left_on="ts", right_on="rts", by="key", direction="backward"
        )
        for _, row in merged.iterrows():
            want_rts = None if pd.isna(row["rts"]) else int(row["rts"])
            want_pay = None if pd.isna(row["payload"]) else int(row["payload"])
            assert got[int(row["lid"])] == (want_rts, want_pay), (
                f"lid={row['lid']}: spark={got[int(row['lid'])]} "
                f"pandas=({want_rts}, {want_pay})"
            )


class TestSaltedAggDifferential:
    """salted_agg must be value-identical to the plain groupBy it
    replaces, for every decomposable aggregate, under any skew."""

    @given(
        rows=st.lists(
            st.tuples(
                st.sampled_from(["hot", "k1", "k2"]),  # 'hot' dominates: skew
                st.integers(min_value=-1000, max_value=1000),
            ),
            min_size=1,
            max_size=40,
        ),
        n_salts=st.sampled_from([1, 2, 7]),
    )
    @_SETTINGS
    def test_equals_plain_groupby(self, spark, rows, n_salts):
        from pyspark.sql import functions as F

        from mini_data_platform_spark.operators.skew import salted_agg

        df = spark.createDataFrame(rows, "key string, v long")
        got = {
            r["key"]: (r["n"], r["total"], r["lo"], r["hi"])
            for r in salted_agg(
                df,
                ["key"],
                {
                    "n": ("count", "*"),
                    "total": ("sum", "v"),
                    "lo": ("min", "v"),
                    "hi": ("max", "v"),
                },
                n_salts=n_salts,
            ).collect()
        }
        want = {
            r["key"]: (r["n"], r["total"], r["lo"], r["hi"])
            for r in df.groupBy("key")
            .agg(
                F.count("*").alias("n"),
                F.sum("v").alias("total"),
                F.min("v").alias("lo"),
                F.max("v").alias("hi"),
            )
            .collect()
        }
        assert got == want


class TestJaccardProperties:
    """jaccard_pairs_from (array_intersect formulation) vs a Python set
    reference on random corpora: exact n_inter and jaccard for every
    candidate pair, including empty-token docs and identical texts."""

    _WORD = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
    _DOC = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)

    @given(texts=st.lists(_DOC, min_size=2, max_size=8))
    @_SETTINGS
    def test_matches_python_set_reference(self, spark, texts):
        from mini_data_platform_spark.operators.dedup_fuzzy import (
            _staged_shingles,
            jaccard_pairs_from,
        )

        n = 3
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        # all pairs as candidates — exercises the join fully
        pairs = spark.createDataFrame(
            [(a, b) for a in range(len(texts)) for b in range(a + 1, len(texts))],
            "id_a long, id_b long",
        )
        if pairs.count() == 0:
            return
        sh = _staged_shingles(docs, "doc_id", "text", n)
        got = {
            (r["id_a"], r["id_b"]): (r["n_inter"], r["jaccard"])
            for r in jaccard_pairs_from(sh, pairs, "doc_id").collect()
        }

        def shingle_set(t):
            toks = t.split()
            return {
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            } if len(toks) >= n else set()

        sets = [shingle_set(t) for t in texts]
        for a in range(len(texts)):
            for b in range(a + 1, len(texts)):
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                want_j = inter / union if union else None
                got_inter, got_j = got[(a, b)]
                assert got_inter == inter
                if want_j is None:
                    assert got_j is None  # 0/0 -> null, ANSI off
                else:
                    assert abs(got_j - want_j) < 1e-12


class TestBloomProperties:
    """Bloom filter invariant that must hold for ANY key set: zero false
    negatives, whatever the values, types aside (long keys here; the
    string path is unit-tested)."""

    @_SETTINGS
    @given(
        keys=st.lists(
            st.integers(min_value=-(2**62), max_value=2**62),
            min_size=1,
            max_size=60,
            unique=True,
        ),
        num_bits=st.sampled_from([64, 256, 4096]),
        num_hashes=st.integers(min_value=1, max_value=6),
    )
    def test_no_false_negatives_ever(self, spark, keys, num_bits, num_hashes):
        from mini_data_platform_spark.operators.bloomjoin import (
            build_bloom_words,
            might_contain,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(k,) for k in keys], "k long")
        words = build_bloom_words(df, "k", num_bits, num_hashes)
        hits = df.where(
            might_contain(words, F.col("k"), num_hashes)
        ).count()
        assert hits == len(keys)


class TestHeavyHitterProperties:
    @_SETTINGS
    @given(
        counts=st.dictionaries(
            st.text(alphabet="abcdef", min_size=1, max_size=3),
            st.integers(min_value=1, max_value=40),
            min_size=1,
            max_size=12,
        ),
        threshold=st.integers(min_value=2, max_value=30),
    )
    def test_exactly_group_by_having(self, spark, counts, threshold):
        from mini_data_platform_spark.operators.heavyhitters import heavy_hitters
        from pyspark.sql import functions as F

        rows = [(k,) for k, n in counts.items() for _ in range(n)]
        df = spark.createDataFrame(rows, "k string").repartition(4)
        got = {
            (r["k"], r["n"])
            for r in heavy_hitters(
                df, "k", min_count=threshold, k_counters=256
            ).collect()
        }
        want = {
            (k, n) for k, n in counts.items() if n >= threshold
        }
        assert got == want


class TestIvmProperties:
    """Property: for ANY facts and ANY batching (including empty
    batches), the maintained view equals the one-shot aggregate — and a
    random interleaving of CDC inserts/deletes lands on the recompute of
    the surviving rows."""

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[
            HealthCheck.function_scoped_fixture,
            HealthCheck.too_slow,
        ],
    )
    @given(
        rows=st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c"]),
                st.one_of(
                    st.none(),
                    st.floats(
                        min_value=-100, max_value=100,
                        allow_nan=False, allow_infinity=False,
                        width=16,
                    ),
                ),
            ),
            min_size=1, max_size=24,
        ),
        cuts=st.lists(
            st.integers(min_value=0, max_value=24), max_size=3
        ),
    )
    def test_any_batching_equals_recompute(self, spark, tmp_path_factory, rows, cuts):
        import shutil
        import tempfile

        from mini_data_platform_spark.operators.ivm import (
            view_build,
            view_increment,
            view_read,
        )

        d = tempfile.mkdtemp(prefix="ivmprop_", dir=str(tmp_path_factory.getbasetemp()))
        shutil.rmtree(d, ignore_errors=True)
        bounds = sorted({min(c, len(rows)) for c in cuts})
        batches, prev = [], 0
        for b in [*bounds, len(rows)]:
            batches.append(rows[prev:b])
            prev = b
        schema = "k string, amount double"
        first, rest = batches[0], batches[1:]
        view_build(
            spark.createDataFrame(first, schema), d, ["k"],
            {"total": ("sum", "amount"), "n": ("count", "*")},
        )
        for b in rest:
            view_increment(spark.createDataFrame(b, schema), d)
        got = {
            r["k"]: (r["total"], r["n"])
            for r in view_read(spark, d).collect()
        }
        want = {}
        for k, a in rows:
            t, n = want.get(k, (None, 0))
            if a is not None:
                t = a if t is None else t + a
            want[k] = (t, n + 1)
        assert set(got) == set(want)
        for k, (t, n) in want.items():
            assert got[k][1] == n
            if t is None:
                assert got[k][0] is None
            else:
                # tolerance covers the DECIMAL(30,6) per-row quantization (5e-7
                # each) the view's exact-decimal states apply by design
                assert abs(got[k][0] - t) <= 5e-7 * len(rows) + 1e-9
