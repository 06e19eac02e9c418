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
