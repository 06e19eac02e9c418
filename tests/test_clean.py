"""Pandas-parity cleaning tests (SURVEY.md §5.1 / FIXTURES.md §A2).

Each case name cites the reference behavior it reproduces
(/root/reference/dags/src/processor.py:44-81).
"""

import datetime

from pyspark.sql import Row

from mini_data_platform_spark.operators.clean import (
    clean_sales,
    clean_strings,
    coerce_double,
    coerce_int,
    coerce_timestamp,
    conform,
    drop_null_keys,
    normalize_column_names,
)
from pyspark.sql import functions as F


def _raw(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_normalize_column_names(spark):
    df = _raw(spark, [("a",)], [" Sale_ID "])
    assert normalize_column_names(df).columns == ["sale_id"]


def test_conform_adds_missing_drops_extras_reorders(spark):
    df = _raw(spark, [("x", "c9", "noise")], ["product_id", "customer_id", "comment"])
    out = conform(df)
    assert out.columns == ["sale_id", "sale_date", "customer_id", "product_id", "quantity", "amount"]
    row = out.collect()[0]
    assert row.sale_id is None and row.customer_id == "c9" and row.product_id == "x"


def test_nan_sentinel_and_trim(spark):
    df = _raw(spark, [("  CUST-1  ",), ("nan",), ("",), (None,)], ["customer_id"])
    vals = [r.customer_id for r in clean_strings(df).collect()]
    assert vals == ["CUST-1", None, None, None]


def test_date_coercion_null_on_failure_row_kept(spark):
    df = _raw(spark, [("2024-03-01 10:00:00",), ("not-a-date",)], ["d"])
    out = df.select(coerce_timestamp(F.col("d")).alias("d")).collect()
    assert out[0].d == datetime.datetime(2024, 3, 1, 10, 0, 0)
    assert out[1].d is None  # row kept, value null (processor.py:64)


def test_quantity_coercion_truncates_and_defaults(spark):
    df = _raw(spark, [("12.5",), ("abc",), (None,), ("7",)], ["q"])
    vals = [r.q for r in df.select(coerce_int(F.col("q")).alias("q")).collect()]
    assert vals == [12, 1, 1, 7]  # "12.5"->12 via double; unparseable->1


def test_amount_coercion_defaults_zero(spark):
    df = _raw(spark, [("19.99",), ("abc",), (None,)], ["a"])
    vals = [r.a for r in df.select(coerce_double(F.col("a")).alias("a")).collect()]
    assert vals == [19.99, 0.0, 0.0]


def test_drop_null_keys(spark):
    df = _raw(spark, [("s1", "x"), (None, "y")], ["sale_id", "v"])
    assert drop_null_keys(df).count() == 1


def test_clean_sales_end_to_end(spark):
    rows = [
        Row(**{" Sale_ID ": "s1", "sale_date": "2024-01-02 03:04:05", "customer_id": "  CUST-9 ",
               "product_id": "nan", "quantity": "12.5", "amount": "bad", "comment": "extra"}),
        Row(**{" Sale_ID ": None, "sale_date": "x", "customer_id": "c", "product_id": "p",
               "quantity": "1", "amount": "2", "comment": "dropped-null-key"}),
    ]
    df = spark.createDataFrame(rows)
    out = clean_sales(df)
    assert out.columns == ["sale_id", "sale_date", "customer_id", "product_id", "quantity", "amount"]
    got = out.collect()
    assert len(got) == 1
    r = got[0]
    assert r.sale_id == "s1"
    assert r.customer_id == "CUST-9"
    assert r.product_id is None
    assert r.quantity == 12
    assert r.amount == 0.0
    assert r.sale_date == datetime.datetime(2024, 1, 2, 3, 4, 5)


def test_clean_sales_missing_columns_get_defaults(spark):
    df = _raw(spark, [("s1",)], ["sale_id"])
    r = clean_sales(df).collect()[0]
    assert (r.quantity, r.amount, r.sale_date, r.customer_id) == (1, 0.0, None, None)


def test_clean_is_idempotent(spark):
    df = _raw(
        spark,
        [("s1", "2024-01-02 03:04:05", " c ", "nan", "12.5", "7.25")],
        ["sale_id", "sale_date", "customer_id", "product_id", "quantity", "amount"],
    )
    once = clean_sales(df)
    twice = clean_sales(once)
    assert [tuple(r) for r in once.collect()] == [tuple(r) for r in twice.collect()]
