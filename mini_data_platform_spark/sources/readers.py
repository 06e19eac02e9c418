"""Multi-format file readers (SURVEY.md §2.1 S2-S5).

Each reader produces a DataFrame with normalized column names
(strip().lower(), /root/reference/dags/src/processor.py:40). The
string-mode variants reproduce the reference's read-everything-as-text
discipline (``pd.read_csv(dtype=str)``, processor.py:23): coercion with
defaults happens later in operators/clean.py, so a bad cell can never
fail a read.

Scale notes:
- these take paths (or glob patterns / directories) — Spark parallelizes
  multi-file and splittable-file reads natively; nothing is ever
  downloaded driver-side.
- CSV/JSON readers run in PERMISSIVE mode with a ``_corrupt_record``
  column available for row-granular quarantine; the file-granular
  verdict (matching the reference) lives in sources/validate.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mini_data_platform_spark.sources.formats import (
    detect_format_path,
    sniff_json_layout_path,
)

CORRUPT_COL = "_corrupt_record"


def normalize_column_names(df: DataFrame) -> DataFrame:
    return df.toDF(*[c.strip().lower() for c in df.columns])


def read_csv(spark: SparkSession, path: str) -> DataFrame:
    """Header CSV, every column string (no inferSchema — Spark's default
    string-types-everything matches pandas dtype=str)."""
    return normalize_column_names(
        spark.read.option("header", True).option("mode", "PERMISSIVE").csv(path)
    )


def read_json_array(spark: SparkSession, path: str) -> DataFrame:
    """Whole-file JSON array (multiLine), one row per element."""
    return normalize_column_names(
        spark.read.option("multiLine", True).json(path)
    )


def read_ndjson(spark: SparkSession, path: str) -> DataFrame:
    """Line-delimited JSON (Spark's default JSON mode)."""
    return normalize_column_names(spark.read.json(path))


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return normalize_column_names(spark.read.parquet(path))


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC (beyond the reference's format set — Spark-native columnar
    reader with the same pushdown/pruning machinery as parquet)."""
    return normalize_column_names(spark.read.orc(path))


def read_file(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """Format-dispatched read (reference read_bytes_to_df,
    processor.py:15-41): csv → all-string; json → array vs ndjson sniff;
    parquet → typed."""
    fmt = fmt or detect_format_path(path)
    if fmt == "csv":
        return read_csv(spark, path)
    if fmt == "json":
        if sniff_json_layout_path(path) == "array":
            return read_json_array(spark, path)
        return read_ndjson(spark, path)
    if fmt == "parquet":
        return read_parquet(spark, path)
    if fmt == "orc":
        return read_orc(spark, path)
    raise ValueError(f"Unsupported format: {fmt}")


def read_file_as_strings(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """``read_file`` then cast every column to string — the canonical input
    to the cleaning pipeline, so JSON numbers / parquet types flow through
    the exact same coercion rules as CSV text."""
    df = read_file(spark, path, fmt)
    return df.select(*[F.col(c).cast("string").alias(c) for c in df.columns])


def read_csv_tracking_corrupt(spark: SparkSession, path: str, schema) -> DataFrame:
    """Row-level quarantine variant (SURVEY.md V4): typed PERMISSIVE read
    where rows that fail the schema land intact in ``_corrupt_record``
    instead of failing the file. Complements the file-granularity
    validators: use this when a file is broadly healthy and only stray
    rows should quarantine. ``schema`` must NOT already contain the
    corrupt column."""
    from pyspark.sql import types as T

    full = T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    return normalize_column_names(
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(full)
        .csv(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good_rows, corrupt_rows): good rows drop the tracking column;
    corrupt rows keep the raw line for the quarantine sink. The cache is
    required — Spark refuses plans that filter on only the internal
    corrupt column of an uncached PERMISSIVE read (the parser would have
    pruned the data columns away)."""
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_record")
    )
    return good, bad
