"""Bucketed-table sink — co-located joins without a shuffle.

At 100 TB the dominant cost of fact⋈fact joins is shuffling both sides on
the join key. Writing the tables bucketed on that key (same bucket count)
lets Spark plan a shuffle-free sort-merge join: bucket i of the left reads
against bucket i of the right, no Exchange on either side. Bucketing also
accelerates keyed upserts and dedup (the window's hash partitioning
matches the bucket layout).

Spark's bucketing requires the catalog (``saveAsTable``) — bucket
metadata lives in the metastore, not the parquet files. These helpers
wrap that and a bucket-aware reader; tests/test_bucketed.py asserts the
no-Exchange property on the joined plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally sorted)
    on ``bucket_cols``. Sorting within buckets additionally gives
    row-group min/max pruning on the sort key and removes the sort from
    downstream sort-merge joins."""
    writer = df.write.format("parquet").mode(mode).bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucket metadata (and therefore shuffle elision)
    only applies through the catalog, never through path-based reads."""
    return spark.table(table)
