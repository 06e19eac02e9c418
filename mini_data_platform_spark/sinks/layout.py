"""Partitioned data layout — directory-level partition pruning.

The third leg of the 100 TB layout strategy alongside bucketing
(sinks/bucketed.py — shuffle-free keyed joins) and compaction
(sinks/compact.py — small-file control): partition the storage directory
tree by a LOW-cardinality column (almost always the event/order date) so
time-ranged queries never open irrelevant files at all. Catalyst turns a
filter on the partition column into ``PartitionFilters`` — pruning happens
at file-listing time, before any IO — which is the difference between
scanning one day and scanning three years.

Discipline encoded here:
- partition columns must be LOW cardinality (dates, regions — never ids):
  each distinct value is a directory; high-cardinality partitioning
  creates the million-small-files failure mode compaction exists to fix.
- partition by a DERIVED day/month column while keeping the original
  timestamp intact — queries filter whichever is natural, and the
  double-write costs one string column per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: derived partition column name
DAY_COL = "p_day"


def write_day_partitioned(
    df: DataFrame,
    target_dir: str,
    ts_col: str,
    mode: str = "overwrite",
) -> None:
    """Write parquet partitioned by the day of ``ts_col`` (directory per
    day: ``p_day=2024-01-01/...``). The source timestamp column is kept."""
    out = df.withColumn(DAY_COL, F.date_format(F.col(ts_col), "yyyy-MM-dd"))
    out.write.partitionBy(DAY_COL).mode(mode).parquet(target_dir)


def read_day_partitioned(spark: SparkSession, target_dir: str) -> DataFrame:
    """Read back a day-partitioned directory. Filters on ``p_day`` (or
    anything Catalyst can fold to it) prune partitions at listing time —
    assert via ``PartitionFilters`` in the scan node."""
    return spark.read.parquet(target_dir)
