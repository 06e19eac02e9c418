"""Bucketed range join — interval/point containment at scale.

Spark executes a raw theta-join (``a.ts BETWEEN b.start AND b.end``)
as BroadcastNestedLoopJoin (|L|·|R| comparisons) — fine for a small side,
fatal when both sides are large. The scale-path rewrite is bucketing:
quantize time into ``bucket_width`` cells, explode each right interval to
the buckets it overlaps, equi-join on (keys…, bucket), then apply the
exact predicate. Cost ∝ truly-overlapping candidates (plus interval_len /
bucket_width duplicates, deduped), and the equi-join shuffles, AQE-skew-
splits and codegens like any other hash join.

This is the same rewrite DuckDB/Databricks apply internally for range
joins (published as "range join optimization" / IEJoin literature); the
oracle uses the naive inequality join, which is exactly what the rewrite
must reproduce.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def range_join_point_interval(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    point: str,
    start: str,
    end: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join left points into right intervals: ``start <= point < end``
    (half-open), equi-matching ``on`` keys first. ``point``/``start``/
    ``end`` are integral columns (e.g. unix micros); ``bucket_width`` in
    the same unit trades duplicate factor (wide intervals explode to more
    buckets) against candidate precision.

    Output: left columns + right's non-key columns. ``how="left"`` keeps
    match-less left rows with null right payload.
    """
    on = list(on)
    lb = (F.col(point) / bucket_width).cast("long").alias("_bucket")
    l_tagged = left.withColumn("_bucket", lb)

    n_buckets = (
        (F.col(end) - 1) / bucket_width - (F.col(start) / bucket_width).cast("long")
    ).cast("long") + 1
    r_exploded = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(start) / bucket_width).cast("long"),
                (F.col(start) / bucket_width).cast("long") + n_buckets - 1,
            )
        ),
    )

    joined = l_tagged.join(r_exploded, [*on, "_bucket"], "inner").where(
        (F.col(start) <= F.col(point)) & (F.col(point) < F.col(end))
    )
    # a (left,right) pair matches in exactly one bucket (the point's), so
    # no dedup is needed despite the interval exploding to many buckets
    out = joined.drop("_bucket")
    if how == "left":
        matched = out
        missing = left.join(
            matched.select(*left.columns).distinct(), left.columns, "left_anti"
        )
        pad = [
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in out.columns
            if c not in left.columns
        ]
        out = matched.unionByName(missing.select(*left.columns, *pad))
    return out
