"""Count-min sketch — mergeable frequency estimates in fixed memory.

Completes the engine's sketch family (HLL distinct counts, Misra-Gries
heavy hitters, Bloom membership, MinHash/SimHash similarity): CMS
answers "about how often does key x occur" for EVERY key in
depth × width counters, where exact per-key counts would need one row
per distinct key (Cormode & Muthukrishnan, "An improved data stream
summary: the count-min sketch", J. Algorithms 2005). Estimates
OVERCOUNT only: each of the ``depth`` rows hashes x to one of ``width``
counters holding the sum of all colliding keys' counts, and the estimate
is the MIN over rows — ≥ the true count always, ≤ true + εN with
probability 1−δ for width = e/ε, depth = ln(1/δ).

Spark shape: the sketch BUILD is one explode (depth rows per input row)
+ one groupBy(row, bucket) count — map-side partial aggregation
collapses each partition to ≤ depth × width cells, so the shuffle
carries the SKETCH, not the data; at 100 TB that is the entire point.
Sketches merge by cell-wise addition (union streams, shard combine),
which the build's own partial aggregation already exploits.

The hash family is the repo's engine-independent md5 bucketing
(operators/corpus.hash_bucket — salt "cms0", "cms1", ... per row), so
the counter table is DETERMINISTIC and the SQL oracle reproduces it
cell-for-cell; the probabilistic part (estimation error) is pinned by
property tests, not the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mini_data_platform_spark.operators.corpus import (
    hash_bucket,
    sql_hash_bucket,
)

#: salt prefix for the CMS hash family (one salt per depth row)
CMS_SALT = "cms"


def cms_table(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Build the count-min counter table for ``col``: one row per
    non-empty cell, (row, bucket, n) with ``row`` in [0, depth). Null
    keys are excluded (consistent with the heavy-hitters contract).
    Deterministic — same input, same table, any partitioning."""
    src = df.select(F.col(col)).where(F.col(col).isNotNull())
    cells = src.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        hash_bucket(
                            F.col(col), f"{CMS_SALT}{d}", width
                        ).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c")
    )
    return (
        cells.select("c.row", "c.bucket")
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("n"))
    )


def sql_cms_table(src: str, id_expr: str, depth: int = 4, width: int = 64) -> str:
    """DuckDB twin of :func:`cms_table` over source ``src``."""
    rows = "\n            UNION ALL\n".join(
        f"""            SELECT {d} AS row,
                   {sql_hash_bucket(id_expr, f"{CMS_SALT}{d}", width)} AS bucket
            FROM ({src}) WHERE {id_expr} IS NOT NULL"""
        for d in range(depth)
    )
    return f"""
        SELECT row, bucket, COUNT(*) AS n
        FROM (
{rows}
        )
        GROUP BY row, bucket
    """


def cms_estimate(
    cells: list[tuple[int, int, int]],
    key,
    depth: int = 4,
    width: int = 64,
) -> int:
    """Point estimate for ``key`` from a collected counter table
    (list of (row, bucket, n)): min over rows of the key's cell. The
    driver-side helper mirrors how a serving layer would use the sketch
    (the table is depth × width longs — KBs, not data).

    Supported key types: int and str ONLY — for these Python's string
    form matches Spark's ``CAST(key AS STRING)`` that built the table
    (bool is mapped to Spark's lowercase form). Floats and other types
    are refused: their Python repr diverges from Spark's cast (e.g.
    ``1e20`` vs ``1.0E20``), which would silently hash to the wrong cell.
    Query those through a Spark-side lookup against :func:`cms_table`
    instead."""
    import hashlib

    if isinstance(key, bool):
        key = "true" if key else "false"
    elif not isinstance(key, (int, str)):
        raise TypeError(
            f"cms_estimate supports int/str keys only, got {type(key).__name__}: "
            "Python's string form of other types diverges from Spark's "
            "CAST(... AS STRING) used to build the table"
        )
    table: dict[tuple[int, int], int] = {
        (r, b): n for r, b, n in cells
    }
    est = None
    for d in range(depth):
        h = hashlib.md5(f"{CMS_SALT}{d}#{key}".encode()).hexdigest()
        bucket = int(h[:4], 16) % width
        v = table.get((d, bucket), 0)
        est = v if est is None else min(est, v)
    return int(est or 0)
