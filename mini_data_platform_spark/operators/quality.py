"""Declarative data-quality checks — the reference's own declared future
work (/root/reference/README.md:178 "data-quality checks") implemented as
a first-class operator.

A check is (name, violation-predicate). ``dq_report`` evaluates EVERY
check in ONE aggregation pass over the data (conditional counts compiled
into a single partial+final hash agg — at 100 TB this costs one scan, not
one scan per check), then unpivots the single aggregate row into a
(check_name, n_rows, n_violations, passed) report.

Uniqueness rides the same pass as ``count(*) - count(DISTINCT key)``
(duplicate count over non-null keys; null keys belong to a not_null
check — count(DISTINCT) ignores nulls in both Spark and ANSI SQL).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Check:
    name: str
    violation: Column  # boolean — True means the row violates the check


def not_null(col: str) -> Check:
    return Check(f"not_null_{col}", F.col(col).isNull())


def in_range(col: str, lo: float, hi: float) -> Check:
    """Violated when outside [lo, hi]; nulls do NOT violate (pair with
    not_null when absence itself is a defect)."""
    c = F.col(col)
    return Check(
        f"in_range_{col}", c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))
    )


def in_set(col: str, values: list) -> Check:
    c = F.col(col)
    return Check(f"in_set_{col}", c.isNotNull() & ~c.isin(values))


def matches(col: str, regex: str) -> Check:
    c = F.col(col)
    return Check(f"matches_{col}", c.isNotNull() & ~c.rlike(regex))


def dq_report(
    df: DataFrame,
    checks: list[Check],
    unique_keys: list[str] | None = None,
) -> DataFrame:
    """Evaluate all checks in one pass. Returns one row per check:
    (check_name, n_rows, n_violations, passed)."""
    if not checks and not unique_keys:
        raise ValueError("dq_report needs at least one check or unique_keys")
    aggs = [F.count("*").alias("_n")]
    names = []
    for c in checks:
        aggs.append(
            F.sum(F.when(c.violation, 1).otherwise(0)).alias(f"_v_{c.name}")
        )
        names.append(c.name)
    if unique_keys:
        uname = "unique_" + "_".join(unique_keys)
        all_set = F.lit(True)
        for k in unique_keys:
            all_set = all_set & F.col(k).isNotNull()
        # duplicates among fully-non-null keys: count(DISTINCT ...) excludes
        # any-null rows (SQL standard), so the baseline must too — null keys
        # are a not_null check's business, not a uniqueness violation
        aggs.append(
            (
                F.count(F.when(all_set, 1))
                - F.count_distinct(*[F.col(k) for k in unique_keys])
            ).alias(f"_v_{uname}")
        )
        names.append(uname)

    wide = df.agg(*aggs)
    long = wide.unpivot(
        ids=["_n"],
        values=[f"_v_{n}" for n in names],
        variableColumnName="_check",
        valueColumnName="n_violations",
    )
    return long.select(
        F.expr("substring(_check, 4)").alias("check_name"),
        F.col("_n").alias("n_rows"),
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )
