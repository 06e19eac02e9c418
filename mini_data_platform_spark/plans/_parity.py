"""Cross-engine numeric parity helpers.

Problem: floating-point SUM/AVG are order-dependent, and Spark's partial
aggregation order is nondeterministic across partitions — so a double sum
can differ between two Spark runs, let alone between Spark and a DuckDB
oracle. Row counts and grouping keys match, value hashes don't.

Solution used by every query in this library: compute each per-row term in
DOUBLE (IEEE-754 ops are deterministic and identical across engines for the
same inputs), then aggregate as a high-precision DECIMAL — decimal addition
is exact and associative, hence order-independent — and cast the final
aggregate back to DOUBLE. Both engines then produce bit-identical values.

The decimal scale (6) is chosen to match the data's true fixed-point
precision: money columns are 2-decimal values, so any product of two of
them is exact on the 1e-4 grid, and a scale-6 cast recovers the exact true
value in BOTH engines — even though their double->decimal conversion paths
round differently in the far digits (DuckDB converts via a double multiply
by 10^scale, Spark via exact BigDecimal HALF_UP; they can disagree at
scale 12, never at scale 6 for 4dp-true data). DECIMAL(30,6) holds
|x| < 1e24: headroom for 100 TB-scale sums while staying well inside both
engines' 38-digit width. This isn't only an oracle trick — deterministic
aggregates are a real engine feature (re-runs of a 1000-executor job
produce identical bytes).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEC = "decimal(30,6)"


def dsum(col: Column) -> Column:
    """Order-independent, cross-engine-deterministic sum of a double column.
    SQL oracle equivalent: CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE)."""
    return F.sum(col.cast(DEC)).cast("double")


def davg(col: Column) -> Column:
    """Deterministic average: exact decimal sum divided by count, in double.
    SQL oracle: CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE) / COUNT(x)."""
    return F.sum(col.cast(DEC)).cast("double") / F.count(col)


def sql_dsum(expr: str) -> str:
    """Oracle-side text for :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """Oracle-side text for :func:`davg`."""
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE) / COUNT({expr}))"
