"""Skew-handling aggregation: two-stage salted aggregate.

AQE's skew-join splitting handles skewed JOINS automatically, but a
``groupBy`` over a power-law key (the common case in event/clickstream
data: one hot user, one hot URL) still funnels every hot-key row into a
single reducer. The standard fix is salting: partial-aggregate on
(key, salt) — spreading each hot key over ``n_salts`` reducers — then
merge the partials per key. Two narrow shuffles of pre-aggregated data
instead of one skewed shuffle of raw rows.

Only decomposable aggregates can be merged (sum/count/min/max; avg as
sum+count); that's the price of the pattern and why the API is explicit
about the merge rule.

When to use: keys whose row counts differ by orders of magnitude AND the
per-partition partial agg doesn't already collapse them (it usually does
for plain groupBy — Spark's partial aggregation is itself a salt-by-
partition — so reach for this only when the map-side hash table spills:
very high distinct-key counts per partition with a hot tail).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

#: aggregate -> (partial fn, merge fn)
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregate: ``aggs`` maps output column name ->
    (fn, input column) with fn in {sum, count, min, max}.

    ``salted_agg(df, ["user_id"], {"n": ("count", "*"), "total": ("sum",
    "value")})`` ≡ ``df.groupBy("user_id").agg(count("*"), sum("value"))``
    with hot keys spread over ``n_salts`` reducers.
    """
    unknown = [fn for fn, _ in aggs.values() if fn not in _MERGEABLE]
    if unknown:
        raise ValueError(f"non-decomposable aggregate(s): {unknown}")

    salt = (F.rand(seed=0) * n_salts).cast("int").alias("_salt")
    partial_cols = []
    merge_cols = []
    for out, (fn, col) in aggs.items():
        partial_fn, merge_fn = _MERGEABLE[fn]
        src = F.lit(1) if col == "*" and fn == "count" else F.col(col)
        partial_cols.append(partial_fn(src).alias(f"_p_{out}"))
        merge_cols.append(merge_fn(f"_p_{out}").alias(out))

    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*partial_cols)
    )
    return partial.groupBy(*keys).agg(*merge_cols)
