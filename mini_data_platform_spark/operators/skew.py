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


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed fact-dim equi-join without broadcast: each FACT row gets
    one random salt, the DIM side is replicated across all ``n_salts``,
    and the join runs on ``keys + [_salt]`` — a hot fact key's rows
    spread over ``n_salts`` reducers instead of funneling into one.
    Result ≡ ``facts.join(dim, keys, how)`` exactly (every fact row
    still meets every matching dim row, under exactly one salt).

    When to use: the dim side is too big to broadcast (else broadcast
    and there is no shuffle to skew) AND AQE's skew-join splitting is
    unavailable or defeated (e.g. the skew hides behind an exchange
    reuse, or the engine is pinned pre-AQE). The price is shuffling
    ``n_salts×`` the dim side — right when facts ≫ dim, wrong when the
    sides are comparable. AQE remains the first resort; this is the
    explicit dial (same doctrine as ``salted_agg`` vs map-side combine).

    ``how``: 'inner' or 'left' (fact-preserving). Dim-preserving joins
    ('right'/'full') would need the REPLICATED dim deduped back —
    unsupported rather than subtly wrong.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    overlap = set(facts.columns) & set(dim.columns) - set(keys)
    if overlap:
        raise ValueError(
            f"non-key columns {sorted(overlap)} exist on both sides; "
            "rename before joining (salting cannot disambiguate them)"
        )
    if "_salt" in facts.columns or "_salt" in dim.columns:
        # withColumn would silently overwrite it and drop() would then
        # destroy user data the plain join preserves
        raise ValueError(
            "'_salt' is this operator's working column; rename it on "
            "the input first"
        )
    f = facts.withColumn(
        "_salt", (F.rand(seed=0) * n_salts).cast("int")
    )
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return f.join(d, [*keys, "_salt"], how).drop("_salt")
