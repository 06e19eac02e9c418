"""As-of (merge-asof / point-in-time) join — an operator Spark lacks natively.

``asof_join(left, right, ...)`` attaches, to every left row, the most recent
right row with the same key and ``right_ts <= left_ts`` (backward direction).

Spark-first design — NOT a range-explosion join and NOT a per-group pandas
merge: both sides are tagged and unioned, then a single window pass per key
carries the last-seen right payload forward onto left rows
(``last(..., ignorenulls=True)`` over rows-unbounded-preceding).

Scale properties:
- exactly ONE shuffle (hash partition by key) + per-key sort — the same cost
  as a sort-merge join, independent of time-range density;
- no pairwise candidate blow-up: a key with n left × m right rows costs
  O(n+m log(n+m)), not O(n·m) as bucketed range-join approaches do;
- skewed keys are split by AQE like any other sort/window input.

Tie semantics: right rows at exactly left_ts are visible (<=); within equal
timestamps the right row sorts before the left row (tag order) so "at or
before" is inclusive, matching pandas merge_asof(direction="backward") and
DuckDB ASOF JOIN (ON left_ts >= right_ts).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
    how: str = "left",
) -> DataFrame:
    """Backward as-of join. ``right_cols`` are the payload columns carried
    from the right side (default: all non-key, non-ts columns); they appear
    in the output suffixed if they collide with left column names.

    ``how="left"`` keeps left rows with no prior right row (payload null);
    ``how="inner"`` drops them.
    """
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    out_names = {c: (c + suffix if c in left.columns else c) for c in right_cols}
    payload = [*out_names.values()]
    ts_out = right_ts + suffix if right_ts in left.columns else right_ts

    # The whole right row rides as ONE struct through last(ignorenulls=True):
    # carrying payload columns independently would let a NULL payload field
    # of the winning right row "resurrect" a stale non-null value from an
    # older right row (and mix columns across right rows). The struct is
    # non-null exactly for right rows, so last() picks the most recent right
    # ROW atomically and its interior NULLs survive.
    from pyspark.sql import types as T

    struct_fields = [(ts_out, right.schema[right_ts].dataType)] + [
        (out_names[c], right.schema[c].dataType) for c in right_cols
    ]
    null_struct = F.lit(None).cast(
        T.StructType([T.StructField(n, t, True) for n, t in struct_fields])
    )
    tagged_right = right.select(
        *on,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_tag"),
        F.struct(
            F.col(right_ts).alias(ts_out),
            *[F.col(c).alias(out_names[c]) for c in right_cols],
        ).alias("_asof_row"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
    )
    tagged_left = left.select(
        *on,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_tag"),
        null_struct.alias("_asof_row"),
        *[F.col(c) for c in left.columns if c not in on],
    )

    unioned = tagged_right.unionByName(tagged_left)
    # right rows sort before coincident left rows => <= (inclusive) semantics
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_asof_ts").asc(), F.col("_asof_tag").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *on,
        "_asof_tag",
        *[c for c in left.columns if c not in on],
        F.last("_asof_row", ignorenulls=True).over(w).alias("_asof_row"),
    )
    out = (
        carried.filter(F.col("_asof_tag") == 1)
        .select(
            "*",
            *[F.col(f"_asof_row.{n}").alias(n) for n in (*payload, ts_out)],
        )
        .drop("_asof_tag", "_asof_row")
    )
    if how == "inner":
        out = out.filter(F.col(ts_out).isNotNull())
    return out
