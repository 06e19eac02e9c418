"""Time-series resampling: per-key date-grid densification with gap
filling (linear interpolation or LOCF).

Sensor/metric/finance pipelines constantly need "one row per key per
day, holes repaired" before windows, joins, or model features make
sense. revenue_by_day_dense (plans/analytics.py) densifies a GLOBAL
axis with zeros; this operator densifies PER KEY between each key's own
first and last observation and repairs the holes from the neighboring
observations — the standard resample→interpolate step (pandas
``resample().interpolate()``, TimescaleDB ``time_bucket_gapfill`` +
``interpolate``/``locf``), distributed.

Spark shape — one aggregate, one join, one window pass, all JVM:
1. per-key bounds (groupBy min/max) → per-key grid via ``F.sequence``
   explode: output rows ∝ Σ_key span_days, never a cross join;
2. left join observations back on (key, day) — one shuffle keyed
   exactly like the grid;
3. one window pass per direction (``F.last(ignorenulls)`` unbounded-
   preceding for the previous observation, ``F.first(ignorenulls)``
   unbounded-following for the next) carrying both the value and ITS
   day, then a pure projection computes
   ``prev + (next - prev) · gap_fraction`` (or carries ``prev`` for
   LOCF). Inside a key's [min, max] span every gap has both neighbors,
   so the fill is total.

Cross-engine float parity: the fill arithmetic is per-row IEEE-754 on
doubles (identical in any engine); no double is ever AGGREGATED here,
so the _parity.py decimal recipe applies only to whatever aggregate
produced the observations upstream.

Scale notes (100 TB): keys partition the grid, windows, and join
identically — one shuffle each; a key's span is the parallelism grain
(the same per-key-window assumption as asof.py / sessionize). No
driver data paths, no Python rows.

No reference-repo counterpart (see SURVEY.md §2.8 extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

MODES = ("linear", "locf")


def resample_fill(
    df: DataFrame,
    key_col: str,
    day_col: str,
    val_col: str,
    mode: str = "linear",
) -> DataFrame:
    """Densify ``df`` — one row per (key, day) observation, ``day_col``
    a date, ``val_col`` a double — onto each key's full daily grid
    [min(day), max(day)], filling missing days by ``mode``:
    ``linear`` interpolates between the neighboring observations,
    ``locf`` carries the last observation forward. Returns
    (key, day, value, filled) with ``filled`` = 1 on repaired rows.

    Precondition: at most one row per (key, day) — aggregate first
    (duplicate days would make "the" observed value ambiguous)."""
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
    obs = df.select(
        F.col(key_col).alias("_k"),
        F.col(day_col).cast("date").alias("day"),
        F.col(val_col).cast("double").alias("_v"),
    )
    grid = (
        obs.groupBy("_k")
        .agg(F.min("day").alias("_lo"), F.max("day").alias("_hi"))
        .select(
            "_k",
            F.explode(
                F.sequence("_lo", "_hi", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    j = grid.join(obs, ["_k", "day"], "left")
    w_back = (
        Window.partitionBy("_k")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("_k")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("_v").isNotNull(), F.col("day"))
    filled = j.select(
        "_k",
        "day",
        "_v",
        F.last("_v", ignorenulls=True).over(w_back).alias("_pv"),
        F.last(obs_day, ignorenulls=True).over(w_back).alias("_pd"),
        F.first("_v", ignorenulls=True).over(w_fwd).alias("_nv"),
        F.first(obs_day, ignorenulls=True).over(w_fwd).alias("_nd"),
    )
    if mode == "locf":
        fill_expr = F.col("_pv")
    else:
        frac = F.datediff("day", "_pd") / F.datediff("_nd", "_pd")
        fill_expr = F.col("_pv") + (F.col("_nv") - F.col("_pv")) * frac
    return filled.select(
        F.col("_k").alias(key_col),
        F.col("day").alias(day_col),
        F.when(F.col("_v").isNotNull(), F.col("_v"))
        .otherwise(fill_expr)
        .alias("value"),
        F.when(F.col("_v").isNotNull(), F.lit(0)).otherwise(F.lit(1)).alias(
            "filled"
        ),
    )


def sql_resample_fill(
    src: str, key_col: str, day_col: str, val_col: str, mode: str = "linear"
) -> str:
    """ANSI/DuckDB equivalent of :func:`resample_fill`. ``src`` must
    produce (key, day DATE, val DOUBLE) with unique (key, day). The
    fill arithmetic is written as the SAME IEEE double expression the
    Spark plan compiles, so values hash-match bit-exactly."""
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
    if mode == "locf":
        fill = "pv"
    else:
        fill = "pv + (nv - pv) * (CAST(day - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE))"
    return f"""
        WITH obs AS (
            SELECT {key_col} AS k, CAST({day_col} AS DATE) AS day,
                   CAST({val_col} AS DOUBLE) AS v
            FROM ({src})
        ),
        grid AS (
            SELECT k, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
            FROM (SELECT k, min(day) AS lo, max(day) AS hi FROM obs GROUP BY k)
        ),
        j AS (
            SELECT grid.k, grid.day, obs.v
            FROM grid LEFT JOIN obs ON obs.k = grid.k AND obs.day = grid.day
        ),
        w AS (
            SELECT k, day, v,
                   last_value(v IGNORE NULLS) OVER back AS pv,
                   last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
                       OVER back AS pd,
                   first_value(v IGNORE NULLS) OVER fwd AS nv,
                   first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
                       OVER fwd AS nd
            FROM j
            WINDOW back AS (PARTITION BY k ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   fwd AS (PARTITION BY k ORDER BY day
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT k AS {key_col}, day AS {day_col},
               CASE WHEN v IS NOT NULL THEN v ELSE {fill} END AS value,
               CASE WHEN v IS NOT NULL THEN 0 ELSE 1 END AS filled
        FROM w
    """
