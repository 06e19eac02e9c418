"""Behavioral analytics: ordered conversion funnels and cohort
retention.

Product-analytics engines (Amplitude/Mixpanel-class) are built on two
queries every event table eventually needs:

- FUNNEL: of the users who did step 1, how many went on to do step 2
  STRICTLY AFTER it, then step 3 after that, … (the greedy
  earliest-completion semantics: each step matches at its earliest
  occurrence after the previous step's match — the standard funnel
  definition, and an order-sensitive pattern a bare GROUP BY cannot
  see).
- COHORT RETENTION: group users by their first-activity day, then for
  each (cohort, days-since-first) cell count how many were active —
  the retention triangle.

Spark shape — per-user aggregates only, no window over everything:
- funnel: step 0 is one groupBy(user).min(ts); step i is a join of the
  step-(i-1) completion times onto the step-i events (shuffle keyed by
  user both sides) + another min. k steps = k joins — k is 3-5 in
  practice, and every shuffle is (user, ts) pairs. The k per-step
  counts union into a k-row result; the conversion ratio divides by
  the step-0 count via a window over those k rows (k rows, not data).
- retention: distinct (user, day) activity → min day per user → one
  join + one groupBy (cohort, offset). Day arithmetic is integer
  epoch-day (`div` on unix microseconds), never calendar/timezone
  functions, so results are session-timezone-proof and the DuckDB
  oracle matches bit-for-bit.

All time math in unix microseconds (exact integers — the
events_sessionize doctrine, plans/analytics.py).

No reference-repo counterpart (see SURVEY.md §2.8 extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

US_PER_DAY = 86_400_000_000


def funnel_steps(
    df: DataFrame,
    user_col,
    ts_col: str,
    type_col: str,
    steps: list[str],
    checkpoint: bool = True,
) -> DataFrame:
    """Ordered-funnel counts: one row per step — (step_idx, step,
    users, conversion) where ``users`` counts funnel entities whose
    earliest greedy completion chain reaches the step (each step
    strictly after the previous completion) and ``conversion`` =
    users / step-0 users. ``user_col`` may be a single column or a
    LIST of columns — the funnel entity (a user, or a (user, session)
    for session-scoped funnels). ``checkpoint=False`` keeps the whole
    composition as one lazy plan (the step-filter-pushdown plan gate
    inspects that form; the default materializes each step's
    completion frame — see below)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    from pyspark import StorageLevel

    keys = [user_col] if isinstance(user_col, str) else list(user_col)
    kcols = [f"_u{i}" for i in range(len(keys))]
    ev = df.select(
        *[F.col(k).alias(a) for k, a in zip(keys, kcols)],
        F.unix_micros(F.col(ts_col)).alias("_t"),
        F.col(type_col).alias("_y"),
    )
    # persist each step's completion frame (round-8 advice): counting
    # step i would otherwise re-execute the whole join chain of steps
    # 0..i — quadratic recomputation in the number of steps. Each
    # materialized frame is one row per surviving entity, shrinking
    # monotonically down the funnel. persist (lazy, pure bookkeeping)
    # rather than localCheckpoint(eager=False): the lazy checkpoint
    # still runs the JVM planning-to-RDD pipeline per step at BUILD
    # time — ~0.34 s × k of sequential driver wall (round-15 cProfile)
    # — while cached blocks give the same compute-once guarantee at
    # execution. The persisted frames are plan-attached to the result
    # for the caller's release (near_dup_pairs discipline).
    cuts: list[DataFrame] = []

    def _cut(frame):
        if not checkpoint:
            return frame
        frame = frame.persist(StorageLevel.MEMORY_AND_DISK)
        cuts.append(frame)
        return frame

    completions = []
    cur = _cut(
        ev.where(F.col("_y") == steps[0])
        .groupBy(*kcols)
        .agg(F.min("_t").alias("_done"))
    )
    completions.append(cur)
    for step in steps[1:]:
        nxt = _cut(
            ev.where(F.col("_y") == step)
            .join(
                cur.select(*kcols, F.col("_done").alias("_prev")), kcols
            )
            .where(F.col("_t") > F.col("_prev"))
            .groupBy(*kcols)
            .agg(F.min("_t").alias("_done"))
        )
        completions.append(nxt)
        cur = nxt
    rows = None
    for i, (step, frame) in enumerate(zip(steps, completions)):
        one = frame.agg(
            F.lit(i).alias("step_idx"),
            F.lit(step).alias("step"),
            F.count(F.lit(1)).alias("users"),
        )
        rows = one if rows is None else rows.unionByName(one)
    # k-row frame: the whole-frame window is over `len(steps)` rows,
    # not data — constant-attach of the step-0 denominator
    w_all = Window.partitionBy()
    base = F.max(F.when(F.col("step_idx") == 0, F.col("users"))).over(w_all)
    # nullif guard: an empty step 0 yields NULL conversions on both
    # engines instead of engine-specific 0/0 behavior
    out = rows.select(
        "step_idx",
        "step",
        "users",
        (F.col("users") / F.nullif(base, F.lit(0))).alias("conversion"),
    )
    if cuts:
        from mini_data_platform_spark.operators.resources import attach_plan

        out = attach_plan(out, *cuts)
    return out


def cohort_retention(
    df: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Retention triangle: (cohort_day, day_offset, active_users,
    cohort_size, retention) — cohort_day is the user's first active
    epoch-day (integer days since 1970-01-01 UTC), day_offset the
    integer day distance, active_users the distinct users of that
    cohort active at that offset, retention = active / cohort size.
    Every cohort emits its offset-0 row, so cohort_size is also
    readable off the diagonal."""
    act = df.select(
        F.col(user_col).alias("_u"),
        F.expr(f"unix_micros({ts_col}) div {US_PER_DAY}").alias("_day"),
    ).distinct()
    first = act.groupBy("_u").agg(F.min("_day").alias("_cohort"))
    sizes = first.groupBy("_cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    cells = (
        act.join(first, "_u")
        .groupBy(
            F.col("_cohort"),
            (F.col("_day") - F.col("_cohort")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    return cells.join(sizes, "_cohort").select(
        F.col("_cohort").alias("cohort_day"),
        "day_offset",
        "active_users",
        "cohort_size",
        (F.col("active_users") / F.col("cohort_size")).alias("retention"),
    )


def sql_funnel_steps(
    src: str,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    ts_in_us: bool = False,
) -> str:
    """ANSI/DuckDB equivalent of :func:`funnel_steps` (nested greedy
    min-after-previous CTE chain). ``user_col`` may be any expression
    (compose multi-column funnel entities into one string key);
    ``ts_in_us`` marks a source already in unix microseconds."""
    if not steps:
        raise ValueError("steps must be non-empty")
    t_expr = ts_col if ts_in_us else f"epoch_us(CAST({ts_col} AS TIMESTAMP))"
    ctes = [
        f"""ev AS (
            SELECT {user_col} AS u,
                   {t_expr} AS t,
                   {type_col} AS y
            FROM ({src})
        )""",
        f"""s0 AS (
            SELECT u, min(t) AS done FROM ev
            WHERE y = '{steps[0]}' GROUP BY u
        )""",
    ]
    for i, step in enumerate(steps[1:], start=1):
        ctes.append(
            f"""s{i} AS (
            SELECT ev.u, min(ev.t) AS done
            FROM ev JOIN s{i - 1} ON ev.u = s{i - 1}.u AND ev.t > s{i - 1}.done
            WHERE ev.y = '{step}' GROUP BY ev.u
        )"""
        )
    unions = "\nUNION ALL\n".join(
        f"SELECT {i} AS step_idx, '{s}' AS step, count(*) AS users FROM s{i}"
        for i, s in enumerate(steps)
    )
    ctes.append(f"counts AS (\n{unions}\n)")
    return f"""
        WITH {",".join(ctes)}
        SELECT step_idx, step, CAST(users AS BIGINT) AS users,
               users / nullif((SELECT users FROM counts WHERE step_idx = 0), 0)
                   AS conversion
        FROM counts
    """


def sql_cohort_retention(src: str, user_col: str, ts_col: str) -> str:
    """ANSI/DuckDB equivalent of :func:`cohort_retention`."""
    return f"""
        WITH act AS (
            SELECT DISTINCT {user_col} AS u,
                   epoch_us(CAST({ts_col} AS TIMESTAMP)) // {US_PER_DAY} AS day
            FROM ({src})
        ),
        first AS (SELECT u, min(day) AS cohort FROM act GROUP BY u),
        sizes AS (
            SELECT cohort, count(*) AS cohort_size FROM first GROUP BY cohort
        ),
        cells AS (
            SELECT first.cohort, act.day - first.cohort AS day_offset,
                   count(*) AS active_users
            FROM act JOIN first ON act.u = first.u
            GROUP BY 1, 2
        )
        SELECT CAST(cells.cohort AS BIGINT) AS cohort_day,
               CAST(day_offset AS BIGINT) AS day_offset,
               CAST(active_users AS BIGINT) AS active_users,
               CAST(cohort_size AS BIGINT) AS cohort_size,
               active_users / cohort_size AS retention
        FROM cells JOIN sizes ON cells.cohort = sizes.cohort
    """
