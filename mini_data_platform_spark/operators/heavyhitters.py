"""Exact heavy hitters via a Misra-Gries candidate pass.

Problem shape: "which keys occur ≥ s times" over a power-law column
(hot users, hot URLs, boilerplate fingerprints). The naive plan —
groupBy(key).count().filter(n ≥ s) — shuffles ONE ROW PER DISTINCT KEY;
at 100 TB with billions of near-unique keys the shuffle is dominated by
the long tail that can never qualify.

Two-pass fix with an EXACT result:
1. CANDIDATES: each partition runs a Misra-Gries summary with
   ``k_counters`` counters (Misra & Gries, "Finding repeated elements",
   1982). MG guarantees any item with partition count > n_p/k survives
   the partition's summary; since a globally-heavy item (count ≥ s ≥
   n/k overall) must exceed n_p/k in at least one partition (pigeonhole),
   the UNION of per-partition survivors is a SUPERSET of the true heavy
   hitters. The union is tiny: ≤ k_counters × partitions candidate keys.
2. VERIFY: exact counts for candidate keys only — a broadcast
   ``isin``-style semi filter on the scan, then one groupBy whose shuffle
   carries only rows of candidate keys. False candidates die on the
   ``≥ s`` filter; no true hitter was lost in pass 1, so the output is
   EXACTLY ``HAVING COUNT(*) >= s`` — which is what makes the SQL oracle
   possible for an operator whose cheap pass is sketch-based.

Correctness requirement: ``k_counters`` must satisfy n/k_counters < s
(checked at runtime with the observed n) — otherwise pass 1's guarantee
does not cover threshold ``s`` and the operator refuses rather than
silently under-reporting.

The MG summaries run inside ``mapInPandas`` (Arrow batches, numpy/pandas
value_counts per batch folded into a dict bounded at ~2×k_counters);
driver traffic is the candidate key set (bounded, hyperparameter-scale)
— never the distinct-key universe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def _mg_partition_summaries(df: DataFrame, col: str, k_counters: int):
    """Per-partition Misra-Gries: one row per surviving counter —
    (key, pid, n_part) with the task's partition id and row count, so ONE
    pass yields both the candidate keys and the exact total row count
    (sum of n_part over distinct pid)."""
    field = df.select(col).schema.fields[0]
    schema = T.StructType(
        [
            T.StructField("key", field.dataType, True),
            T.StructField("pid", T.IntegerType(), False),
            T.StructField("n_part", T.LongType(), False),
        ]
    )

    def summarize(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        counters: dict = {}
        total = 0
        for pdf in batches:
            if not len(pdf):
                continue
            total += len(pdf)
            vc = pdf[col].value_counts(dropna=False)
            for key, cnt in vc.items():
                if key in counters:
                    counters[key] += int(cnt)
                else:
                    counters[key] = int(cnt)
            # shrink back to ≤ k_counters survivors: subtracting the
            # (k+1)-largest weight from everyone and dropping non-positive
            # counters is the batched form of that many classic MG
            # decrements (each round retires ≥ k+1 units of mass, which
            # is where the n/(k+1) undercount bound comes from)
            if len(counters) > k_counters:
                cut = sorted(counters.values(), reverse=True)[k_counters]
                counters = {
                    k: v - cut for k, v in counters.items() if v - cut > 0
                }
        # a non-empty partition can end with ZERO survivors (uniform data
        # where the shrink cut equals every count): still report n_part
        # via a null-key marker row, or the total-count check undercounts.
        # Null keys never match the candidate semi-join, so the marker is
        # invisible to pass 2.
        keys = list(counters.keys()) if counters else ([None] if total else [])
        yield pd.DataFrame(
            {
                "key": keys,
                "pid": [pid] * len(keys),
                "n_part": [total] * len(keys),
            }
        )

    return df.select(col).mapInPandas(summarize, schema)


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_count: int,
    k_counters: int | None = None,
) -> DataFrame:
    """All values of ``col`` occurring at least ``min_count`` times, with
    their EXACT counts — (``col``, n) rows, equal to the plain
    ``GROUP BY HAVING`` result. Two passes over the input (candidate
    sketch, then verified counts); the verification shuffle carries only
    candidate-key rows.

    Null keys are excluded (the candidate semi-join cannot match null =
    null) — filter or fill upstream if null is a meaningful group.

    ``k_counters=None`` (default) AUTO-SIZES the sketch from the observed
    row count: ``max(256, 2·ceil(n / min_count))`` — 2× the coverage
    bound, so the same call scales from fixture to production without
    constant-tuning (round-6 verdict: hard-coded constants tripped the
    guard when the fixture grew). Auto mode costs one extra count-star
    scan (no shuffle; columnar-cheap) before the MG pass.

    An EXPLICIT ``k_counters`` is honored and still refuses if the MG
    guarantee cannot cover ``min_count`` (n / ``k_counters`` ≥
    ``min_count`` — strictly stronger than the n/(k+1) < s bound the
    proof needs): raise ``k_counters`` or ``min_count``. The check uses
    the exact observed row count, so the refusal is exact, not
    heuristic.

    NOTE on scan count: candidate + verify means the input is read twice
    (three times in auto mode). When the scan itself is the dominant
    cost (remote object storage, no column pruning), either persist the
    input across the passes or use the one-pass streaming form
    (streaming/heavyhitters.py), which trades exactness of the candidate
    bound for a single read."""
    import math

    from mini_data_platform_spark.operators.resources import attach_plan

    if k_counters is None:
        n_obs = df.count()
        k_counters = max(256, 2 * math.ceil(n_obs / max(min_count, 1)))
    # one MG pass, cached: serves BOTH the exact total-row count (sum of
    # n_part over distinct partitions) and the candidate key set. The
    # cache holds ≤ k_counters × partitions tiny rows; attached to the
    # returned plan for release_plan cleanup.
    summaries = _mg_partition_summaries(df, col, k_counters).persist()
    n_total = (
        summaries.select("pid", "n_part")
        .distinct()
        .agg(F.sum("n_part"))
        .collect()[0][0]
        or 0
    )
    if n_total / k_counters >= min_count:
        summaries.unpersist(False)
        raise ValueError(
            f"heavy_hitters: n/k_counters = {n_total}/{k_counters} = "
            f"{n_total / k_counters:.0f} >= min_count={min_count}; the "
            "Misra-Gries pass cannot guarantee coverage — raise "
            "k_counters above n/min_count"
        )
    cand_frame = (
        summaries.where(F.col("key").isNotNull())
        .select(F.col("key").alias(col))
        .distinct()
    )
    # broadcast semi-join on the candidate set (bounded: ≤ k_counters ×
    # partitions keys) — the scan drops tail keys BEFORE the shuffle, so
    # the groupBy carries candidate rows only
    out = (
        df.join(F.broadcast(cand_frame), col, "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= min_count)
    )
    return attach_plan(out, summaries)
