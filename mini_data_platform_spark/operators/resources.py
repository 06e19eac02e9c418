"""Persist-lifecycle bookkeeping for operators that return LAZY plans
backed by persisted intermediate frames.

Spark has no "unpersist when this plan has executed" hook: an operator
like ``near_dup_pairs`` persists its shared shingle/candidate frames so
the returned plan computes them once, but the operator returns before any
action runs, so it can never unpersist them itself. Left alone, every
invocation pins blocks in executor storage until LRU eviction — harmless
on a laptop fixture, real memory pressure on a long-lived 1000-executor
session (round-5 verdict item 3).

The contract here: an operator ATTACHES the frames it persisted to the
plan it returns (``attach_plan``); whoever runs the action calls
``release_plan`` afterwards. Operators that consume their input EAGERLY
(``connected_components`` materializes the pair graph at call time) call
``release_plan`` on their *input* themselves — by the time they return,
the input plan has executed and its cached frames are dead.

Releasing is always correctness-neutral: an unpersisted frame recomputes
on the next action. ``unpersist(blocking=False)`` keeps the release off
the critical path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_mdp_persisted_frames"


def attach_plan(out: DataFrame, *frames: DataFrame) -> DataFrame:
    """Record ``frames`` (persisted on behalf of ``out``) on the returned
    plan so a downstream ``release_plan`` can free them. Frames already
    attached (operator composition) are kept."""
    held: list[DataFrame] = list(getattr(out, _ATTR, []))
    held.extend(frames)
    setattr(out, _ATTR, held)
    return out


def carry_plan(out: DataFrame, *sources: DataFrame) -> DataFrame:
    """Propagate attached frames from ``sources`` onto ``out`` — for plan
    functions that wrap an operator's output in further projections (the
    attribute does not survive DataFrame transformations)."""
    frames: list[DataFrame] = []
    for s in sources:
        frames.extend(getattr(s, _ATTR, []))
    return attach_plan(out, *frames) if frames else out


def release_plan(df: DataFrame | None) -> int:
    """Unpersist every frame attached to ``df``; returns how many were
    released. Safe to call on any DataFrame (no-op without attachments)
    and idempotent (the attachment list is cleared)."""
    if df is None:
        return 0
    frames = getattr(df, _ATTR, None)
    if not frames:
        return 0
    n = 0
    for f in frames:
        try:
            f.unpersist(False)
            n += 1
        except Exception:  # noqa: BLE001 — cleanup is advisory
            pass
    setattr(df, _ATTR, [])
    return n


def run_concurrently(*thunks):
    """Run independent Spark-action chains from driver threads (the
    optimization-guide §2.6 overlap: while one chain's last stragglers
    drain, the next chain's tasks back-fill the freed cores, and the
    chains' driver-side planning/py4j gaps overlap each other's executor
    work). Only for chains with NO ordering dependency — e.g. building
    two different merge tables, or maintaining two views off one shared
    (persisted) change feed. Results come back in ``thunks`` order; the
    first exception propagates after all threads finish."""
    from concurrent.futures import ThreadPoolExecutor

    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]
