"""One-shot (batch-style) execution of stateful streaming plans.

The gotcha this module owns: for a query holding state registered with
``GroupStateTimeout.ProcessingTimeTimeout``, Spark schedules CONTINUOUS
no-data micro-batches so that wall-clock time can advance and eventually
fire the timeouts (``spark.sql.streaming.noDataMicroBatches.enabled``
defaults to true). Under ``Trigger.AvailableNow`` that means the query
NEVER terminates on its own — it burns one empty micro-batch per second
until every registered timeout (e.g. a 30-minute session gap or a
near-dup bucket TTL) has fired. ``processAllAvailable`` hangs the same
way, because the engine never goes idle. Measured here: a 5-second
sf0.001 sessionize run instead spun 163 empty batches in 120 s and was
still going.

``run_available_now`` disables no-data micro-batches for the query it
starts (the conf is read at query start; the previous value is restored
immediately after) so an availableNow run processes exactly the available
input and stops. Timeouts that would have fired during idle wall-clock
simply don't — correct for one-shot runs, where "the stream ended" is the
only end-of-input signal anyway.

Scope: use this for plans built on ``applyInPandasWithState`` with
processing-time timeouts (``sessionize_stateful``,
``near_dup_candidates_stream``). Watermark-driven queries (windowed aggs,
``session_window``) terminate fine under availableNow WITH no-data
batches enabled — and may rely on a trailing no-data batch to emit their
final windows — so run those the normal way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_NO_DATA_KEY = "spark.sql.streaming.noDataMicroBatches.enabled"


def run_available_now(
    df: DataFrame,
    checkpoint_dir: str,
    fmt: str = "noop",
    query_name: str | None = None,
    output_mode: str = "append",
    timeout_sec: int = 600,
) -> None:
    """Run a streaming DataFrame to completion as a one-shot availableNow
    batch against the ``fmt`` sink, with no-data micro-batches disabled
    for the duration (see module docstring). Raises ``TimeoutError`` if
    the run exceeds ``timeout_sec`` (the query is stopped first, so a
    hang never leaks a background query into the session)."""
    spark = df.sparkSession
    try:
        prev = spark.conf.get(_NO_DATA_KEY)
    except Exception:  # noqa: BLE001
        prev = "true"
    spark.conf.set(_NO_DATA_KEY, "false")
    try:
        writer = (
            df.writeStream.format(fmt)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode(output_mode)
            .trigger(availableNow=True)
        )
        if query_name is not None:
            writer = writer.queryName(query_name)
        q = writer.start()
        try:
            finished = q.awaitTermination(timeout_sec)
        finally:
            if q.isActive:
                q.stop()
        if not finished:
            raise TimeoutError(
                f"one-shot streaming run exceeded {timeout_sec}s "
                f"(checkpoint: {checkpoint_dir})"
            )
    finally:
        spark.conf.set(_NO_DATA_KEY, prev)
