"""Streaming maintenance of JOIN views: CDC streams in, a maintained
join aggregate out — the streaming half of operators/joinview.py.

The protocol composes two already-exactly-once pieces, adding no new
state: each micro-batch is (1) a ``table_apply`` under the
``epoch-{checkpoint-identity}-{epoch_id}`` id (idempotent — replays
no-op, streaming/mergetable.py), then (2) a ``join_view_refresh``,
whose cursor is DERIVED from the view's last committed
``join-l0-l1-r0-r1`` batch id. Every crash point is covered:

- replayed epoch, apply already landed  → apply no-ops; the refresh
  either no-ops (cursors current) or completes the missing fold;
- crash between apply and refresh       → the NEXT epoch's refresh
  folds both windows in one delta (the algebra is cadence-invariant,
  tests/test_joinview.py);
- refresh lands, crash before Spark commits the epoch → replay no-ops
  both steps.

One refresher owns the view: when BOTH join sides are fed by streams,
exactly one stream passes ``refresh=True`` (the other only applies) —
two concurrent refreshers could commit overlapping windows, and the
replay guard only blocks identical ids. This mirrors the single-writer
discipline every commit-log store in the repo assumes.

Scale: per micro-batch, one O(batch) segment append + one
O(delta + candidate log rows) join-delta refresh — the view is never
recomputed, the tables never rescanned. The serve read (``view_read``)
is identical whether the tables were loaded by batch applies, streams,
or both — the same batch/stream unification as the near-dup index
bridge (streaming/neardup.py) and view maintenance (streaming/ivm.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from mini_data_platform_spark.operators.joinview import join_view_refresh
from mini_data_platform_spark.operators.mergetable import table_apply


def maintain_join_view_stream(
    changes: DataFrame,
    table_dir: str,
    view_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
    validate: bool = True,
    refresh: bool = True,
) -> StreamingQuery:
    """Apply the CDC stream to ``table_dir`` (one side of the view's
    join) and, if ``refresh``, catch the join view up after every
    micro-batch. ``refresh=False`` is for the NON-owning side when both
    join sides stream (see module docstring). The refresh also folds
    advances other writers made to EITHER table — a one-stream deploy
    over a dim table that changes by occasional batch applies stays
    current too."""
    from mini_data_platform_spark.streaming.ivm import checkpoint_key

    ckpt_key = checkpoint_key(checkpoint_dir)
    spark = changes.sparkSession

    def process(batch: DataFrame, epoch_id: int) -> None:
        table_apply(
            batch, table_dir,
            batch_id=f"epoch-{ckpt_key}-{epoch_id}",
            validate=validate,
        )
        if refresh:
            join_view_refresh(spark, view_dir)

    writer = (
        changes.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
