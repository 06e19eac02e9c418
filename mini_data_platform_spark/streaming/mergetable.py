"""Streaming maintenance of the keyed merge table: exactly-once MERGE.

The batch side (operators/mergetable.py) already makes ``table_apply``
idempotent per batch id, so the same ``foreachBatch`` protocol that
upgrades IVM views to exactly-once (streaming/ivm.py — replayed epochs
no-op against the commit log, crashed epochs overwrite their orphan
segment) applies verbatim to keyed state: a CDC stream of ``_op``-tagged
upsert/delete rows keeps the lakehouse table current, with every
micro-batch landing exactly once under Spark's at-least-once replays.

This is the streaming half of the reference's keyed-upsert pipeline
(db.py:22-67) re-based onto object storage: the Postgres MERGE becomes
an O(micro-batch) segment append, and the serve read
(``table_read``) is identical whether the table was loaded by batch
applies, the stream, or both. Micro-batches must satisfy the same
key-uniqueness contract as batch applies (validated per epoch by
default); ``compact_table`` runs from a maintenance job, exactly like
``compact_view``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from mini_data_platform_spark.operators.mergetable import table_apply


def maintain_table_stream(
    changes: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
    validate: bool = True,
) -> StreamingQuery:
    """Keep the (already-built) merge table at ``table_dir`` current
    from the streaming ``changes`` frame (rows optionally tagged
    ``_op`` 'u'/'d'; untagged streams are all-upserts). The commit-log
    batch id is ``epoch-{checkpoint-identity}-{epoch_id}`` — the same
    id-space rules as streaming/ivm.py, including the one unsupported
    move (wiping but reusing an exact checkpoint path)."""
    from mini_data_platform_spark.streaming.ivm import checkpoint_key

    ckpt_key = checkpoint_key(checkpoint_dir)

    def process(batch: DataFrame, epoch_id: int) -> None:
        table_apply(
            batch, table_dir,
            batch_id=f"epoch-{ckpt_key}-{epoch_id}",
            validate=validate,
        )

    writer = (
        changes.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
