"""Streaming dedup driven THROUGH the persisted incremental indexes —
the last unification of batch and streaming dedup state.

streaming/neardup.py keeps TTL-bounded in-memory state and bridges to
the persisted index via seed export/drain; this module goes the other
way: each micro-batch IS an index increment. The index becomes the one
durable dedup state — batch backfills, streaming ingest, serving
lookups, and takedown deletes all see the same committed corpus, and a
restarted stream resumes against everything every other writer has
committed (single-writer discipline per index still applies: one
committing stream OR batch job at a time; read-only lookups are always
safe).

Exactly-once comes from composing two at-least-once halves, the same
argument as streaming/ivm.py: foreachBatch replays a crashed epoch
under the SAME epoch id, and the index increments' ``batch_id`` replay
protection makes the second apply a no-op that returns the original
batch's materialized ``pairs/batch=N``. The per-epoch resolution is
therefore durable and re-readable — downstream consumers read the
``pairs/`` log as the stream's output.

Scale per micro-batch = one index increment: sign/hash the batch only,
probe committed segments guarded-broadcast, candidate-bounded
verification — O(batch + candidates), never O(corpus). Run
``compact_index`` from a maintenance window to fold the
one-segment-per-epoch log (exactly the small-file story the IVM views
have).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from mini_data_platform_spark.streaming.ivm import checkpoint_key


def _maintain(fold, docs, index_dir, checkpoint_dir, available_now):
    ckpt_key = checkpoint_key(checkpoint_dir)

    def process(batch: DataFrame, epoch_id: int) -> None:
        fold(batch, index_dir, batch_id=f"epoch-{ckpt_key}-{epoch_id}")

    writer = (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def maintain_exact_index_stream(
    docs: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
) -> StreamingQuery:
    """Streaming EXACT dedup against a persisted hash index
    (``exact_index_build``): every micro-batch is resolved (each doc's
    ``dup_of`` = smallest indexed-or-batch id with its content hash) and
    committed, exactly-once. The per-epoch resolutions land in the
    index's ``pairs/`` log."""
    from mini_data_platform_spark.operators.incremental import (
        exact_index_increment,
    )

    return _maintain(
        exact_index_increment, docs, index_dir, checkpoint_dir,
        available_now,
    )


def maintain_neardup_index_stream(
    docs: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
) -> StreamingQuery:
    """Streaming NEAR-dup detection against a persisted MinHash-LSH
    index: each micro-batch's verified pairs (new-vs-corpus ∪
    new-vs-new) are materialized per epoch and the batch joins the
    corpus for every later epoch/batch/lookup. The durable-state
    counterpart of ``streaming/neardup.near_dup_candidates_stream``'s
    in-memory TTL operator — use that one for bounded-latency
    candidate flagging, this one when the corpus index is the source
    of truth."""
    from mini_data_platform_spark.operators.incremental import (
        neardup_index_increment,
    )

    return _maintain(
        neardup_index_increment, docs, index_dir, checkpoint_dir,
        available_now,
    )
