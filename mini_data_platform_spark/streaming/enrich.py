"""Streaming dimension enrichment: a fact stream joined, per
micro-batch, against a keyed merge table (operators/mergetable.py) —
the streaming lookup join onto a slowly-changing dimension store.

Spark's native stream-stream and stream-static joins don't fit this
shape: stream-static re-plans the static side per batch but a merge
table is a LOG that needs resolving, and stream-stream needs the
dimension as a stream with watermarks. Here the dimension is the
merge table itself — each micro-batch probes it CANDIDATE-BOUNDED
(``table_lookup``: guarded-broadcast semi-join + IN-literal scan
pushdown, O(batch keys' log rows) never O(table)), so a 100-row batch
against a billion-row dimension touches only the probed keys' segments.

Semantics: AT-APPLY-TIME enrichment — each batch sees the dimension as
committed when the batch processes (the Kimball Type-1 lookup every
streaming ETL runs). For point-in-time (Type-2) semantics over
historical facts, use ``operators/scd.scd2_enrich`` in batch; the two
are the streaming/batch halves of the same dimension story.

Exactly-once OUTPUT without a transactional sink: each epoch writes to
its own ``epoch={checkpoint-identity}-{epoch_id}`` subdirectory in
OVERWRITE mode — a replayed micro-batch rewrites the same directory
with the same rows (enrichment is deterministic given the table state;
a replay after a dim change may legitimately re-enrich with the newer
version, exactly like any at-apply-time lookup). Readers just read the
output root; partition discovery exposes the epoch column.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from mini_data_platform_spark.streaming.ivm import checkpoint_key


def enrich_stream(
    facts: DataFrame,
    table_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    how: str = "left",
    available_now: bool = False,
) -> StreamingQuery:
    """Enrich the streaming ``facts`` against the merge table at
    ``table_dir`` (join on the table's key columns, which must all be
    present in the stream) and land each epoch's joined rows under
    ``out_dir/epoch=.../``. ``how`` is ``left`` (unmatched/deleted keys
    carry NULL dim columns — the audit-friendly default) or ``inner``
    (drop them). Dim data columns must not collide with fact column
    names (refused per batch, loudly)."""
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    from mini_data_platform_spark.operators.mergetable import _read_meta

    keys = _read_meta(table_dir)["keys"]
    missing = [k for k in keys if k not in facts.columns]
    if missing:
        raise ValueError(
            f"stream is missing the table's key columns {missing}"
        )
    ckpt_key = checkpoint_key(checkpoint_dir)

    def process(batch: DataFrame, epoch_id: int) -> None:
        from mini_data_platform_spark.operators.mergetable import (
            table_lookup,
        )
        from mini_data_platform_spark.operators.resources import (
            release_plan,
        )

        spark = batch.sparkSession
        dims = table_lookup(
            spark, table_dir, batch.select(*keys).distinct()
        )
        clash = [
            c for c in dims.columns
            if c not in keys and c in batch.columns
        ]
        if clash:
            raise ValueError(
                f"dim columns {clash} collide with fact columns; "
                "rename one side before enriching"
            )
        out = batch.join(dims, keys, how)
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch={ckpt_key}-{epoch_id}")
        )
        release_plan(dims)

    writer = (
        facts.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
