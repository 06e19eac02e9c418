"""Streaming maintenance of KMV distinct synopses.

The batch side (operators/sketch.py) builds k-minimum-values synopses;
this module keeps them current from a stream. The interesting property
is what it does NOT need: the exactly-once machinery every other
streaming maintainer here carries (ivm.py's idempotent batch ids,
mergetable.py's tickets). KMV merge is a DISTINCT-UNION truncated to k
— ``merge(merge(S, B), B) == merge(S, B)`` — so a replayed micro-batch
is algebraically a no-op and ``foreachBatch``'s at-least-once contract
is already exactly right. The test suite pins both the replay no-op
and the stream ≡ batch-build equivalence.

State layout: ``state_dir/v{epoch}/`` parquet (one tiny synopsis table:
group cols + kmv array + n_values) with ``meta.json`` naming the
current version, swapped by one atomic ``os.replace`` — readers never
see a half-written state, a crash before the swap leaves an orphan dir
the next write ignores (the incremental.py segment discipline, minus
the commit log it doesn't need).

Scale: each micro-batch costs one distinct + top-k over the BATCH
(O(micro-batch)), then a merge join against state that is k rows per
group — the synopsis, not the data.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from mini_data_platform_spark.operators.sketch import kmv_merge, kmv_synopsis


def _meta_path(state_dir: str) -> str:
    return os.path.join(state_dir, "meta.json")


def kmv_state_read(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Current synopsis state, or None before the first batch."""
    meta = _meta_path(state_dir)
    if not os.path.exists(meta):
        return None
    with open(meta) as fh:
        cur = json.load(fh)["current"]
    return spark.read.parquet(os.path.join(state_dir, cur))


def apply_kmv_batch(
    batch: DataFrame,
    state_dir: str,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> None:
    """Merge one batch's synopsis into the state (idempotent — see
    module docstring). ``n_values`` is kept as the count of distinct
    hashes in the MERGED synopsis (exact below k, saturates at k),
    which is exactly what kmv_estimate's small-set branch needs."""
    spark = batch.sparkSession
    delta = kmv_synopsis(batch, group_cols, value_col, k)
    state = kmv_state_read(spark, state_dir)
    if state is not None:
        s = state.select(
            *group_cols, F.col("kmv").alias("_skmv")
        )
        d = delta.select(*group_cols, F.col("kmv").alias("_dkmv"))
        merged_arr = kmv_merge(
            F.coalesce("_skmv", F.array().cast("array<long>")),
            F.coalesce("_dkmv", F.array().cast("array<long>")),
            k,
        )
        merged = (
            s.join(d, group_cols, "full_outer")
            .withColumn("kmv", merged_arr)
            .select(
                *group_cols,
                "kmv",
                F.size("kmv").cast("long").alias("n_values"),
            )
        )
    else:
        merged = delta
    os.makedirs(state_dir, exist_ok=True)
    prev = None
    if os.path.exists(_meta_path(state_dir)):
        with open(_meta_path(state_dir)) as fh:
            prev = json.load(fh).get("current")
    vname = f"v{uuid.uuid4().hex[:12]}"
    merged.write.mode("overwrite").parquet(os.path.join(state_dir, vname))
    tmp = _meta_path(state_dir) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump({"current": vname, "k": k}, fh)
    os.replace(tmp, _meta_path(state_dir))
    # GC superseded versions AFTER the swap (round-8 advice: a
    # long-running stream must not grow the state dir without bound) —
    # but KEEP the immediately-previous version (round-9 advice): a
    # point-in-time reader that resolved meta just before the swap may
    # still be mid-scan of `prev`; it is deleted only on the NEXT
    # increment, by which time its scan window has long passed. Crash
    # orphans (v* never published) are reaped by the same sweep.
    import shutil

    for name in os.listdir(state_dir):
        if name.startswith("v") and name not in (vname, prev):
            shutil.rmtree(os.path.join(state_dir, name),
                          ignore_errors=True)


def maintain_kmv_stream(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    available_now: bool = False,
) -> StreamingQuery:
    """Keep a KMV synopsis state current from a stream via
    ``foreachBatch`` — no batch-id bookkeeping, because the merge is
    idempotent (the module's whole point)."""

    def process(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        apply_kmv_batch(batch, state_dir, group_cols, value_col, k)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
