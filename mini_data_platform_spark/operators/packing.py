"""Sequence packing (concat-and-chunk) — LLM training-batch layout.

Training pipelines concatenate the tokenized corpus in a canonical order
and slice it into fixed-size chunks (e.g. 4096 tokens); each document
needs to know WHERE it lands: its global token start offset and the
chunk range it spans. The core primitive is a GLOBAL PREFIX SUM over the
corpus order — the textbook "window over everything" formulation
(``SUM(n) OVER (ORDER BY id)``) collapses onto a single partition and is
exactly what cannot run at 100 TB.

Distributed two-phase prefix sum instead (the classic scan pattern):
1. range-partition by the ordering key, so partition p holds a
   contiguous id range and partitions are ordered;
2. LOCAL cumulative sums per partition (window partitioned by
   ``spark_partition_id()`` — parallel, no global shuffle);
3. per-partition TOTALS to the driver (one long per partition — bounded,
   hyperparameter-scale traffic), prefix-summed in Python, and rejoined
   as a broadcast (partition_id → global offset) map.
Global offset = partition offset + local cumsum − own length. The result
is PARTITION-INVARIANT: offsets depend only on the id order, so any
partitioning of the same data yields identical output — which is what
makes the single-window SQL oracle valid.

Chunk geometry per document follows arithmetically: first/last chunk ids
and how many chunk boundaries cut through the document. Documents are
never reordered or dropped; boundary-straddling is reported, not
resolved (truncate/pad policy is the trainer's call downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .resources import attach_plan


def pack_documents(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    chunk_tokens: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-document packing metadata for concat-and-chunk at
    ``chunk_tokens``: (id, n_tokens, start_offset, first_chunk,
    last_chunk, n_boundary_cuts), where offsets follow the global
    ``id_col`` ascending order. Equivalent to the single-window SQL
    ``SUM(n) OVER (ORDER BY id) - n`` — computed as a distributed
    two-phase prefix sum (module docstring)."""
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    base = (
        df.select(F.col(id_col), F.col(n_tokens_col).cast("long").alias("_n"))
        .repartitionByRange(n_parts, F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
    )
    # PERSIST before the totals collect: repartitionByRange samples its
    # boundaries per-job, so evaluating `base` in two separate jobs (the
    # totals collect below and the final plan) can assign rows to
    # DIFFERENT partitions at scale — the collected offsets would then
    # mismatch the final plan's pids and silently corrupt every offset.
    # Persisting pins one partitioning across both evaluations; the
    # caller releases via release_plan (resources.py contract).
    base = base.persist()
    w = Window.partitionBy("_pid").orderBy(id_col)
    local = base.withColumn("_cum_local", F.sum("_n").over(w))
    # bounded driver traffic: one (pid, total) per partition
    totals = {
        r["_pid"]: r["_t"]
        for r in base.groupBy("_pid").agg(F.sum("_n").alias("_t")).collect()
    }
    offsets, running = {}, 0
    for pid in sorted(totals):
        offsets[pid] = running
        running += totals[pid]
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _off long"
    )
    start = F.col("_off") + F.col("_cum_local") - F.col("_n")
    # inclusive last token; a 0-token document occupies no tokens but is
    # pinned to its start chunk (greatest(n,1) keeps end >= start)
    end = start + F.greatest(F.col("_n"), F.lit(1)) - 1
    out = (
        local.join(F.broadcast(off_df), "_pid")
        .select(
            F.col(id_col),
            F.col("_n").alias("n_tokens"),
            start.alias("start_offset"),
            F.floor(start / chunk_tokens).alias("first_chunk"),
            F.floor(end / chunk_tokens).alias("last_chunk"),
            (F.floor(end / chunk_tokens) - F.floor(start / chunk_tokens))
            .alias("n_boundary_cuts"),
        )
    )
    return attach_plan(out, base)
