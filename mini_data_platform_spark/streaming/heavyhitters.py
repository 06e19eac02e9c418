"""Streaming heavy hitters — sharded Misra-Gries state over an event
stream.

The batch operator (operators/heavyhitters.py) answers "which keys occur
≥ s times" with a candidate sketch + exact verification pass; a STREAM
cannot re-scan, so this is the one-pass formulation: shard keys by hash,
keep one Misra-Gries summary (``k_counters`` counters) per shard in
``applyInPandasWithState`` state, and EMIT a key the first time its
counter reaches ``min_count``.

Guarantees (asymmetric by design — the usual streaming-sketch trade):
- NO FALSE POSITIVES: an MG counter is a LOWER bound on the key's true
  count within its shard, so an emitted ``(key, at_least)`` row proves
  true_count ≥ at_least ≥ min_count. Alerts are trustworthy as-is.
- Bounded false-negative window: a counter undercounts by at most
  (shard rows)/(k_counters+1), so any key whose shard count exceeds
  ``min_count`` + that slack HAS been emitted. Size ``k_counters``
  to the tolerable detection slack, exactly as in the batch operator.
- EMIT-ONCE: each key is reported the first time it crosses the
  threshold (the emitted set rides in state; its size is the number of
  heavy hitters in the shard — small by the problem's definition).

Scale story:
- the only shuffle key is the hash shard (``n_shards`` groups) — state
  store size is n_shards × k_counters counters, INDEPENDENT of the
  distinct-key universe (the reason a naive per-key count-state is not
  the 100 TB design);
- per-batch work inside each shard is a pandas value_counts + dict merge
  over Arrow batches — vectorized, no per-row Python;
- a processing-time TTL evicts idle shards so state tracks active
  traffic, not stream lifetime (same argument as streaming/neardup.py).

One-shot (availableNow) runs MUST go through
``streaming.run.run_available_now`` (the TTL timeout spins no-data
micro-batches forever otherwise — streaming/run.py docstring).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: (key, at_least, shard): at_least is the MG lower bound at emit time
OUTPUT_SCHEMA = "key string, at_least long, shard int"
_STATE_SCHEMA = (
    "keys array<string>, counts array<long>, emitted array<string>"
)

#: default shard-state TTL: shards idle this long are evicted
DEFAULT_TTL_MS = 6 * 3_600_000


def _make_shard_fn(min_count: int, k_counters: int, ttl_ms: int):
    def shard_fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        shard = int(key[0])
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            keys, counts, emitted = state.get
            counters = dict(zip(keys, counts))
            emitted_set = set(emitted)
        else:
            counters = {}
            emitted_set = set()
        for pdf in pdfs:
            if not len(pdf):
                continue
            for k, c in pdf["key"].value_counts().items():
                counters[k] = counters.get(k, 0) + int(c)
            if len(counters) > k_counters:
                # batched MG shrink — same arithmetic as the batch
                # operator (operators/heavyhitters.py)
                cut = sorted(counters.values(), reverse=True)[k_counters]
                counters = {
                    k: v - cut for k, v in counters.items() if v - cut > 0
                }
        fresh = [
            (k, v)
            for k, v in counters.items()
            if v >= min_count and k not in emitted_set
        ]
        emitted_set.update(k for k, _ in fresh)
        state.update(
            (
                list(counters.keys()),
                [int(v) for v in counters.values()],
                sorted(emitted_set),
            )
        )
        state.setTimeoutDuration(ttl_ms)
        if fresh:
            yield pd.DataFrame(
                {
                    "key": [k for k, _ in fresh],
                    "at_least": [int(v) for _, v in fresh],
                    "shard": [shard] * len(fresh),
                }
            )

    return shard_fn


def heavy_hitters_stream(
    events: DataFrame,
    key_col: str,
    min_count: int,
    n_shards: int = 32,
    k_counters: int = 256,
    state_ttl_ms: int = DEFAULT_TTL_MS,
) -> DataFrame:
    """Streaming heavy-hitter alerts: one ``(key, at_least, shard)`` row
    the first time a key's Misra-Gries lower bound reaches ``min_count``.
    See the module docstring for the no-false-positive / bounded-slack
    guarantees and the state-size argument. Keys are cast to string
    (the state schema is fixed); null keys are dropped."""
    sharded = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
    ).where(F.col("key").isNotNull())
    return sharded.groupBy("shard").applyInPandasWithState(
        _make_shard_fn(min_count, k_counters, state_ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
