"""Streaming near-duplicate candidate detection (MinHash-LSH over a
document stream).

The batch near-dup pipeline (operators/dedup_fuzzy.py) is a corpus-level
self-join; a STREAM needs the incremental formulation: as each document
arrives, does any LSH band bucket already contain an earlier document?
This module implements it as

1. a shuffle-free per-row projection computing the MinHash signature
   (``dedup_fuzzy.minhash_signature_columns`` — array expressions, no
   aggregate) and its banded bucket keys;
2. one explode to (band_id, band_key) rows;
3. ``applyInPandasWithState`` keyed on the bucket: state = the FIRST
   document ever seen in that bucket; every later arrival emits a
   candidate edge ``(doc_id -> first_doc_id)``.

Output is a stream of candidate EDGES, star-shaped per bucket (everyone
links to the bucket's first document) rather than the batch clique
(all pairs). The two shapes are interchangeable for deduplication: a
star and a clique over the same members have identical connected
components, so downstream clustering (operators/graph.py) produces the
same duplicate clusters — pinned by
tests/test_streaming.py::TestNearDupStream. Exact Jaccard verification
stays a batch job over the flagged pairs (the standard lambda split:
stream flags cheaply, batch verifies exactly).

Scale story (the 100 TB/day version):
- signature + banding are projections — scan-speed, no shuffle;
- the only shuffle keys are (band_id, band_key) — bucket keys, not text;
- state is ONE row per active bucket (first_id, first_ts), evicted by a
  processing-time TTL, so state size tracks distinct buckets within the
  TTL window, not stream lifetime — same bounded-state argument as
  ``dedup_stream``'s watermark;
- dedup against history is free: the first-seen id persists in state, so
  a duplicate arriving hours later still links to the original without
  re-scanning the corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mini_data_platform_spark.functions.text import shingles_of, tokens
from mini_data_platform_spark.operators.dedup_fuzzy import (
    minhash_signature_columns,
)

#: (doc_id, first_doc_id, band_id) candidate edges
CANDIDATE_SCHEMA = "doc_id long, first_doc_id long, band_id int"
_STATE_SCHEMA = "first_id long, first_ts_ms long"

#: default bucket-state TTL: buckets idle this long are evicted
DEFAULT_TTL_MS = 6 * 3_600_000


def banded_bucket_keys(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, ts, band_id, band_key) rows for every document — the
    projection + one-explode prefix shared by the streaming operator and
    its static-mode parity tests. Same shingle/hash/band construction as
    the batch ``lsh_candidate_pairs``, so bucket keys are comparable
    across the two pipelines."""
    r = num_hashes // bands
    assert bands * r == num_hashes, "bands must divide num_hashes"
    toked = docs.select(
        F.col(id_col), F.col(ts_col), tokens(F.col(text_col)).alias("_toks")
    )
    shingled = toked.select(
        F.col(id_col), F.col(ts_col), shingles_of(F.col("_toks"), shingle_n).alias("_sh")
    )
    sigs = minhash_signature_columns(shingled, [id_col, ts_col], num_hashes)
    banded = sigs.select(
        F.col(id_col),
        F.col(ts_col),
        *[
            F.md5(
                F.concat_ws("|", *[F.col(f"mh_{b * r + j}") for j in range(r)])
            ).alias(f"band_{b}")
            for b in range(bands)
        ],
    )
    return banded.select(
        F.col(id_col),
        F.col(ts_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"), F.col(f"band_{b}").alias("band_key")
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select(id_col, ts_col, "bk.band_id", "bk.band_key")


def _make_bucket_fn(ttl_ms: int):
    def bucket_fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        band_id = int(key[0])
        if state.hasTimedOut:
            state.remove()
            return
        rows: list[tuple[int, int]] = []  # (ts_ms, doc_id)
        for pdf in pdfs:
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).tolist()
            rows.extend(zip(ts_ms, pdf["doc_id"].tolist()))
        rows.sort()
        if state.exists:
            first_id, first_ts = state.get
        else:
            first_ts, first_id = rows[0]
            rows = rows[1:]
        later = [int(d) for _, d in rows if d != first_id]
        state.update((int(first_id), int(first_ts)))
        state.setTimeoutDuration(ttl_ms)
        if later:
            yield pd.DataFrame(
                {
                    "doc_id": later,
                    "first_doc_id": [int(first_id)] * len(later),
                    "band_id": [band_id] * len(later),
                }
            )

    return bucket_fn


def near_dup_candidates_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    state_ttl_ms: int = DEFAULT_TTL_MS,
) -> DataFrame:
    """Streaming LSH near-dup candidates: emits one
    ``(doc_id, first_doc_id, band_id)`` edge per band bucket a document
    shares with that bucket's first-ever member. See module docstring for
    semantics and the scale argument. ``id_col`` must be long-typed (the
    fixture/document contract); rename upstream otherwise.

    One-shot (availableNow) runs MUST go through
    ``streaming.run.run_available_now``: the TTL's processing-time timeout
    makes Spark schedule continuous no-data micro-batches, so a plain
    availableNow query never terminates (streaming/run.py docstring)."""
    banded = banded_bucket_keys(
        docs, id_col, text_col, ts_col, num_hashes, bands, shingle_n
    ).select(
        F.col(id_col).alias("doc_id"), F.col(ts_col).alias("ts"),
        "band_id", "band_key",
    )
    return banded.groupBy("band_id", "band_key").applyInPandasWithState(
        _make_bucket_fn(state_ttl_ms),
        outputStructType=CANDIDATE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
