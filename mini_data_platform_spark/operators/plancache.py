"""Analyzed-plan cache for committed-segment parquet reads.

Every incremental store in this engine (merge tables, IVM views, the
near-dup/exact/embedding indexes) reads an immutable committed-segment
list per operation, and each ``spark.read.parquet(*paths)`` pays file
listing, footer schema reads, and driver-side analysis — pure latency
that a maintenance loop (N increments per funnel, one lookup per serve
request) re-pays for the SAME path set every call. This module caches
the analyzed DataFrame keyed by (application, exact path list, per-path
mtimes): any commit changes the segment list, compaction writes
fresh token-named segment dirs, and the mtime component catches even an
out-of-band rewrite — a stale entry is simply never hit again and ages
out of the LRU. DataFrames are immutable, so handing the same object to
concurrent readers is safe; a lock guards the map itself.

This caches the PLAN, not data — executors still read parquet; nothing
about memory or scale changes. operators/incremental.py carries its own
equivalent cache at the live-view level (tombstone anti-join included);
this is the shared primitive for the simpler single-table readers."""

from __future__ import annotations

import os
import threading
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession

_CACHE: "OrderedDict[tuple, DataFrame]" = OrderedDict()
_CACHE_MAX = 64
_LOCK = threading.Lock()


def cached_parquet(spark: SparkSession, paths: list[str]) -> DataFrame:
    """``spark.read.parquet(*paths)``, memoized on the exact path list
    + per-path mtimes. Falls back to an uncached read when a path
    cannot be stat'd (remote URIs, races with cleanup)."""
    try:
        stamps = tuple(os.stat(p).st_mtime_ns for p in paths)
    except OSError:
        return spark.read.parquet(*paths)
    key = (spark.sparkContext.applicationId, tuple(paths), stamps)
    with _LOCK:
        hit = _CACHE.get(key)
        if hit is not None:
            _CACHE.move_to_end(key)
            return hit
    df = spark.read.parquet(*paths)
    with _LOCK:
        _CACHE[key] = df
        while len(_CACHE) > _CACHE_MAX:
            _CACHE.popitem(last=False)
    return df
