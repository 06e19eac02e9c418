"""Decompose the ~0.7-0.8 s fixed-size point-lookup floor (round-14
verdict item 7): where does one 25-doc near-dup serving lookup spend
its time?

Phases measured per run (after 2 warm runs, so plan caches and the OS
page cache are in serving state):

- build_s      — constructing the lookup DataFrame. For the point-probe
                 path this INCLUDES the real driver-side probe work:
                 the batch-key collect, the pushed-IN probe scan, and
                 the Python pair generation (3 small Spark jobs by
                 design — see operators/incremental.py point probe).
- exec_s       — running the final plan (noop write; JVM execution).
- collect_s    — cProfile cumulative time under DataFrame.collect
                 inside the build = the probe jobs' wall (JVM job
                 scheduling + parquet read + result pickle).
- py4j_s       — cProfile cumulative under py4j send_command = every
                 driver→JVM round trip during the build (plan
                 construction, analysis, and the collects' transport;
                 overlaps collect_s — the two are alternative lenses,
                 not disjoint buckets).
- python_s     — build_s minus collect_s: driver-side Python+py4j plan
                 assembly outside the probe jobs.

Usage:
    python tools/profile_point.py [sf_dir] [--runs N]

Prints one JSON line with per-phase medians plus the cProfile top for
the last run — paste the table into SURVEY §6.
"""

from __future__ import annotations

import argparse
import cProfile
import io
import json
import os
import pstats
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _phase_times(pr: cProfile.Profile) -> dict[str, float]:
    """Cumulative seconds under collect / py4j transport in a profile."""
    st = pstats.Stats(pr)
    collect = py4j = 0.0
    for (fname, _lineno, func), (_cc, _nc, _tt, ct, _callers) in st.stats.items():
        if func == "collect" and "dataframe" in fname:
            collect += ct
        if func == "send_command" and "py4j" in fname:
            py4j = max(py4j, ct)  # nested wrappers share the outer wall
    return {"collect_s": collect, "py4j_s": py4j}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--n-docs", type=int, default=25)
    args = ap.parse_args()

    from mini_data_platform_spark.session import get_spark

    spark = get_spark("profile-point")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from mini_data_platform_spark.operators.incremental import (
        neardup_index_lookup,
    )
    from mini_data_platform_spark.operators.resources import release_plan
    from mini_data_platform_spark.plans import llm

    # the serving request shape of probe_full._neardup_point_lookups:
    # a fixed 25-doc mutated batch against the cached serve index
    docs = llm.load_table(spark, args.sf_dir, "documents").select(
        "doc_id", "text"
    )
    t = llm.TX.tokens(F.col("text"))
    batch = llm._spread(
        docs.orderBy("doc_id").limit(args.n_docs).select(
            (F.col("doc_id") + 90_000_000).alias("doc_id"),
            F.concat_ws(" ", F.slice(t, 2, F.size(t) - 1)).alias("text"),
        )
    )
    from mini_data_platform_spark.operators.incremental import (
        neardup_index_build,
    )

    index_dir = llm._cached_index(
        args.sf_dir,
        f"nd|{llm.JACCARD_THRESHOLD}|{llm.NUM_HASHES}|{llm.BANDS}|"
        f"{llm.SHINGLE_N}",
        lambda d: neardup_index_build(
            llm._spread(docs), d, "doc_id", "text",
            llm.JACCARD_THRESHOLD, llm.NUM_HASHES, llm.BANDS,
            llm.SHINGLE_N,
        ),
    )

    for _ in range(2):  # warm: per-process plan caches + page cache
        df = neardup_index_lookup(batch, index_dir, small_batch=True)
        df.write.format("noop").mode("overwrite").save()
        release_plan(df)

    rows = []
    last_profile = None
    for _ in range(args.runs):
        pr = cProfile.Profile()
        t0 = time.perf_counter()
        pr.enable()
        df = neardup_index_lookup(batch, index_dir, small_batch=True)
        pr.disable()
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_exec = time.perf_counter() - t0
        release_plan(df)
        phases = _phase_times(pr)
        rows.append(
            {
                "total_s": round(t_build + t_exec, 3),
                "build_s": round(t_build, 3),
                "exec_s": round(t_exec, 3),
                "collect_s": round(phases["collect_s"], 3),
                "py4j_s": round(phases["py4j_s"], 3),
                "python_s": round(t_build - phases["collect_s"], 3),
            }
        )
        last_profile = pr

    med = {
        k: round(statistics.median(r[k] for r in rows), 3)
        for k in rows[0]
    }
    out = {
        "tool": "tools/profile_point.py",
        "sf_dir": args.sf_dir,
        "n_docs": args.n_docs,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "median": med,
        "runs": rows,
    }
    print(json.dumps(out, sort_keys=True))
    s = io.StringIO()
    pstats.Stats(last_profile, stream=s).sort_stats("cumulative").print_stats(
        20
    )
    print(s.getvalue())
    spark.stop()


if __name__ == "__main__":
    main()
