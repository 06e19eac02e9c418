"""Ingest-throughput scale probe (round-13; makes the SURVEY §6
ingest-scale numbers reproducible instead of prose).

bench.py's ingest block measures the end-to-end batch pipeline
(validate → clean/coerce → dedup → keyed parquet upsert → finalize
moves) at a fixed 100k rows / 8 files — a window short enough that
fixed per-run costs (validation round-trips, upsert planning, JVM
job-submission latency) dominate. This tool runs the SAME
``bench.bench_ingest`` at a volume ladder so the scale story is
measured, not extrapolated:

  python tools/ingest_scale.py [--out INGEST_SCALE_rN.json]

One warm run (first-pipeline-touch codegen excluded, mirroring
bench.py's warmup doctrine), then each ladder rung once. The artifact
records loadavg at start so a contended recording is self-diagnosing
(same doctrine as BENCH_DETAIL's load block).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: (rows, files) rungs: the bench point, then 10x and 20x volume.
LADDER = [(100_000, 8), (1_000_000, 32), (2_000_000, 64)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ingest_scale.json")
    args = ap.parse_args()

    import bench
    from mini_data_platform_spark.session import get_spark

    load0 = [round(x, 2) for x in os.getloadavg()]
    spark = get_spark()
    warm = bench.bench_ingest(spark, n=100_000, files=8)
    runs = []
    for n, files in LADDER:
        r = bench.bench_ingest(spark, n=n, files=files)
        r["n"], r["n_files"] = n, files
        runs.append(r)
        print(f"{n} rows / {files} files: {r['rows_per_min']} rows/min",
              flush=True)
    spark.stop()

    out = {
        "tool": "tools/ingest_scale.py",
        "loadavg_start": load0,
        "warm_run_excluded": warm,
        "runs": runs,
        "reference_rows_per_min": 10_000,
    }
    with open(args.out, "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
