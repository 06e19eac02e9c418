"""Benchmark harness — driver contract (TESTDATA.md / BASELINE.md).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...,
 "ingest": {"rows": ..., "rows_per_min": ...}}

Each query is forced with a noop-format write (full plan execution, no
driver-side collect cost); failures are isolated per query and recorded
under "errors" so one broken query never sinks the run. A warmup absorbs
JVM/codegen/Python-worker startup so per-query numbers reflect
steady-state plan cost. The "ingest" block measures the end-to-end batch
pipeline (validate -> clean -> dedup -> keyed upsert) in rows/min —
directly comparable to the reference's published 10k rows/min
(BASELINE.md). The JSON line is printed last, after spark.stop().
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mini_data_platform_spark.session import get_spark  # noqa: E402


def bench_ingest(spark, n: int = 100_000, files: int = 8) -> dict:
    """End-to-end batch-ingest throughput: generate ``n`` synthetic sales
    rows as ``files`` CSV files, run the full pipeline (validate -> clean/
    coerce -> dedup -> parquet keyed upsert -> finalize moves), report
    rows/min. Direct comparison point for the reference's published
    10,000 rows/min single-node figure (BASELINE.md) — same workload
    shape, measured end to end including validation and file moves.
    Generation time is excluded; the clock covers ingestion only."""
    import shutil
    import tempfile

    from mini_data_platform_spark.generator import generate_sales_data
    from mini_data_platform_spark.runner import run_batch_ingest
    from mini_data_platform_spark.sinks.upsert import upsert_parquet

    root = tempfile.mkdtemp(prefix="bench_ingest_")
    try:
        incoming = os.path.join(root, "incoming")
        generate_sales_data(spark, n, seed=7, num_partitions=files).write.option(
            "header", True
        ).mode("overwrite").csv(incoming)
        for fn in os.listdir(incoming):  # drop _SUCCESS/.crc marker noise
            if not fn.endswith(".csv"):
                os.remove(os.path.join(incoming, fn))
        target = os.path.join(root, "sales")
        t0 = time.perf_counter()
        report = run_batch_ingest(
            spark,
            incoming,
            os.path.join(root, "processed"),
            os.path.join(root, "failed"),
            sink=lambda df: upsert_parquet(spark, df, target, ["sale_id"]),
        )
        sec = time.perf_counter() - t0
        return {
            "rows": report.rows_upserted,
            "files": len(report.outcomes),
            "failed_files": len(report.failed),
            "sec": round(sec, 3),
            "rows_per_min": round(report.rows_upserted / sec * 60),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()

    # warmup: absorb JVM startup, codegen compile, and parquet reader init
    # (sf0.001 scan — steady-state per-query numbers, negligible work)
    from mini_data_platform_spark.catalog import load_table

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in ("lineitem", "events", "documents", "embeddings"):
        load_table(spark, "/root/testdata/sf0.001", t).count()
    # spawn the Python worker pool + Arrow serializers once, so the first
    # pandas-UDF query measures its plan, not worker startup
    from pyspark.sql import functions as F

    (
        spark.range(64)
        .withColumn("g", F.col("id") % 8)
        .groupBy("g")
        .applyInPandas(lambda pdf: pdf, "id long, g long")
        .write.format("noop").mode("overwrite").save()
    )

    # Per-query error isolation: one broken query must not abort the run
    # (rounds 3+4 lost all bench signal to a single failing query). Errors
    # are recorded in a parallel dict and the JSON line ALWAYS prints.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in queries.items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — isolate, record, continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"bench: query {name!r} FAILED: {errors[name]}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
    }
    if errors:
        out["errors"] = errors
    try:
        out["ingest"] = bench_ingest(spark)
    except Exception as exc:  # noqa: BLE001 — auxiliary metric, never fatal
        out["ingest"] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
    # Stop the session BEFORE printing so no JVM/log4j output can land
    # after the JSON line — it must be the LAST line on stdout, on its own
    # line (the driver tail-parses it).
    try:
        spark.stop()
    except Exception:  # noqa: BLE001
        pass
    sys.stderr.flush()
    sys.stdout.flush()
    print(json.dumps(out))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
