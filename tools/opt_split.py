"""Round-15 tail attribution: split each query's wall into driver-side plan
CONSTRUCTION (the ``queries()[name](spark, sf_dir)`` call — py4j Column
building plus any eager artifact jobs) and EXECUTION (the noop-sink
action on the returned frame), guide §1 / §7.3: a query whose construct
share dominates is a driver-overhead problem (the simhash/ivf_assign
class), not a plan problem.

Usage:
    python tools/opt_split.py [--sf-dir DIR] [--min-sec S] [query ...]

With no queries given, sweeps every declared query. Each query gets one
untimed warm run (artifact caches, codegen), then one timed
construct+exec pass, then a SECOND timed construct (plan re-build with
warm JVM state) to separate steady construction cost from first-touch
effects. Output is sorted by steady construct descending.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--min-sec", type=float, default=0.0,
                    help="only print queries whose total >= this")
    args = ap.parse_args()

    from mini_data_platform_spark.operators.resources import release_plan
    from mini_data_platform_spark.session import get_spark

    spark = get_spark("opt_split")
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    names = list(args.queries) if args.queries else list(queries)
    unknown = [n for n in names if n not in queries]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    from pyspark.sql import functions as F

    # shared warmup: JVM, codegen, python worker pool (mirrors bench.py)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    (
        spark.range(64)
        .withColumn("g", F.col("id") % 8)
        .groupBy("g")
        .applyInPandas(lambda pdf: pdf, "id long, g long")
        .write.format("noop").mode("overwrite").save()
    )

    rows = []
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"split:{name}:warm")
        try:
            df = fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            release_plan(df)

            spark.sparkContext.setJobDescription(f"split:{name}:timed")
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            release_plan(df)

            # second construct: steady plan-build cost with warm state
            t3 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            t4 = time.perf_counter()
            release_plan(df)
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            print(f"{name:34s} FAILED: {type(exc).__name__}: {exc}"[:120])
            continue
        rows.append({
            "name": name,
            "construct": t1 - t0,
            "exec": t2 - t1,
            "construct2": t4 - t3,
            "total": t2 - t0,
        })

    rows.sort(key=lambda r: -r["construct2"])
    print(f"\n{'query':34s} {'constr':>8s} {'constr2':>8s} "
          f"{'exec':>8s} {'total':>8s}")
    for r in rows:
        if r["total"] < args.min_sec:
            continue
        print(f"{r['name']:34s} {r['construct']:8.3f} "
              f"{r['construct2']:8.3f} {r['exec']:8.3f} {r['total']:8.3f}")


if __name__ == "__main__":
    main()
