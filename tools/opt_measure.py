"""Round-15 optimization harness: isolate named queries, time them
against the noop sink (guide §1.4), and capture ``explain("formatted")``
to plans/r15/<query>_<tag>.txt (guide §1 "measure first").

Usage:
    python tools/opt_measure.py [--runs K] [--tag before|after]
                                [--sf-dir DIR] [--no-explain]
                                query [query ...]
    python tools/opt_measure.py --top N --tag before   # N slowest from
                                                       # BENCH_DETAIL_r15.json

Prints one line per query: median/min of K timed noop-sink runs after
one untimed warm run (the warm run also writes the plan file). Jobs are
labelled with setJobDescription so the UI/event log stays readable.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def _print_jobs(evdir: str, names: list[str]) -> None:
    """Per-job wall times from the event log, grouped by the
    ``opt:<name>:0`` job description (the first timed run only)."""
    jobs: dict[int, dict] = {}
    for fn in os.listdir(evdir):
        path = os.path.join(evdir, fn)
        if not os.path.isfile(path):
            continue
        with open(path, encoding="utf-8", errors="replace") as fh:
            for line in fh:
                if '"SparkListenerJobStart"' in line:
                    ev = json.loads(line)
                    desc = (ev.get("Properties") or {}).get(
                        "spark.job.description", "")
                    jobs[ev["Job ID"]] = {
                        "desc": desc, "t0": ev["Submission Time"],
                        "stages": [
                            (s.get("Stage Name") or "")[:90]
                            for s in ev.get("Stage Infos", [])
                        ],
                    }
                elif '"SparkListenerJobEnd"' in line:
                    ev = json.loads(line)
                    j = jobs.get(ev["Job ID"])
                    if j:
                        j["sec"] = (ev["Completion Time"] - j["t0"]) / 1000
    for name in names:
        tag = f"opt:{name}:0"
        mine = sorted(
            (j for j in jobs.values() if j["desc"] == tag and "sec" in j),
            key=lambda j: -j["sec"],
        )
        total = sum(j["sec"] for j in mine)
        print(f"\n== {name}: {len(mine)} jobs, {total:.3f}s job wall")
        for j in mine[:25]:
            print(f"  {j['sec']:7.3f}s  {'; '.join(j['stages'][:2])}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--tag", default=None, help="plan file suffix")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--top", type=int, default=0,
                    help="add the N slowest queries from BENCH_DETAIL_r15")
    ap.add_argument("--no-explain", action="store_true")
    ap.add_argument("--conf", action="append", default=[],
                    help="extra spark conf k=v (repeatable) — config "
                         "experiments without touching session.py")
    ap.add_argument("--jobs", action="store_true",
                    help="enable the event log and print per-job wall "
                         "times for the FIRST timed run of each query")
    args = ap.parse_args()

    names = list(args.queries)
    if args.top:
        with open(os.path.join(REPO_ROOT, "BENCH_DETAIL_r15.json")) as fh:
            detail = json.load(fh)
        ranked = sorted(detail["queries"].items(), key=lambda kv: -kv[1])
        for name, _ in ranked[: args.top]:
            if name not in names:
                names.append(name)

    from mini_data_platform_spark.session import get_spark
    from mini_data_platform_spark.operators.resources import release_plan

    evdir = "/tmp/mdp_opt_eventlog"
    extra = {}
    if args.jobs:
        import shutil

        shutil.rmtree(evdir, ignore_errors=True)
        os.makedirs(evdir, exist_ok=True)
        extra = {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        }
    for kv in args.conf:
        k, _, v = kv.partition("=")
        extra[k] = v
    spark = get_spark("opt_measure", extra_conf=extra)
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    # shared warmup: JVM, codegen, python worker pool (mirrors bench.py)
    from pyspark.sql import functions as F

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    (
        spark.range(64)
        .withColumn("g", F.col("id") % 8)
        .groupBy("g")
        .applyInPandas(lambda pdf: pdf, "id long, g long")
        .write.format("noop").mode("overwrite").save()
    )

    plan_dir = os.path.join(REPO_ROOT, "plans", "r15")
    os.makedirs(plan_dir, exist_ok=True)

    results = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"opt:{name}:warm")
        df = fn(spark, args.sf_dir)
        if args.tag and not args.no_explain:
            with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted")))
        # untimed warm run (page cache, artifact build, codegen for this plan)
        df.write.format("noop").mode("overwrite").save()
        release_plan(df)
        runs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"opt:{name}:{i}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            release_plan(df)
        results[name] = runs
        print(
            f"{name:34s} median={statistics.median(runs):7.3f}s "
            f"min={min(runs):7.3f}s runs={[round(r, 3) for r in runs]}",
            flush=True,
        )
    spark.stop()
    if args.jobs:
        _print_jobs(evdir, names)
    print(json.dumps({k: round(statistics.median(v), 3)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
