"""Phase-level profiler for the near-dup serving lookups.

Runs a *_serve query steady-state (index prebuilt + warmed) and reports
where the wall goes: per-Spark-job durations from the status tracker
plus the end-to-end wall per iteration. Usage:

    python tools/profile_serve.py [doc|emb] [sf_dir] [iters]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "doc"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("MDP_PROF_PARFIRST", "true"),
        )
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("MDP_PROF_ADVISORY", "67108864"),
        )
        .appName("profile_serve")
        .getOrCreate()
    )
    from mini_data_platform_spark.plans import llm
    from mini_data_platform_spark.operators.resources import release_plan

    fn = llm.doc_neardup_serve if which == "doc" else llm.emb_neardup_serve
    st = spark.sparkContext.statusTracker()

    # warm: build/cache the index and JIT the plan once
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    release_plan(df)

    for it in range(iters):
        jobs_before = set(st.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        t_total = time.perf_counter() - t0
        release_plan(df)
        jobs_after = set(st.getJobIdsForGroup(None) or [])
        new_jobs = sorted(jobs_after - jobs_before)
        print(f"iter {it}: build={t_build:.3f}s total={t_total:.3f}s "
              f"jobs={len(new_jobs)}")
        for j in new_jobs:
            ji = st.getJobInfo(j)
            if ji is None:
                continue
            stages = []
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si:
                    stages.append(f"s{sid}:{si.numTasks}t")
            print(f"  job {j}: stages=[{', '.join(stages)}]")
    spark.stop()


if __name__ == "__main__":
    main()
