"""Horizontal-drivers serving proof (round-12 verdict item 4).

Round 12 measured the single-driver serve-concurrency ceiling honestly:
8 in-process threads against one SparkSession top out near ~4 lookups/s
because per-lookup plan construction is Python/py4j driver work under
one GIL (BENCH_DETAIL_r12 ``serve_concurrent``; SURVEY §6). The scale-out
story — N independent read-only driver PROCESSES over the same prebuilt
parquet artifacts, zero coordination — was prose until now. This tool
measures it:

  python tools/serve_multiproc.py                        # full matrix
  python tools/serve_multiproc.py --queries doc_neardup_serve \
      --procs 1 2 --seconds 20 --out SERVE_MULTIPROC_r13.json

Design: the parent prebuilds the serve artifacts once (first touch paid
offline, exactly like bench.py's warmup), then for each process count N
spawns N worker processes. Each worker builds its OWN SparkSession
(``local[cpus]``; serving is driver-bound, so executor threads mostly
idle — that is the point), warms its per-process plan/artifact caches
with two untimed lookups, blocks on a wall-clock start barrier so the
timed windows overlap, then runs lookups for a fixed duration and
reports its own throughput. Aggregate lookups/s = sum over workers; the
artifact also records each pairing's window overlap so a straggler JVM
cannot fake a concurrency win (windows that overlap < 80% are flagged
and the pairing is not trusted).

Nothing here is engine code — it is measurement for the serving tier's
horizontal claim: the per-index serve caches (plans/_serving.py) are
per-process and publish via atomic rename, so concurrent readers share
disk artifacts and nothing else.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = ["doc_neardup_serve", "emb_ann_pq_serve"]
DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def _session(label: str, cpus: int):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.ui.enabled", "false")
        .appName(label)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _lookup_once(spark, fn, sf_dir: str) -> None:
    from mini_data_platform_spark.operators.resources import release_plan

    df = fn(spark, sf_dir)
    try:
        df.write.format("noop").mode("overwrite").save()
    finally:
        try:
            release_plan(df)
        except Exception:  # noqa: BLE001 — cleanup is advisory
            pass


def worker(query: str, sf_dir: str, start_at: float, seconds: float,
           cpus: int) -> None:
    """One driver process: warm, barrier, run lookups for ``seconds``,
    print a single JSON line on stdout (the parent parses it). The
    FIRST warmup lookup is timed and reported separately — on a cold
    fleet (no prebuilt artifacts) it IS the racing build, so its wall
    is the per-worker convergence cost the cold_start block records."""
    spark = _session(f"serve-mp-{query}-{os.getpid()}", cpus)
    import __spark_entry__ as entry_mod

    fn = entry_mod.queries()[query]
    f0 = time.perf_counter()
    _lookup_once(spark, fn, sf_dir)  # racing build on a cold fleet
    first_lookup = time.perf_counter() - f0
    t_first_done = time.time()
    _lookup_once(spark, fn, sf_dir)  # plan-cache warmup
    now = time.time()
    if start_at > now:
        time.sleep(start_at - now)
    t0 = time.time()
    deadline = t0 + seconds
    lats = []
    while time.time() < deadline:
        l0 = time.perf_counter()
        _lookup_once(spark, fn, sf_dir)
        lats.append(time.perf_counter() - l0)
    t1 = time.time()
    spark.stop()
    print(json.dumps({
        "query": query,
        "pid": os.getpid(),
        "n": len(lats),
        "window": [round(t0, 3), round(t1, 3)],
        "wall": round(t1 - t0, 3),
        "lps": round(len(lats) / (t1 - t0), 3),
        "p50": round(statistics.median(lats), 3) if lats else None,
        "first_lookup_sec": round(first_lookup, 3),
        "t_first_done": round(t_first_done, 3),
    }))


def aggregate(rows: list[dict]) -> dict:
    """Pure aggregation over worker reports (unit-tested): aggregate
    lookups/s = sum of per-worker rates, trusted only when every timed
    window overlaps ≥80% of the shortest wall — a straggler JVM that
    ran alone must not fake a concurrency win."""
    windows = [r["window"] for r in rows]
    overlap = max(
        0.0, min(w[1] for w in windows) - max(w[0] for w in windows)
    )
    min_wall = min(r["wall"] for r in rows)
    entry = {
        "n_procs": len(rows),
        "aggregate_lps": round(sum(r["lps"] for r in rows), 3),
        "per_proc_lps": [r["lps"] for r in rows],
        "per_proc_p50": [r["p50"] for r in rows],
        "lookups": sum(r["n"] for r in rows),
        "overlap_frac": round(overlap / min_wall, 3) if min_wall else 0.0,
    }
    if entry["overlap_frac"] < 0.8:
        entry["untrusted"] = (
            "timed windows overlap <80% — straggler JVM; rerun"
        )
    return entry


def _spawn(query: str, sf_dir: str, start_at: float, seconds: float,
           cpus: int) -> subprocess.Popen:
    return subprocess.Popen(
        [
            sys.executable, os.path.abspath(__file__), "--worker", query,
            "--sf-dir", sf_dir, "--start-at", repr(start_at),
            "--seconds", repr(seconds), "--cpus", str(cpus),
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        cwd=REPO,
        text=True,
    )


def run_matrix(queries: list[str], procs: list[int], sf_dir: str,
               seconds: float, cpus: int, warm_allowance: float) -> dict:
    # prebuild the shared disk artifacts once so every worker's first
    # touch is a cache READ (bench.py does the same in its warmup)
    spark = _session("serve-mp-prebuild", 16)
    import __spark_entry__ as entry_mod

    qmap = entry_mod.queries()
    for q in queries:
        _lookup_once(spark, qmap[q], sf_dir)
        print(f"prebuilt artifacts for {q}", flush=True)
    gateway = getattr(spark.sparkContext, "_gateway", None)
    spark.stop()
    try:
        # stop() alone leaves the parent's py4j gateway JVM alive for
        # the rest of the matrix — an idle-but-real process the timed
        # windows then share cores with. The parent never touches
        # Spark again, so shut the JVM down outright.
        if gateway is not None:
            gateway.shutdown()
    except Exception:  # noqa: BLE001 — advisory cleanup
        pass

    results: dict[str, dict] = {}
    for q in queries:
        results[q] = {}
        for n in procs:
            start_at = time.time() + warm_allowance
            ps = [_spawn(q, sf_dir, start_at, seconds, cpus)
                  for _ in range(n)]
            rows, dead = [], 0
            for p in ps:
                try:
                    out, _ = p.communicate(
                        timeout=warm_allowance + seconds + 120
                    )
                except subprocess.TimeoutExpired:
                    p.kill()  # a hung JVM must not wedge the matrix
                    out = ""
                line = out.strip().splitlines()[-1] if out.strip() else "{}"
                try:
                    row = json.loads(line)
                except ValueError:
                    row = {}
                if "window" in row:
                    rows.append(row)
                else:
                    dead += 1
            if not rows:
                results[q][str(n)] = {"err": f"all {n} workers died"}
                continue
            entry = aggregate(rows)
            if dead:
                entry["untrusted"] = (
                    f"{dead}/{n} workers died — aggregate understates"
                )
            entry["loadavg"] = [round(x, 2) for x in os.getloadavg()]
            results[q][str(n)] = entry
            print(f"{q} x{n}: {entry['aggregate_lps']} lookups/s "
                  f"(per-proc {entry['per_proc_lps']}, "
                  f"overlap {entry['overlap_frac']})", flush=True)
        solo = results[q].get("1", {}).get("aggregate_lps")
        for n in procs:
            entry = results[q][str(n)]
            if n > 1 and solo and "aggregate_lps" in entry:
                entry["scaling_vs_solo"] = round(
                    entry["aggregate_lps"] / solo, 2
                )
    return results


def wipe_serve_caches() -> int:
    """Remove every published serve artifact (and any orphaned staging
    dir) from the temp dir — the cold-fleet precondition."""
    import glob
    import shutil
    import tempfile

    n = 0
    for d in glob.glob(os.path.join(tempfile.gettempdir(), "mdp_serveidx_*")):
        shutil.rmtree(d, ignore_errors=True)
        n += 1
    return n


def _serve_cache_census() -> dict:
    import glob
    import tempfile

    paths = glob.glob(os.path.join(tempfile.gettempdir(), "mdp_serveidx_*"))
    return {
        "published_dirs": sum(1 for p in paths if ".build-" not in p),
        "staging_leftovers": sum(1 for p in paths if ".build-" in p),
    }


def run_cold_start(queries: list[str], n: int, sf_dir: str,
                   seconds: float, cpus: int,
                   warm_allowance: float) -> dict:
    """Cold-fleet start (round-13 verdict item 6): wipe the serve
    caches, spawn ``n`` workers with NO parent prebuild — their first
    lookups race to build the artifacts; the atomic-rename publish
    means exactly one copy per artifact survives and losers discard.
    Records per-worker first-lookup walls (the racing build),
    fleet convergence (spawn → last worker's first lookup done), and a
    post-run census proving single-winner publish (no duplicate
    artifact dirs, no staging leftovers)."""
    results: dict[str, dict] = {}
    for q in queries:
        wiped = wipe_serve_caches()
        start_at = time.time() + warm_allowance
        t_spawn = time.time()
        ps = [_spawn(q, sf_dir, start_at, seconds, cpus) for _ in range(n)]
        rows = []
        for p in ps:
            try:
                out, _ = p.communicate(timeout=warm_allowance + seconds + 300)
            except subprocess.TimeoutExpired:
                p.kill()
                out = ""
            line = out.strip().splitlines()[-1] if out.strip() else "{}"
            try:
                row = json.loads(line)
            except ValueError:
                row = {}
            if "window" in row:
                rows.append(row)
        entry = {
            "n_procs": n,
            "workers_alive": len(rows),
            "caches_wiped": wiped,
            "per_worker_first_lookup_sec": [
                r.get("first_lookup_sec") for r in rows
            ],
            "convergence_sec": round(
                max(r["t_first_done"] for r in rows) - t_spawn, 3
            ) if rows else None,
            "post_run": _serve_cache_census(),
        }
        if rows:
            steady = aggregate(rows)
            entry["steady_after_converge"] = {
                "aggregate_lps": steady["aggregate_lps"],
                "per_proc_lps": steady["per_proc_lps"],
                "overlap_frac": steady["overlap_frac"],
            }
        results[q] = entry
        print(f"cold start {q} x{n}: convergence "
              f"{entry['convergence_sec']}s, first lookups "
              f"{entry['per_worker_first_lookup_sec']}, post-run "
              f"{entry['post_run']}", flush=True)
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", default=None, help="internal: query name")
    ap.add_argument("--queries", nargs="+", default=DEFAULT_QUERIES)
    ap.add_argument("--procs", nargs="+", type=int, default=[1, 2, 4])
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR))
    ap.add_argument("--seconds", type=float, default=25.0)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--start-at", type=float, default=0.0)
    ap.add_argument("--warm-allowance", type=float, default=75.0,
                    help="seconds from spawn to the start barrier "
                         "(JVM spinup + 2 warmup lookups)")
    ap.add_argument("--out", default="/tmp/serve_multiproc.json")
    ap.add_argument("--cold-start", type=int, default=0, metavar="N",
                    help="also run the cold-fleet block: wipe serve "
                         "caches, N workers race to build (0 = skip)")
    ap.add_argument("--skip-matrix", action="store_true",
                    help="run only the cold-start block")
    args = ap.parse_args()

    if args.worker:
        worker(args.worker, args.sf_dir, args.start_at, args.seconds,
               args.cpus)
        return

    out = {
        "sf_dir": args.sf_dir,
        "seconds_per_window": args.seconds,
        "worker_cpus": args.cpus,
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
    }
    if args.cold_start:
        # cold block FIRST: the matrix prebuild would defeat the wipe
        out["cold_start"] = run_cold_start(
            args.queries, args.cold_start, args.sf_dir, args.seconds,
            args.cpus, args.warm_allowance,
        )
    if not args.skip_matrix:
        out["results"] = run_matrix(args.queries, args.procs, args.sf_dir,
                                    args.seconds, args.cpus,
                                    args.warm_allowance)
    with open(args.out, "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
