"""Round-over-round bench regression gate (round-9 verdict item 1).

Two silent per-query creeps slipped through human review in three
rounds (emb_dup_clusters 2.3→8.6 s over rounds 6→9; emb_near_dups_exact
1.33→2.73 s inside round 9) because the bench artifact is a 129-entry
dict a reader eyeballs. This makes the diff mechanical:

  python tools/bench_regress.py                 # latest two BENCH_DETAIL_r*
  python tools/bench_regress.py --old BENCH_DETAIL_r08.json \
                                --new BENCH_DETAIL_r09.json

A query REGRESSED when both gates trip (ratio alone flags 0.1→0.2 s
noise; absolute alone flags 20→21 s drift that IS worth a look but not
a gate failure):

  new >= old * RATIO   (default 1.5×)
  new - old >= ABS_SEC (default 0.5 s)

The ingest block regresses on rows_per_min dropping below 1/RATIO of
the previous round. Every flagged name must be EXPLAINED — named in
SURVEY.md §6 (the performance-notes section, where the cause lives as
prose with numbers) in a note STAMPED with the regressing round
(``r{N}:`` in the same paragraph as the query name; N parsed from the
new detail file) — or the gate exits 1. The stamp requirement is the
round-11 hardening: a bare substring match let that round's two flags
pass on §6 prose written in rounds 9-10 about different numbers with
different causes, laundering the creep. tests/test_bench_regress.py
runs the same gate against the repo's latest two detail files inside
the normal pytest sweep, so a round cannot close with an unexplained
creep.

Context the report always prints: loadavg start/end of both runs.
A contended driver machine inflates CPU-bound queries ~uniformly
(round-6 note: two bench attempts read 480 s and 200 s under ambient
load) — when the loadavg ratio is >2× the report says so, because the
right fix is then a re-run or a §6 contention note, not a plan hunt.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RATIO = 1.5
ABS_SEC = 0.5


def latest_details(repo: str = REPO) -> tuple[str, str]:
    """Paths of the two most recent BENCH_DETAIL_r{N}.json files."""
    stamped = sorted(
        (int(m.group(1)), fn)
        for fn in os.listdir(repo)
        if (m := re.match(r"BENCH_DETAIL_r(\d+)\.json$", fn))
    )
    if len(stamped) < 2:
        raise SystemExit("need at least two BENCH_DETAIL_r*.json files")
    return (
        os.path.join(repo, stamped[-2][1]),
        os.path.join(repo, stamped[-1][1]),
    )


def survey_section6(repo: str = REPO) -> str:
    """SURVEY.md §6 text — the place a regression's cause must be named."""
    with open(os.path.join(repo, "SURVEY.md"), encoding="utf-8") as fh:
        text = fh.read()
    m = re.search(r"^## 6\..*?(?=^## 7\.|\Z)", text, re.M | re.S)
    return m.group(0) if m else ""


def find_regressions(
    old: dict,
    new: dict,
    ratio: float = RATIO,
    abs_sec: float = ABS_SEC,
) -> list[dict]:
    """Flagged regressions between two BENCH_DETAIL dicts (pure logic —
    unit-tested directly). Each entry: name, old, new, kind."""
    flags: list[dict] = []
    oq, nq = old.get("queries", {}), new.get("queries", {})
    for name in sorted(set(oq) & set(nq)):
        o, n = oq[name], nq[name]
        if n >= o * ratio and n - o >= abs_sec:
            flags.append({"name": name, "old": o, "new": n, "kind": "query"})
    oi, ni = old.get("ingest", {}), new.get("ingest", {})
    orpm, nrpm = oi.get("rows_per_min"), ni.get("rows_per_min")
    if orpm and nrpm and nrpm * ratio <= orpm:
        flags.append(
            {"name": "ingest", "old": orpm, "new": nrpm, "kind": "ingest"}
        )
    return flags


def round_of(path: str) -> int | None:
    """Round number from a BENCH_DETAIL_r{N}.json filename, else None."""
    m = re.search(r"BENCH_DETAIL_r(\d+)\.json$", os.path.basename(path))
    return int(m.group(1)) if m else None


def unexplained(
    flags: list[dict], notes: str, round_no: int | None = None
) -> list[dict]:
    """Flags not explained in the §6 notes text. The ingest block is
    matched on 'rows/min' OR 'ingest' (that is how the prose refers to
    it). With ``round_no`` (the regressing round, parsed from the new
    detail filename — the repo gate always passes it), the needle must
    share a PARAGRAPH with an ``r{N}:`` stamp: a note written about a
    different round's numbers never explains this round's creep
    (round-11: both flags passed on rounds-9/10 prose)."""
    if round_no is not None:
        stamp = f"r{round_no}:"
        blocks = [b for b in re.split(r"\n\s*\n", notes) if stamp in b]
        notes = "\n\n".join(blocks)
    out = []
    for f in flags:
        needles = (
            [f["name"]] if f["kind"] == "query"
            else ["rows/min", "rows_per_min", "ingest"]
        )
        if not any(n in notes for n in needles):
            out.append(f)
    return out


def _load_ctx(d: dict) -> str:
    load = d.get("load") or {}
    s, e = load.get("loadavg_start"), load.get("loadavg_end")
    return f"loadavg {s} -> {e}" if s else "loadavg unrecorded"


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--old")
    p.add_argument("--new")
    p.add_argument("--ratio", type=float, default=RATIO)
    p.add_argument("--abs", dest="abs_sec", type=float, default=ABS_SEC)
    a = p.parse_args(argv)
    if bool(a.old) != bool(a.new):
        p.error("--old and --new come together")
    old_path, new_path = (
        (a.old, a.new) if a.old else latest_details()
    )
    with open(old_path, encoding="utf-8") as fh:
        old = json.load(fh)
    with open(new_path, encoding="utf-8") as fh:
        new = json.load(fh)
    print(f"old: {os.path.basename(old_path)}  ({_load_ctx(old)})")
    print(f"new: {os.path.basename(new_path)}  ({_load_ctx(new)})")
    ol = (old.get("load") or {}).get("loadavg_start") or [0]
    nl = (new.get("load") or {}).get("loadavg_start") or [0]
    if ol[0] and nl[0] and max(nl[0] / ol[0], ol[0] / nl[0]) > 2:
        print(
            "NOTE: >2x loadavg delta between runs — uniform inflation "
            "here is the contention signature, not a plan regression"
        )
    flags = find_regressions(old, new, a.ratio, a.abs_sec)
    if not flags:
        print(f"no regressions (> {a.ratio}x and > {a.abs_sec}s)")
        return 0
    notes = survey_section6()
    new_round = round_of(new_path)
    if new_round is not None:
        print(f"explanations must carry an 'r{new_round}:' stamp in §6")
    bad = unexplained(flags, notes, new_round)
    for f in flags:
        tag = "UNEXPLAINED" if f in bad else "explained in SURVEY §6"
        unit = "s" if f["kind"] == "query" else " rows/min"
        print(f"  {f['name']}: {f['old']}{unit} -> {f['new']}{unit}  [{tag}]")
    if bad:
        print(
            f"\nFAIL: {len(bad)} regression(s) not named in SURVEY.md §6 — "
            "either fix the query or pin the cause with numbers there"
        )
        return 1
    print("\nall regressions carry a SURVEY §6 note")
    return 0


if __name__ == "__main__":
    sys.exit(main())
