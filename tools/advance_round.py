"""Advance __spark_entry__'s rotation bookkeeping to the next round.

The rotation invariant is enforced mechanically
(tests/test_entry.py::test_rotation_staleness_bound over
``_LAST_WINDOWED`` + ``CURRENT_ROUND``), but MAINTAINING the dict each
round was a by-hand transcription of CORRECTNESS_r{N}.json — exactly
the manual step the round-8 breach proved unreliable. This helper does
the bookkeeping from the recorded artifacts:

  python tools/advance_round.py            # report only
  python tools/advance_round.py --write    # rewrite _LAST_WINDOWED

It reads every CORRECTNESS_r*.json, computes each query's true last
driver-windowed round, prints the cohorts (who MUST be in the next
window, who may rotate out), and with --write regenerates the
``_LAST_WINDOWED = {...}`` block in __spark_entry__.py grouped by
round. Window SELECTION stays a human decision (rule 2 needs the
round's diff); this only keeps the record honest.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def last_windowed() -> tuple[dict[str, int], int]:
    import __spark_entry__ as entry

    queries = list(entry.queries())
    last = {q: 0 for q in queries}
    max_round = 0
    for fn in sorted(os.listdir(REPO)):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", fn)
        if not m:
            continue
        rnd = int(m.group(1))
        max_round = max(max_round, rnd)
        for q in json.load(open(os.path.join(REPO, fn))):
            if q in last:
                last[q] = max(last[q], rnd)
    return last, max_round


def main() -> None:
    last, max_round = last_windowed()
    nxt = max_round + 1
    print(f"latest recorded round: {max_round}; next: {nxt}")
    by_round: dict[int, list[str]] = {}
    for q, r in last.items():
        by_round.setdefault(r, []).append(q)
    must = sorted(
        q for q, r in last.items() if nxt - r > 2
    )
    print(f"\nMUST be in round-{nxt} window (age > 2): {len(must)}")
    for q in must:
        print(f"  {q} (last r{last[q]})")
    for r in sorted(by_round):
        print(f"round {r}: {len(by_round[r])} queries")

    if "--write" not in sys.argv:
        return
    lines = ["_LAST_WINDOWED = {"]
    for r in sorted(by_round):
        label = "never windowed" if r == 0 else f"last windowed in round {r}"
        lines.append(f"    # {label}")
        row = "   "
        for q in sorted(by_round[r]):
            tok = f' "{q}": {r},'
            if len(row) + len(tok) > 78:
                lines.append(row)
                row = "   "
            row += tok
        if row.strip():
            lines.append(row)
    lines.append("}")
    block = "\n".join(lines)
    path = os.path.join(REPO, "__spark_entry__.py")
    src = open(path, encoding="utf-8").read()
    new, n = re.subn(
        r"_LAST_WINDOWED = \{.*?\n\}", block, src, count=1, flags=re.S
    )
    if n != 1:
        raise SystemExit("could not locate the _LAST_WINDOWED block")
    with open(path, "w", encoding="utf-8") as f:
        f.write(new)
    print(f"\nwrote {len(last)} entries to __spark_entry__.py "
          f"(remember to bump CURRENT_ROUND and build the new window)")


if __name__ == "__main__":
    main()
