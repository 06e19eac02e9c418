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
round. ``--window`` additionally prints a paste-able
``_ROUND{N}_WINDOW`` block built by the mechanical rule (must-set
first, then stalest fill — the rule rounds 12 and 13 applied by
hand; round 11's breach was skipping exactly this step). Diff-touched
queries (rotation rule 2) may still be swapped in by hand on top.
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


def build_window(
    last: dict[str, int],
    nxt: int,
    slots: int = 50,
    forced: tuple[str, ...] = (),
) -> tuple[list[str], list[str]]:
    """The next round's window, mechanically (round-13: the manual
    window build is the step that silently failed in round 11 — round
    13's window was exactly this rule applied by hand, so automate it):
    ``forced`` queries first (rotation rule 2 — queries the round's
    diff touched, declared as ``_WINDOW_FORCED`` in __spark_entry__ so
    the deviation is itself mechanical and test-pinned), then the
    MUST-set (age > 2 at round ``nxt``) alphabetically, then the
    stalest remainder by (last_windowed, name) up to ``slots``. Returns
    (window, overflow): overflow is the must-set tail that did not fit
    — non-empty only in a remediation round, and each overflow query
    then needs an exact-multiset row in VERIFY_LOCAL_r{nxt}.json (the
    staleness test enforces that)."""
    head = list(dict.fromkeys(forced))
    # _WINDOW_FORCED is hand-edited and the window test pins the
    # declared window to this function's output, so validate up front
    # (round-13 advice): an unknown forced name would flow into the
    # window and KeyError in queries(); an oversized forced set would
    # make `room` negative and silently drop the must-set tail.
    unknown = [q for q in head if q not in last]
    if unknown:
        raise ValueError(
            f"forced window entries not in the query inventory: {unknown}"
        )
    if len(head) > slots:
        raise ValueError(
            f"{len(head)} forced window entries exceed {slots} slots"
        )
    head_set = set(head)
    must = sorted(
        q for q, r in last.items() if nxt - r > 2 and q not in head_set
    )
    room = slots - len(head)
    if len(must) >= room:
        return head + must[:room], must[room:]
    taken = head_set | set(must)
    rest = sorted(
        (q for q in last if q not in taken),
        key=lambda q: (last[q], q),
    )
    return head + must + rest[: room - len(must)], []


def _wrap(tokens: list[str], width: int = 78) -> list[str]:
    """The 78-column token wrap both generated blocks share."""
    lines: list[str] = []
    row = "   "
    for tok in tokens:
        if len(row) + len(tok) > width:
            lines.append(row)
            row = "   "
        row += tok
    if row.strip():
        lines.append(row)
    return lines


def print_window(
    last: dict[str, int], nxt: int, forced: tuple[str, ...] = ()
) -> None:
    window, overflow = build_window(last, nxt, forced=forced)
    print(f"# round-{nxt} window: {len(window)} slots, "
          f"{len(overflow)} overflow")
    lines = [f"_ROUND{nxt}_WINDOW = ["]
    lines += _wrap([f' "{q}",' for q in window])
    lines.append("]")
    print("\n".join(lines))
    if overflow:
        print(f"# OVERFLOW ({len(overflow)} — verify exact-multiset with "
              f"tools/verify_local.py --record-round {nxt}):")
        for q in overflow:
            print(f"#   {q}")


CONTRACT_RE = r"<!-- contract:begin.*?<!-- contract:end -->"


def contract_block() -> str:
    """The SURVEY.md driver-contract paragraph, derived from the entry
    module itself (round-10 verdict item 4: the hand-maintained counts
    drifted two rounds running — now the doc is generated and a test
    pins it against the module)."""
    import __spark_entry__ as entry

    q = list(entry.queries())
    o = entry.oracle_sql()
    weak = sorted(set(q) - set(o))
    # the parenthetical rationale is specific to the KNOWN weak set —
    # if membership drifts, fail loudly instead of generating stale
    # prose around the wrong names (round-11 advice)
    if weak == ["events_approx_users"]:
        weak_note = (
            " (`events_approx_users` — HLL sketches are "
            "engine-specific; its exact\nhalf is oracle-checked as "
            "`events_distinct_users`, the KMV family is\nthe "
            "oracle-exact approx twin, and the rsd error bound is "
            "pinned in\ntests/test_entry.py)"
        )
    elif not weak:
        weak_note = ""
    else:
        raise SystemExit(
            f"weak-set membership changed ({weak}): write a new "
            "rationale in contract_block() for these names"
        )
    return (
        "<!-- contract:begin — this block is REGENERATED by\n"
        "`python tools/advance_round.py --contract` from __spark_entry__;\n"
        "tests/test_entry.py::test_survey_contract_counts pins it. "
        "Do not edit\nthe counts by hand. -->\n"
        f"Driver contract: {len(q)} queries in `queries()`, {len(o)} "
        "with `oracle_sql()`\ntwins (hash-checkable), "
        f"{len(weak)} deliberately rows-only"
        f"{weak_note}.\n"
        "<!-- contract:end -->"
    )


def write_contract() -> None:
    path = os.path.join(REPO, "SURVEY.md")
    src = open(path, encoding="utf-8").read()
    new, n = re.subn(CONTRACT_RE, contract_block(), src, count=1, flags=re.S)
    if n != 1:
        raise SystemExit("SURVEY.md contract markers not found")
    with open(path, "w", encoding="utf-8") as f:
        f.write(new)
    print("SURVEY.md contract block regenerated")


def main() -> None:
    if "--contract" in sys.argv:
        write_contract()
        if len(sys.argv) == 2:
            return
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

    if "--window" in sys.argv:
        import __spark_entry__ as entry

        print()
        print_window(
            last, nxt, tuple(getattr(entry, "_WINDOW_FORCED", ()))
        )

    if "--write" not in sys.argv:
        return
    lines = ["_LAST_WINDOWED = {"]
    for r in sorted(by_round):
        label = "never windowed" if r == 0 else f"last windowed in round {r}"
        lines.append(f"    # {label}")
        lines += _wrap([f' "{q}": {r},' for q in sorted(by_round[r])])
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
