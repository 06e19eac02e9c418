"""Round-over-round bench regression gate (round-9 verdict item 1).

Pure-logic unit tests for the flag/explain rules, plus the gate itself
run against the repo's ACTUAL latest two BENCH_DETAIL_r*.json files —
so the normal pytest sweep fails whenever a round is about to close
with a per-query creep nobody pinned in SURVEY.md §6. That is the
mechanization the round-9 verdict asked for: emb_dup_clusters took
three rounds to catch and emb_near_dups_exact doubled unnoticed,
both because the 129-entry bench dict was only ever eyeballed.
"""

from __future__ import annotations

import glob
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench_regress import (  # noqa: E402
    CONTENTION_LOAD,
    ambient_load,
    contention,
    evaluate,
    find_regressions,
    latest_details,
    round_of,
    survey_section6,
    unexplained,
)


class TestFlagRules:
    def test_both_gates_must_trip(self):
        old = {"queries": {"a": 1.0, "b": 0.1, "c": 10.0, "d": 1.0}}
        new = {"queries": {"a": 2.0, "b": 0.3, "c": 11.0, "d": 1.4}}
        flags = find_regressions(old, new)
        # a: 2x and +1.0s -> flagged; b: 3x but +0.2s absolute -> no;
        # c: +1.0s but 1.1x ratio -> no; d: 1.4x and +0.4s -> neither
        assert [f["name"] for f in flags] == ["a"]

    def test_new_and_removed_queries_ignored(self):
        old = {"queries": {"gone": 1.0}}
        new = {"queries": {"fresh": 99.0}}
        assert find_regressions(old, new) == []

    def test_ingest_throughput_drop_flagged(self):
        old = {"queries": {}, "ingest": {"rows_per_min": 1_500_000}}
        new = {"queries": {}, "ingest": {"rows_per_min": 900_000}}
        flags = find_regressions(old, new)
        assert len(flags) == 1 and flags[0]["kind"] == "ingest"
        # a <1.5x drop stays quiet
        new2 = {"queries": {}, "ingest": {"rows_per_min": 1_100_000}}
        assert find_regressions(old, new2) == []

    def test_unexplained_matches_on_name_in_notes(self):
        flags = [
            {"name": "q_noted", "old": 1, "new": 2, "kind": "query"},
            {"name": "q_silent", "old": 1, "new": 2, "kind": "query"},
            {"name": "ingest", "old": 2, "new": 1, "kind": "ingest"},
        ]
        notes = "… q_noted slowed because …; ingest rows/min dipped …"
        bad = unexplained(flags, notes)
        assert [f["name"] for f in bad] == ["q_silent"]

    def test_stale_prose_does_not_explain_a_stamped_round(self):
        """The round-11 laundering hole: a §6 note written about an
        OLDER round's numbers must not satisfy this round's flag — the
        needle must share a paragraph with the regressing round's
        ``r{N}:`` stamp."""
        flags = [{"name": "q_slow", "old": 1, "new": 2, "kind": "query"}]
        stale = "q_slow regressed in round 9 because of contention."
        assert [f["name"] for f in unexplained(flags, stale, 12)] == [
            "q_slow"
        ]
        # the same prose in a paragraph stamped for THIS round passes
        fresh = (
            "old stuff about other queries.\n\n"
            "r12: q_slow 1.0->2.0 s — cause pinned here."
        )
        assert unexplained(flags, fresh, 12) == []
        # a stamp in a DIFFERENT paragraph from the name does not count
        split = "r12: something else regressed.\n\nq_slow is slow."
        assert [f["name"] for f in unexplained(flags, split, 12)] == [
            "q_slow"
        ]
        # ingest matches its prose aliases inside a stamped paragraph
        iflags = [{"name": "ingest", "old": 2, "new": 1, "kind": "ingest"}]
        assert unexplained(
            iflags, "r12: ingest rows/min dipped under load.", 12
        ) == []

    def test_round_of_parses_detail_filenames(self):
        assert round_of("/x/BENCH_DETAIL_r12.json") == 12
        assert round_of("BENCH_DETAIL_r08.json") == 8
        assert round_of("/x/custom.json") is None


def _run(load_start, queries):
    return {"load": {"loadavg_start": load_start}, "queries": queries}


class TestContention:
    """Round-12 verdict item 1: the driver's post-close bench rerun
    overwrote BENCH_DETAIL_r12.json with a loaded-machine run (ambient
    start loadavg 6.3-10.9 vs the committed quiet run's 2.2) and the
    gate failed the delivered tree on 10 contention-class queries. The
    gate must use the load signal it already records: a contended
    compare downgrades (ratio gate ×2), never fails on ambient noise."""

    def test_ambient_load_is_max_of_start_triple(self):
        # the 5/15-min averages catch load the 1-min number already shed
        assert ambient_load(_run([6.33, 9.95, 10.86], {})) == 10.86
        assert ambient_load({"queries": {}}) == 0.0

    def test_quiet_pair_is_clean(self):
        assert contention(_run([2.2, 2.0, 1.8], {}),
                          _run([1.9, 2.1, 2.3], {})) is None

    def test_absolute_load_trips_contention(self):
        v = contention(_run([2.19, 2.0, 1.8], {}),
                       _run([6.33, 9.95, 10.86], {}))
        assert v is not None and str(CONTENTION_LOAD) in v

    def test_load_delta_trips_contention_below_absolute_bar(self):
        v = contention(_run([1.0, 1.0, 1.0], {}),
                       _run([2.5, 2.0, 2.0], {}))
        assert v is not None and "2.5x" in v

    def test_contended_compare_downgrades_not_skips(self):
        """The exact r12 shape: ~1.5-2.1x uniform inflation under load
        passes; a genuine plan blowup (the 2.3->8.6 s class this gate
        exists for) still flags and still needs its §6 note."""
        old = _run([2.2, 2.0, 1.8], {"noise": 1.767, "blowup": 2.3})
        new = _run([6.33, 9.95, 10.86], {"noise": 3.697, "blowup": 8.6})
        flags, bad, verdict, eff = evaluate(old, new, notes="", round_no=13)
        assert verdict is not None and eff == 3.0
        assert [f["name"] for f in flags] == ["blowup"]
        assert [f["name"] for f in bad] == ["blowup"]

    def test_quiet_compare_keeps_the_tight_gate(self):
        old = _run([1.0, 1.0, 1.0], {"q": 1.767})
        new = _run([1.2, 1.1, 1.0], {"q": 3.697})
        flags, bad, verdict, eff = evaluate(old, new, notes="", round_no=13)
        assert verdict is None and eff == 1.5
        assert [f["name"] for f in flags] == ["q"]

    def test_bench_keeps_quieter_round_artifact(self):
        """The incident closed at the SOURCE: bench.py must refuse to
        overwrite a quieter round-stamped artifact with a contended
        rerun (and must overwrite in every other direction — quieter
        runs always improve the record)."""
        import bench

        quiet = _run([2.2, 2.0, 1.8], {})
        loaded = _run([6.33, 9.95, 10.86], {})
        quieter = _run([0.5, 0.4, 0.3], {})
        assert bench._keep_existing_detail(quiet, loaded)
        assert not bench._keep_existing_detail(loaded, quiet)
        assert not bench._keep_existing_detail(quiet, quieter)
        # two loaded runs: the quieter of the two still wins
        assert bench._keep_existing_detail(
            _run([5.0, 5.0, 5.0], {}), loaded
        )
        assert not bench._keep_existing_detail(
            loaded, _run([5.0, 5.0, 5.0], {})
        )
        # a mildly-ambient rerun (under the contention bar) may replace
        assert not bench._keep_existing_detail(
            quiet, _run([3.5, 3.0, 2.0], {})
        )

    def test_r12_overwrite_artifact_passes_clean(self):
        """The incident itself, pinned: the driver-overwritten r12
        artifact vs r11 must evaluate clean (contention verdict named,
        zero unexplained flags) on the tree as the driver leaves it."""
        import json

        r11 = os.path.join(REPO, "BENCH_DETAIL_r11.json")
        r12 = os.path.join(REPO, "BENCH_DETAIL_r12.json")
        if not (os.path.exists(r11) and os.path.exists(r12)):
            pytest.skip("r11/r12 artifacts not present")
        with open(r11) as fh:
            old = json.load(fh)
        with open(r12) as fh:
            new = json.load(fh)
        if ambient_load(new) <= CONTENTION_LOAD >= ambient_load(old):
            pytest.skip("artifact pair is quiet — nothing to downgrade")
        flags, bad, verdict, _ = evaluate(
            old, new, survey_section6(REPO), 12
        )
        assert verdict is not None
        assert bad == []


class TestRepoGate:
    """The actual round-close gate: latest two recorded rounds."""

    @pytest.mark.skipif(
        len(glob.glob(os.path.join(REPO, "BENCH_DETAIL_r*.json"))) < 2,
        reason="needs two recorded rounds",
    )
    def test_latest_rounds_have_no_unexplained_regressions(self):
        import json

        old_p, new_p = latest_details(REPO)
        with open(old_p) as fh:
            old = json.load(fh)
        with open(new_p) as fh:
            new = json.load(fh)
        # evaluate() is the same call main() makes — contention-aware,
        # so the driver's loaded-machine bench reruns (which overwrite
        # the round artifact post-close) downgrade instead of failing
        # the delivered tree (round-12 verdict item 1)
        flags, bad, verdict, eff = evaluate(
            old, new, survey_section6(REPO), round_of(new_p)
        )
        assert not bad, (
            f"{os.path.basename(new_p)} regressed vs "
            f"{os.path.basename(old_p)} (gate {eff}x"
            + (f", contended: {verdict}" if verdict else "")
            + ") with no SURVEY §6 note: "
            + ", ".join(
                f"{f['name']} {f['old']}->{f['new']}" for f in bad
            )
        )


class TestShuffleAttribution:
    """bench._shuffle_by_window: event-log task metrics bin into the
    query whose wall window the task finished in (r9 verdict item 7)."""

    def test_tasks_bin_by_finish_time(self, tmp_path, monkeypatch):
        import json as _json

        import bench

        monkeypatch.setattr(bench, "_EVENTLOG", str(tmp_path))

        def task_end(finish_s, bytes_written):
            return _json.dumps(
                {
                    "Event": "SparkListenerTaskEnd",
                    "Task Info": {"Finish Time": finish_s * 1000},
                    "Task Metrics": {
                        "Shuffle Write Metrics": {
                            "Shuffle Bytes Written": bytes_written
                        }
                    },
                }
            )

        lines = [
            task_end(10.5, 2**20),   # inside q1
            task_end(11.9, 2**20),   # inside q1
            task_end(12.5, 2**21),   # between queries -> dropped
            task_end(14.0, 2**22),   # inside q2
            task_end(99.0, 2**23),   # after everything -> dropped
            '{"Event": "SparkListenerJobStart"}',  # non-task noise
            "not json at all",
        ]
        (tmp_path / "app-123").write_text("\n".join(lines))
        got = bench._shuffle_by_window(
            {"q1": (10.0, 12.0), "q2": (13.0, 15.0)}
        )
        assert got == {"q1": 2.0, "q2": 4.0}

    def test_empty_log_dir_and_no_windows(self, tmp_path, monkeypatch):
        import bench

        monkeypatch.setattr(bench, "_EVENTLOG", str(tmp_path / "missing"))
        assert bench._shuffle_by_window({"q": (0, 1)}) == {}


class TestIngestScaleArtifact:
    def test_warm_exclusion_rule_is_stamped(self):
        """Round-13 verdict item 7: the warm-run exclusion must be
        self-explaining IN the artifact, not a convention living only
        in the tool."""
        from ingest_scale import WARM_EXCLUSION_RULE, artifact

        out = artifact(
            [0.1, 0.2, 0.3],
            {"rows": 100_000, "sec": 8.0, "rows_per_min": 750_000},
            [{"n": 100_000}],
            [{"n": 2_000_000, "n_files": 512}],
        )
        assert out["warm_run_excluded"]["exclusion_rule"] == (
            WARM_EXCLUSION_RULE
        )
        assert "by rule" in WARM_EXCLUSION_RULE.lower()
        assert out["warm_run_excluded"]["rows_per_min"] == 750_000
        assert out["file_count_runs"][0]["n_files"] == 512
