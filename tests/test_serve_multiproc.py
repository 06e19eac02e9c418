"""Pure-logic tests for tools/serve_multiproc.py (round-12 verdict
item 4 — the horizontal-drivers serving proof). The measurement itself
runs offline on a quiet machine (SERVE_MULTIPROC_r13.json is the
recorded artifact); these pin the aggregation rules so the artifact's
numbers mean what they claim: summed per-worker throughput, trusted
only when the timed windows genuinely overlapped."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
))

from serve_multiproc import aggregate  # noqa: E402


def _row(t0, t1, n, p50=0.5):
    wall = t1 - t0
    return {
        "window": [t0, t1], "wall": wall, "n": n,
        "lps": round(n / wall, 3), "p50": p50,
    }


def test_overlapping_workers_sum_throughput():
    rows = [_row(100.0, 125.0, 30), _row(100.5, 125.5, 28)]
    got = aggregate(rows)
    assert got["n_procs"] == 2
    assert got["aggregate_lps"] == round(30 / 25 + 28 / 25, 3)
    assert got["overlap_frac"] > 0.9
    assert "untrusted" not in got


def test_straggler_window_is_flagged_untrusted():
    """A worker whose JVM missed the barrier and ran mostly alone must
    not let the pairing claim a concurrency win."""
    rows = [_row(100.0, 125.0, 30), _row(122.0, 147.0, 30)]
    got = aggregate(rows)
    assert got["overlap_frac"] < 0.8
    assert "untrusted" in got


def test_solo_worker_trivially_trusted():
    got = aggregate([_row(10.0, 35.0, 31)])
    assert got["n_procs"] == 1 and got["overlap_frac"] == 1.0
    assert got["aggregate_lps"] == round(31 / 25, 3)


def test_concurrent_builders_single_winner_publish(tmp_path, monkeypatch):
    """Round-13 verdict item 6: the cold-fleet contract's core —
    N concurrent builders of the SAME artifact all return the same
    published dir, exactly one build's copy survives (atomic rename),
    losers discard their staging copies, and no staging dir leaks.
    Run with real threads racing through plans/_serving.cached_artifact
    against a shared temp dir."""
    import tempfile
    import threading
    import uuid

    from mini_data_platform_spark.plans import _serving

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    fixture = tmp_path / "documents.parquet"
    fixture.write_bytes(b"fixture-bytes")

    def build(staging: str) -> None:
        os.makedirs(staging)
        # per-builder unique token: the survivor identifies the winner
        with open(os.path.join(staging, "token"), "w") as f:
            f.write(uuid.uuid4().hex)
        with open(os.path.join(staging, "meta.json"), "w") as f:
            f.write("{}")

    results: list[str] = []
    errs: list[BaseException] = []

    def one():
        try:
            results.append(
                _serving.cached_artifact(str(tmp_path), "p=1", build)
            )
        except BaseException as e:  # noqa: BLE001 — surface in assert
            errs.append(e)

    threads = [threading.Thread(target=one) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs and len(set(results)) == 1, (errs, results)
    out = results[0]
    # exactly one complete artifact, one winner's token
    assert os.path.exists(os.path.join(out, "meta.json"))
    assert len(os.listdir(out)) == 2  # token + meta.json, one copy
    # no staging leftovers anywhere in the temp dir
    leftovers = [
        d for d in os.listdir(tmp_path) if ".build-" in d
    ]
    assert leftovers == []
    # a later caller hits the published artifact without rebuilding
    def explode(_):
        raise AssertionError("cache miss after publish")
    assert _serving.cached_artifact(str(tmp_path), "p=1", explode) == out
