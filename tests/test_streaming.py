"""Streaming: file-source ingestion with checkpointed exactly-once file
admission, watermarked windowed aggregation, stateful sessionization."""

import datetime
import os
import time

import pytest

from pyspark.sql import Row, functions as F, types as T

from mini_data_platform_spark.sinks.upsert import upsert_parquet
from mini_data_platform_spark.streaming import (
    run_available_now,
    sessionize_stateful,
    start_streaming_ingest,
    windowed_event_stats,
)

CSV_1 = (
    "sale_id,sale_date,customer_id,product_id,quantity,amount\n"
    "a,2024-01-01 00:00:00,C1,P1,1,10.0\n"
    "b,2024-01-02 00:00:00,C2,P2,2,20.0\n"
)
CSV_2 = (
    "sale_id,sale_date,customer_id,product_id,quantity,amount\n"
    "b,2024-02-02 00:00:00,C2,P2,9,99.0\n"
    "c,2024-01-03 00:00:00,C3,P3,3,30.0\n"
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, 0, 0, 0) + datetime.timedelta(
        minutes=minute, seconds=second
    )


class TestStreamingIngest:
    def _run_once(self, spark, incoming, ckpt, target):
        def sink(df):
            return upsert_parquet(spark, df, target, ["sale_id"])

        q = start_streaming_ingest(
            spark, incoming, ckpt, sink=sink, available_now=True
        )
        q.awaitTermination(120)
        assert not q.isActive

    def test_ingest_and_checkpointed_admission(self, spark, tmp_path):
        incoming = str(tmp_path / "incoming")
        ckpt = str(tmp_path / "ckpt")
        target = str(tmp_path / "target")
        os.makedirs(incoming)

        with open(os.path.join(incoming, "f1.csv"), "w") as f:
            f.write(CSV_1)
        self._run_once(spark, incoming, ckpt, target)
        got = {r["sale_id"]: r["amount"] for r in spark.read.parquet(target).collect()}
        assert got == {"a": 10.0, "b": 20.0}

        # second file lands; SAME checkpoint -> f1 not reprocessed, b upserted
        with open(os.path.join(incoming, "f2.csv"), "w") as f:
            f.write(CSV_2)
        self._run_once(spark, incoming, ckpt, target)
        got = {r["sale_id"]: r["amount"] for r in spark.read.parquet(target).collect()}
        assert got == {"a": 10.0, "b": 99.0, "c": 30.0}


class TestWindowedStats:
    def _events(self, spark):
        rows = [
            Row(event_id=1, ts=_ts(5), user_id=1, event_type="click", value=1.0),
            Row(event_id=2, ts=_ts(20), user_id=2, event_type="click", value=2.0),
            Row(event_id=3, ts=_ts(70), user_id=1, event_type="view", value=3.0),
        ]
        return spark.createDataFrame(rows, EVENT_SCHEMA)

    def test_static_semantics(self, spark):
        out = windowed_event_stats(self._events(spark), "1 hour").collect()
        by_key = {(r["window_start"].minute + r["window_start"].hour * 60, r["event_type"]): r for r in out}
        assert by_key[(0, "click")]["n_events"] == 2
        assert by_key[(0, "click")]["sum_value"] == 3.0
        assert by_key[(60, "view")]["n_events"] == 1

    def test_streaming_with_watermark(self, spark, tmp_path):
        src = str(tmp_path / "events_src")
        self._events(spark).coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        agg = windowed_event_stats(stream, "1 hour", watermark="2 hours")
        q = (
            agg.writeStream.format("memory")
            .queryName("win_stats")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM win_stats").collect()
        assert sum(r["n_events"] for r in rows) == 3


class TestStreamDedup:
    def test_replays_dropped_across_microbatches(self, spark, tmp_path):
        from mini_data_platform_spark.streaming import dedup_stream

        src = str(tmp_path / "dd_src")
        os.makedirs(src)
        rows1 = [
            Row(event_id=1, ts=_ts(0), user_id=1, event_type="c", value=1.0),
            Row(event_id=2, ts=_ts(1), user_id=1, event_type="c", value=2.0),
        ]
        rows2 = [
            Row(event_id=2, ts=_ts(1), user_id=1, event_type="c", value=2.0),  # replay
            Row(event_id=3, ts=_ts(2), user_id=1, event_type="c", value=3.0),
        ]
        spark.createDataFrame(rows1, EVENT_SCHEMA).coalesce(1).write.parquet(
            os.path.join(src, "b1")
        )
        spark.createDataFrame(rows2, EVENT_SCHEMA).coalesce(1).write.parquet(
            os.path.join(src, "b2")
        )
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        q = (
            dedup_stream(stream, keys=("event_id",), watermark="1 hour")
            .writeStream.format("memory")
            .queryName("dd_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(r["event_id"] for r in spark.sql("SELECT * FROM dd_out").collect())
        assert got == [1, 2, 3]  # the replayed id 2 appears exactly once


class TestSessionize:
    def test_finished_sessions_emit_within_batch(self, spark, tmp_path):
        # user 7: burst at t=0..5min (3 events), 40-min gap, burst at t=45
        # -> first burst is a finished session; second stays open in state.
        rows = [
            Row(event_id=1, ts=_ts(0), user_id=7, event_type="c", value=1.0),
            Row(event_id=2, ts=_ts(2), user_id=7, event_type="c", value=2.0),
            Row(event_id=3, ts=_ts(5), user_id=7, event_type="c", value=3.0),
            Row(event_id=4, ts=_ts(45), user_id=7, event_type="c", value=4.0),
            Row(event_id=5, ts=_ts(1), user_id=9, event_type="c", value=5.0),
        ]
        src = str(tmp_path / "sess_src")
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        # run_available_now: ProcessingTimeTimeout state spins no-data
        # micro-batches forever under a plain availableNow start, so this
        # test used to burn its full 120 s awaitTermination AND leak a
        # live query into the rest of the suite (streaming/run.py)
        run_available_now(
            sessionize_stateful(stream),
            str(tmp_path / "sess_ckpt"),
            fmt="memory",
            query_name="sessions",
            timeout_sec=120,
        )
        got = spark.sql("SELECT * FROM sessions").collect()
        assert len(got) == 1
        s = got[0]
        assert s["user_id"] == 7
        assert s["n_events"] == 3
        assert s["sum_value"] == 6.0
        assert s["session_start"] == _ts(0)
        assert s["session_end"] == _ts(5)


class TestSessionWindowBuiltin:
    def test_static_matches_stateful_session_semantics(self, spark):
        """The built-in session_window must carve the SAME sessions as the
        custom stateful operator's gap logic: user 7 bursts at 0-5min and
        45min (40-min gap > 30-min session gap -> two sessions)."""
        from mini_data_platform_spark.streaming import session_window_agg

        rows = [
            Row(event_id=1, ts=_ts(0), user_id=7, event_type="c", value=1.0),
            Row(event_id=2, ts=_ts(2), user_id=7, event_type="c", value=2.0),
            Row(event_id=3, ts=_ts(5), user_id=7, event_type="c", value=3.0),
            Row(event_id=4, ts=_ts(45), user_id=7, event_type="c", value=4.0),
            Row(event_id=5, ts=_ts(1), user_id=9, event_type="c", value=5.0),
        ]
        df = spark.createDataFrame(rows, EVENT_SCHEMA)
        out = sorted(
            session_window_agg(df, gap="30 minutes").collect(),
            key=lambda r: (r["user_id"], r["session_start"]),
        )
        assert [(r["user_id"], r["n_events"], r["sum_value"]) for r in out] == [
            (7, 3, 6.0), (7, 1, 4.0), (9, 1, 5.0)
        ]
        first = out[0]
        assert first["session_start"] == _ts(0)
        assert first["last_event"] == _ts(5)
        # session_window end = last event + gap by definition
        assert first["window_end"] == _ts(35)

    def test_streaming_append_emits_closed_sessions(self, spark, tmp_path):
        from mini_data_platform_spark.streaming import session_window_agg

        rows = [
            Row(event_id=1, ts=_ts(0), user_id=7, event_type="c", value=1.0),
            Row(event_id=2, ts=_ts(5), user_id=7, event_type="c", value=2.0),
            # a much later event advances the watermark so session 1 closes
            Row(event_id=3, ts=_ts(600), user_id=8, event_type="c", value=9.0),
        ]
        src = str(tmp_path / "sw_src")
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        q = (
            session_window_agg(stream, gap="30 minutes", watermark="1 hour")
            .writeStream.format("memory")
            .queryName("sw_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "sw_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM sw_out").collect()
        # user 7's session closed (watermark passed); user 8's stays open
        assert [(r["user_id"], r["n_events"]) for r in got] == [(7, 2)]


class TestStreamIntervalJoin:
    def test_purchases_match_recent_clicks_only(self, spark, tmp_path):
        from mini_data_platform_spark.streaming import stream_interval_join

        clicks = [
            Row(event_id=10, ts=_ts(0), user_id=1, event_type="click", value=0.0),
            Row(event_id=11, ts=_ts(50), user_id=1, event_type="click", value=0.0),
            Row(event_id=12, ts=_ts(0), user_id=2, event_type="click", value=0.0),
        ]
        purchases = [
            Row(event_id=20, ts=_ts(60), user_id=1, event_type="buy", value=5.0),
            Row(event_id=21, ts=_ts(90), user_id=2, event_type="buy", value=7.0),
        ]
        csrc, psrc = str(tmp_path / "clicks"), str(tmp_path / "purch")
        spark.createDataFrame(clicks, EVENT_SCHEMA).coalesce(1).write.parquet(csrc)
        spark.createDataFrame(purchases, EVENT_SCHEMA).coalesce(1).write.parquet(psrc)
        cs = spark.readStream.schema(EVENT_SCHEMA).parquet(csrc).select(
            F.col("user_id"), F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
        )
        ps = spark.readStream.schema(EVENT_SCHEMA).parquet(psrc).select(
            F.col("user_id"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
        )
        joined = stream_interval_join(
            ps, cs, key="user_id", left_ts="purchase_ts", right_ts="click_ts",
            lookback="30 minutes",
        ).select("purchase_id", "click_id")
        q = (
            joined.writeStream.format("memory")
            .queryName("ssj_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {(r["purchase_id"], r["click_id"]) for r in spark.sql("SELECT * FROM ssj_out").collect()}
        # purchase 20 at t=60: click 11 (t=50) is within 30 min, click 10 (t=0) is not;
        # purchase 21 at t=90: user 2's only click (t=0) is too old -> no match
        assert got == {(20, 11)}


class TestNearDupStream:
    """Streaming LSH near-dup candidates (streaming/neardup.py): the
    star-shaped per-bucket edges must cluster identically to the batch
    clique pairs, and the bucket state must link cross-micro-batch
    duplicates to the FIRST-seen document."""

    N_HASHES, BANDS, SHINGLE_N = 16, 4, 3

    def _corpus_rows(self):
        base = (
            "the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep green forest tonight"
        )
        other = (
            "completely different text about spark structured streaming "
            "state stores and watermark semantics for late data"
        )
        rows = []
        for i in range(6):  # near-identical family: one-word mutations
            words = base.split()
            words[i] = f"mut{i}"
            rows.append((100 + i, _ts(i), " ".join(words)))
        for i in range(4):  # second family
            words = other.split()
            words[-1 - i] = f"alt{i}"
            rows.append((200 + i, _ts(10 + i), " ".join(words)))
        rows.append((300, _ts(20), "tiny unrelated snippet entirely alone"))
        return rows

    def _docs_df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, ts timestamp, text string")

    def _run_stream(self, spark, src, files_per_trigger=None):
        from mini_data_platform_spark.streaming.neardup import (
            near_dup_candidates_stream,
        )

        reader = spark.readStream.schema(
            "doc_id long, ts timestamp, text string"
        )
        if files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", files_per_trigger)
        stream = reader.parquet(src)
        edges = near_dup_candidates_stream(
            stream, num_hashes=self.N_HASHES, bands=self.BANDS,
            shingle_n=self.SHINGLE_N,
        )
        name = f"neardup_{int(time.time() * 1000)}"
        # run_available_now: the bucket TTL's ProcessingTimeTimeout spins
        # no-data micro-batches forever otherwise (streaming/run.py)
        run_available_now(
            edges,
            f"{src}_ckpt_{name}",
            fmt="memory",
            query_name=name,
            timeout_sec=120,
        )
        return spark.table(name)

    def test_star_edges_cluster_like_batch_cliques(self, spark, tmp_path):
        from mini_data_platform_spark.operators.dedup_fuzzy import (
            lsh_candidate_pairs,
            minhash_signatures,
        )
        from mini_data_platform_spark.operators.graph import (
            connected_components,
        )

        rows = self._corpus_rows()
        docs = self._docs_df(spark, rows)
        src = str(tmp_path / "docs")
        docs.repartition(1).write.parquet(src)

        got = self._run_stream(spark, src)
        stream_edges = got.select(
            F.col("doc_id").alias("id_a"), F.col("first_doc_id").alias("id_b")
        ).distinct()
        assert stream_edges.count() > 0

        sigs = minhash_signatures(
            docs, "doc_id", "text", self.N_HASHES, self.SHINGLE_N
        )
        batch_pairs = lsh_candidate_pairs(
            sigs, "doc_id", self.N_HASHES, self.BANDS
        )
        # star vs clique: identical connected components
        cc_stream = {
            (r["v"], r["comp"])
            for r in connected_components(stream_edges).collect()
        }
        cc_batch = {
            (r["v"], r["comp"])
            for r in connected_components(batch_pairs).collect()
        }
        assert cc_stream == cc_batch

    def test_cross_batch_duplicates_link_to_first_seen(self, spark, tmp_path):
        rows = self._corpus_rows()
        first_file = [r for r in rows if r[0] in (100, 300)]
        second_file = [r for r in rows if r[0] == 101]  # near-dup of 100
        src = str(tmp_path / "docs")
        self._docs_df(spark, first_file).repartition(1).write.parquet(src)
        self._docs_df(spark, second_file).repartition(1).write.mode(
            "append"
        ).parquet(src)

        got = self._run_stream(spark, src, files_per_trigger=1)
        links = {
            (r["doc_id"], r["first_doc_id"]) for r in got.collect()
        }
        # 101 (later micro-batch) must link back to 100 via bucket state
        assert (101, 100) in links
        # the singleton never emits an edge
        assert all(300 not in pair for pair in links)

    def test_row_local_signatures_match_batch_aggregation(self, spark):
        """minhash_signature_columns (array exprs) and
        minhash_signatures_from (explode + min-agg) must emit identical
        signatures — they share one hash family by construction."""
        from mini_data_platform_spark.operators.dedup_fuzzy import (
            _staged_shingles,
            minhash_signature_columns,
            minhash_signatures_from,
        )

        docs = self._docs_df(spark, self._corpus_rows()).drop("ts")
        sh = _staged_shingles(docs, "doc_id", "text", self.SHINGLE_N)
        row_local = minhash_signature_columns(sh, ["doc_id"], self.N_HASHES)
        agg = minhash_signatures_from(sh, "doc_id", self.N_HASHES)
        a = {tuple(r) for r in row_local.collect()}
        b = {tuple(r) for r in agg.collect()}
        assert a == b


class TestHeavyHittersStream:
    """Streaming MG heavy hitters (streaming/heavyhitters.py): emitted
    keys are provably heavy (no false positives), state accumulates
    across micro-batches, and each key alerts exactly once."""

    def _write_batches(self, spark, tmp_path, batches):
        src = str(tmp_path / "hh_events")
        for i, rows in enumerate(batches):
            spark.createDataFrame(
                [(k,) for k in rows], "k string"
            ).repartition(1).write.mode(
                "append" if i else "overwrite"
            ).parquet(src)
        return src

    def _run(self, spark, src, min_count, k_counters=256, per_trigger=None):
        from mini_data_platform_spark.streaming.heavyhitters import (
            heavy_hitters_stream,
        )

        reader = spark.readStream.schema("k string")
        if per_trigger:
            reader = reader.option("maxFilesPerTrigger", per_trigger)
        out = heavy_hitters_stream(
            reader.parquet(src), "k", min_count,
            n_shards=8, k_counters=k_counters,
        )
        name = f"hh_{int(time.time() * 1000)}"
        run_available_now(
            out, f"{src}_ckpt_{name}", fmt="memory",
            query_name=name, timeout_sec=120,
        )
        return spark.table(name)

    def test_emits_exactly_the_heavy_keys(self, spark, tmp_path):
        # hot1 x 30, hot2 x 12, 40 singleton tail keys; threshold 10.
        # k_counters=256 > distinct keys -> sketch is exact here.
        batch = ["hot1"] * 30 + ["hot2"] * 12 + [f"t{i}" for i in range(40)]
        src = self._write_batches(spark, tmp_path, [batch])
        got = {
            (r["key"], r["at_least"])
            for r in self._run(spark, src, min_count=10).collect()
        }
        assert got == {("hot1", 30), ("hot2", 12)}

    def test_accumulates_across_micro_batches_and_emits_once(
        self, spark, tmp_path
    ):
        # 6 per batch, threshold 10: below threshold in EVERY batch,
        # above it only across batches — state must carry the counts,
        # and the key must alert exactly once (in the second batch)
        batches = [
            ["slow"] * 6 + [f"a{i}" for i in range(10)],
            ["slow"] * 6 + [f"b{i}" for i in range(10)],
            ["slow"] * 6 + [f"c{i}" for i in range(10)],
        ]
        src = self._write_batches(spark, tmp_path, batches)
        rows = self._run(
            spark, src, min_count=10, per_trigger=1
        ).collect()
        assert [(r["key"], r["at_least"]) for r in rows] == [("slow", 12)]

    def test_no_false_positives_under_tight_sketch(self, spark, tmp_path):
        # k_counters=4 over 50 distinct keys: heavy decrement pressure.
        # Whatever gets emitted must be TRULY >= threshold.
        import collections

        batch = (
            ["h1"] * 40 + ["h2"] * 25
            + [f"t{i % 48}" for i in range(96)]  # 48 keys x 2
        )
        truth = collections.Counter(batch)
        src = self._write_batches(spark, tmp_path, [batch])
        rows = self._run(
            spark, src, min_count=20, k_counters=4
        ).collect()
        assert rows  # the two hot keys dwarf the slack; they must alert
        for r in rows:
            assert truth[r["key"]] >= 20
            assert truth[r["key"]] >= r["at_least"]


class TestNearDupBridge:
    """Batch/stream near-dup state bridge (round-7 verdict item 7):
    a stream bootstrapped from a persisted index (export_index_seed)
    links streamed near-dups to the SETTLED corpus ids without
    re-shingling the corpus; draining the streamed batch into the index
    (the standard increment) leaves the index identical to never having
    streamed at all."""

    NH, BANDS, SHN = 16, 4, 3

    def _b1(self, spark):
        base = (
            "the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep green forest tonight"
        )
        rows = []
        for i in range(8):
            words = base.split()
            words[i] = f"orig{i}"
            rows.append((100 + i, " ".join(words)))
        rows.append((150, "isolated corpus document about parquet footers"))
        return spark.createDataFrame(rows, "doc_id long, text string")

    def _b2_rows(self, b1):
        # near-dups of the corpus family (drop first token) + one fresh
        t = F.split(F.trim(F.col("text")), " +")
        muts = b1.where(F.col("doc_id") < 110).select(
            (F.col("doc_id") + 900).alias("doc_id"),
            F.current_timestamp().alias("ts"),
            F.concat_ws(" ", F.slice(t, 2, F.size(t) - 1)).alias("text"),
        )
        return muts

    def test_seeded_stream_links_to_corpus_ids(self, spark, tmp_path):
        from mini_data_platform_spark.operators.dedup_fuzzy import (
            _staged_shingles,
            lsh_band_keys,
            minhash_signatures_from,
        )
        from mini_data_platform_spark.operators.incremental import (
            neardup_index_build,
        )
        from mini_data_platform_spark.streaming.neardup import (
            export_index_seed,
            near_dup_candidates_stream,
        )

        b1 = self._b1(spark)
        idx = str(tmp_path / "idx")
        neardup_index_build(
            b1, idx, "doc_id", "text", 0.5, self.NH, self.BANDS, self.SHN
        )
        seed_dir = str(tmp_path / "seed")
        meta = export_index_seed(spark, idx, seed_dir)
        assert meta["num_hashes"] == self.NH

        src = str(tmp_path / "src")
        self._b2_rows(b1).write.parquet(src)
        stream = spark.readStream.schema(
            "doc_id long, ts timestamp, text string"
        ).parquet(src)
        edges = near_dup_candidates_stream(
            stream, num_hashes=self.NH, bands=self.BANDS,
            shingle_n=self.SHN, seed_dir=seed_dir,
        )
        name = f"ndbridge_{int(time.time() * 1000)}"
        run_available_now(
            edges, str(tmp_path / "ckpt"), fmt="memory",
            query_name=name, timeout_sec=180,
        )
        got = spark.table(name).collect()
        assert got, "seeded stream must flag the planted near-dups"
        # seeds emit no edges; streamed docs link to CORPUS ids
        assert all(r["doc_id"] >= 900 for r in got)
        assert all(r["first_doc_id"] < 900 for r in got)

        # PARITY with the batch candidate join: the stream must flag
        # exactly the streamed docs that share >= 1 band bucket with the
        # corpus (the same candidate set a batch increment generates)
        batch = self._b2_rows(b1).select(
            F.col("doc_id").alias("id"), F.col("text")
        )
        sigs = minhash_signatures_from(
            _staged_shingles(batch, "id", "text", self.SHN), "id", self.NH
        )
        bands_new = lsh_band_keys(sigs, "id", self.NH, self.BANDS)
        from mini_data_platform_spark.operators.incremental import (
            _read_meta,
            _read_table,
        )

        corpus_buckets = _read_table(spark, idx, "buckets", _read_meta(idx))
        want_flagged = {
            r["id"]
            for r in bands_new.alias("n")
            .join(
                corpus_buckets.alias("o"),
                (F.col("n.band_id") == F.col("o.band_id"))
                & (F.col("n.band_key") == F.col("o.band_key")),
            )
            .select(F.col("n.id"))
            .distinct()
            .collect()
        }
        assert {r["doc_id"] for r in got} == want_flagged

    def test_stream_then_drain_equals_increment_twice(self, spark, tmp_path):
        """Streaming a batch (read-only vs the seed) then DRAINING it via
        the standard increment leaves the index in exactly the state of
        a never-streamed double-increment run: the later increment's
        pairs are identical."""
        from mini_data_platform_spark.operators.incremental import (
            neardup_index_build,
            neardup_index_increment,
        )
        from mini_data_platform_spark.streaming.neardup import (
            export_index_seed,
            near_dup_candidates_stream,
        )

        b1 = self._b1(spark)
        b2 = self._b2_rows(b1).select("doc_id", "text")
        t = F.split(F.trim(F.col("text")), " +")
        b3 = b1.where(F.col("doc_id") < 104).select(
            (F.col("doc_id") + 5000).alias("doc_id"),
            F.concat_ws(" ", F.slice(t, 2, F.size(t) - 1)).alias("text"),
        )

        def pairs(df):
            return {
                (r["id_a"], r["id_b"], round(r["jaccard"], 12))
                for r in df.collect()
            }

        # path A: stream b2 against the seed, then drain (= increment)
        idx_a = str(tmp_path / "idx_a")
        neardup_index_build(
            b1, idx_a, "doc_id", "text", 0.5, self.NH, self.BANDS, self.SHN
        )
        seed_dir = str(tmp_path / "seed_a")
        export_index_seed(spark, idx_a, seed_dir)
        src = str(tmp_path / "src_a")
        self._b2_rows(b1).write.parquet(src)
        stream = spark.readStream.schema(
            "doc_id long, ts timestamp, text string"
        ).parquet(src)
        name = f"nddrain_{int(time.time() * 1000)}"
        run_available_now(
            near_dup_candidates_stream(
                stream, num_hashes=self.NH, bands=self.BANDS,
                shingle_n=self.SHN, seed_dir=seed_dir,
            ),
            str(tmp_path / "ckpt_a"), fmt="memory",
            query_name=name, timeout_sec=180,
        )
        assert spark.table(name).count() > 0
        a2 = pairs(neardup_index_increment(b2, idx_a))  # the drain
        a3 = pairs(neardup_index_increment(b3, idx_a))

        # path B: plain double increment, never streamed
        idx_b = str(tmp_path / "idx_b")
        neardup_index_build(
            b1, idx_b, "doc_id", "text", 0.5, self.NH, self.BANDS, self.SHN
        )
        b2p = pairs(neardup_index_increment(b2, idx_b))
        b3p = pairs(neardup_index_increment(b3, idx_b))
        assert a2 == b2p
        assert a3 == b3p


class TestStreamingViewMaintenance:
    """streaming/ivm.py: a view bootstrapped in batch stays current from
    a stream, exactly-once across checkpointed restarts."""

    MEASURES = {
        "revenue": ("sum", "amount"),
        "n": ("count", "*"),
        "hi": ("max", "amount"),
    }

    def _facts(self, spark, rows):
        return spark.createDataFrame(rows, "k string, amount double")

    def test_stream_equals_batch_aggregate(self, spark, tmp_path):
        from mini_data_platform_spark.operators.ivm import (
            view_build,
            view_read,
        )
        from mini_data_platform_spark.streaming.ivm import (
            maintain_view_stream,
        )

        hist = [("a", 1.0), ("b", 2.0)]
        live1 = [("a", 3.5), ("c", 10.0)]
        live2 = [("b", 0.5), ("c", 1.0), ("a", -1.0)]

        view_dir = str(tmp_path / "view")
        view_build(self._facts(spark, hist), view_dir, ["k"], self.MEASURES)

        src = str(tmp_path / "facts")
        ckpt = str(tmp_path / "ckpt")
        self._facts(spark, live1).write.mode("append").parquet(src)
        stream = spark.readStream.schema("k string, amount double").parquet(src)
        q = maintain_view_stream(stream, view_dir, ckpt, available_now=True)
        q.awaitTermination(180)

        got = {
            r["k"]: (r["revenue"], r["n"], r["hi"])
            for r in view_read(spark, view_dir).collect()
        }
        assert got == {
            "a": (4.5, 2, 3.5), "b": (2.0, 1, 2.0), "c": (10.0, 1, 10.0)
        }

        # restart from the checkpoint with MORE files: only the new
        # files apply (processed epochs are not re-applied — the
        # batch-id guard would also swallow them if they were)
        self._facts(spark, live2).write.mode("append").parquet(src)
        stream2 = spark.readStream.schema(
            "k string, amount double"
        ).parquet(src)
        q2 = maintain_view_stream(stream2, view_dir, ckpt, available_now=True)
        q2.awaitTermination(180)

        got2 = {
            r["k"]: (r["revenue"], r["n"], r["hi"])
            for r in view_read(spark, view_dir).collect()
        }
        assert got2 == {
            "a": (3.5, 3, 3.5), "b": (2.5, 2, 2.0), "c": (11.0, 2, 10.0)
        }

    def test_replayed_epoch_applies_once(self, spark, tmp_path):
        """Simulate Spark replaying a crashed micro-batch: the same
        epoch id delivered twice lands once (the foreachBatch
        at-least-once → exactly-once upgrade)."""
        from mini_data_platform_spark.operators.ivm import (
            view_build,
            view_read,
        )
        from mini_data_platform_spark.operators import ivm

        view_dir = str(tmp_path / "view")
        view_build(
            self._facts(spark, [("a", 1.0)]), view_dir, ["k"], self.MEASURES
        )
        batch = self._facts(spark, [("a", 2.0)])
        # what maintain_view_stream's process() does, twice with one id
        ivm.view_increment(batch, view_dir, batch_id="epoch-7")
        ivm.view_increment(batch, view_dir, batch_id="epoch-7")
        got = {r["k"]: r["n"] for r in view_read(spark, view_dir).collect()}
        assert got == {"a": 2}

    def test_fresh_checkpoint_gets_fresh_id_space(self, spark, tmp_path):
        """A NEW checkpoint dir restarts Spark's epoch counter at 0; its
        batches must land instead of colliding with the old checkpoint's
        epoch-0 commit (batch ids are keyed by checkpoint identity)."""
        from mini_data_platform_spark.operators.ivm import (
            view_build,
            view_read,
        )
        from mini_data_platform_spark.streaming.ivm import (
            maintain_view_stream,
        )

        view_dir = str(tmp_path / "view")
        view_build(
            self._facts(spark, [("a", 1.0)]), view_dir, ["k"], self.MEASURES
        )
        src1 = str(tmp_path / "s1")
        self._facts(spark, [("a", 2.0)]).write.parquet(src1)
        q = maintain_view_stream(
            spark.readStream.schema("k string, amount double").parquet(src1),
            view_dir, str(tmp_path / "ckpt1"), available_now=True,
        )
        q.awaitTermination(180)
        # second PIPELINE: different source, FRESH checkpoint — its
        # epoch 0 must not be swallowed
        src2 = str(tmp_path / "s2")
        self._facts(spark, [("a", 4.0)]).write.parquet(src2)
        q2 = maintain_view_stream(
            spark.readStream.schema("k string, amount double").parquet(src2),
            view_dir, str(tmp_path / "ckpt2"), available_now=True,
        )
        q2.awaitTermination(180)
        got = {r["k"]: r["n"] for r in view_read(spark, view_dir).collect()}
        assert got == {"a": 3}

    def test_streamed_merge_table(self, spark, tmp_path):
        """streaming/mergetable.py: a CDC stream of upsert/delete rows
        keeps the keyed merge table current, exactly-once across
        checkpointed restarts, and the serve read equals the batch-apply
        twin."""
        from mini_data_platform_spark.operators.mergetable import (
            table_apply,
            table_build,
            table_read,
        )
        from mini_data_platform_spark.streaming.mergetable import (
            maintain_table_stream,
        )

        schema = "k bigint, v string, _op string"
        base = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string")
        live1 = [(2, "B", "u"), (4, "d", "u"), (3, None, "d")]
        live2 = [(3, "c2", "u"), (1, None, "d")]

        tdir = str(tmp_path / "table")
        table_build(base, tdir, ["k"])
        src = str(tmp_path / "changes")
        ckpt = str(tmp_path / "ckpt")
        spark.createDataFrame(live1, schema).write.mode("append").parquet(src)
        q = maintain_table_stream(
            spark.readStream.schema(schema).parquet(src), tdir, ckpt,
            available_now=True,
        )
        q.awaitTermination(180)
        got = {r["k"]: r["v"] for r in table_read(spark, tdir).collect()}
        assert got == {1: "a", 2: "B", 4: "d"}

        # restart from the checkpoint with more files: only new files
        # apply; the final state equals a batch-apply twin
        spark.createDataFrame(live2, schema).write.mode("append").parquet(src)
        q2 = maintain_table_stream(
            spark.readStream.schema(schema).parquet(src), tdir, ckpt,
            available_now=True,
        )
        q2.awaitTermination(180)
        twin = str(tmp_path / "twin")
        table_build(base, twin, ["k"])
        table_apply(spark.createDataFrame(live1, schema), twin)
        table_apply(spark.createDataFrame(live2, schema), twin)
        assert (
            {r["k"]: r["v"] for r in table_read(spark, tdir).collect()}
            == {r["k"]: r["v"] for r in table_read(spark, twin).collect()}
            == {2: "B", 3: "c2", 4: "d"}
        )

    def test_cdc_change_stream(self, spark, tmp_path):
        """changes=True: a streamed upsert (delete-old/insert-new pair)
        retracts through view_apply_changes exactly once."""
        from mini_data_platform_spark.operators.ivm import (
            view_build,
            view_read,
        )
        from mini_data_platform_spark.streaming.ivm import (
            maintain_view_stream,
        )

        view_dir = str(tmp_path / "cdcview")
        view_build(
            self._facts(spark, [("a", 10.0), ("b", 3.0)]),
            view_dir, ["k"],
            {"revenue": ("sum", "amount"), "n": ("count", "*")},
        )
        src = str(tmp_path / "cdc")
        spark.createDataFrame(
            [("a", 10.0, -1), ("a", 12.5, 1), ("b", 3.0, -1)],
            "k string, amount double, _op int",
        ).write.parquet(src)
        q = maintain_view_stream(
            spark.readStream.schema(
                "k string, amount double, _op int"
            ).parquet(src),
            view_dir, str(tmp_path / "cdcckpt"),
            available_now=True, changes=True,
        )
        q.awaitTermination(180)
        got = {
            r["k"]: (r["revenue"], r["n"])
            for r in view_read(spark, view_dir).collect()
        }
        # a upserted to 12.5; b fully deleted -> vanished
        assert got == {"a": (12.5, 1)}


class TestStreamingJoinView:
    """streaming/joinview.py: a JOIN view over two merge tables stays
    current from CDC streams — apply + refresh per epoch, one
    refresher, equal to the GROUP BY recompute over final states."""

    ORDERS = "o_id bigint, cust bigint, price double"
    CUST = "cust bigint, seg string"

    def _setup(self, spark, tmp_path):
        from mini_data_platform_spark.operators.joinview import (
            join_view_build,
            join_view_refresh,
        )
        from mini_data_platform_spark.operators.mergetable import (
            table_build,
        )

        L, R, V = (str(tmp_path / d) for d in ("orders", "cust", "view"))
        table_build(
            spark.createDataFrame(
                [(1, 10, 100.0), (2, 20, 50.0)], self.ORDERS
            ),
            L, ["o_id"],
        )
        table_build(
            spark.createDataFrame([(10, "A"), (20, "B")], self.CUST),
            R, ["cust"],
        )
        join_view_build(
            spark, L, R, ["cust"], V, ["seg"],
            {"revenue": ("sum", "price"), "n": ("count", "*")},
        )
        join_view_refresh(spark, V)
        return L, R, V

    def _recompute(self, spark, L, R):
        from mini_data_platform_spark.operators.mergetable import table_read

        return {
            r["seg"]: (r["revenue"], r["n"])
            for r in table_read(spark, L)
            .join(table_read(spark, R), "cust")
            .groupBy("seg")
            .agg(
                F.sum("price").alias("revenue"), F.count("*").alias("n")
            )
            .collect()
        }

    def _view(self, spark, V):
        from mini_data_platform_spark.operators.ivm import view_read

        return {
            r["seg"]: (r["revenue"], r["n"])
            for r in view_read(spark, V).collect()
        }

    def test_stream_equals_recompute(self, spark, tmp_path):
        from mini_data_platform_spark.streaming.joinview import (
            maintain_join_view_stream,
        )

        L, R, V = self._setup(spark, tmp_path)
        src = str(tmp_path / "cdc")
        # epoch: an update to order 1, a new order, a delete of order 2
        spark.createDataFrame(
            [(1, 10, 150.0, "u"), (3, 20, 7.0, "u"), (2, None, None, "d")],
            "o_id bigint, cust bigint, price double, _op string",
        ).write.parquet(src)
        q = maintain_join_view_stream(
            spark.readStream.schema(
                "o_id bigint, cust bigint, price double, _op string"
            ).parquet(src),
            L, V, str(tmp_path / "ckpt"), available_now=True,
        )
        q.awaitTermination(180)
        got = self._view(spark, V)
        assert got == self._recompute(spark, L, R)
        assert got == {"A": (150.0, 1), "B": (7.0, 1)}

    def test_two_streams_one_refresher(self, spark, tmp_path):
        """Dim side streams with refresh=False (apply-only); the fact
        side owns the refresh and folds BOTH sides' advances."""
        from mini_data_platform_spark.streaming.joinview import (
            maintain_join_view_stream,
        )

        L, R, V = self._setup(spark, tmp_path)
        dim_src = str(tmp_path / "dimcdc")
        spark.createDataFrame(
            [(10, "PROMOTED"), (30, "C")], self.CUST
        ).write.parquet(dim_src)
        q1 = maintain_join_view_stream(
            spark.readStream.schema(self.CUST).parquet(dim_src),
            R, V, str(tmp_path / "dimckpt"),
            available_now=True, refresh=False,
        )
        q1.awaitTermination(180)
        # apply-only: the view has NOT moved yet
        assert self._view(spark, V) == {"A": (100.0, 1), "B": (50.0, 1)}
        fact_src = str(tmp_path / "factcdc")
        spark.createDataFrame(
            [(4, 30, 9.0)], self.ORDERS
        ).write.parquet(fact_src)
        q2 = maintain_join_view_stream(
            spark.readStream.schema(self.ORDERS).parquet(fact_src),
            L, V, str(tmp_path / "factckpt"), available_now=True,
        )
        q2.awaitTermination(180)
        got = self._view(spark, V)
        assert got == self._recompute(spark, L, R)
        # order 1 moved to PROMOTED with the dim change; new C row
        assert got == {
            "PROMOTED": (100.0, 1), "B": (50.0, 1), "C": (9.0, 1)
        }

    def test_outside_writer_folded(self, spark, tmp_path):
        """A batch applied OUTSIDE the stream (the crashed-between-
        apply-and-refresh shape) is folded by the next epoch's
        refresh."""
        from mini_data_platform_spark.operators.mergetable import (
            table_apply,
        )
        from mini_data_platform_spark.streaming.joinview import (
            maintain_join_view_stream,
        )

        L, R, V = self._setup(spark, tmp_path)
        table_apply(
            spark.createDataFrame([(5, 10, 1000.0)], self.ORDERS), L
        )
        src = str(tmp_path / "cdc")
        spark.createDataFrame(
            [(6, 20, 2.0)], self.ORDERS
        ).write.parquet(src)
        q = maintain_join_view_stream(
            spark.readStream.schema(self.ORDERS).parquet(src),
            L, V, str(tmp_path / "ckpt"), available_now=True,
        )
        q.awaitTermination(180)
        assert self._view(spark, V) == self._recompute(spark, L, R)


class TestStreamingHistogram:
    """streaming/ivm.maintain_histogram_stream: streaming p95 — a
    histogram view fed by a stream serves the same quantiles as the
    batch-built twin, and a CDC stream retracts."""

    def _facts(self, spark, rows):
        return spark.createDataFrame(rows, "k string, v double")

    def test_stream_equals_batch_histogram(self, spark, tmp_path):
        from mini_data_platform_spark.operators.ivm import (
            histogram_view_build,
            quantile_view_read,
        )
        from mini_data_platform_spark.streaming.ivm import (
            maintain_histogram_stream,
        )

        hist = [("a", float(i)) for i in range(50)]
        live = [("a", float(i)) for i in range(50, 100)] + [("b", 7.0)]

        view_dir = str(tmp_path / "hview")
        histogram_view_build(
            self._facts(spark, hist), view_dir, ["k"], "v", width=10.0
        )
        src = str(tmp_path / "facts")
        ckpt = str(tmp_path / "ckpt")
        self._facts(spark, live).write.mode("append").parquet(src)
        stream = spark.readStream.schema("k string, v double").parquet(src)
        q = maintain_histogram_stream(
            stream, view_dir, ckpt, available_now=True
        )
        q.awaitTermination(180)

        twin = str(tmp_path / "twin")
        histogram_view_build(
            self._facts(spark, hist + live), twin, ["k"], "v", width=10.0
        )
        qs = {"p50": 0.5, "p95": 0.95}
        got = {
            r["k"]: (r["p50"], r["p95"])
            for r in quantile_view_read(spark, view_dir, qs).collect()
        }
        want = {
            r["k"]: (r["p50"], r["p95"])
            for r in quantile_view_read(spark, twin, qs).collect()
        }
        assert got == want  # bit-identical to the batch-built twin

    def test_cdc_stream_retracts(self, spark, tmp_path):
        from mini_data_platform_spark.operators.ivm import (
            histogram_view_build,
            quantile_view_read,
        )
        from mini_data_platform_spark.streaming.ivm import (
            maintain_histogram_stream,
        )

        view_dir = str(tmp_path / "hview")
        histogram_view_build(
            self._facts(
                spark, [("a", float(i)) for i in range(100)]
            ),
            view_dir, ["k"], "v", width=10.0,
        )
        # CDC stream deletes the top half
        src = str(tmp_path / "chg")
        ckpt = str(tmp_path / "ckpt")
        spark.createDataFrame(
            [("a", float(i), -1) for i in range(50, 100)],
            "k string, v double, _op int",
        ).write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            "k string, v double, _op int"
        ).parquet(src)
        q = maintain_histogram_stream(
            stream, view_dir, ckpt, available_now=True, changes=True
        )
        q.awaitTermination(180)
        r = quantile_view_read(
            spark, view_dir, {"p95": 0.95}
        ).collect()[0]
        assert r["p95"] <= 50.0


class TestStreamEnrich:
    """streaming/enrich.py: per-micro-batch dimension lookup against a
    keyed merge table — at-apply-time versions, candidate-bounded
    probes, idempotent epoch output."""

    def _dim(self, spark, tmp_path):
        from mini_data_platform_spark.operators.mergetable import (
            table_build,
        )

        d = str(tmp_path / "dim")
        rows = spark.createDataFrame(
            [(1, "alice", "AUTO"), (2, "bob", "BUILD"),
             (3, "carol", "SHIP")],
            "c_custkey long, c_name string, c_seg string",
        )
        table_build(rows, d, ["c_custkey"], batch_id="b0")
        return d

    def _facts(self, spark, rows):
        return spark.createDataFrame(
            rows, "o_id long, c_custkey long, amount double"
        )

    def test_at_apply_time_versions_and_left_nulls(self, spark, tmp_path):
        from mini_data_platform_spark.operators.mergetable import (
            table_apply,
        )
        from mini_data_platform_spark.streaming.enrich import enrich_stream

        dim = self._dim(spark, tmp_path)
        src = str(tmp_path / "facts")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        # wave 1: keys 1,2 and an unknown key 9
        self._facts(
            spark, [(100, 1, 5.0), (101, 2, 6.0), (102, 9, 7.0)]
        ).write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            "o_id long, c_custkey long, amount double"
        ).parquet(src)
        q = enrich_stream(stream, dim, out, ckpt, available_now=True)
        q.awaitTermination(180)
        got1 = {
            r["o_id"]: r["c_name"]
            for r in spark.read.parquet(out).collect()
        }
        assert got1 == {100: "alice", 101: "bob", 102: None}

        # dim changes between waves: rename key 1, delete key 2
        table_apply(
            spark.createDataFrame(
                [(1, "ALICE2", "AUTO", "u"), (2, None, None, "d")],
                "c_custkey long, c_name string, c_seg string, _op string",
            ),
            dim, batch_id="b1",
        )
        self._facts(
            spark, [(200, 1, 8.0), (201, 2, 9.0)]
        ).write.mode("append").parquet(src)
        stream2 = spark.readStream.schema(
            "o_id long, c_custkey long, amount double"
        ).parquet(src)
        q2 = enrich_stream(stream2, dim, out, ckpt, available_now=True)
        q2.awaitTermination(180)
        got2 = {
            r["o_id"]: r["c_name"]
            for r in spark.read.parquet(out).collect()
        }
        # wave-1 rows keep their at-apply-time enrichment; wave-2 sees
        # the new version, and the deleted key enriches to NULL
        assert got2 == {
            100: "alice", 101: "bob", 102: None,
            200: "ALICE2", 201: None,
        }

    def test_inner_drops_and_guards(self, spark, tmp_path):
        import pytest

        from mini_data_platform_spark.streaming.enrich import enrich_stream

        dim = self._dim(spark, tmp_path)
        src = str(tmp_path / "facts")
        out = str(tmp_path / "out")
        self._facts(
            spark, [(1, 1, 5.0), (2, 9, 7.0)]
        ).write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            "o_id long, c_custkey long, amount double"
        ).parquet(src)
        q = enrich_stream(
            stream, dim, out, str(tmp_path / "ck2"), how="inner",
            available_now=True,
        )
        q.awaitTermination(180)
        assert {
            r["o_id"] for r in spark.read.parquet(out).collect()
        } == {1}
        with pytest.raises(ValueError):
            enrich_stream(stream, dim, out, str(tmp_path / "ck3"),
                          how="full")
        bad = spark.readStream.schema("o_id long, amount double").parquet(
            src
        )
        with pytest.raises(ValueError):
            enrich_stream(bad, dim, out, str(tmp_path / "ck4"))


class TestDedupIndexStream:
    """streaming/dedup_index.py: micro-batches ARE index increments —
    stream-driven dedup equals the batch-increment twin, exactly-once
    across checkpointed restarts."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_exact_stream_equals_batch_increments(self, spark, tmp_path):
        from mini_data_platform_spark.operators.incremental import (
            _read_meta,
            exact_index_build,
            exact_index_increment,
        )
        from mini_data_platform_spark.streaming.dedup_index import (
            maintain_exact_index_stream,
        )

        base = [(i, f"text number {i} alpha beta") for i in range(20)]
        wave1 = [(100 + i, f"text number {i} alpha beta") for i in range(10)]
        wave2 = [(200 + i, f"text number {i} alpha beta") for i in range(5)] + [
            (300, "entirely new content gamma")
        ]

        sidx = str(tmp_path / "sidx")
        exact_index_build(self._docs(spark, base), sidx, "doc_id", "text")
        src = str(tmp_path / "stream_src")
        ckpt = str(tmp_path / "ckpt")
        self._docs(spark, wave1).write.mode("append").parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = maintain_exact_index_stream(stream, sidx, ckpt, available_now=True)
        q.awaitTermination(180)

        # restart with more files: only the new wave applies
        self._docs(spark, wave2).write.mode("append").parquet(src)
        stream2 = spark.readStream.schema(
            "doc_id long, text string"
        ).parquet(src)
        q2 = maintain_exact_index_stream(stream2, sidx, ckpt, available_now=True)
        q2.awaitTermination(180)

        # batch twin: same waves as plain increments
        bidx = str(tmp_path / "bidx")
        exact_index_build(self._docs(spark, base), bidx, "doc_id", "text")
        exact_index_increment(self._docs(spark, wave1), bidx)
        exact_index_increment(self._docs(spark, wave2), bidx)

        def resolutions(idx):
            import os

            out = set()
            pairs_root = os.path.join(idx, "pairs")
            for d in sorted(os.listdir(pairs_root)):
                for r in spark.read.parquet(
                    os.path.join(pairs_root, d)
                ).collect():
                    out.add((r["id"], r["dup_of"]))
            return out

        assert resolutions(sidx) == resolutions(bidx)
        # stream state committed: corpus count includes both waves
        assert _read_meta(sidx)["n_docs"] == 20 + 10 + 6

    def test_neardup_stream_pairs_equal_batch(self, spark, tmp_path):
        from mini_data_platform_spark.operators.incremental import (
            neardup_index_build,
            neardup_index_increment,
        )
        from mini_data_platform_spark.streaming.dedup_index import (
            maintain_neardup_index_stream,
        )

        base = [
            (i, f"alpha beta gamma delta tok{i} word{i % 5} alpha beta")
            for i in range(30)
        ]
        live = [
            (1000 + i, f"beta gamma delta tok{i} word{i % 5} alpha beta")
            for i in range(10)
        ]
        sidx = str(tmp_path / "sidx")
        neardup_index_build(
            self._docs(spark, base), sidx, "doc_id", "text"
        )
        src = str(tmp_path / "src")
        self._docs(spark, live).write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            "doc_id long, text string"
        ).parquet(src)
        q = maintain_neardup_index_stream(
            stream, sidx, str(tmp_path / "ck"), available_now=True
        )
        q.awaitTermination(180)

        bidx = str(tmp_path / "bidx")
        neardup_index_build(self._docs(spark, base), bidx, "doc_id", "text")
        want = {
            (r["id_a"], r["id_b"])
            for r in neardup_index_increment(
                self._docs(spark, live), bidx
            ).collect()
        }
        import os

        got = set()
        for d in sorted(os.listdir(os.path.join(sidx, "pairs"))):
            for r in spark.read.parquet(
                os.path.join(sidx, "pairs", d)
            ).collect():
                got.add((r["id_a"], r["id_b"]))
        assert got == want
