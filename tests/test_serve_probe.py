"""The round-12 driver-side point probe (operators/incremental.py
``_local_bucket_pairs`` + the probe blocks in ``_neardup_batch_pairs``
/ ``_embdup_batch_pairs``): declared-small serving lookups and small
counted increments generate their candidate pairs from two bounded
driver collects (batch band keys + an In-probed bucket scan) instead
of distributed joins. These tests pin that the probe is a pure
STRATEGY change — identical pairs to the distributed path in every
regime (serve, increment, hot-bucket cap, embedding) — that every cap
overflow degrades to the distributed path rather than erroring, and
that the live-view plan cache can never serve a stale index state."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from mini_data_platform_spark.operators import incremental as inc
from mini_data_platform_spark.operators.dedup_fuzzy import near_dup_pairs
from mini_data_platform_spark.operators.incremental import (
    neardup_index_build,
    neardup_index_increment,
    neardup_index_lookup,
)
from mini_data_platform_spark.operators.resources import release_plan

NUM_HASHES, BANDS, SHINGLE_N, THRESH = 16, 4, 3, 0.5


def _corpus(spark, start, n):
    w = "alpha beta gamma delta"
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit(w),
            F.concat(F.lit("tok"), F.col("id")),
            F.concat(F.lit("word"), F.col("id") % 7),
            F.lit(w),
            F.concat(F.lit("x"), F.col("id") % 3),
        ).alias("text"),
    )


def _mutated(docs, offset):
    t = F.split(F.trim(F.col("text")), " +")
    return docs.select(
        (F.col("doc_id") + offset).alias("doc_id"),
        F.concat_ws(" ", F.slice(t, 2, F.size(t) - 1)).alias("text"),
    )


def _pairs_set(df):
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 12)) for r in df.collect()
    }
    release_plan(df)
    return got


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="probeidx_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


class TestLocalBucketPairs:
    """Unit semantics of the driver-side pair generator."""

    def test_cross_and_self_pairs_deduped_and_ordered(self):
        new = [(10, "b1"), (11, "b1"), (10, "b2")]
        old = [(1, "b1"), (2, "b1"), (3, "b2"), (10, "b2")]
        pairs, ids = inc._local_bucket_pairs(new, old, None, 1000, 1000)
        # cross: b1 -> (1,10),(2,10),(1,11),(2,11); b2 -> (3,10); the
        # old entry (10,'b2') is the SAME id as new 10 -> excluded
        # self: b1 -> (10,11)
        assert set(pairs) == {
            (1, 10), (2, 10), (1, 11), (2, 11), (3, 10), (10, 11),
        }
        assert pairs == sorted(pairs)
        assert ids == [1, 2, 3, 10, 11]

    def test_hot_bucket_cap_skips_whole_bucket(self):
        new = [(10, "hot"), (11, "hot"), (12, "cold")]
        old = [(1, "hot"), (2, "hot"), (3, "cold")]
        # hot occupancy 2 old + 2 new = 4 > 3 -> dropped entirely,
        # including its new-vs-new pair; cold survives
        pairs, ids = inc._local_bucket_pairs(new, old, 3, 1000, 1000)
        assert set(pairs) == {(3, 12)}
        assert ids == [3, 12]

    def test_pair_cap_overflow_returns_none(self):
        new = [(i, "b") for i in range(100, 130)]
        old = [(i, "b") for i in range(30)]
        assert (
            inc._local_bucket_pairs(new, old, None, 10, 10_000) is None
        )

    def test_id_cap_overflow_returns_none(self):
        new = [(100, "b")]
        old = [(i, "b") for i in range(50)]
        assert (
            inc._local_bucket_pairs(new, old, None, 10_000, 3) is None
        )

    def test_duplicate_batch_ids_no_self_pair(self):
        # a doc appearing twice in one bucket pairs with others once
        # and never with itself — mirrors the distinct() + (a < b)
        # semantics of the distributed join
        new = [(10, "b"), (10, "b"), (11, "b")]
        pairs, ids = inc._local_bucket_pairs(new, [], None, 1000, 1000)
        assert set(pairs) == {(10, 11)}


class TestProbeEquivalence:
    """Probe path ≡ distributed path, pinned by forcing the fallback
    with a zero entry cap and diffing the pair sets."""

    def _build(self, spark, tmpdir, n=60, max_bucket=None):
        b1 = _corpus(spark, 0, n)
        neardup_index_build(
            b1, tmpdir, "doc_id", "text",
            THRESH, NUM_HASHES, BANDS, SHINGLE_N, max_bucket=max_bucket,
        )
        return b1, _mutated(b1.where(F.col("doc_id") % 3 == 0), 1000)

    def test_serve_lookup_probe_equals_distributed(
        self, spark, tmpdir, monkeypatch
    ):
        _, batch = self._build(spark, tmpdir)
        probed = _pairs_set(
            neardup_index_lookup(batch, tmpdir, small_batch=True)
        )
        monkeypatch.setattr(inc, "_PROBE_MAX_ENTRIES", 0)
        fallback = _pairs_set(
            neardup_index_lookup(batch, tmpdir, small_batch=True)
        )
        assert probed == fallback and probed

    def test_counted_increment_probe_equals_recompute(
        self, spark, tmpdir, monkeypatch
    ):
        b1, batch = self._build(spark, tmpdir)
        probed = _pairs_set(neardup_index_increment(batch, tmpdir))
        # the increment committed; rebuild fresh for the fallback twin
        d2 = tempfile.mkdtemp(prefix="probeidx_")
        try:
            neardup_index_build(
                b1, d2, "doc_id", "text",
                THRESH, NUM_HASHES, BANDS, SHINGLE_N,
            )
            monkeypatch.setattr(inc, "_PROBE_MAX_ENTRIES", 0)
            fallback = _pairs_set(neardup_index_increment(batch, d2))
        finally:
            shutil.rmtree(d2, ignore_errors=True)
        assert probed == fallback and probed
        # and both equal the full-corpus recompute restricted to batch
        full = near_dup_pairs(
            b1.unionByName(batch), "doc_id", "text",
            THRESH, NUM_HASHES, BANDS, SHINGLE_N,
        )
        want = {p for p in _pairs_set(full) if p[1] >= 1000}
        assert probed == want

    def test_hot_bucket_cap_probe_equals_distributed(
        self, spark, tmpdir, monkeypatch
    ):
        CAP = 8
        _, batch = self._build(spark, tmpdir, n=40, max_bucket=CAP)
        probed = _pairs_set(
            neardup_index_lookup(batch, tmpdir, small_batch=True)
        )
        monkeypatch.setattr(inc, "_PROBE_MAX_ENTRIES", 0)
        fallback = _pairs_set(
            neardup_index_lookup(batch, tmpdir, small_batch=True)
        )
        assert probed == fallback

    def test_misdeclared_small_batch_degrades_not_collects(
        self, spark, tmpdir, monkeypatch
    ):
        """Round-12 advice: the probe's FIRST collect is capped too. A
        batch DECLARED small but actually over the entry cap must take
        the limit+1 collect and degrade to the distributed path with
        identical pairs — never an unbounded driver collect (the
        counted gate only bounds the n_batch-known regime)."""
        _, batch = self._build(spark, tmpdir)
        want = _pairs_set(
            neardup_index_lookup(batch, tmpdir, small_batch=True)
        )
        # 20 batch docs x 8 bands = 160 band rows >> 5: mis-declared
        monkeypatch.setattr(inc, "_PROBE_MAX_ENTRIES", 5)
        got = _pairs_set(
            neardup_index_lookup(batch, tmpdir, small_batch=True)
        )
        assert got == want and got

    def test_embdup_probe_equals_distributed(
        self, spark, tmpdir, monkeypatch
    ):
        from mini_data_platform_spark.operators.incremental import (
            embdup_index_build,
            embdup_index_lookup,
        )

        b1 = spark.range(0, 40).select(
            F.col("id").alias("vec_id"),
            F.array(
                F.col("id").cast("double") + 1.0,
                (F.col("id") % 7 - 3).cast("double"),
                (F.col("id") % 5 - 2).cast("double"),
            ).alias("embedding"),
        )
        b2 = b1.select(
            (F.col("vec_id") + 1000).alias("vec_id"),
            F.transform(F.col("embedding"), lambda x: x * 0.5).alias(
                "embedding"
            ),
        )
        embdup_index_build(b1, tmpdir, "vec_id", "embedding", threshold=0.9)

        def pairs(df):
            got = {
                (r["id_a"], r["id_b"], round(r["cos_sim"], 9))
                for r in df.collect()
            }
            release_plan(df)
            return got

        probed = pairs(embdup_index_lookup(b2, tmpdir, small_batch=True))
        monkeypatch.setattr(inc, "_PROBE_MAX_ENTRIES", 0)
        fallback = pairs(embdup_index_lookup(b2, tmpdir, small_batch=True))
        assert probed == fallback and probed


class TestLivePlanCache:
    """The analyzed-plan cache keys on the exact committed segment
    lists — any commit (increment, takedown) must change the key, so a
    lookup after a commit can never see the pre-commit corpus."""

    def test_lookup_sees_post_increment_state(self, spark, tmpdir):
        b1 = _corpus(spark, 0, 30)
        neardup_index_build(
            b1, tmpdir, "doc_id", "text",
            THRESH, NUM_HASHES, BANDS, SHINGLE_N,
        )
        batch1 = _mutated(b1.where(F.col("doc_id") < 5), 1000)
        # a lookup warms the cache for the batch-0-only state
        before = _pairs_set(
            neardup_index_lookup(batch1, tmpdir, small_batch=True)
        )
        assert {(a, a + 1000) for a in range(5)} <= {
            (a, b) for a, b, _ in before
        }
        # commit an increment, then look up a batch that collides with
        # the NEW segment's docs — a stale cached corpus view would
        # miss every one of these pairs
        release_plan(neardup_index_increment(batch1, tmpdir))
        batch2 = _mutated(b1.where(F.col("doc_id") < 5), 2000)
        after = _pairs_set(
            neardup_index_lookup(batch2, tmpdir, small_batch=True)
        )
        got = {(a, b) for a, b, _ in after}
        assert {(a + 1000, a + 2000) for a in range(5)} <= got

    def test_cache_hit_returns_same_plan_object(self, spark, tmpdir):
        b1 = _corpus(spark, 0, 10)
        neardup_index_build(
            b1, tmpdir, "doc_id", "text",
            THRESH, NUM_HASHES, BANDS, SHINGLE_N,
        )
        meta = inc._recover_meta(tmpdir)
        d1 = inc._read_live(spark, tmpdir, "docs", meta)
        d2 = inc._read_live(spark, tmpdir, "docs", meta)
        assert d1 is d2

    def test_remote_paths_hit_cache_via_segment_lists(
        self, spark, tmpdir, monkeypatch
    ):
        """Round-12 verdict item 7: remote URI paths (s3a:// in
        deployment — simulated by patching the _is_remote seam to
        claim the index dir) must still hit BOTH plan caches via the
        committed-segment lists, because remote object stores are
        exactly where listing and footer latency hurt most. A commit
        must still change the key (the segment list changes)."""
        import os as _os

        from mini_data_platform_spark.operators import plancache as pc

        b1 = _corpus(spark, 0, 10)
        neardup_index_build(
            b1, tmpdir, "doc_id", "text",
            THRESH, NUM_HASHES, BANDS, SHINGLE_N,
        )
        seg = _os.path.join(
            tmpdir, "docs", inc._recover_meta(tmpdir)["segments"]["docs"][0]
        )
        monkeypatch.setattr(
            pc, "_is_remote",
            lambda p: str(p).startswith(str(tmpdir)) or "://" in str(p),
        )
        # shared primitive: same object on the second call, plan works
        c1 = pc.cached_parquet(spark, [seg])
        c2 = pc.cached_parquet(spark, [seg])
        assert c1 is c2 and c1.count() == 10
        # live-view cache: same object on a cache hit under no-stat
        meta = inc._recover_meta(tmpdir)
        d1 = inc._read_live(spark, tmpdir, "docs", meta)
        d2 = inc._read_live(spark, tmpdir, "docs", meta)
        assert d1 is d2 and d1.count() == 10
        # a commit changes the segment list -> new key even without
        # stat-able paths: the post-increment lookup must see new docs
        release_plan(
            neardup_index_increment(
                _mutated(b1.where(F.col("doc_id") < 3), 500), tmpdir
            )
        )
        meta2 = inc._recover_meta(tmpdir)
        d3 = inc._read_live(spark, tmpdir, "docs", meta2)
        assert d3 is not d1 and d3.count() == 13

    def test_local_stat_failure_degrades_to_uncached_read(
        self, spark, tmpdir, monkeypatch
    ):
        """Round-13 advice: a transient LOCAL stat failure (EMFILE, a
        permission blip, a cleanup race) must NOT cache the plan under
        the remote sentinel — that would silently drop the mtime
        entry-level defense local dirs get. Both caches degrade to an
        uncached read (fresh object, correct rows) and resume caching
        once stat works again."""
        import os as _os

        from mini_data_platform_spark.operators import plancache as pc

        b1 = _corpus(spark, 0, 10)
        neardup_index_build(
            b1, tmpdir, "doc_id", "text",
            THRESH, NUM_HASHES, BANDS, SHINGLE_N,
        )
        seg = _os.path.join(
            tmpdir, "docs", inc._recover_meta(tmpdir)["segments"]["docs"][0]
        )
        real_stat = _os.stat

        def flaky_stat(path, *a, **k):
            if str(path).startswith(str(tmpdir)):
                raise OSError(24, "too many open files (injected)")
            return real_stat(path, *a, **k)

        monkeypatch.setattr(pc.os, "stat", flaky_stat)
        c1 = pc.cached_parquet(spark, [seg])
        c2 = pc.cached_parquet(spark, [seg])
        assert c1 is not c2 and c1.count() == 10 and c2.count() == 10
        monkeypatch.setattr(inc.os, "stat", flaky_stat)
        meta = inc._recover_meta(tmpdir)
        d1 = inc._read_live(spark, tmpdir, "docs", meta)
        d2 = inc._read_live(spark, tmpdir, "docs", meta)
        assert d1 is not d2 and d1.count() == 10
        # stat recovers -> caching resumes
        monkeypatch.setattr(pc.os, "stat", real_stat)
        monkeypatch.setattr(inc.os, "stat", real_stat)
        c3 = pc.cached_parquet(spark, [seg])
        assert pc.cached_parquet(spark, [seg]) is c3
        d3 = inc._read_live(spark, tmpdir, "docs", meta)
        assert inc._read_live(spark, tmpdir, "docs", meta) is d3


class TestStringIdProbe:
    """String-keyed indexes through the point probe: the literal In
    filter must escape quote/backslash ids, and Python's pair ordering
    (min/max on str) must agree with Spark's least/greatest — pinned by
    diffing the probe against the distributed path on ids built to
    stress both."""

    def test_quoted_ids_probe_equals_distributed(
        self, spark, tmpdir, monkeypatch
    ):
        base = "alpha beta gamma delta epsilon zeta"
        rows = []
        for i in range(12):
            # ids carrying single quotes, backslashes, and unicode —
            # every one must survive the In-literal round trip
            rows.append((f"d'{i}\\xé", f"{base} doc{i}"))
        corpus = spark.createDataFrame(rows, "doc_id string, text string")
        neardup_index_build(
            corpus, tmpdir, "doc_id", "text",
            THRESH, NUM_HASHES, BANDS, SHINGLE_N,
        )
        t = F.split(F.trim(F.col("text")), " +")
        batch = corpus.select(
            F.concat(F.lit("q'"), F.col("doc_id")).alias("doc_id"),
            F.concat_ws(" ", F.slice(t, 2, F.size(t) - 1)).alias("text"),
        )

        def pairs(df):
            got = {
                (r["id_a"], r["id_b"], round(r["jaccard"], 12))
                for r in df.collect()
            }
            release_plan(df)
            return got

        probed = pairs(neardup_index_lookup(batch, tmpdir, small_batch=True))
        monkeypatch.setattr(inc, "_PROBE_MAX_ENTRIES", 0)
        fallback = pairs(
            neardup_index_lookup(batch, tmpdir, small_batch=True)
        )
        assert probed == fallback and probed
        # every id in the output still carries its special characters
        ids = {a for a, _, _ in probed} | {b for _, b, _ in probed}
        assert all("'" in i and "\\" in i and "é" in i for i in ids)

    def test_key_ceiling_falls_back_identically(
        self, spark, tmpdir, monkeypatch
    ):
        """A probe whose distinct key set exceeds _PROBE_MAX_KEYS skips
        the corpus probe entirely (no oversized In predicate) and the
        distributed path returns the identical pairs."""
        base = "alpha beta gamma delta epsilon zeta"
        corpus = spark.createDataFrame(
            [(str(i), f"{base} doc{i}") for i in range(20)],
            "doc_id string, text string",
        )
        neardup_index_build(
            corpus, tmpdir, "doc_id", "text",
            THRESH, NUM_HASHES, BANDS, SHINGLE_N,
        )
        t = F.split(F.trim(F.col("text")), " +")
        batch = corpus.select(
            F.concat(F.lit("n"), F.col("doc_id")).alias("doc_id"),
            F.concat_ws(" ", F.slice(t, 2, F.size(t) - 1)).alias("text"),
        )
        probed = _pairs_set(
            neardup_index_lookup(batch, tmpdir, small_batch=True)
        )
        monkeypatch.setattr(inc, "_PROBE_MAX_KEYS", 0)
        skipped = _pairs_set(
            neardup_index_lookup(batch, tmpdir, small_batch=True)
        )
        assert probed == skipped and probed
