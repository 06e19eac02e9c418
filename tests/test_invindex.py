"""Persisted inverted index + BM25 serving (operators/invindex.py):
the lookup must return EXACTLY the full-corpus scorer's rows for
candidate documents, with bit-identical scores, reading only the query
terms' partition buckets."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mini_data_platform_spark.operators.invindex import (
    N_TERM_BUCKETS,
    invindex_bm25_lookup,
    invindex_build,
)
from mini_data_platform_spark.operators.ranking import bm25_scores


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("alpha beta"),
            F.when(F.col("id") % 3 == 0, F.lit("vector vector")).otherwise(
                F.lit("gamma")
            ),
            F.when(F.col("id") % 5 == 0, F.lit("hash")).otherwise(
                F.concat(F.lit("w"), F.col("id") % 11)
            ),
            F.lit("tail"),
        ).alias("text"),
    )


TERMS = ["vector", "hash", "nosuchterm"]


class TestInvIndex:
    def test_lookup_equals_full_scorer_on_candidates(self, spark, tmp_path):
        docs = _docs(spark)
        d = str(tmp_path / "inv")
        invindex_build(docs, d, "doc_id", "text")
        got = {
            (r["id"], r["dl"], r["bm25"])
            for r in invindex_bm25_lookup(spark, d, TERMS).collect()
        }
        toks = F.split(F.trim(F.col("text")), " +")
        cand = docs.where(
            F.array_contains(toks, "vector") | F.array_contains(toks, "hash")
        ).select("doc_id")
        want = {
            (r["doc_id"], r["dl"], r["bm25"])
            for r in bm25_scores(docs, "doc_id", "text", TERMS)
            .join(cand, "doc_id")
            .collect()
        }
        assert got == want  # same rows, bit-identical doubles
        assert got, "fixture must produce candidates"

    def test_zero_score_docs_absent(self, spark, tmp_path):
        docs = _docs(spark)
        d = str(tmp_path / "inv")
        invindex_build(docs, d, "doc_id", "text")
        out = invindex_bm25_lookup(spark, d, ["nosuchterm"])
        assert out.count() == 0

    def test_postings_partition_pruned(self, spark, tmp_path):
        """The postings scan must keep only the query terms' buckets —
        directory-level pruning, the index's whole point."""
        docs = _docs(spark)
        d = str(tmp_path / "inv")
        invindex_build(docs, d, "doc_id", "text")
        n_dirs = len(
            [
                x
                for x in os.listdir(os.path.join(d, "postings"))
                if x.startswith("bucket=")
            ]
        )
        assert n_dirs > 3  # the corpus spreads over many buckets
        out = invindex_bm25_lookup(spark, d, ["vector"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        import re

        m = re.search(r"PartitionFilters: \[[^\]]*bucket", plan)
        assert m, "postings scan lost its bucket partition filter"

    def test_add_equals_rebuild_bit_for_bit(self, spark, tmp_path):
        """build(half) + add(half) must serve EXACTLY what build(all)
        serves — same rows, same double bits — because tf/dl/df/N/avgdl
        are all re-derived from the appended tables at query time."""
        docs = _docs(spark, 200)
        first = docs.where(F.col("doc_id") < 120)
        second = docs.where(F.col("doc_id") >= 120)
        from mini_data_platform_spark.operators.invindex import invindex_add

        d1 = str(tmp_path / "incr")
        invindex_build(first, d1, "doc_id", "text")
        meta = invindex_add(second, d1, "doc_id", "text")
        d2 = str(tmp_path / "full")
        full_meta = invindex_build(docs, d2, "doc_id", "text")
        assert meta == full_meta
        got = {
            tuple(r)
            for r in invindex_bm25_lookup(spark, d1, TERMS).collect()
        }
        want = {
            tuple(r)
            for r in invindex_bm25_lookup(spark, d2, TERMS).collect()
        }
        assert got == want and got

    def test_delete_equals_rebuild_on_remaining(self, spark, tmp_path):
        """Takedown: build(all) + delete(some) must serve EXACTLY what
        build(all minus some) serves — df, N, avgdl and the candidate
        set all reflect only live docs."""
        from mini_data_platform_spark.operators.invindex import (
            invindex_delete,
        )

        docs = _docs(spark, 200)
        doomed = docs.where(F.col("doc_id") % 4 == 0)
        d1 = str(tmp_path / "del")
        invindex_build(docs, d1, "doc_id", "text")
        meta = invindex_delete(doomed, d1, "doc_id")
        d2 = str(tmp_path / "remain")
        remain_meta = invindex_build(
            docs.where(F.col("doc_id") % 4 != 0), d2, "doc_id", "text"
        )
        assert {k: meta[k] for k in ("n", "dl_sum")} == remain_meta
        got = {
            tuple(r)
            for r in invindex_bm25_lookup(spark, d1, TERMS).collect()
        }
        want = {
            tuple(r)
            for r in invindex_bm25_lookup(spark, d2, TERMS).collect()
        }
        assert got == want and got
        # re-deleting (and deleting an absent id) is stat-neutral
        meta2 = invindex_delete(
            doomed.unionByName(
                doomed.select((F.col("doc_id") + 10**9).alias("doc_id"),
                              "text")
            ),
            d1, "doc_id",
        )
        assert {k: meta2[k] for k in ("n", "dl_sum")} == remain_meta

    def test_refuses_empty_query_and_double_build(self, spark, tmp_path):
        docs = _docs(spark)
        d = str(tmp_path / "inv")
        invindex_build(docs, d, "doc_id", "text")
        with pytest.raises(ValueError, match="empty query"):
            invindex_bm25_lookup(spark, d, [])
        with pytest.raises(ValueError, match="already exists"):
            invindex_build(docs, d, "doc_id", "text")


class TestTombstoneBounds:
    """Round-10 advice (low): deleting ids the index never held must
    append NOTHING to tombstones/ — otherwise repeated absent-id deletes
    grow the tombstone table unboundedly past what ``n_deleted`` (the
    ``_live`` broadcast gate's measure) accounts for, eventually
    hard-broadcasting an oversized frame. Every appended tombstone row
    is counted in ``n_deleted`` exactly once."""

    def test_absent_and_repeated_deletes_stay_bounded(
        self, spark, tmp_path
    ):
        from mini_data_platform_spark.operators.invindex import (
            invindex_delete,
        )

        d = str(tmp_path / "idx")
        invindex_build(_docs(spark, 50), d, "doc_id", "text")
        tomb = os.path.join(d, "tombstones")

        # all-absent delete: a documented no-op — no tombstone rows,
        # no stat movement
        absent = spark.range(10_000, 10_050).select(
            F.col("id").alias("doc_id")
        )
        meta = invindex_delete(absent, d, "doc_id")
        assert meta["n_deleted"] == 0
        assert (not os.path.exists(tomb)) or (
            spark.read.parquet(tomb).count() == 0
        )

        # mixed present/absent, delivered TWICE: the two live ids land
        # once each, the absent id never lands
        mixed = spark.createDataFrame([(3,), (4,), (99_999,)], "doc_id long")
        invindex_delete(mixed, d, "doc_id")
        meta = invindex_delete(mixed, d, "doc_id")
        assert meta["n_deleted"] == 2
        assert spark.read.parquet(tomb).count() == 2

        # lookups still serve the live corpus (doc 3 carried 'vector')
        ids = {
            r["id"] for r in invindex_bm25_lookup(spark, d, ["vector"])
            .collect()
        }
        assert 3 not in ids and 0 in ids


def _phrase_hits_py(rows, phrase):
    """Independent oracle: per-doc count of (overlapping) phrase
    occurrences via plain Python token slices."""
    k = len(phrase)
    out = {}
    for r in rows:
        t = r["text"].strip().split()
        n = sum(
            1 for i in range(len(t) - k + 1) if t[i : i + k] == phrase
        )
        if n:
            out[r["doc_id"]] = n
    return out


class TestPhraseLookup:
    """Positional postings (round-10 task 6): phrase lookups must count
    exact consecutive occurrences — BM25's bag-of-words candidates that
    carry the terms NON-adjacently must not match."""

    def test_phrase_equals_python_scan(self, spark, tmp_path):
        from mini_data_platform_spark.operators.invindex import (
            invindex_phrase_lookup,
        )

        docs = _docs(spark, 200)
        d = str(tmp_path / "inv")
        invindex_build(docs, d, "doc_id", "text")
        phrase = ["alpha", "beta", "gamma"]
        got = {
            (r["id"], r["n_hits"])
            for r in invindex_phrase_lookup(spark, d, phrase).collect()
        }
        want = set(_phrase_hits_py(docs.collect(), phrase).items())
        assert got == want and got
        # the same terms NON-adjacently ordered match nothing, even
        # though every BM25 candidate carries all three terms
        assert (
            invindex_phrase_lookup(spark, d, ["beta", "alpha", "gamma"])
            .count()
            == 0
        )

    def test_repeated_term_phrase_counts_overlaps(self, spark, tmp_path):
        """'vector vector' must match only ADJACENT repeats: the same
        postings row serves both offsets with different shifts."""
        from mini_data_platform_spark.operators.invindex import (
            invindex_phrase_lookup,
        )

        docs = _docs(spark, 60)
        d = str(tmp_path / "inv")
        invindex_build(docs, d, "doc_id", "text")
        phrase = ["vector", "vector"]
        got = {
            (r["id"], r["n_hits"])
            for r in invindex_phrase_lookup(spark, d, phrase).collect()
        }
        want = set(_phrase_hits_py(docs.collect(), phrase).items())
        assert got == want and got

    def test_phrase_respects_tombstones_and_rejects_empty(
        self, spark, tmp_path
    ):
        from mini_data_platform_spark.operators.invindex import (
            invindex_delete,
            invindex_phrase_lookup,
        )

        docs = _docs(spark, 50)
        d = str(tmp_path / "inv")
        invindex_build(docs, d, "doc_id", "text")
        phrase = ["alpha", "beta"]
        before = {
            r["id"]
            for r in invindex_phrase_lookup(spark, d, phrase).collect()
        }
        assert 7 in before
        invindex_delete(
            spark.createDataFrame([(7,)], "doc_id long"), d, "doc_id"
        )
        after = {
            r["id"]
            for r in invindex_phrase_lookup(spark, d, phrase).collect()
        }
        assert after == before - {7}
        with pytest.raises(ValueError, match="empty phrase"):
            invindex_phrase_lookup(spark, d, [])

    def test_bm25_path_never_reads_positions(self, spark, tmp_path):
        """Paying for positions at build time must cost the SCORING
        path nothing: the BM25 lookup's postings scan prunes the
        positions column (parquet column pruning) — its plan must not
        mention the column at all."""
        docs = _docs(spark, 50)
        d = str(tmp_path / "inv")
        invindex_build(docs, d, "doc_id", "text")
        plan = (
            invindex_bm25_lookup(spark, d, ["vector"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "positions" not in plan


class TestCompaction:
    """invindex_compact: the physical-purge half of the tombstone/
    compaction split — lookups before and after must be BIT-identical,
    with the tombstone anti-join gone from the plan."""

    def test_compact_preserves_lookups_and_drops_tombstones(
        self, spark, tmp_path
    ):
        from mini_data_platform_spark.operators.invindex import (
            invindex_compact,
            invindex_delete,
            invindex_phrase_lookup,
        )

        docs = _docs(spark, 200)
        d = str(tmp_path / "inv")
        invindex_build(docs, d, "doc_id", "text")
        doomed = docs.where(F.col("doc_id") % 4 == 0)
        meta_del = invindex_delete(doomed, d, "doc_id")
        assert meta_del["n_deleted"] == 50
        before = {
            tuple(r) for r in invindex_bm25_lookup(spark, d, TERMS).collect()
        }
        before_ph = {
            tuple(r)
            for r in invindex_phrase_lookup(
                spark, d, ["alpha", "beta"]
            ).collect()
        }
        meta = invindex_compact(spark, d)
        assert not os.path.exists(os.path.join(d, "tombstones"))
        assert meta["n_deleted"] == 0
        assert meta["n"] == meta_del["n"]
        assert meta["dl_sum"] == meta_del["dl_sum"]
        after = {
            tuple(r) for r in invindex_bm25_lookup(spark, d, TERMS).collect()
        }
        after_ph = {
            tuple(r)
            for r in invindex_phrase_lookup(
                spark, d, ["alpha", "beta"]
            ).collect()
        }
        assert after == before and after  # bit-identical doubles
        assert after_ph == before_ph and after_ph
        # the purge is PHYSICAL: no dead id survives in the tables
        post_ids = {
            r["id"]
            for r in spark.read.parquet(os.path.join(d, "postings"))
            .select("id").distinct().collect()
        }
        assert not any(i % 4 == 0 for i in post_ids)
        # ... and the serving plan lost its tombstone anti-join
        plan = (
            invindex_bm25_lookup(spark, d, TERMS)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "LeftAnti" not in plan

    def test_compact_noop_without_tombstones_and_add_after(
        self, spark, tmp_path
    ):
        from mini_data_platform_spark.operators.invindex import (
            invindex_add,
            invindex_compact,
            invindex_delete,
        )

        docs = _docs(spark, 200)
        d = str(tmp_path / "inv")
        built = invindex_build(
            docs.where(F.col("doc_id") < 120), d, "doc_id", "text"
        )
        assert invindex_compact(spark, d) == built  # no tombstones: no-op

        # delete + compact + add == rebuild over (live ∪ added)
        invindex_delete(
            docs.where(F.col("doc_id") % 4 == 0), d, "doc_id"
        )
        invindex_compact(spark, d)
        invindex_add(
            docs.where(F.col("doc_id") >= 120), d, "doc_id", "text"
        )
        d2 = str(tmp_path / "ref")
        invindex_build(
            docs.where(
                (F.col("doc_id") % 4 != 0) | (F.col("doc_id") >= 120)
            ),
            d2, "doc_id", "text",
        )
        got = {
            tuple(r) for r in invindex_bm25_lookup(spark, d, TERMS).collect()
        }
        want = {
            tuple(r) for r in invindex_bm25_lookup(spark, d2, TERMS).collect()
        }
        assert got == want and got
