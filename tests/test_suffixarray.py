"""Suffix-array repeated-substring detection (operators/suffixarray.py).

Strategy: hand-built corpora with known answers, a seeded randomized
sweep against an in-process Python brute force (the same semantics the
DuckDB oracle checks at sf0.01), edge cases (no repeats, short docs,
id-range guard), and partition invariance.
"""

import random

import pytest
from pyspark.sql import functions as F

from mini_data_platform_spark.operators.resources import release_plan
from mini_data_platform_spark.operators.suffixarray import (
    longest_repeat,
    repeated_span_coverage,
    suffix_classes,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute_longest(texts, max_len=128):
    """(repeat_len, n_grams, n_positions, top_gram) by enumeration."""
    toks = [t.split() for t in texts if t.strip()]
    best = (0, 0, 0, "")
    for L in range(1, max_len + 1):
        grams = {}
        for t in toks:
            for s in range(0, len(t) - L + 1):
                g = " ".join(t[s : s + L])
                grams[g] = grams.get(g, 0) + 1
        rep = {g: c for g, c in grams.items() if c >= 2}
        if rep:
            best = (L, len(rep), sum(rep.values()), min(rep))
    return best


def _brute_coverage(texts, min_len=16):
    """{doc_index: (n_tokens, n_repeat_starts, covered)} by enumeration."""
    toks = {i: t.split() for i, t in enumerate(texts) if t.strip()}
    counts = {}
    for t in toks.values():
        for s in range(0, len(t) - min_len + 1):
            g = " ".join(t[s : s + min_len])
            counts[g] = counts.get(g, 0) + 1
    out = {}
    for i, t in toks.items():
        starts = [
            s
            for s in range(0, len(t) - min_len + 1)
            if counts[" ".join(t[s : s + min_len])] >= 2
        ]
        covered = set()
        for s in starts:
            covered.update(range(s, s + min_len))
        out[i] = (len(t), len(starts), len(covered))
    return out


class TestLongestRepeat:
    def test_known_answer(self, spark):
        # "x y z w" repeats across docs 0/1; nothing longer does
        texts = [
            "a b x y z w c d",
            "e f g x y z w h",
            "q r s t u v",
        ]
        df = longest_repeat(_docs(spark, texts), "doc_id", "text")
        row = df.collect()[0]
        release_plan(df)
        assert (
            row["repeat_len"],
            row["n_grams"],
            row["n_positions"],
            row["top_gram"],
        ) == (4, 1, 2, "x y z w")

    def test_overlapping_self_repeat(self, spark):
        # "a a a a" contains "a a a" twice (overlapping starts)
        df = longest_repeat(_docs(spark, ["a a a a"]), "doc_id", "text")
        row = df.collect()[0]
        release_plan(df)
        assert (row["repeat_len"], row["n_positions"]) == (3, 2)

    def test_no_repeats(self, spark):
        df = longest_repeat(_docs(spark, ["a b c", "d e f"]), "doc_id", "text")
        row = df.collect()[0]
        release_plan(df)
        assert (
            row["repeat_len"],
            row["n_grams"],
            row["n_positions"],
            row["top_gram"],
        ) == (0, 0, 0, "")

    def test_repeat_longer_than_one_block(self, spark):
        # 20-token shared span exercises multi-block keys (block=8)
        span = " ".join(f"s{i}" for i in range(20))
        texts = [f"a b {span}", f"{span} c d", "unrelated words only here"]
        df = longest_repeat(_docs(spark, texts), "doc_id", "text")
        row = df.collect()[0]
        release_plan(df)
        assert row["repeat_len"] == 20
        assert row["top_gram"] == span

    def test_max_len_caps_report(self, spark):
        span = " ".join(f"s{i}" for i in range(30))
        texts = [f"{span} a", f"{span} b"]
        df = longest_repeat(_docs(spark, texts), "doc_id", "text", max_len=12)
        row = df.collect()[0]
        release_plan(df)
        assert row["repeat_len"] == 12

    def test_randomized_vs_brute(self, spark):
        rng = random.Random(42)
        for trial in range(3):
            vocab = ["w%d" % i for i in range(rng.randint(3, 6))]
            texts = [
                " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40)))
                for _ in range(12)
            ]
            expect = _brute_longest(texts)
            df = longest_repeat(_docs(spark, texts), "doc_id", "text")
            row = df.collect()[0]
            release_plan(df)
            got = (
                row["repeat_len"],
                row["n_grams"],
                row["n_positions"],
                row["top_gram"],
            )
            assert got == expect, f"trial {trial}: {got} != {expect}"

    def test_partition_invariance(self, spark):
        texts = ["p q r s p q r s", "p q r s t", "t t t t t t"]
        base = _docs(spark, texts)
        a = longest_repeat(base.repartition(1), "doc_id", "text").collect()
        b = longest_repeat(base.repartition(7), "doc_id", "text").collect()
        assert a == b


class TestRepeatedSpanCoverage:
    def test_known_answer(self, spark):
        span = " ".join(f"s{i}" for i in range(16))
        texts = [
            f"a b c {span}",  # 19 tokens, covered 16 from pos 3
            f"{span} x y",  # 18 tokens, covered 16 from pos 0
            "short doc",  # below min_len: zero coverage
            " ".join(f"u{i}" for i in range(25)),  # unique 25-token doc
        ]
        df = repeated_span_coverage(_docs(spark, texts), "doc_id", "text")
        rows = {r["doc_id"]: r for r in df.collect()}
        release_plan(df)
        assert (rows[0]["n_tokens"], rows[0]["n_repeat_starts"],
                rows[0]["covered_tokens"]) == (19, 1, 16)
        assert (rows[1]["n_tokens"], rows[1]["n_repeat_starts"],
                rows[1]["covered_tokens"]) == (18, 1, 16)
        assert (rows[2]["n_repeat_starts"], rows[2]["covered_tokens"]) == (0, 0)
        assert (rows[3]["n_repeat_starts"], rows[3]["covered_tokens"]) == (0, 0)
        assert rows[1]["coverage_frac"] == pytest.approx(round(16 / 18, 6))

    def test_overlapping_intervals_union(self, spark):
        # doc repeats its own 16-gram at stride 1 (17 identical tokens →
        # starts 0 and 1 overlap; union covers all 17 positions)
        texts = ["a " * 17, "a " * 16]
        df = repeated_span_coverage(_docs(spark, texts), "doc_id", "text")
        rows = {r["doc_id"]: r for r in df.collect()}
        release_plan(df)
        assert (rows[0]["n_repeat_starts"], rows[0]["covered_tokens"]) == (2, 17)
        assert (rows[1]["n_repeat_starts"], rows[1]["covered_tokens"]) == (1, 16)

    def test_randomized_vs_brute(self, spark):
        rng = random.Random(7)
        vocab = ["a", "b"]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))
            for _ in range(10)
        ]
        expect = _brute_coverage(texts, min_len=4)
        df = repeated_span_coverage(
            _docs(spark, texts), "doc_id", "text", min_len=4
        )
        rows = {r["doc_id"]: r for r in df.collect()}
        release_plan(df)
        got = {
            i: (r["n_tokens"], r["n_repeat_starts"], r["covered_tokens"])
            for i, r in rows.items()
        }
        assert got == expect


class TestGuards:
    def test_negative_id_raises(self, spark):
        bad = spark.createDataFrame([(-1, "a b c")], "doc_id long, text string")
        df = suffix_classes(bad, "doc_id", "text", 8)
        with pytest.raises(Exception, match="packing range"):
            df.count()
        release_plan(df)

    def test_classes_group_equal_prefixes(self, spark):
        # cls_1 (block 8) must group positions whose 8-token truncated
        # suffix prefixes are equal — including the truncation length
        texts = ["a b c d e f g h i", "a b c d e f g h z"]
        cls = suffix_classes(_docs(spark, texts), "doc_id", "text", 128)
        rows = cls.where(F.col("pos") == 0).select("cls_1").collect()
        release_plan(cls)
        # both docs share the first 8 tokens → same level-1 class at pos 0
        assert rows[0]["cls_1"] == rows[1]["cls_1"]

    def test_truncation_distinguishes_lengths(self, spark):
        # suffix "g h" (len 2) vs "g h i" (len 3): equal first 2 tokens
        # but different truncated-8 strings → different cls_1
        texts = ["x g h", "y g h i"]
        cls = suffix_classes(_docs(spark, texts), "doc_id", "text", 128)
        rows = {
            (r["doc_id"], r["pos"]): r["cls_1"]
            for r in cls.select("doc_id", "pos", "cls_1").collect()
        }
        release_plan(cls)
        assert rows[(0, 1)] != rows[(1, 1)]


def _brute_span_dedup(texts, min_len=16):
    """{doc_index: (n_tokens, n_removed, dedup_text)} by enumeration."""
    POS_LIMIT = 1 << 22
    toks = {i: t.split() for i, t in enumerate(texts) if t.strip()}
    groups = {}
    for i, t in toks.items():
        for s in range(0, len(t) - min_len + 1):
            g = " ".join(t[s : s + min_len])
            groups.setdefault(g, []).append(i * POS_LIMIT + s)
    removal = {i: set() for i in toks}
    for sids in groups.values():
        if len(sids) < 2:
            continue
        canon = min(sids)
        for sid in sids:
            if sid != canon:
                i, s = divmod(sid, POS_LIMIT)
                removal[i].update(range(s, s + min_len))
    out = {}
    for i, t in toks.items():
        kept = [tok for p, tok in enumerate(t) if p not in removal[i]]
        out[i] = (len(t), len(t) - len(kept), " ".join(kept))
    return out


class TestSuffixSpanDedup:
    def test_second_occurrence_removed(self, spark):
        from mini_data_platform_spark.operators.suffixarray import (
            suffix_span_dedup,
        )

        span = " ".join(f"s{i}" for i in range(16))
        texts = [f"{span} tail0", f"head1 {span} tail1", "no repeats here"]
        df = suffix_span_dedup(_docs(spark, texts), "doc_id", "text")
        rows = {r["doc_id"]: r for r in df.collect()}
        release_plan(df)
        # doc 0 holds the canonical (min sid) occurrence — untouched
        assert rows[0]["dedup_text"] == f"{span} tail0"
        assert rows[0]["n_removed"] == 0
        # doc 1 loses exactly the 16 span tokens
        assert rows[1]["dedup_text"] == "head1 tail1"
        assert rows[1]["n_removed"] == 16
        assert rows[2]["n_removed"] == 0

    def test_full_doc_duplicate_empties(self, spark):
        from mini_data_platform_spark.operators.suffixarray import (
            suffix_span_dedup,
        )

        span = " ".join(f"s{i}" for i in range(16))
        df = suffix_span_dedup(_docs(spark, [span, span]), "doc_id", "text")
        rows = {r["doc_id"]: r for r in df.collect()}
        release_plan(df)
        assert rows[0]["dedup_text"] == span
        assert (rows[1]["n_removed"], rows[1]["dedup_text"]) == (16, "")

    def test_randomized_vs_brute(self, spark):
        from mini_data_platform_spark.operators.suffixarray import (
            suffix_span_dedup,
        )

        rng = random.Random(11)
        vocab = ["a", "b", "c"]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))
            for _ in range(10)
        ]
        expect = _brute_span_dedup(texts, min_len=5)
        df = suffix_span_dedup(_docs(spark, texts), "doc_id", "text", min_len=5)
        rows = {r["doc_id"]: r for r in df.collect()}
        release_plan(df)
        got = {
            i: (r["n_tokens"], r["n_removed"], r["dedup_text"])
            for i, r in rows.items()
        }
        assert got == expect
