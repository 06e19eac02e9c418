"""Text-analysis functions: tokenization/shingles edge cases, language ID,
quality scoring, fingerprints. Focus on the boundary cases the oracle
corpus doesn't hit (empty/short/whitespace/unicode docs)."""

import pytest

from pyspark.sql import Row, functions as F

from mini_data_platform_spark.functions import text as TX


def _vals(spark, texts, col):
    df = spark.createDataFrame([Row(t=t) for t in texts])
    return [r["v"] for r in df.select(col(F.col("t")).alias("v")).collect()]


class TestTokens:
    def test_whitespace_and_edges(self, spark):
        out = _vals(spark, ["a b  c", "  x  ", "one"], TX.tokens)
        assert out[0] == ["a", "b", "c"]
        assert out[1] == ["x"]
        assert out[2] == ["one"]

    def test_token_count_unicode(self, spark):
        out = _vals(spark, ["héllo wörld", "的 了 是"], TX.token_count)
        assert out == [2, 3]

    def test_bpe_count(self, spark):
        # letter runs, digit runs, single symbols
        out = _vals(spark, ["abc123 x!y", "no-punct"], TX.bpe_token_count)
        assert out[0] == 5  # abc,123,x,!,y
        assert out[1] == 3  # no,-,punct


class TestShingles:
    def test_short_docs_empty(self, spark):
        out = _vals(spark, ["a b", "a", ""], lambda c: TX.shingles(c, 3))
        assert out == [[], [], []]

    def test_exact_n(self, spark):
        out = _vals(spark, ["a b c", "a b c d"], lambda c: TX.shingles(c, 3))
        assert out[0] == ["a b c"]
        assert out[1] == ["a b c", "b c d"]

    def test_shingles_of_matches_shingles(self, spark):
        df = spark.createDataFrame([Row(t="w1 w2 w3 w4 w5")])
        inline = df.select(TX.shingles(F.col("t"), 3).alias("s")).first()["s"]
        staged = (
            df.select(TX.tokens(F.col("t")).alias("_toks"))
            .select(TX.shingles_of(F.col("_toks"), 3).alias("s"))
            .first()["s"]
        )
        assert inline == staged


class TestLanguageGuess:
    def test_clear_languages(self, spark):
        out = _vals(
            spark,
            [
                "the cat sat on the mat and it is fine",
                "der hund und die katze das ist gut",
                "le chat et la souris est une belle chose",
            ],
            TX.language_guess,
        )
        assert out == ["en", "de", "fr"]

    def test_tie_breaks_to_langs_order(self, spark):
        # no stopword hits anywhere -> all counts 0 -> first language wins
        out = _vals(spark, ["zzz qqq www"], TX.language_guess)
        assert out == ["en"]


class TestQuality:
    def test_bounds(self, spark):
        texts = ["", "word " * 200, "!!!!....;;;;", "a b c d e f"]
        out = _vals(spark, texts, TX.quality_score)
        for v in out:
            assert 0.0 <= v <= 1.0
        assert out[1] > out[2]  # long clean text beats pure punctuation

    def test_punct_ratio(self, spark):
        out = _vals(spark, ["ab.,", "abcd"], TX.punct_ratio)
        assert out == [0.5, 0.0]


class TestNormalizeFingerprint:
    def test_normalize(self, spark):
        out = _vals(spark, ["  A   B  ", "a b"], TX.normalize_text)
        assert out[0] == out[1] == "a b"

    def test_fingerprint_stable_under_small_edits(self, spark):
        base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
        mutated = base + " tail"  # appended token: bottom-k hashes usually unchanged
        df = spark.createDataFrame([Row(t=base), Row(t=mutated)])
        fps = [r["v"] for r in df.select(TX.fingerprint(F.col("t"), k=2).alias("v")).collect()]
        assert fps[0] == fps[1]


class TestHashEmbed:
    def test_counts_and_zero_vector_for_empty(self, spark):
        from pyspark.sql import Row

        from mini_data_platform_spark.operators.embed import hash_embed

        df = spark.createDataFrame(
            [Row(doc_id=1, text="a b a"), Row(doc_id=2, text="   ")]
        )
        out = {r["doc_id"]: r.asDict() for r in hash_embed(df, "doc_id", "text").collect()}
        import hashlib

        bkt = lambda t: hashlib.md5(t.encode()).hexdigest()[0]
        v1 = out[1]
        assert v1[f"h_{bkt('a')}"] == 2 and v1[f"h_{bkt('b')}"] == 1
        assert sum(v for k, v in v1.items() if k.startswith("h_")) == 3
        # whitespace-only doc embeds as the zero vector, not a missing row
        assert sum(v for k, v in out[2].items() if k.startswith("h_")) == 0

    def test_dim_validation(self, spark):
        import pytest
        from pyspark.sql import Row

        from mini_data_platform_spark.operators.embed import hash_embed

        df = spark.createDataFrame([Row(doc_id=1, text="x")])
        with pytest.raises(ValueError, match="16 or 256"):
            hash_embed(df, "doc_id", "text", dim=32)
