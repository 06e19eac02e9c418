"""BM25: hand-checked scores, idf ordering, term dedup, stats pass."""

import math

import pytest

from pyspark.sql import functions as F

from mini_data_platform_spark.operators.ranking import (
    bm25_scores,
    corpus_stats,
)


def _docs(spark):
    rows = [
        (1, "fox jumps over the lazy dog"),
        (2, "fox fox fox everywhere fox"),
        (3, "a completely unrelated sentence about spark"),
        (4, "the dog sleeps"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBm25:
    def test_stats_single_pass(self, spark):
        n, avgdl, dfs = corpus_stats(_docs(spark), "text", ["fox", "dog"])
        assert n == 4
        assert avgdl == (6 + 5 + 6 + 3) / 4
        assert dfs == {"fox": 2, "dog": 2}

    def test_hand_checked_score(self, spark):
        docs = _docs(spark)
        out = {
            r["doc_id"]: r["bm25"]
            for r in bm25_scores(docs, "doc_id", "text", ["fox"]).collect()
        }
        n, avgdl, dfs = 4, 5.0, {"fox": 2}
        idf = math.log((n - 2 + 0.5) / (2 + 0.5) + 1.0)
        k1, b = 1.2, 0.75

        def score(tf, dl):
            return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

        assert out[1] == pytest.approx(score(1, 6))
        assert out[2] == pytest.approx(score(4, 5))
        assert out[3] == 0.0
        # repetition saturates: 4x the tf is far from 4x the score
        assert out[2] < 4 * out[1]

    def test_multi_term_and_dedup(self, spark):
        docs = _docs(spark)
        a = {
            r["doc_id"]: r["bm25"]
            for r in bm25_scores(
                docs, "doc_id", "text", ["fox", "dog", "fox"]
            ).collect()
        }
        bt = {
            r["doc_id"]: r["bm25"]
            for r in bm25_scores(
                docs, "doc_id", "text", ["fox", "dog"]
            ).collect()
        }
        assert a == bt  # duplicate query terms fold away
        # doc 1 has both terms: strictly above either single-term doc 4
        assert a[1] > a[4] > 0

    def test_rare_term_outweighs_common(self, spark):
        docs = _docs(spark).unionByName(
            _docs(spark).sparkSession.createDataFrame(
                [(10 + i, "the dog barks") for i in range(6)],
                "doc_id long, text string",
            )
        )
        out = {
            r["doc_id"]: r["bm25"]
            for r in bm25_scores(
                docs, "doc_id", "text", ["fox", "dog"]
            ).collect()
        }
        # 'dog' is now common (8/10 docs), 'fox' rare (2/10): the
        # fox-only doc 2 outranks every dog-only doc
        assert out[2] > max(out[i] for i in range(10, 16))

    def test_empty_query_and_corpus_rejected(self, spark):
        with pytest.raises(ValueError):
            bm25_scores(_docs(spark), "doc_id", "text", [])
        empty = _docs(spark).where(F.col("doc_id") < 0)
        with pytest.raises(ValueError):
            bm25_scores(empty, "doc_id", "text", ["fox"])

    def test_scoring_is_pure_projection(self, spark):
        plan = (
            bm25_scores(_docs(spark), "doc_id", "text", ["fox"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "EvalPython" not in plan
