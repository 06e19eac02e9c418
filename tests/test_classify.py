"""Model-based quality filter (operators/classify.py): deterministic
training, bit-exact literal-fold inference, and the learnability sanity
check — the model trained to imitate a token-count rule must actually
imitate it (hashed bucket counts sum to the token count, so a linear
model can represent the rule exactly)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_data_platform_spark.functions import text as TX
from mini_data_platform_spark.operators.classify import (
    quality_model_scores,
    quality_training_sample,
    sql_lr_margin,
    train_lr,
)


def _docs(spark, n=300):
    # token counts spread 1..60: the label rule (>= 30 tokens) splits
    # the corpus roughly in half
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), (F.col("id") % 60) + 1),
                lambda i: F.concat(F.lit("w"), ((F.col("id") * 7) + i) % 50),
            ),
        ).alias("text"),
    )


class TestTraining:
    def test_deterministic(self):
        rows = [(1, 2, 0), (3, 0, 1), (2, 2, 1), (0, 1, 0)]
        assert train_lr(rows) == train_lr(rows)

    def test_empty_sample_refused(self):
        with pytest.raises(ValueError, match="empty"):
            train_lr([])

    def test_separable_sample_learned(self):
        # y = 1 iff feature0 > 5 — linearly separable
        rows = [(i, 1, int(i > 5)) for i in range(12)]
        w, b = train_lr(rows, n_iter=2000, lr=0.5)
        correct = sum(
            int((w[0] * f0 + w[1] * f1 + b > 0) == bool(y))
            for f0, f1, y in rows
        )
        assert correct >= 11


class TestInference:
    def test_margin_is_the_sql_fold(self, spark):
        """The Spark margin equals evaluating the SAME SQL string —
        the cross-engine parity contract in-miniature."""
        df = spark.createDataFrame(
            [(1, 3, 7), (2, 0, 2)], "id long, h_a long, h_b long"
        )
        w, b = [0.25, -1.5], 0.125
        sql = sql_lr_margin(w, b, ["h_a", "h_b"])
        got = {
            r["id"]: r["m"]
            for r in df.select("id", F.expr(sql).alias("m")).collect()
        }
        assert got == {1: ((0.125 + 0.25 * 3) + -1.5 * 7),
                       2: ((0.125 + 0.25 * 0) + -1.5 * 2)}

    def test_model_imitates_the_label_rule(self, spark):
        docs = _docs(spark)
        label = F.size(TX.tokens(F.col("text"))) >= 30
        sample = quality_training_sample(
            docs, "doc_id", "text", label, dim=16, sample_n=200
        )
        w, b = train_lr(sample, n_iter=1000, lr=0.05)
        scored = quality_model_scores(docs, "doc_id", "text", w, b, dim=16)
        joined = scored.join(
            docs.select("doc_id", label.alias("_y")), "doc_id"
        )
        acc = (
            joined.where(F.col("keep") == F.col("_y")).count()
            / joined.count()
        )
        assert acc >= 0.95, f"quality model accuracy {acc}"

    def test_empty_doc_scores_bias_only(self, spark):
        df = spark.createDataFrame([(1, "")], "doc_id long, text string")
        w = [1.0] * 16
        out = quality_model_scores(df, "doc_id", "text", w, 0.5).collect()
        assert out[0]["margin"] == 0.5
