"""SQ8 scalar quantization: encode/decode bounds, quantization error,
recall vs exact kNN, and the shortlist-rerank path's exactness."""

import math
import random

import pytest
from pyspark.sql import functions as F

from mini_data_platform_spark.operators.sq import (
    sq8_decode_expr,
    sq8_encode,
    sq8_encode_expr,
    sq8_knn,
    sq8_train,
)


def _vecs(spark, n=120, dim=6, seed=11):
    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-2.0, 3.0) for _ in range(dim)]) for i in range(n)
    ]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        {i: v for i, v in rows},
    )


def _exact_topk(vecs, qid, k):
    q = vecs[qid]
    nq = math.sqrt(sum(x * x for x in q))

    def cos(v):
        return sum(a * b for a, b in zip(q, v)) / (
            nq * math.sqrt(sum(x * x for x in v))
        )

    scored = sorted(
        ((cos(v), -i) for i, v in vecs.items() if i != qid), reverse=True
    )
    return [-s[1] for s in scored[:k]]


class TestEncodeDecode:
    def test_codes_in_range_and_error_bound(self, spark):
        df, raw = _vecs(spark)
        mins, scales = sq8_train(df, "embedding")
        enc = sq8_encode(df, "vec_id", "embedding", mins, scales)
        dec = enc.select(
            "id", sq8_decode_expr(F.col("codes"), mins, scales).alias("dv")
        )
        codes = {r["id"]: r["codes"] for r in enc.collect()}
        decs = {r["id"]: r["dv"] for r in dec.collect()}
        for i, v in raw.items():
            assert all(0 <= c <= 255 for c in codes[i])
            for d, (x, s) in zip(decs[i], zip(v, scales)):
                # bin-center decode: error is at most half a bin
                assert abs(d - x) <= s / 2 + 1e-12

    def test_degenerate_dimension(self, spark):
        df = spark.createDataFrame(
            [(0, [1.0, 7.5]), (1, [2.0, 7.5])],
            "vec_id long, embedding array<double>",
        )
        mins, scales = sq8_train(df, "embedding")
        assert scales[1] == 1.0  # max == min -> sentinel scale
        codes = {
            r["id"]: r["codes"]
            for r in sq8_encode(df, "vec_id", "embedding", mins, scales).collect()
        }
        assert codes[0][1] == 0 and codes[1][1] == 0
        # max value of a live dimension clamps to 255
        assert codes[1][0] == 255

    def test_out_of_range_vector_clamps(self, spark):
        df, _ = _vecs(spark)
        mins, scales = sq8_train(df, "embedding")
        wild = spark.createDataFrame(
            [(99, [1e6] * 6), (98, [-1e6] * 6)],
            "vec_id long, embedding array<double>",
        )
        codes = {
            r["id"]: r["codes"]
            for r in sq8_encode(
                wild, "vec_id", "embedding", mins, scales
            ).collect()
        }
        assert codes[99] == [255] * 6
        assert codes[98] == [0] * 6


class TestKnn:
    def test_recall_vs_exact(self, spark):
        df, raw = _vecs(spark)
        mins, scales = sq8_train(df, "embedding")
        codes = sq8_encode(df, "vec_id", "embedding", mins, scales)
        queries = df.where(F.col("vec_id") < 5)
        out = sq8_knn(
            queries, codes, df, "vec_id", "embedding", mins, scales, k=5
        ).collect()
        got = {}
        for r in out:
            got.setdefault(r["query_id"], []).append(r["neighbor_id"])
        hits = total = 0
        for qid in range(5):
            want = set(_exact_topk(raw, qid, 5))
            hits += len(want & set(got[qid]))
            total += 5
        assert hits / total >= 0.8  # 256-level grid keeps recall high

    def test_rerank_full_shortlist_equals_exact(self, spark):
        df, raw = _vecs(spark, n=60)
        mins, scales = sq8_train(df, "embedding")
        codes = sq8_encode(df, "vec_id", "embedding", mins, scales)
        queries = df.where(F.col("vec_id") < 3)
        out = sq8_knn(
            queries, codes, df, "vec_id", "embedding", mins, scales,
            k=5, shortlist=59,
        ).collect()
        got = {}
        for r in out:
            got.setdefault(r["query_id"], []).append(
                (r["knn_rank"], r["neighbor_id"], r["score"])
            )
        for qid in range(3):
            want = _exact_topk(raw, qid, 5)
            ranked = [n for _rk, n, _s in sorted(got[qid])]
            assert ranked == want
            for _rk, n, s in got[qid]:
                # rerank scores are EXACT cosine, not quantized
                q, v = raw[qid], raw[n]
                exact = sum(a * b for a, b in zip(q, v)) / (
                    math.sqrt(sum(x * x for x in q))
                    * math.sqrt(sum(x * x for x in v))
                )
                assert s == pytest.approx(exact, abs=1e-12)

    def test_rerank_shortlist_monotone(self, spark):
        """A bigger shortlist can only improve recall vs exact."""
        df, raw = _vecs(spark)
        mins, scales = sq8_train(df, "embedding")
        codes = sq8_encode(df, "vec_id", "embedding", mins, scales)
        queries = df.where(F.col("vec_id") < 5)

        def recall(m):
            out = sq8_knn(
                queries, codes, df, "vec_id", "embedding", mins, scales,
                k=5, shortlist=m,
            ).collect()
            got = {}
            for r in out:
                got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            return sum(
                len(set(_exact_topk(raw, q, 5)) & got[q]) for q in range(5)
            )

        assert recall(40) >= recall(10)
