"""Document chunking: window geometry, overlap sharing, full coverage,
short/empty docs, and plan purity (no shuffle)."""

import pytest

from pyspark.sql import functions as F

from mini_data_platform_spark.operators.chunking import chunk_documents


def _docs(spark):
    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),   # 10 tokens
        (2, " ".join(f"u{i}" for i in range(4))),    # 4 tokens (one chunk)
        (3, "solo"),                                  # 1 token
        (4, ""),                                      # empty -> no rows
        (5, None),                                    # null -> no rows
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestChunking:
    def test_geometry_no_overlap(self, spark):
        out = chunk_documents(_docs(spark), "doc_id", "text", 4).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert set(by_doc) == {1, 2, 3}
        d1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
        assert [r["n_chunk_tokens"] for r in d1] == [4, 4, 2]
        assert d1[0]["chunk_text"] == "t0 t1 t2 t3"
        assert d1[2]["chunk_text"] == "t8 t9"
        assert by_doc[2][0]["chunk_text"] == "u0 u1 u2 u3"
        assert by_doc[3][0]["chunk_text"] == "solo"

    def test_overlap_shares_tokens(self, spark):
        out = sorted(
            chunk_documents(_docs(spark), "doc_id", "text", 4, overlap=2)
            .where(F.col("doc_id") == 1)
            .collect(),
            key=lambda r: r["chunk_id"],
        )
        # stride 2 over 10 tokens: ceil((10-2)/2) = 4 chunks (starts
        # 0,2,4,6 — the minimal cover; a start at 8 would duplicate the
        # chunk-at-6 tail)
        assert len(out) == 4
        for a, b in zip(out, out[1:]):
            at = a["chunk_text"].split()
            bt = b["chunk_text"].split()
            assert at[2:] == bt[: len(at) - 2]  # shared overlap region

    def test_every_token_covered_exactly(self, spark):
        docs = spark.range(1, 40).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), (F.col("id") % 37).cast("int")),
                    lambda i: F.concat(F.lit("w"), i),
                ),
            ).alias("text"),
        )
        chunks = chunk_documents(docs, "doc_id", "text", 8, overlap=3)
        # reconstruct: union of all chunk tokens == original token set,
        # and stride-aligned first tokens
        joined = (
            chunks.groupBy("doc_id")
            .agg(
                F.sum("n_chunk_tokens").alias("sum_n"),
                F.count("*").alias("n_chunks"),
            )
            .join(
                docs.select(
                    "doc_id",
                    F.size(F.split(F.trim("text"), " +")).alias("n_toks"),
                ),
                "doc_id",
            )
            .collect()
        )
        for r in joined:
            n, k = r["n_toks"], r["n_chunks"]
            import math

            assert k == max(1, math.ceil((n - 3) / 5))
            # total tokens = n + overlap re-counted per extra chunk,
            # minus the tail chunk's truncation
            starts = [i * 5 for i in range(k)]
            expect = sum(min(8, n - s) for s in starts)
            assert r["sum_n"] == expect

    def test_bad_params_rejected(self, spark):
        with pytest.raises(ValueError):
            chunk_documents(_docs(spark), "doc_id", "text", 0)
        with pytest.raises(ValueError):
            chunk_documents(_docs(spark), "doc_id", "text", 4, overlap=4)

    def test_no_shuffle_in_plan(self, spark):
        plan = (
            chunk_documents(_docs(spark), "doc_id", "text", 4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "EvalPython" not in plan


class TestChunkingProperty:
    def test_reconstruction_property_random_docs(self, spark):
        """Property over random docs/params: the minimal-cover geometry
        holds — chunk 0 starts at token 0, consecutive chunks advance by
        stride, the last chunk reaches the final token, and stitching
        chunk texts (dropping each chunk's overlap prefix) reproduces
        the document exactly."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        word = st.sampled_from([f"w{i}" for i in range(30)])

        @given(
            toks=st.lists(word, min_size=1, max_size=40),
            chunk=st.integers(min_value=2, max_value=12),
            overlap=st.integers(min_value=0, max_value=11),
        )
        @settings(
            max_examples=10,
            deadline=None,
            suppress_health_check=[
                HealthCheck.function_scoped_fixture,
                HealthCheck.too_slow,
            ],
        )
        def prop(toks, chunk, overlap):
            if overlap >= chunk:
                overlap = chunk - 1
            stride = chunk - overlap
            docs = spark.createDataFrame(
                [(1, " ".join(toks))], "doc_id long, text string"
            )
            rows = sorted(
                chunk_documents(docs, "doc_id", "text", chunk, overlap)
                .collect(),
                key=lambda r: r["chunk_id"],
            )
            n = len(toks)
            import math

            assert len(rows) == max(1, math.ceil((n - overlap) / stride))
            stitched = rows[0]["chunk_text"].split()
            for r in rows[1:]:
                ct = r["chunk_text"].split()
                start = r["chunk_id"] * stride
                # overlap region agrees with what's already stitched
                assert stitched[start:] == ct[: len(stitched) - start]
                stitched = stitched[:start] + ct
            assert stitched == toks

        prop()


class TestChunkKnn:
    """The composed RAG retrieval query (plans/llm.doc_chunk_knn)."""

    def test_topk_shape_and_plan(self, spark):
        from mini_data_platform_spark.plans.llm import doc_chunk_knn

        out = doc_chunk_knn(spark, "/root/testdata/sf0.001")
        plan = out._jdf.queryExecution().executedPlan().toString()
        # global top-k must compile to TakeOrderedAndProject, never a
        # full sort; the whole composition stays JVM-side
        assert "TakeOrderedAndProject" in plan
        assert "EvalPython" not in plan
        rows = out.collect()
        assert len(rows) == 10
        assert [r["knn_rank"] for r in rows] == list(range(1, 11))
        # ranked by similarity, query doc excluded
        sims = [r["cos_sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(r["doc_id"] != 0 for r in rows)
