"""Sequence packing: the distributed two-phase prefix sum must equal the
single-window formulation for any partitioning, and the chunk geometry
must handle exact fills, oversize documents, and zero-token documents."""

from pyspark.sql import Window, functions as F

from mini_data_platform_spark.operators.packing import pack_documents


def _reference(rows, chunk):
    out, start = {}, 0
    for i, n in sorted(rows):
        end = start + max(n, 1) - 1
        out[i] = (
            n,
            start,
            start // chunk,
            end // chunk,
            end // chunk - start // chunk,
        )
        start += n
    return out


class TestPackDocuments:
    def _check(self, spark, rows, chunk, num_partitions=None):
        df = spark.createDataFrame(rows, "doc_id long, n long")
        got = {
            r["doc_id"]: (
                r["n_tokens"],
                r["start_offset"],
                r["first_chunk"],
                r["last_chunk"],
                r["n_boundary_cuts"],
            )
            for r in pack_documents(
                df, "doc_id", "n", chunk, num_partitions=num_partitions
            ).collect()
        }
        assert got == _reference(rows, chunk)

    def test_matches_sequential_reference(self, spark):
        import random

        rng = random.Random(5)
        rows = [(i, rng.randrange(0, 900)) for i in range(300)]
        self._check(spark, rows, chunk=512)

    def test_partition_invariant(self, spark):
        rows = [(i, (i * 37) % 200 + 1) for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, n long")
        a = sorted(
            map(tuple, pack_documents(df, "doc_id", "n", 128, 1).collect())
        )
        b = sorted(
            map(tuple, pack_documents(df, "doc_id", "n", 128, 8).collect())
        )
        assert a == b

    def test_chunk_geometry_edges(self, spark):
        # doc0 fills chunk 0 exactly; doc1 spans chunks 1-3 (2 cuts);
        # doc2 is empty (pinned to its start chunk, no cuts); doc3 starts
        # exactly on a boundary
        rows = [(0, 100), (1, 250), (2, 0), (3, 50)]
        df = spark.createDataFrame(rows, "doc_id long, n long")
        got = {
            r["doc_id"]: (
                r["start_offset"], r["first_chunk"], r["last_chunk"],
                r["n_boundary_cuts"],
            )
            for r in pack_documents(df, "doc_id", "n", 100).collect()
        }
        assert got[0] == (0, 0, 0, 0)
        assert got[1] == (100, 1, 3, 2)
        assert got[2] == (350, 3, 3, 0)
        assert got[3] == (350, 3, 3, 0)

    def test_matches_window_formulation(self, spark):
        rows = [(i, (i * 13) % 97) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, n long")
        w = Window.orderBy("doc_id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        want = sorted(
            (r["doc_id"], r["s"])
            for r in df.select(
                "doc_id", (F.sum("n").over(w) - F.col("n")).alias("s")
            ).collect()
        )
        got = sorted(
            (r["doc_id"], r["start_offset"])
            for r in pack_documents(df, "doc_id", "n", 64).collect()
        )
        assert got == want

    def test_rejects_bad_chunk(self, spark):
        import pytest

        df = spark.createDataFrame([(1, 2)], "doc_id long, n long")
        with pytest.raises(ValueError):
            pack_documents(df, "doc_id", "n", 0)
