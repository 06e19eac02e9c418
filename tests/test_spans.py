"""Window-level duplication: planted shared spans detected, internal
repetition counted, short/empty docs report zero, stride geometry."""

from pyspark.sql import functions as F

from mini_data_platform_spark.operators.spans import (
    _windows,
    doc_window_overlap,
)

SPAN = " ".join(f"s{i}" for i in range(16))


def _docs(spark):
    uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))
    rows = [
        # docs 1 and 2: mostly different, share one 16-token span at
        # stride-ALIGNED offsets (16 and 24 with stride 8) — the fixed-
        # stride form only sees stride-aligned sharing; the unaligned
        # case is TestSegmentOverlap's job (content-defined anchors)
        (1, uniq("a", 16) + " " + SPAN + " " + uniq("b", 24)),
        (2, uniq("c", 24) + " " + SPAN + " " + uniq("d", 16)),
        # doc 3: fully unique
        (3, uniq("e", 56)),
        # doc 4: internal repetition (same span twice)
        (4, SPAN + " " + SPAN),
        # doc 5: shorter than one window
        (5, "tiny doc"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestWindowOverlap:
    def test_shared_span_detected_across_docs(self, spark):
        out = {
            r["doc_id"]: r
            for r in doc_window_overlap(
                _docs(spark), "doc_id", "text", window=16, stride=8
            ).collect()
        }
        assert out[1]["n_dup_windows"] >= 1
        assert out[2]["n_dup_windows"] >= 1
        assert out[3]["n_dup_windows"] == 0
        assert out[3]["dup_frac"] == 0.0
        # internal repetition counts too (stride 8 aligns the two copies
        # of the 16-token span at starts 0 and 16)
        assert out[4]["n_dup_windows"] >= 2
        # short/empty docs: zero windows, zero frac, but present
        assert out[5]["n_windows"] == 0 and out[5]["dup_frac"] == 0.0
        assert out[6]["n_windows"] == 0

    def test_window_geometry(self, spark):
        docs = spark.createDataFrame(
            [(1, " ".join(f"w{i}" for i in range(40)))],
            "doc_id long, text string",
        )
        n = _windows(docs, "doc_id", "text", 16, 8).count()
        # starts 0,8,16,24 (24+16=40 fits); 32 would need 48 tokens
        assert n == 4
        # stride == window -> non-overlapping tiling
        n2 = _windows(docs, "doc_id", "text", 16, 16).count()
        assert n2 == 2

    def test_no_python_in_plan(self, spark):
        plan = (
            doc_window_overlap(_docs(spark), "doc_id", "text")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "EvalPython" not in plan


class TestSegmentOverlap:
    def test_unaligned_shared_span_detected(self, spark):
        """The case fixed-stride windows cannot see: the same long span
        at DIFFERENT, non-stride-aligned offsets. Content-defined
        anchors cut identical segments out of it regardless of
        position."""
        from mini_data_platform_spark.operators.spans import (
            doc_segment_overlap,
        )

        span = " ".join(f"s{i}" for i in range(40))
        uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))
        docs = spark.createDataFrame(
            [
                (1, uniq("a", 7) + " " + span + " " + uniq("b", 20)),
                (2, uniq("c", 23) + " " + span + " " + uniq("d", 5)),
                (3, uniq("e", 60)),
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in doc_segment_overlap(
                docs, "doc_id", "text", avg_tokens=8, min_tokens=4
            ).collect()
        }
        assert out[1]["n_dup_segments"] >= 1
        assert out[2]["n_dup_segments"] >= 1
        assert out[3]["n_dup_segments"] == 0

    def test_internal_repetition_not_counted_cross_doc(self, spark):
        """doc_segment_overlap counts CROSS-document sharing only
        (countDistinct doc): a doc repeating its own span is clean."""
        from mini_data_platform_spark.operators.spans import (
            doc_segment_overlap,
        )

        span = " ".join(f"r{i}" for i in range(30))
        docs = spark.createDataFrame(
            [(1, span + " " + span)], "doc_id long, text string"
        )
        out = doc_segment_overlap(docs, "doc_id", "text").collect()[0]
        assert out["n_dup_segments"] == 0

    def test_segments_partition_the_doc(self, spark):
        from mini_data_platform_spark.operators.spans import (
            content_defined_segments,
        )

        docs = spark.createDataFrame(
            [(1, " ".join(f"w{i}" for i in range(100)))],
            "doc_id long, text string",
        )
        segs = content_defined_segments(docs, "doc_id", "text").collect()
        assert sum(r["n_seg_tokens"] for r in segs) == 100
        assert len({r["seg_id"] for r in segs}) == len(segs)
