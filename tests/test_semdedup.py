"""SemDeDup (operators/semdedup.py): semantics, determinism, and the
cell-confinement approximation contract."""

import math

import pytest

from mini_data_platform_spark.operators.semdedup import semantic_dedup

# Two well-separated directions in R^4 so one k-means step puts them in
# different cells; within each direction, near-parallel vectors (cos ~1)
# plus one orthogonal-ish outlier.
_VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),   # cell A survivor (min id of its group)
    (1, [0.999, 0.01, 0.0, 0.0]),  # ~dup of 0
    (2, [0.0, 0.0, 1.0, 0.0]),   # cell B survivor
    (3, [0.0, 0.01, 0.999, 0.0]),  # ~dup of 2
    (4, [0.98, 0.05, 0.0, 0.1]),   # ~dup of 0 (and of 1)
    (5, [0.0, 1.0, 0.0, 0.0]),   # dissimilar to everything at 0.9
]

# explicit centroids: cell 0 = x-axis, cell 1 = z-axis
_CENTS = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0, 0.0])]


def _df(spark, vecs=_VECS):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<double>",
    )


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb)


class TestSemanticDedup:
    def test_min_id_survivor_within_cells(self, spark):
        out = semantic_dedup(
            _df(spark), "vec_id", "embedding", threshold=0.9,
            centroids=_CENTS,
        )
        rows = {r["vec_id"]: r for r in out.collect()}
        assert len(rows) == 6  # one row per input, no loss
        # survivors: group minima and the dissimilar vector
        assert rows[0]["kept"] == 1 and rows[0]["dup_of"] is None
        assert rows[2]["kept"] == 1 and rows[2]["dup_of"] is None
        assert rows[5]["kept"] == 1 and rows[5]["dup_of"] is None
        # dups point at the SMALLEST similar same-cell id
        assert rows[1]["kept"] == 0 and rows[1]["dup_of"] == 0
        assert rows[3]["kept"] == 0 and rows[3]["dup_of"] == 2
        assert rows[4]["kept"] == 0 and rows[4]["dup_of"] == 0

    def test_matches_python_reference(self, spark):
        """Dominance semantics replayed in pure Python over the same
        explicit centroids."""
        thr = 0.9
        cells = {}
        for i, v in _VECS:
            cells[i] = max(
                _CENTS, key=lambda c: (_cos(v, c[1]), -c[0])
            )[0]
        expect = {}
        for i, v in _VECS:
            sims = [
                j for j, w in _VECS
                if j < i and cells[j] == cells[i] and _cos(v, w) >= thr
            ]
            expect[i] = min(sims) if sims else None
        out = semantic_dedup(
            _df(spark), "vec_id", "embedding", threshold=thr,
            centroids=_CENTS,
        )
        got = {r["vec_id"]: r["dup_of"] for r in out.collect()}
        assert got == expect

    def test_cross_cell_pairs_invisible(self, spark):
        """The approximation contract: a similar pair split across cells
        is NOT flagged — recall is bounded by clustering quality (the
        SemDeDup trade), never by silent extra comparisons. Vector 1
        leans toward the z-centroid (cos 0.8 > 0.6), so the pair
        (0, 1) — cosine 0.6, over the 0.5 threshold — straddles cells."""
        vecs = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.6, 0.0, 0.8, 0.0]),
        ]
        out = semantic_dedup(
            spark.createDataFrame(
                vecs, "vec_id long, embedding array<double>"
            ),
            "vec_id", "embedding", threshold=0.5, centroids=_CENTS,
        )
        rows = {r["vec_id"]: r for r in out.collect()}
        assert rows[0]["cell"] == 0 and rows[1]["cell"] == 1
        assert rows[1]["kept"] == 1 and rows[1]["dup_of"] is None

    def test_trained_centroids_deterministic(self, spark):
        """Without explicit centroids the operator trains its own; two
        runs must agree row-for-row (kmeans_centroids' integer-quantized
        means + first-k seed)."""
        df = _df(spark)
        a = sorted(
            semantic_dedup(df, "vec_id", "embedding", 0.9, k=2).collect()
        )
        b = sorted(
            semantic_dedup(df, "vec_id", "embedding", 0.9, k=2).collect()
        )
        assert a == b

    def test_threshold_monotone(self, spark):
        """Raising the threshold never drops MORE vectors."""
        df = _df(spark)
        kept = {}
        for thr in (0.5, 0.9, 0.999):
            out = semantic_dedup(
                df, "vec_id", "embedding", thr, centroids=_CENTS
            )
            kept[thr] = {
                r["vec_id"] for r in out.collect() if r["kept"] == 1
            }
        assert kept[0.5] <= kept[0.9] <= kept[0.999]


class TestSemanticDedupPlan:
    def test_no_python_boundary(self, spark):
        """The whole pipeline (assignment projection + cell join) stays
        JVM-side: no BatchEvalPython / ArrowEvalPython in the plan."""
        out = semantic_dedup(
            _df(spark), "vec_id", "embedding", 0.9, centroids=_CENTS
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
        assert "CartesianProduct" not in plan


class TestFrameAssignment:
    def test_frame_path_identical_to_literal_path(self, spark):
        """ivf_assign_frame (broadcast-join argmax, the large-k path)
        must produce bit-identical assignments and dedup decisions to
        the literal-centroid projection."""
        import random

        from mini_data_platform_spark.operators.similarity import (
            centroids_to_frame,
            ivf_assign,
            ivf_assign_frame,
        )
        from pyspark.sql import functions as F

        random.seed(11)
        d = 16
        df = spark.range(0, 400).select(
            F.col("id").alias("vec_id"),
            F.array(*[F.rand(seed=i) - 0.5 for i in range(d)]).alias(
                "embedding"
            ),
        )
        cents = [
            (i, [random.random() - 0.5 for _ in range(d)]) for i in range(24)
        ]
        lit = {
            r["vec_id"]: r["cell"]
            for r in ivf_assign(df, cents, "vec_id", "embedding").collect()
        }
        frame = {
            r["vec_id"]: r["cell"]
            for r in ivf_assign_frame(
                df, centroids_to_frame(spark, cents), "vec_id", "embedding"
            ).collect()
        }
        assert lit == frame
        # and end-to-end through semantic_dedup
        a = sorted(
            semantic_dedup(
                df, "vec_id", "embedding", 0.8, centroids=cents
            ).collect()
        )
        b = sorted(
            semantic_dedup(
                df, "vec_id", "embedding", 0.8,
                centroids=centroids_to_frame(spark, cents),
            ).collect()
        )
        assert a == b

    def test_frame_path_no_python_and_broadcast(self, spark):
        from mini_data_platform_spark.operators.similarity import (
            centroids_to_frame,
            ivf_assign_frame,
        )
        from pyspark.sql import functions as F

        df = spark.range(0, 50).select(
            F.col("id").alias("vec_id"),
            F.array(F.rand(seed=1), F.rand(seed=2)).alias("embedding"),
        )
        cents = centroids_to_frame(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
        plan = (
            ivf_assign_frame(df, cents, "vec_id", "embedding")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "EvalPython" not in plan
        assert "Broadcast" in plan


class TestDuplicateIds:
    def test_frame_path_row_faithful_under_duplicate_ids(self, spark):
        """Duplicate ids must yield one output row each on BOTH
        assignment paths (the frame path groups on a per-row surrogate,
        never on the id)."""
        from mini_data_platform_spark.operators.similarity import (
            centroids_to_frame,
            ivf_assign,
            ivf_assign_frame,
        )

        rows = [
            (7, [1.0, 0.0]),
            (7, [0.0, 1.0]),   # same id, different vector/cell
            (8, [1.0, 0.1]),
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
        lit = sorted(
            (r["vec_id"], r["cell"])
            for r in ivf_assign(df, cents, "vec_id", "embedding").collect()
        )
        frame = sorted(
            (r["vec_id"], r["cell"])
            for r in ivf_assign_frame(
                df, centroids_to_frame(spark, cents), "vec_id", "embedding"
            ).collect()
        )
        assert lit == frame == [(7, 0), (7, 1), (8, 0)]
