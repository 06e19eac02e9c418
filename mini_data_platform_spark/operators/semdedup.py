"""Semantic deduplication over embedding columns (SemDeDup).

The technique of Abbas et al. 2023 ("SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", arXiv:2303.09540): k-means
cluster the embedding space, then compare pairs ONLY within each cluster
and drop all but one member of every high-cosine group. Near-dup LSH
(operators/dedup_fuzzy.py) catches lexical copies; SemDeDup catches
*paraphrases* — semantically redundant documents whose token overlap is
too low for MinHash — which is why modern pretraining pipelines run both.

Composition, not new machinery: clustering is the IVF coarse quantizer
(`similarity.kmeans_centroids` — deterministic first-k seed +
integer-quantized means, so cell assignments are reproducible across
runs AND engines), assignment is `similarity.ivf_assign` (a zero-shuffle
codegen projection: centroids ride the plan as literals), and the
within-cell comparison is one self-join shuffled on `cell`.

Survivor rule: a vector is a semantic duplicate iff some SAME-CELL
vector with a smaller id has cosine >= threshold to it (min-id survivor,
the library's dedup doctrine — deterministic, engine-independent). This
is dominance semantics, exactly SQL's "EXISTS smaller similar same-cell
neighbor": of a similar pair the larger id is always dropped, so every
similarity group keeps at least its minimum. The paper keeps the
member farthest from the centroid; min-id is the deterministic variant
that lets a SQL oracle replay the decision bit-for-bit.

Scale (100 TB): the whole point of SemDeDup is that the O(n²) cosine
comparison is confined within cells — k balanced cells cut the pair
space by ~k, and each cell's join is an independent shuffle task. The
knobs when a cell is huge (the known failure mode): raise k (the paper
uses 50k clusters at web scale), or pre-cap cells like dedup_fuzzy's
``max_bucket``. Nothing here is all-pairs across cells, the kmeans
driver traffic is k centroid rows (model parameters, not data), and the
scoring arithmetic is all-JVM codegen (functions/vectors.py).

Approximation contract (same as every LSH/IVF path in this library): a
similar pair that k-means splits across two cells is NOT seen — recall
is bounded by clustering quality, which is the paper's trade. The exact
twin is ``similarity.near_dup_embeddings(exact=True)``.

Reference parity: the reference platform (/root/reference) has no
similarity operators at all; this extends the mandated X1/X2 dedup
family (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mini_data_platform_spark.functions.vectors import cosine
from mini_data_platform_spark.operators.similarity import (
    ivf_assign,
    ivf_assign_frame,
    kmeans_centroids,
)


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    k: int = 8,
    n_iter: int = 1,
    centroids: list[tuple[int, list[float]]] | DataFrame | None = None,
) -> DataFrame:
    """SemDeDup over ``df``: cluster into ``k`` cells (or assign to the
    caller's ``centroids`` — pass the same ones to make two runs share a
    clustering), mark within-cell semantic duplicates at ``threshold``.

    ``centroids`` as a list rides the plan as literals (zero-shuffle
    assignment — right for small k); as a ``(cent_id, cvec)`` DataFrame
    it broadcast-joins (O(1) plan size — REQUIRED for SemDeDup-scale k,
    where thousands of cells as literals blow up codegen; see
    ``similarity.ivf_assign_frame``). Both orders are bit-identical.

    Returns one row per input row: ``(id_col, cell, dup_of, kept)``
    where ``dup_of`` is the SMALLEST same-cell id with cosine >=
    threshold (null for survivors) and ``kept`` is 1/0. Downstream
    curation keeps ``kept = 1`` — exactly the D2 survivor contract,
    lifted to semantic space.
    """
    from mini_data_platform_spark.operators.resources import attach_plan

    if centroids is None:
        centroids = kmeans_centroids(df, id_col, vec_col, k=k, n_iter=n_iter)
    if isinstance(centroids, DataFrame):
        assigned = ivf_assign_frame(df, centroids, id_col, vec_col)
    else:
        assigned = ivf_assign(df, centroids, id_col, vec_col)
    # the assignment feeds both self-join sides AND the final projection;
    # unpersisted, Spark would recompute the n×k scoring pass three times
    # (measured 3× at 105k×256 — no ReusedExchange across the differently
    # aliased branches). Standard operator contract: persist + attach,
    # action-runner releases.
    assigned = assigned.persist()
    a = assigned.select(
        F.col(id_col).alias("_id_a"),
        F.col(vec_col).alias("_va"),
        F.col("nrm").alias("_na"),
        "cell",
    )
    b = assigned.select(
        F.col(id_col).alias("_id_b"),
        F.col(vec_col).alias("_vb"),
        F.col("nrm").alias("_nb"),
        "cell",
    )
    dup_of = (
        a.join(b, "cell")
        .filter(F.col("_id_b") < F.col("_id_a"))
        .filter(
            cosine(F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb"))
            >= F.lit(float(threshold))
        )
        .groupBy(F.col("_id_a").alias(id_col))
        .agg(F.min("_id_b").alias("dup_of"))
    )
    out = (
        assigned.select(id_col, "cell")
        .join(dup_of, id_col, "left")
        .select(
            id_col,
            "cell",
            "dup_of",
            F.col("dup_of").isNull().cast("int").alias("kept"),
        )
    )
    return attach_plan(out, assigned)
