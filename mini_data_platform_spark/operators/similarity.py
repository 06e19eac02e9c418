"""Embedding similarity search (SURVEY.md §2.8 X2): brute-force cosine
top-k as the exact baseline, random-hyperplane LSH bucketing as the
approximate scale path.

Scale design:
- Brute-force kNN broadcasts the (small) query side against the corpus —
  cost |corpus|·|queries|·dim, embarrassingly parallel, no shuffle except
  the final per-query top-k (which TakeOrdered-style reduces per
  partition first via the row_number window on a query-partitioned
  window). Right for |queries|·|corpus| up to ~1e10 ops; beyond that,
  use the LSH path.
- Hyperplane LSH: signature = sign bits of dots against P fixed planes →
  2^P buckets; candidate pairs/neighbors only join within a bucket.
  Planes here are taken from the corpus itself (first ``n_planes`` vectors
  by id) so the transform is fully deterministic and oracle-checkable;
  production would draw seeded Gaussian planes the same way.
- All arithmetic is codegen'd array expressions (functions/vectors.py).
  For very high dims swap the dot for a Pandas-UDF numpy matmul over
  Arrow batches — the operator contract stays the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from mini_data_platform_spark.functions.vectors import cosine, dot, l2_norm


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector. Deterministic:
    ties break on neighbor id. Returns (query_id, neighbor_id, cos_sim, rank)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
    )
    pairs = F.broadcast(q).crossJoin(c)
    if not include_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine(
            F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_bucket(
    df: DataFrame,
    planes: list[list[float]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Attach the hyperplane-LSH bucket signature ('0'/'1' per plane,
    concatenated) to every vector. ``planes`` is a driver-side list of
    plane vectors (small: P×dim floats, shipped in the plan as literals)."""
    bits = []
    for p in planes:
        plane_col = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(dot(F.col(vec_col), plane_col) >= 0, F.lit("1")).otherwise(F.lit("0"))
        )
    return df.select(
        F.col(id_col), F.col(vec_col), F.concat(*bits).alias("bucket")
    )


def planes_from_corpus(corpus: DataFrame, id_col: str, vec_col: str, n_planes: int = 8) -> list[list[float]]:
    """Deterministic plane selection: the first ``n_planes`` vectors by id.
    (A tiny, bounded collect — planes are hyperparameters, not data.)"""
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(n_planes)
        .collect()
    )
    return [list(r[1]) for r in rows]


def ann_neighbors_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate kNN: only corpus vectors in the query's LSH bucket are
    scored. Recall < 1 by design; cost drops from |Q|·|C| to
    sum over buckets of |Q_b|·|C_b|."""
    planes = planes_from_corpus(corpus, id_col, vec_col, n_planes)
    qb = lsh_bucket(queries, planes, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
        "bucket",
    )
    cb = lsh_bucket(corpus, planes, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
        "bucket",
    )
    scored = (
        qb.join(cb, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def near_dup_embeddings(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.4,
    n_planes: int = 4,
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b). ``exact=True`` scores
    all pairs (baseline / oracle); default uses LSH buckets so only
    same-bucket pairs are scored (the 100 TB path — with few planes for
    high recall at modest bucket counts)."""
    base = df.select(
        F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("nrm")
    )
    if exact:
        a = base.toDF("id_a", "vec_a", "norm_a")
        b = base.toDF("id_b", "vec_b", "norm_b")
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        planes = planes_from_corpus(df, id_col, vec_col, n_planes)
        bucketed = lsh_bucket(df, planes, id_col, vec_col).join(
            base.select(id_col, "nrm"), id_col
        )
        a = bucketed.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"),
            F.col("nrm").alias("norm_a"), "bucket",
        )
        b = bucketed.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"),
            F.col("nrm").alias("norm_b"), "bucket",
        )
        pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        cosine(F.col("vec_a"), F.col("vec_b"), F.col("norm_a"), F.col("norm_b")).alias("cos_sim"),
    ).filter(F.col("cos_sim") >= threshold)
