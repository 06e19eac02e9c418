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


def allpairs_cosine_blocked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    block: int = 512,
) -> DataFrame:
    """Exact all-pairs cosine (id_a < id_b, cos >= threshold) via blocked
    numpy over ``mapInPandas``.

    The corpus is broadcast as a (n × dim) float64 matrix (all-pairs exact
    search requires one side resident anyway — beyond broadcastable sizes
    the LSH path is the answer); each partition's rows are scored against
    it in ``block``-column chunks, so peak memory is
    batch × block × dim × 8B per task. ~10× faster than the per-pair
    zip_with/aggregate expression at sf0.1 (30s → ~3s) because the inner
    loop is vectorized C instead of interpreted HOF lambdas.

    Bit-parity with the sequential-fold oracle (functions/vectors.py
    doctrine) is preserved deliberately: float32×float32 products are
    exact doubles, and the dim loop accumulates strictly sequentially
    (``acc += a[:,k]·b[:,k]``), so dot products — and therefore cosines —
    are bit-identical to ``F.aggregate`` / DuckDB ``list_sum`` folds.
    (``np.dot``/``einsum`` would be faster still but use pairwise/SIMD
    summation orders that break cross-engine bit equality.)"""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    rows = df.select(id_col, vec_col).collect()
    rows.sort(key=lambda r: r[0])
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    bc = spark.sparkContext.broadcast((ids, mat, _seq_norms(np, mat)))

    out_schema = "id_a long, id_b long, cos_sim double"

    def score(batches):
        b_ids, b_mat, b_norms = bc.value
        n, dim = b_mat.shape
        for pdf in batches:
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            a_mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if not len(a_ids):
                continue
            a_norms = _seq_norms(np, a_mat)
            for a_lo in range(0, len(a_ids), block):
                a_hi = min(a_lo + block, len(a_ids))
                am = a_mat[a_lo:a_hi]
                for lo in range(0, n, block):
                    hi = min(lo + block, n)
                    bm = b_mat[lo:hi]
                    # sequential-over-dim accumulation: bit-equal to a fold
                    acc = am[:, 0, None] * bm[None, :, 0]
                    for k in range(1, dim):
                        acc += am[:, k, None] * bm[None, :, k]
                    cos = acc / (a_norms[a_lo:a_hi, None] * b_norms[None, lo:hi])
                    ok = (a_ids[a_lo:a_hi, None] < b_ids[None, lo:hi]) & (
                        cos >= threshold
                    )
                    ai, bj = np.nonzero(ok)
                    if len(ai):
                        yield pd.DataFrame(
                            {
                                "id_a": a_ids[a_lo + ai],
                                "id_b": b_ids[lo + bj],
                                "cos_sim": cos[ai, bj],
                            }
                        )

    cpus = spark.sparkContext.defaultParallelism
    return (
        df.select(id_col, vec_col)
        .repartition(max(cpus, 1))
        .mapInPandas(score, out_schema)
    )


def _seq_norms(np, mat):
    """Row norms with strictly-sequential square sums (oracle bit-parity)."""
    acc = mat[:, 0] * mat[:, 0]
    for k in range(1, mat.shape[1]):
        acc = acc + mat[:, k] * mat[:, k]
    return np.sqrt(acc)


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest centroid
    by cosine (ties → lowest centroid id). Implemented as explode over the
    centroid list + a row_number window — the exact formulation the SQL
    oracle uses, so cell assignments match across engines bit-for-bit.
    Centroids ride the plan as literals (K × dim floats)."""
    structs = []
    for cid, cvec in centroids:
        c = F.array(*[F.lit(float(x)) for x in cvec])
        structs.append(
            F.struct(
                F.lit(cid).alias("cent_id"),
                cosine(F.col(vec_col), c).alias("cent_cos"),
            )
        )
    exploded = df.select(
        F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("nrm"),
        F.explode(F.array(*structs)).alias("c"),
    ).select(id_col, vec_col, "nrm", "c.cent_id", "c.cent_cos")
    w = Window.partitionBy(id_col).orderBy(
        F.col("cent_cos").desc(), F.col("cent_id").asc()
    )
    return (
        exploded.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, vec_col, "nrm", F.col("cent_id").alias("cell"))
    )


def ann_neighbors_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_cells: int = 8,
) -> DataFrame:
    """IVF approximate kNN: corpus partitioned into ``n_cells`` coarse
    cells (centroids = first ``n_cells`` vectors by id — deterministic;
    production would k-means them, the operator contract is unchanged);
    each query scores only its own cell. Complementary to the hyperplane-
    LSH path: IVF adapts to the data distribution, LSH needs no training.
    Recall is bounded by single-probe assignment; raise recall by probing
    more cells (n_probe) at proportional cost."""
    cents = planes_from_corpus(corpus, id_col, vec_col, n_cells)
    centroids = list(enumerate(cents))
    cb = ivf_assign(corpus, centroids, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("nrm").alias("c_norm"),
        "cell",
    )
    qb = ivf_assign(queries, centroids, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("nrm").alias("q_norm"),
        "cell",
    )
    scored = (
        qb.join(cb, "cell")
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
    if exact:
        return allpairs_cosine_blocked(df, id_col, vec_col, threshold)
    base = df.select(
        F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("nrm")
    )
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
