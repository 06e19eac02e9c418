"""Model-based quality filtering — the fasttext-shaped linear filter
every modern pretraining-data pipeline runs (CCNet, RefinedWeb, FineWeb
all gate documents on a cheap learned classifier before any expensive
stage). No reference-repo counterpart; part of the §2.8 LLM-pipeline
extension surface.

Architecture, deliberately minimal and Spark-first:

- FEATURES are the repo's existing hashing-trick bag-of-words
  (operators/embed.hash_embed — md5 hex-prefix buckets, so any engine
  with md5 reproduces them byte-for-byte).
- TRAINING is driver-side numpy logistic regression over a BOUNDED
  deterministic sample (lowest-id docs) — the model is hyperparameter-
  sized state (dim+1 floats), exactly like the PQ codebooks or SQ8
  scales, and follows the same parity doctrine: train ONCE in Python,
  feed every engine the weights as literals.
- INFERENCE is a pure JVM column expression: score = a LEFT-NESTED fold
  ``((b + w0·h0) + w1·h1) + …`` over the count columns. Left-nesting is
  load-bearing — both Spark and DuckDB evaluate the parenthesization as
  written, so scores are bit-identical doubles across engines (the
  emb_knn fold doctrine). The classifier emits the LINEAR margin, not a
  sigmoid: monotone in probability (thresholding is identical), and
  libm-free — ``exp`` is the one function whose last ulp differs across
  engines, so it stays out of the data path.

Scale: inference is a projection over the hash_embed aggregate — one
shuffle (the per-doc count groupBy), scan-dominated at 100 TB; training
cost is fixed (sample_n × dim), independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mini_data_platform_spark.operators.embed import HEX, hash_embed


def _buckets(dim: int) -> list[str]:
    if dim == 16:
        return list(HEX)
    if dim == 256:
        return [a + b for a in HEX for b in HEX]
    raise ValueError("dim must be 16 or 256 (md5 hex-prefix buckets)")


def train_lr(
    rows: list[tuple],
    n_iter: int = 300,
    lr: float = 0.01,
) -> tuple[list[float], float]:
    """Deterministic full-batch logistic-regression training over
    ``rows`` of (feat_0, …, feat_{d-1}, label) tuples — plain gradient
    descent in float64, fixed iteration count, zero initialization, no
    randomness anywhere. Returns (weights, bias). The engine-agnostic
    core: callers may assemble the sample through Spark OR an oracle
    engine — identical integer features give identical weights."""
    import numpy as np

    if not rows:
        raise ValueError("train_lr: empty training sample")
    mat = np.asarray([r[:-1] for r in rows], dtype=np.float64)
    y = np.asarray([r[-1] for r in rows], dtype=np.float64)
    n, d = mat.shape
    w = np.zeros(d)
    b = 0.0
    for _ in range(n_iter):
        z = mat @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (mat.T @ g) / n
        b -= lr * float(g.sum()) / n
    return [float(x) for x in w], float(b)


def sql_lr_margin(weights: list[float], bias: float, cols: list[str]) -> str:
    """The left-nested fold ``((bias + w0·c0) + w1·c1) + …`` as ANSI SQL
    over column NAMES — one string both engines parse identically, with
    every weight spelled as a CAST('<repr>' AS DOUBLE) literal so the
    parsed double is the trained float64 exactly. Spark consumes it via
    ``F.expr`` (one py4j round trip — the one-call-literal doctrine),
    DuckDB verbatim; the shared parenthesization is what makes the
    margin the same double bit for bit."""
    parts = f"CAST('{bias!r}' AS DOUBLE)"
    for w, c in zip(weights, cols):
        parts = f"({parts} + CAST('{w!r}' AS DOUBLE) * {c})"
    return parts


def lr_margin_expr(
    weights: list[float], bias: float, cols: list[str]
) -> Column:
    """:func:`sql_lr_margin` as a Spark column."""
    return F.expr(sql_lr_margin(weights, bias, cols))


def quality_training_sample(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    label: Column,
    dim: int = 16,
    sample_n: int = 512,
) -> list[tuple]:
    """Bounded deterministic training sample: hash-embed features +
    the caller's label expression for the ``sample_n`` LOWEST-id docs
    (the train_pq_codebooks sampling discipline — deterministic, no
    reservoir randomness, bounded collect)."""
    feats = hash_embed(docs, id_col, text_col, dim=dim)
    labeled = feats.join(
        docs.select(F.col(id_col), label.cast("int").alias("_y")), id_col
    )
    cols = [f"h_{b}" for b in _buckets(dim)]
    rows = (
        labeled.orderBy(id_col)
        .limit(sample_n)
        .select(*cols, "_y")
        .collect()
    )
    return [tuple(r) for r in rows]


def quality_model_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    weights: list[float],
    bias: float,
    dim: int = 16,
) -> DataFrame:
    """Score EVERY document with a trained linear quality model:
    (id, margin, keep) where ``keep = margin > 0``. One hash-embed
    aggregate + one projection — no Python in the data path."""
    feats = hash_embed(docs, id_col, text_col, dim=dim)
    cols = [f"h_{b}" for b in _buckets(dim)]
    margin = lr_margin_expr(weights, bias, cols)
    return feats.select(
        F.col(id_col),
        margin.alias("margin"),
        (margin > 0).alias("keep"),
    )
