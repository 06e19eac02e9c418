"""Unigram language-model scoring — the CCNet-style quality signal.

Corpus curation pipelines score every document against a language model
and gate on the score (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", LREC 2020 — they use a
KenLM 5-gram; the unigram form is the same shape with a trivially
distributable estimator). A document full of common words scores high;
gibberish, boilerplate tokens, and OOV-dense text score low. This is
the model-based complement to the heuristic gates in functions/text.py
(punct ratio, TTR, stopword hits).

Two-phase distributed shape (the same stats→score split as BM25,
operators/ranking.py):

1. ESTIMATE: one explode + one aggregate builds the corpus unigram
   table; the TOP-``vocab_size`` vocabulary (by count desc, token asc —
   a deterministic total order) collects to the driver. Driver traffic
   doctrine: a pruned vocabulary is model-parameter-sized (CCNet ships
   one as an artifact), exactly like IVF centroids or PQ codebooks —
   it is the MODEL, not the data.
2. SCORE: per-token log10-probabilities are computed DRIVER-SIDE in
   Python and quantized to 1e-6 (see below), then broadcast-joined to
   the exploded tokens; per-document aggregation uses the decimal
   parity recipe (plans/_parity.py) so the mean is order-independent
   and cross-engine bit-exact. Tokens outside the vocabulary take a
   half-count OOV floor (log10(0.5/total)) and are counted per doc —
   the OOV rate is itself a quality gate.

Why the logs are Python literals, not engine expressions: log10 is not
IEEE-exactly-rounded, and the JVM's Math.log10 measurably disagrees
with glibc's in the last ulp (~1.3% of values on this host — probed),
so an engine-side log cannot be oracle-hash-exact. Computing the
(token → logp) table once in Python and feeding BOTH engines the same
6-decimal literals removes libm from the comparison entirely — the
same constant-folding doctrine as the BM25 idf literals
(operators/ranking.py docstring). Quantizing to 1e-6 also makes the
decimal(30,6) parity aggregation EXACT (the values are 6dp-true by
construction), and costs nothing semantically: a 1e-6 absolute error
on a per-token logprob is far below any gating threshold.

No reference-repo counterpart; §2.8 LLM-pipeline extension surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from mini_data_platform_spark.functions.text import tokens
from mini_data_platform_spark.plans._parity import dsum


def vocab_logprobs(
    counts: list[tuple[str, int]], total: int
) -> tuple[list[tuple[str, float]], float]:
    """(vocab logp table, oov floor logp) from integer token counts and
    the FULL-corpus token total. Pure Python (glibc libm), quantized to
    1e-6 — the single source of the literals both the Spark plan and
    the SQL oracle consume."""
    table = [
        (tok, round(math.log10(cnt / total), 6)) for tok, cnt in counts
    ]
    return table, round(math.log10(0.5 / total), 6)


def unigram_logprob(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    vocab_size: int = 50_000,
) -> DataFrame:
    """Per-document unigram-LM score: (id, n_tokens, n_oov,
    mean_logprob) where ``mean_logprob`` is the decimal-exact mean of
    the per-token quantized log10 probabilities (vocabulary tokens) or
    the OOV floor (everything else). Documents with zero tokens are
    absent (nothing to score — same convention as the SQL unnest).

    Plan: explode → count aggregate (one shuffle) → bounded driver
    collect of the top-``vocab_size`` vocabulary → broadcast join of
    the logp table onto the exploded tokens → per-doc aggregate (one
    shuffle). Nothing corpus-sized ever reaches the driver."""
    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt")).persist()
    # the two model-parameter collects (corpus total, top-k vocabulary)
    # are independent reads of the shared persisted counts — submit
    # them from driver threads (guide §2.6; cached-block locking keeps
    # the count aggregate computed once) instead of paying two
    # sequential driver round-trips
    from mini_data_platform_spark.operators.resources import (
        run_concurrently,
    )

    total_rows, top = run_concurrently(
        lambda: counts.agg(F.sum("cnt")).collect(),
        lambda: counts.orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(vocab_size)
        .collect(),
    )
    total = total_rows[0][0]
    counts.unpersist(False)
    if not total:
        raise ValueError("unigram_logprob: corpus has no tokens")
    table, oov_logp = vocab_logprobs(
        [(r["tok"], r["cnt"]) for r in top], int(total)
    )
    vocab = spark.createDataFrame(table, "tok string, logp double")
    scored = toks.join(F.broadcast(vocab), "tok", "left")
    return (
        scored.groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("logp").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
            (
                dsum(F.coalesce(F.col("logp"), F.lit(oov_logp)))
                / F.count("*")
            ).alias("mean_logprob"),
        )
        .select(
            F.col("id").alias(id_col), "n_tokens", "n_oov", "mean_logprob"
        )
    )


def sql_unigram_logprob(
    src: str,
    id_expr: str,
    tokens_expr: str,
    table: list[tuple[str, float]],
    oov_logp: float,
    id_out: str = "doc_id",
) -> str:
    """DuckDB oracle twin: consumes the SAME Python-computed logp
    literals (pass the output of :func:`vocab_logprobs` built from
    counts probed off the fixture), so libm never enters the
    comparison. Mean via the decimal parity recipe."""

    def esc(s: str) -> str:
        return s.replace("'", "''")

    values = ",\n            ".join(
        f"('{esc(tok)}', {logp!r})" for tok, logp in table
    )
    return f"""
        WITH toks AS (
            SELECT {id_expr} AS id, unnest({tokens_expr}) AS tok
            FROM ({src})
        ),
        v(tok, logp) AS (
            VALUES {values}
        ),
        j AS (
            SELECT t.id,
                   COALESCE(v.logp, {oov_logp!r}) AS logp,
                   CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS is_oov
            FROM toks t LEFT JOIN v USING (tok)
        )
        SELECT id AS {id_out},
               COUNT(*) AS n_tokens,
               CAST(SUM(is_oov) AS BIGINT) AS n_oov,
               CAST(SUM(CAST(logp AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
                   AS mean_logprob
        FROM j GROUP BY id
    """
