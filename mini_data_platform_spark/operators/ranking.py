"""BM25 text ranking — lexical relevance scoring over the corpus.

The retrieval half of the LLM-data toolkit: given a small set of query
terms, score every document with Okapi BM25 (Robertson & Zaragoza, "The
Probabilistic Relevance Framework: BM25 and Beyond", FnTIR 2009) — the
standard lexical ranker behind search/RAG retrieval baselines and the
usual first-stage filter before embedding rerankers.

    score(d, q) = Σ_t idf(t) · tf(t,d)·(k1+1) /
                        (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl))
    idf(t)      = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )

Spark shape, built for the corpus being the big side:
- corpus statistics (N, avgdl, per-term df) are ONE aggregate pass —
  df(t) comes from a single select of per-term membership flags summed
  map-side (query terms are a tiny literal list; no explode, no join);
- idf values are computed DRIVER-SIDE in Python and injected as plan
  literals: ln() is the one piece whose last-ulp behavior differs
  between libm implementations, so baking the same constants into both
  the Spark plan and the DuckDB oracle keeps the remaining arithmetic
  (+ · /) IEEE-identical and the oracle hash-exact;
- per-document scoring is a pure projection (tf via JVM
  ``filter``/``size`` over the token array) — scan-speed, zero shuffle,
  zero Python.

No reference-repo counterpart (the reference — see SURVEY.md — has no
text analytics); part of the §2.8 LLM-pipeline extension surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from mini_data_platform_spark.functions.text import tokens


def corpus_stats(
    df: DataFrame, text_col: str, query_terms: list[str]
) -> tuple[int, float, dict[str, int]]:
    """(N, avgdl, df_per_term) in ONE aggregate pass: token count and a
    0/1 membership flag per query term are computed per row, then summed.
    Driver traffic is |terms| + 2 scalars."""
    toks = tokens(F.col(text_col))
    aggs = [
        F.count("*").alias("_n"),
        F.sum(F.size(toks)).alias("_dl_sum"),
    ]
    for i, t in enumerate(query_terms):
        aggs.append(
            F.sum(
                F.when(F.array_contains(toks, t), 1).otherwise(0)
            ).alias(f"_df_{i}")
        )
    row = df.agg(*aggs).collect()[0]
    n = row["_n"]
    avgdl = (row["_dl_sum"] or 0) / n if n else 0.0
    dfs = {t: row[f"_df_{i}"] or 0 for i, t in enumerate(query_terms)}
    return n, float(avgdl), dfs


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, dl, bm25) for every document against ``query_terms``
    (deduplicated, order-preserving — BM25 is a bag-of-terms model, and
    a fixed term order keeps the score's floating-point summation
    identical between the plan and the SQL oracle)."""
    seen: dict[str, None] = {}
    for t in query_terms:
        seen.setdefault(t, None)
    terms = list(seen)
    if not terms:
        raise ValueError("bm25_scores: empty query")
    n, avgdl, dfs = corpus_stats(df, text_col, terms)
    if n == 0:
        raise ValueError("bm25_scores: empty corpus")
    idf = {
        t: math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0) for t in terms
    }
    toks = tokens(F.col(text_col))

    # NB: the predicate MUST be a single-argument lambda — F.filter
    # dispatches on arity and feeds a second parameter (even a bound
    # default) the ELEMENT INDEX (same trap as documented at
    # dedup_fuzzy.minhash_signature_columns)
    def _eq(term: str):
        return lambda x: x == F.lit(term)

    staged = df.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        *[
            F.size(F.filter(toks, _eq(t))).alias(f"_tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    score = bm25_score_expr(terms, idf, avgdl, k1, b)
    return staged.select(F.col(id_col), F.col("dl"), score.alias("bm25"))


def bm25_score_expr(
    terms: list[str],
    idf: dict[str, float],
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
):
    """The BM25 scoring expression over a staged frame carrying ``dl``
    and ``_tf_0.._tf_{n-1}`` columns — shared by the full-corpus scorer
    above and the inverted-index serving lookup (operators/invindex.py),
    so both paths fold bit-identical arithmetic.

    Every constant product is pre-folded in PYTHON so each engine-side
    expression carries exactly ONE constant: Catalyst's
    ReorderAssociativeOperator regroups chains like idf*tf*(k1+1) into
    (idf*(k1+1))*tf, which costs an ulp vs the SQL oracle's
    left-association — folding removes anything to reorder."""
    c_fixed = k1 * (1.0 - b)
    c_slope = k1 * b / avgdl
    norm = F.lit(c_fixed) + F.lit(c_slope) * F.col("dl").cast("double")
    score = None
    for i, t in enumerate(terms):
        tf = F.col(f"_tf_{i}").cast("double")
        part = F.lit(idf[t] * (k1 + 1.0)) * tf / (tf + norm)
        score = part if score is None else score + part
    return score


def sql_bm25_scores(
    src: str,
    id_expr: str,
    text_expr: str,
    query_terms: list[str],
    n: int,
    avgdl: float,
    idf: dict[str, float],
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_scores`. ``n``/``avgdl``/``idf`` are
    the driver-computed constants (repr() of a Python float round-trips
    exactly, so both engines fold identical literals)."""
    toks = f"string_split_regex(trim({text_expr}), ' +')"
    seen: dict[str, None] = {}
    for t in query_terms:
        seen.setdefault(t, None)
    terms = list(seen)
    tf_cols = ", ".join(
        f"CAST(len(list_filter(t, x -> x = '{t}')) AS DOUBLE) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    c_fixed = k1 * (1.0 - b)
    c_slope = k1 * b / avgdl
    norm = f"({c_fixed!r} + {c_slope!r} * CAST(dl AS DOUBLE))"
    parts = " + ".join(
        f"({idf[t] * (k1 + 1.0)!r} * tf_{i} / (tf_{i} + {norm}))"
        for i, t in enumerate(terms)
    )
    return f"""
        WITH staged AS (
            SELECT {id_expr}, len(t) AS dl, {tf_cols}
            FROM (SELECT {id_expr}, {toks} AS t FROM ({src}))
        )
        SELECT {id_expr}, dl, {parts} AS bm25 FROM staged
    """
