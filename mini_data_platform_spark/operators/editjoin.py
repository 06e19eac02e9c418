"""Bounded edit-distance similarity join — entity-resolution dedup for
SHORT strings (titles, names, product labels).

MinHash/Jaccard (operators/dedup_fuzzy.py) measures token-set overlap —
the right metric for documents, the wrong one for short strings where
one typo changes a whole token. The classic string-similarity join
(Gravano et al., "Approximate String Joins in a Database (Almost) for
Free", VLDB 2001; Xiao et al., Ed-Join, VLDB 2008) answers
``ed(a, b) ≤ d`` exactly with a candidate filter + verification:

- each edit operation destroys at most ``q`` of a string's q-grams, so
  ``ed(a,b) ≤ d`` ⟹ their q-gram SETS share ≥ |G_max| − q·d grams;
- PREFIX FILTERING: order every string's q-grams by one universal total
  order (md5 here — any fixed order is sound; frequency order is only
  an optimization) and keep the first ``q·d + 1``; two strings meeting
  the overlap bound MUST share a prefix gram. Candidates = equi-join on
  prefix grams — shuffle keyed by gram, never all-pairs;
- the prefix-filter guarantee needs ``max(|G_a|, |G_b|) ≥ q·d + 1``,
  i.e. the LONGER string at least ``q·(d+1)`` chars (shorter pairs can
  lose every shared gram to d edits). Strings below that length emit an
  ADDITIONAL "SHORT" key, so at-risk pairs (both below) meet in one
  bounded block; mixed pairs (one below, one at/above) are covered by
  the gram join — the short side still emits its whole gram set as its
  prefix, and a short side with NO grams (len < q) can never be within
  distance d of a ≥ q·(d+1) string anyway (length gap > d);
- verification is ``levenshtein(a, b) ≤ d`` — JVM-side, and the same
  textbook DP integer in every engine, which is what makes the oracle
  exact: the operator's output EQUALS the naive all-pairs predicate, so
  the oracle can BE the naive predicate (the filter is provably a
  superset; verification makes it exact).

Scale shape: grams explode to ≤ (q·d + 1) rows per string; the
candidate join is bucketed by gram (hot grams are the skew knob — the
universal-order prefix keeps common grams out of most prefixes only
under frequency order, so a production deployment would plug document
frequencies into the order; the md5 order keeps the oracle
deterministic instead, the documented trade); verification cost ∝
candidates × |s|², never corpus².

No reference-repo counterpart; §2.8 extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: join keys are namespaced ("g:" + gram vs the short sentinel) so a
#: gram can never collide with the short-block key
_SHORT = "s:short"


def _prefix_grams(text: F.Column, q: int, d: int) -> F.Column:
    """First ``q·d + 1`` q-grams of ``text`` in md5 order (the universal
    total order), as an array; empty array when len(text) < q."""
    n_prefix = q * d + 1
    idx = F.sequence(F.lit(1), F.greatest(F.length(text) - q + 1, F.lit(0)))
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.substr(text, i, F.lit(q)))
    )
    ordered = F.transform(
        F.array_sort(
            F.transform(grams, lambda g: F.struct(F.md5(g).alias("h"), g.alias("g")))
        ),
        lambda s: F.concat(F.lit("g:"), s["g"]),
    )
    return F.slice(ordered, 1, n_prefix)


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """All pairs with ``levenshtein(text_a, text_b) ≤ max_dist`` —
    (id_a, id_b, dist), id_a < id_b, null texts excluded. EXACT: the
    q-gram prefix filter is a proven superset and every candidate is
    verified; equal strings pair at dist 0 (exact-dup detection included
    for free)."""
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    d = max_dist
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).cast("string").alias("s"),
    ).where(F.col("s").isNotNull())
    # SHORT threshold: the prefix guarantee needs the longer side to
    # have >= q*d + 1 grams, i.e. length >= q*(d+1)
    short_len = q * (d + 1)
    keyed = base.select(
        "id",
        "s",
        F.explode(
            # additive keys: grams ALWAYS (empty array when len < q),
            # plus the SHORT block key for strings below the guarantee
            F.concat(
                _prefix_grams(F.col("s"), q, d),
                F.when(
                    F.length("s") < short_len, F.array(F.lit(_SHORT))
                ).otherwise(F.array().cast("array<string>")),
            )
        ).alias("k"),
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.id") < F.col("b.id"))
            # length filter: ed <= d bounds the length difference
            & (
                F.abs(F.length(F.col("a.s")) - F.length(F.col("b.s")))
                <= d
            ),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.s").alias("_sa"),
            F.col("b.s").alias("_sb"),
        )
        .distinct()
    )
    return (
        cands.withColumn("dist", F.levenshtein("_sa", "_sb"))
        .where(F.col("dist") <= d)
        .select("id_a", "id_b", "dist")
    )


def sql_edit_distance_pairs(
    src: str, id_expr: str, text_expr: str, max_dist: int = 2
) -> str:
    """DuckDB oracle: the NAIVE all-pairs predicate — exactly what the
    filtered+verified operator must equal (levenshtein is the same
    integer DP in both engines)."""
    return f"""
        WITH t AS (
            SELECT {id_expr} AS id, CAST({text_expr} AS VARCHAR) AS s
            FROM ({src}) WHERE {text_expr} IS NOT NULL
        )
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(levenshtein(a.s, b.s) AS INT) AS dist
        FROM t a JOIN t b ON a.id < b.id
        WHERE levenshtein(a.s, b.s) <= {max_dist}
    """
