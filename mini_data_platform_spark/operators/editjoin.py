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
candidate join is bucketed by gram (hot grams are the skew knob —
``gram_order="freq"`` orders prefixes rarest-first from a one-pass
document-frequency aggregate, keeping common grams out of every prefix
— the Ed-Join production order; the default md5 order is
corpus-independent and keeps the declared query's oracle deterministic,
the documented trade); verification cost ∝ candidates × |s|², never
corpus².

No reference-repo counterpart; §2.8 extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .resources import attach_plan

#: join keys are namespaced ("g:" + gram vs the short sentinel) so a
#: gram can never collide with the short-block key
_SHORT = "s:short"


def _grams(text: F.Column, q: int) -> F.Column:
    """DISTINCT q-grams of ``text``; empty array when len(text) < q
    (guarded explicitly — an unguarded ``F.sequence(1, len-q+1)``
    defaults to step −1 when the stop is below 1 and would emit
    spurious [1, 0] index pairs for sub-``q`` strings)."""
    idx = F.when(
        F.length(text) >= q,
        F.sequence(F.lit(1), F.length(text) - q + 1, F.lit(1)),
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(idx, lambda i: F.substr(text, i, F.lit(q)))
    )


def _prefix_grams(text: F.Column, q: int, d: int) -> F.Column:
    """First ``q·d + 1`` q-grams of ``text`` in md5 order (the universal
    total order), as an array; empty array when len(text) < q."""
    n_prefix = q * d + 1
    ordered = F.transform(
        F.array_sort(
            F.transform(
                _grams(text, q),
                lambda g: F.struct(F.md5(g).alias("h"), g.alias("g")),
            )
        ),
        lambda s: F.concat(F.lit("g:"), s["g"]),
    )
    return F.slice(ordered, 1, n_prefix)


def _freq_prefix_keyed(base: DataFrame, q: int, d: int) -> DataFrame:
    """(id, s, k) join keys with FREQUENCY-ordered prefixes (the
    Ed-Join production order): one aggregate pass computes each gram's
    document frequency, every string keeps its ``q·d + 1`` RAREST grams
    (ties broken by md5 then the gram itself, so the order stays a
    universal total order — the soundness requirement). Rare-gram
    prefixes collapse the hot-gram pathology: under a tiny gram
    alphabet the md5 order admits nearly everything (the SURVEY §6
    measured worst case), while rarest-first keeps common grams out of
    every prefix, shrinking both candidate count and per-gram skew.
    Costs two extra shuffles (gram-frequency aggregate + regroup by id)
    — noise against the candidate-join savings in hot regimes."""
    n_prefix = q * d + 1
    short_len = q * (d + 1)
    grams = base.select(
        "id", "s", F.explode(_grams(F.col("s"), q)).alias("g")
    )
    freq = grams.groupBy("g").agg(F.count("*").alias("_df"))
    pref = (
        grams.join(freq, "g")
        .groupBy("id", "s")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("_df").alias("f"),
                            F.md5("g").alias("h"),
                            F.col("g").alias("g"),
                        )
                    )
                ),
                1,
                n_prefix,
            ).alias("_pg")
        )
        .select(
            "id",
            "s",
            F.explode(
                F.transform(
                    F.col("_pg"), lambda t: F.concat(F.lit("g:"), t["g"])
                )
            ).alias("k"),
        )
    )
    # strings below the guarantee length ALSO meet in the short block;
    # sub-q strings have no grams at all and appear ONLY here
    short = base.where(F.length("s") < short_len).select(
        "id", "s", F.lit(_SHORT).alias("k")
    )
    return pref.unionByName(short)


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
    q: int = 2,
    gram_order: str = "md5",
) -> DataFrame:
    """All pairs with ``levenshtein(text_a, text_b) ≤ max_dist`` —
    (id_a, id_b, dist), id_a < id_b, null texts excluded. EXACT: the
    q-gram prefix filter is a proven superset and every candidate is
    verified; equal strings pair at dist 0 (exact-dup detection included
    for free).

    ``gram_order``: ``"md5"`` (default — corpus-independent, keeps the
    oracle's constant-free determinism) or ``"freq"`` (rarest-first
    prefixes — the Ed-Join production order; same exact output, far
    fewer candidates when the gram alphabet is small/hot)."""
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if gram_order not in ("md5", "freq"):
        raise ValueError(f"gram_order must be 'md5' or 'freq', got {gram_order!r}")
    d = max_dist
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).cast("string").alias("s"),
    ).where(F.col("s").isNotNull())
    # SHORT threshold: the prefix guarantee needs the longer side to
    # have >= q*d + 1 grams, i.e. length >= q*(d+1)
    short_len = q * (d + 1)
    if gram_order == "freq":
        keyed = _freq_prefix_keyed(base, q, d)
    else:
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
    # The keyed frame feeds BOTH sides of the self-join; without a
    # persist each alias re-runs the whole subtree (scan + tokenize +
    # gram/md5/sort — the expensive half of candidate generation) once
    # per side. It is prefix-bounded (≤ q·d+2 rows per string), so
    # caching it is small by construction. Attached for release_plan.
    keyed = keyed.persist()
    a = keyed.alias("a")
    b = keyed.alias("b")
    cands = a.join(
        b,
        (F.col("a.k") == F.col("b.k"))
        & (F.col("a.id") < F.col("b.id"))
        # length filter: ed <= d bounds the length difference
        & (
            F.abs(F.length(F.col("a.s")) - F.length(F.col("b.s")))
            <= d
        ),
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.col("a.s").alias("_sa"),
        F.col("b.s").alias("_sb"),
    )
    # Verify BEFORE deduplicating: the banded DP (levenshtein with a
    # threshold, O(d·|s|) per pair instead of O(|s|²)) runs map-side on
    # the raw join output, so the distinct no longer shuffles candidate
    # strings — only the (rare) surviving pairs. A pair meeting on k
    # prefix grams is verified k times (k ≤ q·d+2), a bounded constant
    # next to the string shuffle it removes (guide §2.3 "shuffle fewer
    # bytes"). Same output: dist is a pure function of the pair, so
    # distinct-after-verify equals verify-after-distinct.
    # (the distinct keeps the strings: dist is a function of the string
    # pair, so distinct-on-(ids, strings) after verify is row-for-row
    # the original distinct-then-verify — including the degenerate
    # duplicate-id-different-string input, where one id pair can
    # legitimately yield several rows)
    out = (
        cands.withColumn("dist", F.levenshtein("_sa", "_sb", d))
        .where(F.col("dist") >= 0)
        .select("id_a", "id_b", "_sa", "_sb", "dist")
        .distinct()
        .select("id_a", "id_b", "dist")
    )
    return attach_plan(out, keyed)


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
