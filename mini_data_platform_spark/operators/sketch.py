"""Count-min sketch — mergeable frequency estimates in fixed memory.

Completes the engine's sketch family (HLL distinct counts, Misra-Gries
heavy hitters, Bloom membership, MinHash/SimHash similarity): CMS
answers "about how often does key x occur" for EVERY key in
depth × width counters, where exact per-key counts would need one row
per distinct key (Cormode & Muthukrishnan, "An improved data stream
summary: the count-min sketch", J. Algorithms 2005). Estimates
OVERCOUNT only: each of the ``depth`` rows hashes x to one of ``width``
counters holding the sum of all colliding keys' counts, and the estimate
is the MIN over rows — ≥ the true count always, ≤ true + εN with
probability 1−δ for width = e/ε, depth = ln(1/δ).

Spark shape: the sketch BUILD is one explode (depth rows per input row)
+ one groupBy(row, bucket) count — map-side partial aggregation
collapses each partition to ≤ depth × width cells, so the shuffle
carries the SKETCH, not the data; at 100 TB that is the entire point.
Sketches merge by cell-wise addition (union streams, shard combine),
which the build's own partial aggregation already exploits.

The hash family is the repo's engine-independent md5 bucketing
(operators/corpus.hash_bucket — salt "cms0", "cms1", ... per row), so
the counter table is DETERMINISTIC and the SQL oracle reproduces it
cell-for-cell; the probabilistic part (estimation error) is pinned by
property tests, not the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from mini_data_platform_spark.operators.corpus import (
    hash_bucket,
    sql_hash_bucket,
)

#: salt prefix for the CMS hash family (one salt per depth row)
CMS_SALT = "cms"


def cms_table(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Build the count-min counter table for ``col``: one row per
    non-empty cell, (row, bucket, n) with ``row`` in [0, depth). Null
    keys are excluded (consistent with the heavy-hitters contract).
    Deterministic — same input, same table, any partitioning."""
    src = df.select(F.col(col)).where(F.col(col).isNotNull())
    cells = src.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        hash_bucket(
                            F.col(col), f"{CMS_SALT}{d}", width
                        ).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c")
    )
    return (
        cells.select("c.row", "c.bucket")
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("n"))
    )


def sql_cms_table(src: str, id_expr: str, depth: int = 4, width: int = 64) -> str:
    """DuckDB twin of :func:`cms_table` over source ``src``."""
    rows = "\n            UNION ALL\n".join(
        f"""            SELECT {d} AS row,
                   {sql_hash_bucket(id_expr, f"{CMS_SALT}{d}", width)} AS bucket
            FROM ({src}) WHERE {id_expr} IS NOT NULL"""
        for d in range(depth)
    )
    return f"""
        SELECT row, bucket, COUNT(*) AS n
        FROM (
{rows}
        )
        GROUP BY row, bucket
    """


def cms_estimate(
    cells: list[tuple[int, int, int]],
    key,
    depth: int = 4,
    width: int = 64,
) -> int:
    """Point estimate for ``key`` from a collected counter table
    (list of (row, bucket, n)): min over rows of the key's cell. The
    driver-side helper mirrors how a serving layer would use the sketch
    (the table is depth × width longs — KBs, not data).

    Supported key types: int and str ONLY — for these Python's string
    form matches Spark's ``CAST(key AS STRING)`` that built the table
    (bool is mapped to Spark's lowercase form). Floats and other types
    are refused: their Python repr diverges from Spark's cast (e.g.
    ``1e20`` vs ``1.0E20``), which would silently hash to the wrong cell.
    Query those through a Spark-side lookup against :func:`cms_table`
    instead."""
    import hashlib

    if isinstance(key, bool):
        key = "true" if key else "false"
    elif not isinstance(key, (int, str)):
        raise TypeError(
            f"cms_estimate supports int/str keys only, got {type(key).__name__}: "
            "Python's string form of other types diverges from Spark's "
            "CAST(... AS STRING) used to build the table"
        )
    table: dict[tuple[int, int], int] = {
        (r, b): n for r, b, n in cells
    }
    est = None
    for d in range(depth):
        h = hashlib.md5(f"{CMS_SALT}{d}#{key}".encode()).hexdigest()
        bucket = int(h[:4], 16) % width
        v = table.get((d, bucket), 0)
        est = v if est is None else min(est, v)
    return int(est or 0)


# ------------------------------------------------------------------ KMV

#: salt for the KMV hash (one family — KMV needs a single hash)
KMV_SALT = "kmv0"


def _kmv_h60(col: Column) -> Column:
    """60-bit integer hash of (KMV_SALT # value) — the corpus._h60
    family, inlined with the sketch's own salt."""
    joined = F.concat(F.lit(KMV_SALT + "#"), col.cast("string"))
    return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("bigint")


def kmv_synopsis(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """K-minimum-values distinct synopsis (Bar-Yossef et al. RANDOM'02;
    Beyer et al. SIGMOD'07): per group, the ``k`` SMALLEST distinct
    60-bit hashes of ``value_col`` as a sorted array — a tiny,
    MERGEABLE, engine-DETERMINISTIC distinct sketch. Unlike HLL
    registers (engine-specific, so events_approx_users is the one
    rows-only check in the suite), a KMV synopsis is a pure function
    of the value set: the estimate itself is oracle-checkable.

    Build cost is one distinct over (group, hash) — the exact-distinct
    shuffle, NOT sublinear (HLL keeps that crown); KMV's value is the
    synopsis algebra afterwards: persist it, union it (set-union
    estimates via merge — ``kmv_merge``), and verify it cross-engine.

    Returns (group…, kmv array<long>, n_values long) where n_values
    counts DISTINCT hashes seen (exact when < k; the estimator's
    small-set branch)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    hashes = df.select(
        *group_cols, _kmv_h60(F.col(value_col)).alias("_h")
    ).distinct()
    # two-level top-k: a single per-group window would sort the ENTIRE
    # distinct-hash set of a group in one partition — a straggler/OOM
    # on a high-cardinality group at scale. Level 1 keeps each
    # sub-bucket's k smallest (64 sub-partitions per group, each a
    # bounded window); level 2 ranks the ≤ 64·k survivors. The k
    # global minima survive level 1 inside their own sub-bucket, so
    # the result is identical to the single-window form.
    w_sub = Window.partitionBy(*group_cols, "_sub").orderBy("_h")
    survivors = (
        hashes.withColumn("_sub", F.pmod("_h", F.lit(64)))
        .withColumn("_srk", F.row_number().over(w_sub))
        .where(F.col("_srk") <= k)
    )
    w = Window.partitionBy(*group_cols).orderBy("_h")
    return (
        survivors.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .groupBy(*group_cols)
        .agg(
            F.sort_array(F.collect_list("_h")).alias("kmv"),
            F.count(F.lit(1)).alias("n_values"),
        )
    )


def kmv_estimate(synopsis: DataFrame, k: int = 64) -> DataFrame:
    """Distinct-count estimate from a synopsis: exact ``n_values`` when
    the group has fewer than ``k`` distinct hashes, else the unbiased
    (k-1)·2^60 / kth-min estimator. Pure projection; double arithmetic
    identical in any engine."""
    kth = F.element_at("kmv", k).cast("double")
    est = F.when(
        F.col("n_values") < k, F.col("n_values").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(float(1 << 60)) / kth)
    return synopsis.select(
        *[c for c in synopsis.columns if c not in ("kmv", "n_values")],
        est.alias("est_distinct"),
    )


def kmv_merge(a: Column, b: Column, k: int = 64) -> Column:
    """Union two synopsis arrays: the k smallest of the distinct union
    — the merged synopsis is EXACTLY the synopsis of the unioned value
    sets (the KMV closure property), so set-union distinct estimates
    compose without touching the data."""
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)


def sql_kmv_estimate(
    src: str, group_expr: str, value_expr: str, k: int = 64
) -> str:
    """DuckDB twin of ``kmv_synopsis`` + ``kmv_estimate`` (15-nibble
    md5 fold — the corpus.py sql_weighted_sample decode)."""
    from mini_data_platform_spark.operators.corpus import _HEX

    h = f"md5('{KMV_SALT}#' || CAST({value_expr} AS VARCHAR))"
    nibble_sum = " + ".join(
        f"(strpos('{_HEX}', substr(h, {i + 1}, 1)) - 1) * {16 ** (14 - i)}"
        for i in range(15)
    )
    return f"""
        WITH hs AS (
            SELECT DISTINCT g, hv FROM (
                SELECT {group_expr} AS g, {nibble_sum} AS hv
                FROM (SELECT {group_expr}, {h} AS h FROM ({src}))
            )
        ),
        ranked AS (
            SELECT g, hv,
                   row_number() OVER (PARTITION BY g ORDER BY hv) AS rk
            FROM hs
        ),
        agg AS (
            SELECT g, count(*) AS n, max(hv) AS kth
            FROM ranked WHERE rk <= {k} GROUP BY g
        )
        SELECT g AS {group_expr},
               CASE WHEN n < {k} THEN CAST(n AS DOUBLE)
                    ELSE {float(k - 1)} * {float(1 << 60)}
                         / CAST(kth AS DOUBLE)
               END AS est_distinct
        FROM agg
    """


def kmv_overlap(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    group_a,
    group_b,
    k: int = 64,
) -> DataFrame:
    """Set-OVERLAP estimate from two KMV synopses (the theta-sketch
    move, deterministic): for the two groups' value sets A and B,
    estimate |A ∪ B| from the merged synopsis and |A ∩ B| as
    ρ · |A ∪ B| where ρ = |merged ∩ A-synopsis ∩ B-synopsis| / k —
    the fraction of the union's k minima seen by BOTH sides (Beyer et
    al. SIGMOD'07 §4). Everything is integer-array algebra on the two
    synopses (no data touched), so the estimates are engine-exact.
    One row: (est_a, est_b, est_union, est_intersection, jaccard).

    Small-set exactness: when the union has < k distinct hashes the
    merged synopsis IS the union's hash set and every estimate is
    exact."""
    syn = kmv_synopsis(
        df.where(F.col(group_cols[0]).isin([group_a, group_b])),
        group_cols,
        value_col,
        k,
    # localCheckpoint (eager) the two-row synopsis before splitting it
    # into the a/b single-row frames: without it each side re-executes
    # the whole synopsis build (distinct + window over the data) —
    # round-8 advice. The materialized state is 2 groups × k longs.
    ).localCheckpoint()
    a = syn.where(F.col(group_cols[0]) == group_a).select(
        F.col("kmv").alias("ka"), F.col("n_values").alias("na")
    )
    b = syn.where(F.col(group_cols[0]) == group_b).select(
        F.col("kmv").alias("kb"), F.col("n_values").alias("nb")
    )
    both = a.crossJoin(b)  # two 1-row frames: a constant-attach
    merged = F.slice(
        F.array_sort(F.array_distinct(F.concat("ka", "kb"))), 1, k
    )
    n_union = F.least(
        F.size(F.array_distinct(F.concat("ka", "kb"))), F.lit(k)
    ).cast("double")
    kth = F.element_at(F.col("_m"), k).cast("double")
    est_union = F.when(
        F.size("_m") < k, F.size("_m").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(float(1 << 60)) / kth)

    def _est(arr, n):
        kth_g = F.element_at(arr, k).cast("double")
        return F.when(F.col(n) < k, F.col(n).cast("double")).otherwise(
            F.lit(float(k - 1)) * F.lit(float(1 << 60)) / kth_g
        )

    rho = (
        F.size(F.array_intersect(F.array_intersect(F.col("_m"), "ka"), "kb"))
        / n_union
    )
    out = both.withColumn("_m", merged).select(
        _est(F.col("ka"), "na").alias("est_a"),
        _est(F.col("kb"), "nb").alias("est_b"),
        est_union.alias("est_union"),
        (rho * est_union).alias("est_intersection"),
        rho.alias("jaccard"),
    )
    return out


def sql_kmv_overlap(
    src: str,
    group_expr: str,
    value_expr: str,
    group_a: str,
    group_b: str,
    k: int = 64,
) -> str:
    """DuckDB twin of :func:`kmv_overlap` — same synopsis build, same
    integer list algebra (list_distinct/list_sort/list_intersect)."""
    from mini_data_platform_spark.operators.corpus import _HEX

    h = f"md5('{KMV_SALT}#' || CAST({value_expr} AS VARCHAR))"
    nibble_sum = " + ".join(
        f"(strpos('{_HEX}', substr(h, {i + 1}, 1)) - 1) * {16 ** (14 - i)}"
        for i in range(15)
    )
    c = float(k - 1) * 1.0
    dom = float(1 << 60)
    return f"""
        WITH hs AS (
            SELECT DISTINCT g, hv FROM (
                SELECT {group_expr} AS g, {nibble_sum} AS hv
                FROM (SELECT {group_expr}, {h} AS h FROM ({src})
                      WHERE {group_expr} IN ('{group_a}', '{group_b}'))
            )
        ),
        ranked AS (
            SELECT g, hv,
                   row_number() OVER (PARTITION BY g ORDER BY hv) AS rk
            FROM hs
        ),
        syn AS (
            SELECT g, list_sort(list(hv)) AS kmv, count(*) AS n
            FROM ranked WHERE rk <= {k} GROUP BY g
        ),
        pair AS (
            SELECT a.kmv AS ka, a.n AS na, b.kmv AS kb, b.n AS nb
            FROM (SELECT * FROM syn WHERE g = '{group_a}') a,
                 (SELECT * FROM syn WHERE g = '{group_b}') b
        ),
        m AS (
            SELECT ka, na, kb, nb,
                   list_slice(list_sort(list_distinct(list_concat(ka, kb))),
                              1, {k}) AS mm,
                   least(len(list_distinct(list_concat(ka, kb))), {k}) AS nu
            FROM pair
        )
        SELECT CASE WHEN na < {k} THEN CAST(na AS DOUBLE)
                    ELSE {c} * {dom} / CAST(ka[{k}] AS DOUBLE) END AS est_a,
               CASE WHEN nb < {k} THEN CAST(nb AS DOUBLE)
                    ELSE {c} * {dom} / CAST(kb[{k}] AS DOUBLE) END AS est_b,
               CASE WHEN len(mm) < {k} THEN CAST(len(mm) AS DOUBLE)
                    ELSE {c} * {dom} / CAST(mm[{k}] AS DOUBLE)
               END AS est_union,
               (CAST(len(list_intersect(list_intersect(mm, ka), kb)) AS DOUBLE)
                / CAST(nu AS DOUBLE))
               * (CASE WHEN len(mm) < {k} THEN CAST(len(mm) AS DOUBLE)
                       ELSE {c} * {dom} / CAST(mm[{k}] AS DOUBLE) END)
                   AS est_intersection,
               CAST(len(list_intersect(list_intersect(mm, ka), kb)) AS DOUBLE)
               / CAST(nu AS DOUBLE) AS jaccard
        FROM m
    """
