"""Corpus-curation operators for LLM training-data pipelines: deterministic
train/val/test splits, stratified sampling, benchmark decontamination,
and intra-document repetition metrics (the Gopher-style repetition
signals) — the curation steps between raw ingestion and dedup
(dedup_fuzzy.py) that every large-scale pretraining pipeline needs.

Spark-first shapes, all oracle-checkable:

- Splits/sampling hash with md5 (the repo's engine-independent hash,
  see operators/dedup_fuzzy.py): a document's assignment depends only on
  its id + salt, never on partitioning, row order, or cluster size — the
  property that makes a 100 TB split reproducible forever, and lets any
  engine with md5 (DuckDB here) recompute it bit-for-bit.
- Decontamination broadcasts the benchmark n-gram set (benchmarks are
  tiny; corpora are not) so the corpus side stays a single scan +
  per-doc aggregate — no shuffle of the 100 TB side by shingle.
- Repetition metrics are pure per-row array expressions (whole-stage
  codegen, zero shuffle): scan-speed at any scale.

No reference-repo counterpart (the reference pipeline is
ingest/clean/upsert only) — this module is part of the §2.8 extension
surface mandated by the driver brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mini_data_platform_spark.functions.text import shingles_of, tokens
from mini_data_platform_spark.operators.resources import attach_plan

_HEX = "0123456789abcdef"

#: every hash family in this module gets its own salt so that split
#: assignment, sampling, and any future hash use are mutually independent
SPLIT_SALT = "split"
SAMPLE_SALT = "sample"


def hash_bucket(id_col: Column, salt: str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from md5(salt # id).

    The first 4 hex chars (16 bits) of the digest, mod ``buckets``:
    partition-order independent and engine-independent. With 65536 hash
    points the mod-100 buckets differ in mass by at most 1/655 — the
    bias is fixed and documented, not a correctness concern for splits.
    JVM-side end to end (md5 + conv are codegen'd); no shuffle.
    """
    h = F.md5(F.concat(F.lit(salt + "#"), id_col.cast("string")))
    return (F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % buckets).alias(
        "bucket"
    )


def sql_hash_bucket(id_expr: str, salt: str, buckets: int = 100) -> str:
    """DuckDB twin of :func:`hash_bucket` (no ``conv`` there — nibble
    positions in the hex alphabet, summed with place values)."""
    h = f"md5('{salt}#' || CAST({id_expr} AS VARCHAR))"
    terms = " + ".join(
        f"(strpos('{_HEX}', substr({h}, {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"(({terms}) % {buckets})"


def split_assign(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Stable train/val/test assignment: adding, removing, or reordering
    OTHER rows never moves a document between splits (the holdout
    contamination guarantee hash-splits exist for)."""
    b = hash_bucket(F.col(id_col), SPLIT_SALT)
    return df.withColumn("bucket", b).withColumn(
        "split",
        F.when(F.col("bucket") < train_pct, F.lit("train"))
        .when(F.col("bucket") < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def sql_split_assign(id_expr: str, train_pct: int = 80, val_pct: int = 10) -> str:
    b = sql_hash_bucket(id_expr, SPLIT_SALT)
    return (
        f"CASE WHEN {b} < {train_pct} THEN 'train' "
        f"WHEN {b} < {train_pct + val_pct} THEN 'val' ELSE 'test' END"
    )


def stratified_sample(
    df: DataFrame, id_col: str, class_col: str, rates: dict[str, int]
) -> DataFrame:
    """Deterministic per-class downsampling: keep a row iff its hash
    bucket falls below its class's percentage. The per-class rate dial
    every data-mix recipe needs (e.g. downweight boilerplate-heavy
    sources), with the same stability guarantee as :func:`split_assign`.
    Classes absent from ``rates`` are dropped entirely."""
    b = hash_bucket(F.col(id_col), SAMPLE_SALT)
    rate = F.lit(0)
    for cls, pct in sorted(rates.items()):
        rate = F.when(F.col(class_col) == cls, F.lit(pct)).otherwise(rate)
    return df.withColumn("bucket", b).filter(F.col("bucket") < rate)


def sql_stratified_sample_pred(
    id_expr: str, class_expr: str, rates: dict[str, int]
) -> str:
    b = sql_hash_bucket(id_expr, SAMPLE_SALT)
    cases = " ".join(
        f"WHEN {class_expr} = '{cls}' THEN {pct}"
        for cls, pct in sorted(rates.items())
    )
    return f"({b} < (CASE {cases} ELSE 0 END))"


WSAMPLE_SALT = "wsample"


def _h60(*parts: Column) -> Column:
    """60-bit integer hash (first 15 hex chars of md5 over the '#'-joined
    parts) — the widest md5 prefix that fits a signed 64-bit int, so
    ranking keys stay INTEGER end to end: engine-independent with no
    float, no libm, no near-tie ambiguity."""
    joined = F.concat_ws("#", *[p.cast("string") for p in parts])
    return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("bigint")


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = WSAMPLE_SALT,
    max_weight: int = 64,
    validate: bool = True,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis,
    IPL 2006 "A-ES"): rank every row by a key distributed as
    ``U^(1/w)`` and keep the top k — inclusion probability tracks the
    weights without ever materializing a cumulative distribution, one
    projection + one top-k, no shuffle beyond TakeOrderedAndProject's
    per-partition heads.

    LIBM-FREE twist: for INTEGER weights, ``U^(1/w)`` is distributed
    exactly as ``max`` of ``w`` iid uniforms (both have CDF ``x^w``), so
    the key is ``max_{j=1..w} h60(salt, id, j)`` — 60-bit integer hashes
    only. No ``pow``/``log``, hence no engine-divergent libm and no
    near-tie float ambiguity: a DuckDB twin reproduces the SAMPLE
    bit-for-bit (``sql_weighted_sample_key``), which is what lets the
    declared query ``doc_weighted_sample`` hash-match. The price is
    O(weight) hash evaluations per row — right for small integer class
    weights (the data-mix dial); pre-scale real-valued weights to a
    small integer grid (the grid is a quantization of the inclusion
    probabilities, stated, not hidden).

    CONSISTENT-SAMPLING property (same as every hash op here): a row's
    key depends only on (salt, id, weight), so re-runs, appends, and
    partitioning never change survivors except by genuine displacement
    — deleting a non-sampled row never perturbs the sample.

    Rows with weight <= 0 or NULL are excluded (zero-weight semantics).
    Ties (astronomically unlikely across 2^60 points) break on id.
    ``validate`` spends one O(n) aggregate refusing weights above
    ``max_weight`` — silently accepting a 10^6 weight would turn the
    per-row cost into a 10^6-element array, so loud beats slow."""
    w = F.col(weight_col).cast("long")
    if validate:
        over = (
            df.where(w > max_weight).limit(1).count()
        )
        if over:
            raise ValueError(
                f"{weight_col} exceeds max_weight={max_weight}; "
                "pre-scale weights to a small integer grid"
            )
    key = F.array_max(
        F.transform(
            F.sequence(F.lit(1), w),
            lambda j: _h60(F.lit(salt), F.col(id_col), j),
        )
    )
    keyed = (
        df.where(w >= 1)
        .withColumn("skey", key)
        .orderBy(F.col("skey").desc(), F.col(id_col).asc())
        .limit(k)
    )
    return keyed


def sql_weighted_sample(
    src: str,
    id_expr: str,
    weight_expr: str,
    k: int,
    out_cols: str,
    salt: str = WSAMPLE_SALT,
) -> str:
    """DuckDB twin of :func:`weighted_sample`: unnest ``range(1, w+1)``
    per row, hash each (salt, id, j) with the same md5-prefix nibble
    decode, take the per-row MAX as the 60-bit integer key, rank. The
    key is integer-identical to the Spark side, so the SAMPLE matches
    bit-for-bit. ``src`` must select ``{id_expr}``, ``{weight_expr}``
    and every column named in ``out_cols``."""
    h = (
        f"md5('{salt}' || '#' || CAST({id_expr} AS VARCHAR) || '#' || "
        f"CAST(t.j AS VARCHAR))"
    )
    nibble_sum = " + ".join(
        f"(strpos('{_HEX}', substr(h, {i + 1}, 1)) - 1) * {16 ** (14 - i)}"
        for i in range(15)
    )
    return f"""
        WITH src AS ({src}),
        hs AS (
            SELECT {id_expr} AS _sid, {nibble_sum} AS hv
            FROM (SELECT {id_expr}, {h} AS h
                  FROM src,
                       unnest(range(1, CAST({weight_expr} AS BIGINT) + 1))
                           AS t(j)
                  WHERE {weight_expr} >= 1)
        ),
        keys AS (SELECT _sid, MAX(hv) AS skey FROM hs GROUP BY _sid)
        SELECT {out_cols}, k.skey AS skey
        FROM keys k JOIN src ON {id_expr} = k._sid
        ORDER BY k.skey DESC, {id_expr} ASC LIMIT {k}
    """


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
) -> DataFrame:
    """Benchmark decontamination scores: for every document, the fraction
    of its distinct word n-grams that appear anywhere in the benchmark
    set (the standard n-gram-overlap test-set-leakage check).

    Plan shape for 100 TB: the benchmark's distinct n-gram set is small
    by construction (eval sets are thousands of docs, not billions), so
    it is aggregated once and BROADCAST; the corpus side is one staged
    shingle projection + explode + two map-side-combinable aggregates —
    the corpus is never shuffled by shingle. Returns
    (id, n_ngrams, n_hits, contamination)."""
    doc_sh = (
        _distinct_shingles(docs, id_col, text_col, shingle_n)
        .persist()  # consumed by both the totals and the hits branches
    )
    bench_sh = _distinct_shingles(
        benchmark, id_col, text_col, shingle_n
    ).select("_shingle").distinct()
    totals = doc_sh.groupBy(id_col).agg(F.count("*").alias("n_ngrams"))
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "_shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    out = (
        docs.select(id_col)
        .join(totals, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (
                F.coalesce("n_hits", F.lit(0)).cast("double")
                / F.greatest(F.coalesce("n_ngrams", F.lit(0)), F.lit(1)).cast(
                    "double"
                )
            ).alias("contamination"),
        )
    )
    return out


def _distinct_shingles(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int
) -> DataFrame:
    """(id, _shingle) exploded DISTINCT-per-doc shingle rows, tokens staged
    (see dedup_fuzzy._staged_shingles for the HOF-recompute trap)."""
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    return toked.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(shingles_of(F.col("_toks"), shingle_n))
        ).alias("_shingle"),
    )


def sql_contamination(
    docs_src: str, bench_src: str, shingle_sql: str
) -> str:
    """DuckDB twin of :func:`contamination`. ``shingle_sql`` is the shingle
    list expression over a column named ``text`` (TX.sql_shingles)."""
    return f"""
        WITH corpus AS ({docs_src}),
        bench AS ({bench_src}),
        doc_sh AS (
            SELECT doc_id, u.s AS shingle
            FROM (SELECT doc_id, list_distinct({shingle_sql}) AS sh FROM corpus),
                 unnest(sh) AS u(s)
        ),
        bench_sh AS (
            SELECT DISTINCT u.s AS shingle
            FROM (SELECT list_distinct({shingle_sql}) AS sh FROM bench),
                 unnest(sh) AS u(s)
        ),
        totals AS (SELECT doc_id, COUNT(*) AS n_ngrams FROM doc_sh GROUP BY 1),
        hits AS (
            SELECT doc_id, COUNT(*) AS n_hits
            FROM doc_sh JOIN bench_sh USING (shingle) GROUP BY 1
        )
        SELECT c.doc_id,
               COALESCE(t.n_ngrams, 0) AS n_ngrams,
               COALESCE(h.n_hits, 0) AS n_hits,
               CAST(COALESCE(h.n_hits, 0) AS DOUBLE)
               / CAST(greatest(COALESCE(t.n_ngrams, 0), 1) AS DOUBLE)
                   AS contamination
        FROM corpus c
        LEFT JOIN totals t USING (doc_id)
        LEFT JOIN hits h USING (doc_id)
    """


def repetition_metrics(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style intra-document repetition signals, per document:

    - ``n_bigrams`` — total word bigrams
    - ``top_bigram_n`` / ``top_bigram_frac`` — occurrences of the most
      frequent bigram and its share (boilerplate/spam detector)
    - ``n_adjacent_repeats`` — positions where a token immediately
      repeats ("foo foo")

    Everything is a per-row array expression — zero shuffle, whole-stage
    codegen, scan-speed at 100 TB. The top-bigram count deliberately uses
    the O(distinct·total) nested-HOF count over per-row arrays instead of
    an explode + two-level aggregate: documents are bounded (thousands of
    tokens), so per-row quadratic beats two cluster-wide shuffles.
    ``_toks`` and ``_bg`` are staged projections — inlining them into the
    lambdas would re-evaluate the split per element (dedup_fuzzy.py)."""
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    staged = toked.select(
        F.col(id_col),
        F.col("_toks"),
        shingles_of(F.col("_toks"), 2).alias("_bg"),
    )
    bg = F.col("_bg")
    top_n = F.coalesce(
        F.array_max(
            F.transform(
                F.array_distinct(bg),
                lambda b: F.size(F.filter(bg, lambda x: x == b)),
            )
        ),
        F.lit(0),
    )
    t = F.col("_toks")
    head = F.slice(t, 1, F.size(t) - 1)
    tail = F.slice(t, 2, F.size(t) - 1)
    n_adj = F.size(F.filter(F.zip_with(head, tail, lambda a, b: a == b), lambda x: x))
    return staged.select(
        F.col(id_col),
        F.size(bg).alias("n_bigrams"),
        top_n.alias("top_bigram_n"),
        (
            top_n.cast("double")
            / F.greatest(F.size(bg), F.lit(1)).cast("double")
        ).alias("top_bigram_frac"),
        n_adj.alias("n_adjacent_repeats"),
    )


def sql_repetition_metrics(src: str, tokens_sql: str, bigrams_sql: str) -> str:
    """DuckDB twin of :func:`repetition_metrics` over source ``src`` with
    token / bigram list expressions over its ``text`` column."""
    return f"""
        WITH staged AS (
            SELECT doc_id, {tokens_sql} AS t, {bigrams_sql} AS bg FROM ({src})
        )
        SELECT doc_id,
               len(bg) AS n_bigrams,
               COALESCE(list_max(list_transform(list_distinct(bg),
                        b -> len(list_filter(bg, x -> x = b)))), 0) AS top_bigram_n,
               CAST(COALESCE(list_max(list_transform(list_distinct(bg),
                        b -> len(list_filter(bg, x -> x = b)))), 0) AS DOUBLE)
               / CAST(greatest(len(bg), 1) AS DOUBLE) AS top_bigram_frac,
               len(list_filter(list_transform(range(len(t) - 1),
                        i -> t[CAST(i + 1 AS INT)] = t[CAST(i + 2 AS INT)]),
                        x -> x)) AS n_adjacent_repeats
        FROM staged
    """


def epoch_shuffle_ranks(
    df: DataFrame,
    id_col: str,
    seed: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle order for one training epoch:
    (id, epoch_rank) where rank 1..n follows ``md5(seed ":" id)`` — a
    different, reproducible permutation per seed, identical across runs,
    engines, and partitionings.

    Why not ``ORDER BY rand(seed)`` + ``row_number``: Spark's rand is
    partition-dependent (not stable under repartitioning) and a global
    row_number window collapses to ONE partition. This is the
    scale-correct formulation: range-partition by the hash key (ordered
    partitions), row_number WITHIN each partition, then add
    driver-prefix-summed partition row counts (one long per partition of
    driver traffic) — the same two-phase scan as
    ``operators/packing.pack_documents``. The SQL oracle is the
    single-window ``ROW_NUMBER() OVER (ORDER BY md5(...))`` twin."""
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    key = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    base = (
        df.select(F.col(id_col), key.alias("_ek"))
        .repartitionByRange(n_parts, F.col("_ek"))
        .withColumn("_pid", F.spark_partition_id())
    )
    # PERSIST before the counts collect: repartitionByRange resamples its
    # boundaries per-job, so the counts job and the final row_number job
    # could otherwise see DIFFERENT partition assignments at scale,
    # yielding duplicate/skipped epoch_rank values despite the docstring's
    # determinism guarantee (same fix as packing.pack_documents; the
    # caller releases via release_plan).
    base = base.persist()
    from pyspark.sql import Window

    w = Window.partitionBy("_pid").orderBy("_ek", id_col)
    local = base.withColumn("_rl", F.row_number().over(w))
    counts = {
        r["_pid"]: r["_c"]
        for r in base.groupBy("_pid").agg(F.count("*").alias("_c")).collect()
    }
    offsets, running = {}, 0
    for pid in sorted(counts):
        offsets[pid] = running
        running += counts[pid]
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _off long"
    )
    out = (
        local.join(F.broadcast(off_df), "_pid")
        .select(
            F.col(id_col),
            (F.col("_off") + F.col("_rl")).alias("epoch_rank"),
        )
    )
    return attach_plan(out, base)


def sql_epoch_shuffle(src: str, id_expr: str, seed: int) -> str:
    """DuckDB twin of :func:`epoch_shuffle_ranks`: the single-window
    formulation the distributed version must value-match."""
    return f"""
        SELECT {id_expr},
               ROW_NUMBER() OVER (
                   ORDER BY md5('{seed}:' || CAST({id_expr} AS VARCHAR)),
                            {id_expr}
               ) AS epoch_rank
        FROM ({src})
    """


MIX_SALT = "mix"
MIX_BUCKETS = 65536


def source_mixture(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: dict[str, float],
    counts: dict[str, int] | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Deterministic SOURCE-MIXTURE sampling — the pretraining data-mix
    dial: given target mixture ``weights`` (relative proportions over
    sources), keep a per-source deterministic subset so the OUTPUT
    approximates the target mix while keeping as much data as possible
    (the binding source — the one whose availability limits the mix —
    keeps ~100%; every other source downsamples to match). Sources
    absent from ``weights`` are dropped.

    The keep decision is a per-source integer threshold over the
    16-bit md5 bucket (``hash_bucket(buckets=65536)`` — the full hash
    range, so thresholds are exact with zero mod bias): stable under
    reruns, appends, and re-partitioning, same guarantee as
    ``split_assign``/``stratified_sample``. Thresholds are computed
    DRIVER-SIDE from one per-source count aggregate (rows ∝ #sources —
    hyperparameter-sized) with plain Python arithmetic, so an SQL
    oracle folding the same integers reproduces the selection exactly.

    Returns ``(selected_rows_with_bucket, thresholds)`` so callers (and
    the oracle builder) can reuse the fold. Pass ``counts`` to skip the
    aggregate (serving path / oracle parity)."""
    if counts is None:
        counts = {
            r[0]: r[1]
            for r in df.groupBy(source_col).count().collect()
        }
    thresholds = mixture_thresholds(weights, counts)
    b = hash_bucket(F.col(id_col), MIX_SALT, MIX_BUCKETS)
    thr = F.lit(0)
    for s, t in sorted(thresholds.items()):
        thr = F.when(F.col(source_col) == s, F.lit(t)).otherwise(thr)
    out = df.withColumn("bucket", b).filter(F.col("bucket") < thr)
    return out, thresholds


def mixture_thresholds(
    weights: dict[str, float], counts: dict[str, int]
) -> dict[str, int]:
    """Per-source integer keep thresholds over the 16-bit hash range:
    normalize the weights, find the largest output total T with
    norm_s·T ≤ count_s for every weighted source that exists (the
    BINDING source keeps ~100%), threshold_s = round(min(1,
    norm_s·T/count_s)·65536). Plain Python so the SQL oracle can fold
    the identical integers. Sources with zero availability get
    threshold 0 (absent from the output, never bind the scale)."""
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("source_mixture: weights must sum > 0")
    norm = {s: w / total_w for s, w in weights.items()}
    avail = {s: counts.get(s, 0) for s in norm}
    binding = [c / norm[s] for s, c in avail.items() if norm[s] > 0 and c > 0]
    if not binding:
        raise ValueError("source_mixture: no weighted source has rows")
    scale = min(binding)
    return {
        s: (
            round(min(1.0, (norm[s] * scale) / c) * MIX_BUCKETS)
            if c
            else 0
        )
        for s, c in avail.items()
    }


def sql_source_mixture_pred(
    id_expr: str, source_expr: str, thresholds: dict[str, int]
) -> str:
    """DuckDB twin of the :func:`source_mixture` selection predicate —
    fold the SAME integer thresholds the operator computed."""
    b = sql_hash_bucket(id_expr, MIX_SALT, MIX_BUCKETS)
    cases = " ".join(
        f"WHEN {source_expr} = '{s}' THEN {t}"
        for s, t in sorted(thresholds.items())
    )
    return f"({b} < (CASE {cases} ELSE 0 END))"
