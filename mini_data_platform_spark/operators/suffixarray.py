"""Distributed suffix-array repeated-substring detection (radix-R
prefix tupling) — the EXACT substring-dedup primitive.

``spans.py`` approximates Lee et al., "Deduplicating Training Data Makes
Language Models Better" (ACL 2022), with fixed-stride window HASHING:
cheap, but (a) stride-aligned only, (b) fixed length only, (c) md5-
collision-possible. This module builds the real thing, distributed:
suffix-EQUIVALENCE tables in the style of a prefix-doubling suffix
array (Manber–Myers 1990), which answer, exactly and for ANY length L:
"which token positions start identical length-L substrings?" From those
tables fall out two curation signals hashing cannot give exactly: the
corpus's LONGEST verbatim repeat (arbitrary length, found with two
ROLLUP grouping-set passes — a quadratic blowup for brute force) and
stride-1 EXACT repeated-span coverage (no collisions, no alignment
misses).

Construction, in DataFrame ops only (no RDDs, no Python UDFs). Classic
prefix doubling pairs two half-blocks per level — log2(max_len) levels,
each costing a shuffle. Shuffle ROUNDS, not bytes, dominate both the
fixture and a real cluster's critical path, so this implementation
generalizes the radix: level k classifies positions by the first
R^k tokens using an R-TUPLE of level-(k-1) classes at offsets
j·R^(k-1) (R=8 ⇒ 3 levels reach 512 tokens where doubling needs 9).
- level 0: class of each position = the token itself, canonicalized to
  ``min(suffix_id)`` over equal tokens (``Window.partitionBy(token)``) —
  a class id IS a position id, 8 bytes, never a string.
- level k: the R-tuple (cls_{k-1}(p), cls_{k-1}(p+h), …,
  cls_{k-1}(p+(R-1)h)), h = R^(k-1), gathered with ``F.lead`` over the
  per-document position window (a SORT within the established
  per-document partitioning, no exchange), then canonicalized to
  ``min(suffix_id)`` over the tuple (ONE shuffle of fixed-width longs).
  A suffix ending early pads with the -1 sentinel, which is exact:
  equal truncated classes imply equal truncated strings INCLUDING
  length, by induction from level 0.
- length-L equality for arbitrary L: overlapping power-block keys
  (sparse-table style, generalized): with B = R^floor(log_R L), the
  tuple of cls at offsets (0, B, 2B, …, L-B) identifies tokens[p:p+L]
  exactly — ceil(L/B) ≤ R blocks, one ``lead`` window + one groupBy
  per probe, no re-tupling.

Scale notes (100 TB): every shuffle moves fixed-width longs keyed by
class tuple or doc id — no strings move after tokenization, no
all-pairs, no driver data paths (the binary-search loop collects one
Boolean per probe; the max-remaining bound is one row). Documents are
the parallelism unit for the ``lead`` windows (positions of one
document are one window partition), so the operator assumes individual
documents fit a partition — the same assumption every tokenizer/window
op in this repo makes; POS_LIMIT guards it explicitly.

No reference-repo counterpart (the reference — see SURVEY.md — has no
text analytics); part of the §2.8 LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from mini_data_platform_spark.functions.text import tokens
from .resources import attach_plan, carry_plan

#: Blocks combined per level. 8 balances shuffle rounds (3 levels reach
#: 512 tokens) against key width (≤ 64 bytes) and lead-window fan (≤ 7
#: leads, all inside one per-document sort).
RADIX = 8

#: Positions per document the packed suffix id reserves. 2^22 tokens
#: (~16 MB of text) per document; a corpus whose documents exceed this
#: should chunk first (operators/chunking.py). Doc ids must then fit
#: 2^62 / 2^22 = 2^40 — guarded below with raise_error so a violation
#: fails the job loudly instead of silently aliasing suffix ids.
POS_LIMIT = 1 << 22
_MAX_ID = (1 << 62) // POS_LIMIT  # one spare bit of headroom


#: Max blocks a length-L probe key may stitch together. Construction
#: rounds are the expensive resource (each is a corpus-wide shuffle);
#: key WIDTH is nearly free (extra longs inside one already-paid sort
#: and groupBy). So levels stop as soon as MAX_BLOCKS blocks of the top
#: level reach max_len: max_len=128 needs only levels {1, 8} (2 rounds)
#: with probe keys of ≤ 16 longs, instead of levels {1, 8, 64}.
MAX_BLOCKS = 16


def _top_level(max_len: int) -> int:
    """Smallest level k such that MAX_BLOCKS blocks of size RADIX^k
    cover ``max_len`` — the deepest level construction must build."""
    k = 0
    while RADIX**k * MAX_BLOCKS < max_len:
        k += 1
    return k


def _key_level(avail: int, length: int) -> int:
    """Level whose blocks key a length-``length`` probe: the largest
    built level with block <= length (so ceil(length/block) stays
    within MAX_BLOCKS — guaranteed by _top_level for length <= the
    max_len the table was built for)."""
    k = 0
    while k < avail and RADIX ** (k + 1) <= length:
        k += 1
    return k


def _positions(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(_id, pos, rem, sid, _tok): one row per token position. ``sid``
    packs (id, pos) into one long — the canonical suffix id used as a
    class representative. ``rem`` = tokens remaining from ``pos``
    (inclusive), i.e. this suffix's length."""
    toked = df.where(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_toks")
    )
    guarded_id = F.when(
        (F.col("_id") < 0)
        | (F.col("_id") >= _MAX_ID)
        | (F.size("_toks") >= POS_LIMIT),
        F.raise_error(
            F.concat(
                F.lit("suffixarray: id/doc-length out of packing range: id="),
                F.col("_id").cast("string"),
                F.lit(" n_tokens="),
                F.size("_toks").cast("string"),
            )
        ).cast("long"),
    ).otherwise(F.col("_id").cast("long"))
    return toked.select(
        guarded_id.alias("_id"),
        F.size("_toks").alias("_n"),
        F.posexplode("_toks").alias("pos", "_tok"),
    ).select(
        F.col("_id"),
        F.col("pos"),
        (F.col("_n") - F.col("pos")).alias("rem"),
        (F.col("_id") * POS_LIMIT + F.col("pos")).alias("sid"),
        F.col("_tok"),
    )


def suffix_classes(
    df: DataFrame, id_col: str, text_col: str, max_len: int
) -> DataFrame:
    """Per-position suffix-equivalence tables: (id, pos, rem, sid,
    cls_0 .. cls_K) with K the smallest level such that MAX_BLOCKS
    blocks of size RADIX^K reach ``max_len``, where
    ``cls_k(p) == cls_k(q)`` iff the length-RADIX^k prefixes of the
    suffixes at p and q are identical (truncated at document end;
    truncation is part of the identity). Class ids are canonical suffix
    ids (min over the class), so equality is exact — no hashing
    anywhere.

    Returned persisted, hash-partitioned by document id and sorted by
    (id, pos) — balanced, ordered cache partitions. NOTE: under AQE,
    Spark reports a cached adaptive plan's output partitioning as
    unknown, so downstream per-document windows still insert one
    re-exchange of this fixed-width table per probe (sub-second next
    to the construction the cache avoids re-running); the plan gate in
    tests/test_plan_quality.py pins exactly that shape. Caller
    releases via ``release_plan``."""
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    spark = df.sparkSession
    cur = (
        _positions(df, id_col, text_col)
        .withColumn("cls_0", F.min("sid").over(Window.partitionBy("_tok")))
        .drop("_tok")
    )
    w_doc = Window.partitionBy("_id").orderBy("pos")
    for k in range(1, _top_level(max_len) + 1):
        h = RADIX ** (k - 1)
        prev = f"cls_{k - 1}"
        # R-tuple of previous-level classes at offsets 0, h, …, (R-1)h.
        # Suffixes ending early pad with -1 (never collides: sids >= 0).
        # Exactness: equal prev-classes encode equal truncated strings
        # INCLUDING length (induction from level 0), so the padded
        # tuple encodes the length-R^k truncated string exactly.
        # (materialized as columns first — a window's partitionBy
        # cannot itself contain window expressions)
        names = []
        for j in range(1, RADIX):
            names.append(f"_n{j}")
            cur = cur.withColumn(
                names[-1],
                F.coalesce(F.lead(prev, j * h).over(w_doc), F.lit(-1)),
            )
        cur = cur.withColumn(
            f"cls_{k}", F.min("sid").over(Window.partitionBy(prev, *names))
        ).drop(*names)
    out = (
        cur.repartition(spark.sparkContext.defaultParallelism, "_id")
        # pin ordering too: every downstream probe runs a per-document
        # lead/lag window, which then reuses BOTH the partitioning and
        # the (id, pos) sort from the cache — no exchange, no re-sort
        .sortWithinPartitions("_id", "pos")
        .persist()
    )
    return attach_plan(out.withColumnRenamed("_id", id_col), out)


def _length_key(classes: DataFrame, id_col: str, length: int) -> list[Column]:
    """Columns jointly identifying the length-``length`` substring
    starting at each position (valid only where ``rem >= length``):
    classes of the deepest built level whose block fits (block B) at
    offsets 0, B, …, plus the overlapping tail block at L-B (the
    sparse-table trick: overlap is harmless for equality)."""
    avail = sum(1 for c in classes.columns if c.startswith("cls_")) - 1
    k = _key_level(avail, length)
    block = RADIX**k
    m = -(-length // block)  # ceil(length / block)
    offsets = sorted({*range(0, (m - 1) * block, block), length - block})
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    cls_k = f"cls_{k}"
    return [
        F.col(cls_k) if off == 0 else F.lead(cls_k, off).over(w_doc)
        for off in offsets
    ]


def _repeat_starts(classes: DataFrame, id_col: str, length: int) -> DataFrame:
    """(id, pos, _k*...) of every position starting a length-``length``
    token sequence that occurs >= 2 times in the corpus. Key FIRST,
    filter SECOND: ``F.lead`` evaluates over the rows present at that
    point, so filtering ``rem >= length`` before the lead would skip
    the removed tail positions and null-out keys for valid starts near
    document ends."""
    keys = _length_key(classes, id_col, length)
    kcols = [k.alias(f"_k{i}") for i, k in enumerate(keys)]
    knames = [f"_k{i}" for i in range(len(keys))]
    return (
        classes.select(F.col(id_col), F.col("pos"), F.col("rem"), *kcols)
        .where(F.col("rem") >= length)
        .withColumn("_cnt", F.count(F.lit(1)).over(Window.partitionBy(*knames)))
        .where(F.col("_cnt") >= 2)
    )


def longest_repeat(
    df: DataFrame, id_col: str, text_col: str, max_len: int = 128
) -> DataFrame:
    """The corpus's longest verbatim repeated token sequence, exactly —
    one row: (repeat_len, n_grams, n_positions, top_gram) where
    repeat_len is the largest L such that some length-L token sequence
    starts at >= 2 positions (overlapping starts count — internal
    repetition is duplication too), n_grams = distinct repeated
    sequences of that length, n_positions = their total start
    positions, and top_gram = the lexicographically smallest of them.
    (0, 0, 0, '') when nothing repeats at all. ``max_len`` caps the
    search (and the table depth).

    A naive binary search on L (the existence predicate is monotone
    decreasing in L) costs ~log2(max_len) SEQUENTIAL jobs. This runs
    TWO ROLLUP passes instead: a prefix-group of block keys
    (b0, …, b15) answers "does a length-j·block repeat exist?" for ALL
    j in one grouping-sets aggregation — a row's block j is its class
    at offset j·block when the full block exists, else a per-row-unique
    negative pad, so any prefix group of size >= 2 is a genuine repeat
    of the full prefix length. The first pass (top-level blocks) finds
    the repeat length in top-block digits; each lower level refines
    with ≤ RADIX-1 extension blocks (a base-R digit), the already-fixed
    prefix collapsed into one struct column — a LADDER of
    floor(log_R(max_len)) + 1 passes, each a single grouping-sets
    aggregation of fixed-width longs with ≤ MAX_BLOCKS + 1 columns.
    ROLLUP amplifies the shuffled aggregation rows by the prefix count
    (≤ 17×, collapsed map-side) but the job count stays O(log max_len)
    with tiny constants — rounds, not bytes, dominate the critical
    path. The driver sees one ≤17-row grouping summary per pass
    (bounded control-plane traffic, the graph.py convergence-loop
    doctrine)."""
    spark = df.sparkSession
    classes = suffix_classes(df, id_col, text_col, max_len)
    w_doc = Window.partitionBy(id_col).orderBy("pos")

    def _padded_block(lvl: int, offset: int, full_len: int):
        """Class of the block-``lvl`` window at ``offset`` when it is
        fully inside the suffix (rem >= full_len), else a per-row-
        unique negative pad (-sid-2: never collides with a class id
        >= 0, the -1 sentinel, or another row's pad) so incomplete
        rows can never form a group of 2."""
        name = f"cls_{lvl}"
        c = F.col(name) if offset == 0 else F.lead(name, offset).over(w_doc)
        return F.when(F.col("rem") >= full_len, c).otherwise(
            -F.col("sid") - 2
        )

    def _max_depth(cols: list) -> int:
        """Deepest rollup prefix with a group of >= 2 rows; 0 if none.
        grouping_id for prefix depth d over n columns is 2^(n-d) - 1,
        so d = n - bit_length(gid)."""
        named = [c.alias(f"_b{i}") for i, c in enumerate(cols)]
        rows = (
            classes.select(*named)
            .rollup(*[f"_b{i}" for i in range(len(cols))])
            .agg(F.grouping_id().alias("_gid"), F.count(F.lit(1)).alias("_cnt"))
            .where(F.col("_cnt") >= 2)
            .groupBy("_gid")
            .count()
            .collect()
        )
        depths = [len(cols) - int(r["_gid"]).bit_length() for r in rows]
        return max(depths, default=0)

    top = sum(1 for c in classes.columns if c.startswith("cls_")) - 1
    best = 0
    prefix_parts: list = []  # padded block columns covering [0, best)
    for lvl in range(top, -1, -1):
        blk = RADIX**lvl
        limit = MAX_BLOCKS if lvl == top else RADIX - 1
        n_ext = min(limit, (max_len - best) // blk)
        if n_ext < 1:
            continue
        ext = [
            _padded_block(lvl, best + i * blk, best + (i + 1) * blk)
            for i in range(n_ext)
        ]
        cols = ([F.struct(*prefix_parts)] if prefix_parts else []) + ext
        d_ext = _max_depth(cols) - (1 if prefix_parts else 0)
        if d_ext > 0:
            best += d_ext * blk
            prefix_parts.extend(ext[:d_ext])

    if best == 0:
        empty = spark.range(1).select(
            F.lit(0).alias("repeat_len"),
            F.lit(0).cast("long").alias("n_grams"),
            F.lit(0).cast("long").alias("n_positions"),
            F.lit("").alias("top_gram"),
        )
        return carry_plan(empty, classes)

    rep = _repeat_starts(classes, id_col, best)
    knames = [c for c in rep.columns if c.startswith("_k")]
    # reconstruct gram text only for repeated positions (candidate-
    # bounded read of the corpus, same discipline as incremental.py)
    toked = df.where(F.trim(F.col(text_col)) != "").select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )
    grams = rep.join(toked, id_col).select(
        *knames,
        F.concat_ws(" ", F.slice("_toks", F.col("pos") + 1, best)).alias("_g"),
    )
    out = grams.agg(
        F.lit(best).cast("int").alias("repeat_len"),
        F.countDistinct(*knames).alias("n_grams"),
        F.count(F.lit(1)).cast("long").alias("n_positions"),
        F.min("_g").alias("top_gram"),
    )
    return carry_plan(out, classes)


def repeated_span_coverage(
    df: DataFrame, id_col: str, text_col: str, min_len: int = 16
) -> DataFrame:
    """Per-document EXACT repeated-span coverage at threshold
    ``min_len``: (id, n_tokens, n_repeat_starts, covered_tokens,
    coverage_frac) where a position is covered iff it lies inside some
    length-``min_len`` window that occurs >= 2 times anywhere in the
    corpus (stride 1, exact equality — no md5, no alignment misses;
    contrast spans.py's stride-aligned hashed approximation). Coverage
    by windows of exactly ``min_len`` equals coverage by maximal
    repeated spans of length >= ``min_len``: a longer repeat's every
    length-``min_len`` subwindow also repeats, and their union is the
    whole span. Documents shorter than ``min_len`` report 0 coverage.

    Plan: class tables to level floor(log_RADIX(min_len)) (the tupling
    shuffles), one count-over-key to mark repeated starts, then a
    per-document interval union via one ``lag`` window — covered =
    sum(min(min_len, start - prev_start)). No joins carry text; the
    only string work is tokenization."""
    if min_len < 1:
        raise ValueError(f"min_len must be >= 1, got {min_len}")
    classes = suffix_classes(df, id_col, text_col, min_len)
    starts = _repeat_starts(classes, id_col, min_len).select(id_col, "pos")

    w_doc = Window.partitionBy(id_col).orderBy("pos")
    gap = F.col("pos") - F.lag("pos").over(w_doc)
    per_doc = (
        starts.withColumn(
            "_add", F.coalesce(F.least(gap, F.lit(min_len)), F.lit(min_len))
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_repeat_starts"),
            F.sum("_add").cast("long").alias("covered_tokens"),
        )
    )
    sizes = (
        df.where(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(F.col(id_col), F.size("_toks").cast("long").alias("n_tokens"))
    )
    out = sizes.join(per_doc, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("n_repeat_starts", F.lit(0)).cast("long").alias("n_repeat_starts"),
        F.coalesce("covered_tokens", F.lit(0)).cast("long").alias("covered_tokens"),
        F.round(
            F.coalesce("covered_tokens", F.lit(0)) / F.col("n_tokens"), 6
        ).alias("coverage_frac"),
    )
    return carry_plan(out, classes)


def suffix_span_dedup(
    df: DataFrame, id_col: str, text_col: str, min_len: int = 16
) -> DataFrame:
    """Exact substring DEDUP as a transform — the actionable form of
    Lee et al. 2022 ("deduplicating training data"): every occurrence
    of a corpus-repeated span, except the canonical first one, is
    REMOVED from the text. Returns (id, n_tokens, n_removed,
    dedup_text).

    Semantics (position-wise, so cross-group overlaps are well
    defined): each repeated length-``min_len`` window group elects the
    canonical start = min suffix id (first occurrence in (id, pos)
    order); a token position is removed iff some NON-canonical
    repeated-window start covers it. The canonical occurrence
    survives unless a different group's non-canonical window overlaps
    it. Documents losing every token still appear, with
    ``dedup_text = ''``.

    Plan: repeated starts + canonical election ride the same key
    window as coverage; removal flags reach tokens via one (id, pos)
    join; the covered test is a running-max window (last removal
    start seen so far) — no interval explosion; text rebuilds with an
    order-pinned collect (sorted (pos, token) structs, never a bare
    collect_list)."""
    if min_len < 1:
        raise ValueError(f"min_len must be >= 1, got {min_len}")
    classes = suffix_classes(df, id_col, text_col, min_len)
    keys = _length_key(classes, id_col, min_len)
    kcols = [k.alias(f"_k{i}") for i, k in enumerate(keys)]
    knames = [f"_k{i}" for i in range(len(keys))]
    w_key = Window.partitionBy(*knames)
    removals = (
        classes.select(
            F.col(id_col), F.col("pos"), F.col("rem"), F.col("sid"), *kcols
        )
        .where(F.col("rem") >= min_len)
        .withColumn("_cnt", F.count(F.lit(1)).over(w_key))
        .withColumn("_canon", F.min("sid").over(w_key))
        .where((F.col("_cnt") >= 2) & (F.col("sid") != F.col("_canon")))
        .select(F.col(id_col), F.col("pos"), F.lit(1).alias("_isrem"))
    )
    toks = (
        df.where(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(F.col(id_col), F.posexplode("_toks").alias("pos", "_tok"))
    )
    w_doc = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = toks.join(removals, [id_col, "pos"], "left").withColumn(
        "_last_rs",
        F.max(F.when(F.col("_isrem") == 1, F.col("pos"))).over(w_doc),
    )
    removed = F.col("_last_rs").isNotNull() & (
        F.col("pos") < F.col("_last_rs") + min_len
    )
    kept = flagged.where(~removed).groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "_tok"))),
                lambda s: s["_tok"],
            ),
            " ",
        ).alias("dedup_text"),
    )
    sizes = (
        df.where(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(F.col(id_col), F.size("_toks").cast("long").alias("n_tokens"))
    )
    out = sizes.join(kept, id_col, "left").select(
        id_col,
        "n_tokens",
        (F.col("n_tokens") - F.coalesce("_n_kept", F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.coalesce("dedup_text", F.lit("")).alias("dedup_text"),
    )
    return carry_plan(out, classes)


# ------------------------------------------------------------- oracles
# DuckDB oracle builders (the spans.py convention): brute-force n-gram
# enumeration — O(n · max_len) rows, fine at the driver's sf0.01
# correctness scale, and the quadratic-ish blowup the suffix tables
# exist to avoid at corpus scale. Tokenization mirrors
# functions.text.sql_tokens exactly.


def _sql_toks(src: str, id_col: str, text_col: str) -> str:
    return f"""
        toks AS (
            SELECT {id_col} AS id,
                   string_split_regex(trim({text_col}), ' +') AS t
            FROM ({src}) WHERE trim({text_col}) <> ''
        )"""


def sql_longest_repeat(
    src: str, id_col: str, text_col: str, max_len: int = 128
) -> str:
    """ANSI/DuckDB equivalent of ``longest_repeat``: enumerate every
    (start, L) gram, keep grams starting at >= 2 positions, report the
    max L with its gram count, position count, and min gram text."""
    return f"""
        WITH {_sql_toks(src, id_col, text_col)},
        grams AS (
            SELECT id, s, L, array_to_string(t[s+1:s+L], ' ') AS g
            FROM toks,
                 unnest(generate_series(1, {max_len})) AS ls(L),
                 unnest(generate_series(0, len(t) - L)) AS ss(s)
            WHERE len(t) >= L
        ),
        rep AS (
            SELECT L, g, count(*) AS cnt
            FROM grams GROUP BY L, g HAVING count(*) >= 2
        ),
        best AS (SELECT coalesce(max(L), 0) AS bl FROM rep)
        SELECT CAST(best.bl AS INT) AS repeat_len,
               CAST(coalesce(count(rep.g), 0) AS BIGINT) AS n_grams,
               CAST(coalesce(sum(rep.cnt), 0) AS BIGINT) AS n_positions,
               coalesce(min(rep.g), '') AS top_gram
        FROM best LEFT JOIN rep ON rep.L = best.bl
        GROUP BY best.bl
    """


def sql_repeated_span_coverage(
    src: str, id_col: str, text_col: str, min_len: int = 16
) -> str:
    """ANSI/DuckDB equivalent of ``repeated_span_coverage``: repeated
    stride-1 grams of length ``min_len``, coverage via DISTINCT position
    explosion (the interval-union the Spark plan does with one lag)."""
    return f"""
        WITH {_sql_toks(src, id_col, text_col)},
        starts AS (
            SELECT id, s, array_to_string(t[s+1:s+{min_len}], ' ') AS g
            FROM toks, unnest(generate_series(0, len(t) - {min_len})) AS ss(s)
            WHERE len(t) >= {min_len}
        ),
        rep AS (SELECT g FROM starts GROUP BY g HAVING count(*) >= 2),
        rs AS (SELECT id, s FROM starts JOIN rep USING (g)),
        nstarts AS (SELECT id, count(*) AS n_repeat_starts FROM rs GROUP BY id),
        covpos AS (
            SELECT id, count(DISTINCT p) AS covered
            FROM rs, unnest(generate_series(s, s + {min_len} - 1)) AS u(p)
            GROUP BY id
        )
        SELECT toks.id AS {id_col},
               CAST(len(toks.t) AS BIGINT) AS n_tokens,
               CAST(coalesce(nstarts.n_repeat_starts, 0) AS BIGINT)
                   AS n_repeat_starts,
               CAST(coalesce(covpos.covered, 0) AS BIGINT) AS covered_tokens,
               round(coalesce(covpos.covered, 0) / len(toks.t), 6)
                   AS coverage_frac
        FROM toks
        LEFT JOIN nstarts ON nstarts.id = toks.id
        LEFT JOIN covpos ON covpos.id = toks.id
    """


def sql_suffix_span_dedup(
    src: str, id_col: str, text_col: str, min_len: int = 16
) -> str:
    """ANSI/DuckDB equivalent of ``suffix_span_dedup``: same canonical
    election (min packed suffix id over each repeated gram group),
    same position-wise removal, text rebuilt with an ordered
    string_agg."""
    return f"""
        WITH {_sql_toks(src, id_col, text_col)},
        starts AS (
            SELECT id, s, array_to_string(t[s+1:s+{min_len}], ' ') AS g
            FROM toks, unnest(generate_series(0, len(t) - {min_len})) AS ss(s)
            WHERE len(t) >= {min_len}
        ),
        grp AS (
            SELECT g, count(*) AS cnt, min(id * {POS_LIMIT} + s) AS canon
            FROM starts GROUP BY g
        ),
        removals AS (
            SELECT id, s FROM starts JOIN grp USING (g)
            WHERE grp.cnt >= 2 AND id * {POS_LIMIT} + s <> grp.canon
        ),
        rempos AS (
            SELECT DISTINCT id, p
            FROM removals, unnest(generate_series(s, s + {min_len} - 1)) AS u(p)
        ),
        tokpos AS (
            SELECT id, p, t[p+1] AS tok
            FROM toks, unnest(generate_series(0, len(t) - 1)) AS u(p)
        ),
        kept AS (
            SELECT tokpos.id,
                   count(*) AS n_kept,
                   string_agg(tok, ' ' ORDER BY p) AS dedup_text
            FROM tokpos
            ANTI JOIN rempos ON rempos.id = tokpos.id AND rempos.p = tokpos.p
            GROUP BY tokpos.id
        )
        SELECT toks.id AS {id_col},
               CAST(len(toks.t) AS BIGINT) AS n_tokens,
               CAST(len(toks.t) - coalesce(kept.n_kept, 0) AS BIGINT)
                   AS n_removed,
               coalesce(kept.dedup_text, '') AS dedup_text
        FROM toks LEFT JOIN kept ON kept.id = toks.id
    """
