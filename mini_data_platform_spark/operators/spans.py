"""Window-level (substring) duplication — the dedup class BETWEEN
exact-hash and doc-level near-dup.

Doc-level dedup (exact sha2, MinHash/LSH) misses the dominant real-world
contamination mode: two mostly-different documents sharing a long
verbatim SPAN (boilerplate headers, license blocks, quoted passages,
templated paragraphs). Lee et al., "Deduplicating Training Data Makes
Language Models Better" (ACL 2022), dedup at the substring level with a
suffix array; the distributed approximation used at corpus scale is
WINDOW HASHING: slide a fixed window of ``window`` tokens with stride
``stride`` over every document, hash each window, and count cross-corpus
repeats. A window hash seen n ≥ 2 times marks a verbatim (window-sized)
shared span; the per-document duplicated-window FRACTION is the
curation signal (drop/trim documents dominated by repeated spans).

Spark shape — two shuffles, everything JVM-side:
1. tokenize → window starts (``sequence`` by stride) → ``transform`` +
   ``slice`` + md5 → explode: one projection per row, no shuffle;
2. ``groupBy(window_hash).count()`` — map-side partial aggregation
   collapses each partition's repeated windows before the shuffle, so
   network carries (hash, partial_count), not windows;
3. join counts back to the exploded windows (shuffle keyed by hash) and
   re-aggregate per document.
Hot hashes (corpus-wide boilerplate) are bounded aggregation state, not
a join fan-out: counts are one row per distinct hash. The 64-bit slice
of md5 keeps hash traffic to 8 bytes + the doc id.

Engine-independent (whitespace tokens, md5), so the DuckDB oracle
reproduces the table exactly.

No reference-repo counterpart (the reference — see SURVEY.md — is an
ingest/clean/upsert pipeline with no text analytics); part of the
§2.8 LLM-pipeline extension surface mandated by the driver brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mini_data_platform_spark.functions.text import tokens


def _windows(df: DataFrame, id_col: str, text_col: str, window: int, stride: int):
    """(id, window_hash) — one row per stride-aligned window of
    ``window`` tokens (tail windows shorter than ``window`` are NOT
    emitted: a partial window is not the same span)."""
    toked = df.where(F.trim(F.col(text_col)) != "").select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )
    n = F.size("_toks")
    # starts: 0, stride, ... while start + window <= n
    n_win = F.greatest(
        F.floor((n - F.lit(window)) / F.lit(stride)) + 1, F.lit(0)
    )
    return (
        toked.where(n >= window)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_win.cast("int") - 1),
                    lambda k: F.md5(
                        F.concat_ws(
                            " ", F.slice(F.col("_toks"), k * stride + 1, window)
                        )
                    ),
                )
            ).alias("window_hash"),
        )
    )


def doc_window_overlap(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 16,
    stride: int = 8,
) -> DataFrame:
    """Per-document span-duplication profile: (id, n_windows,
    n_dup_windows, dup_frac) where a window is "dup" when its hash
    occurs anywhere else in the corpus (including elsewhere in the SAME
    document — internal repetition is contamination too). Documents
    shorter than one window report 0 windows and fraction 0.0.

    The standard curation use: filter or down-weight documents whose
    ``dup_frac`` exceeds a threshold — doc-level near-dup keeps them
    because MOST of their content differs, while their shared spans
    still leak verbatim text into training."""
    wins = _windows(df, id_col, text_col, window, stride)
    counts = wins.groupBy("window_hash").agg(
        F.count("*").alias("_n_occ")
    )
    per_doc = (
        wins.join(counts, "window_hash")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_windows"),
            F.sum(F.when(F.col("_n_occ") >= 2, 1).otherwise(0)).alias(
                "n_dup_windows"
            ),
        )
    )
    base = df.select(F.col(id_col)).distinct()
    return (
        base.join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_windows"), F.lit(0)).alias("n_windows"),
            F.coalesce(F.col("n_dup_windows"), F.lit(0)).alias(
                "n_dup_windows"
            ),
            (
                F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("double")
                / F.greatest(
                    F.coalesce(F.col("n_windows"), F.lit(0)), F.lit(1)
                ).cast("double")
            ).alias("dup_frac"),
        )
    )


def sql_doc_window_overlap(
    src: str, id_expr: str, text_expr: str, window: int = 16, stride: int = 8
) -> str:
    """DuckDB twin of :func:`doc_window_overlap`."""
    toks = f"string_split_regex(trim({text_expr}), ' +')"
    return f"""
        WITH toked AS (
            SELECT {id_expr}, {toks} AS t, len({toks}) AS n
            FROM ({src})
            WHERE trim({text_expr}) <> ''
        ),
        wins AS (
            SELECT {id_expr},
                   md5(array_to_string(
                       t[CAST(k * {stride} + 1 AS BIGINT):CAST(k * {stride} + {window} AS BIGINT)],
                       ' ')) AS window_hash
            FROM toked,
                 unnest(range(CAST(greatest(
                     floor((n - {window}) / CAST({stride} AS DOUBLE)) + 1, 0
                 ) AS BIGINT))) AS u(k)
            WHERE n >= {window}
        ),
        counts AS (
            SELECT window_hash, COUNT(*) AS n_occ FROM wins GROUP BY 1
        ),
        per_doc AS (
            SELECT w.{id_expr},
                   COUNT(*) AS n_windows,
                   CAST(SUM(CASE WHEN c.n_occ >= 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_dup_windows
            FROM wins w JOIN counts c USING (window_hash)
            GROUP BY 1
        )
        SELECT s.{id_expr},
               COALESCE(p.n_windows, 0) AS n_windows,
               COALESCE(p.n_dup_windows, 0) AS n_dup_windows,
               CAST(COALESCE(p.n_dup_windows, 0) AS DOUBLE)
               / CAST(greatest(COALESCE(p.n_windows, 0), 1) AS DOUBLE)
                   AS dup_frac
        FROM (SELECT DISTINCT {id_expr} FROM ({src})) s
        LEFT JOIN per_doc p USING ({id_expr})
    """


# ------------------------------------------------- content-defined spans

def content_defined_segments(
    df: DataFrame,
    id_col: str,
    text_col: str,
    avg_tokens: int = 8,
    min_tokens: int = 4,
) -> DataFrame:
    """(id, seg_id, seg_hash, n_seg_tokens) — split each document at
    CONTENT-DEFINED anchors: a token t is a boundary when
    ``md5('cdc#' || t) % avg_tokens == 0`` (expected segment length ≈
    ``avg_tokens``). Because anchors depend only on token VALUES, a span
    shared by two documents produces identical segments REGARDLESS of
    its position — the shift-invariance fixed-stride windows lack (the
    same trick as content-defined chunking in dedup storage: Muthitacharoen
    et al., "A Low-Bandwidth Network File System", SOSP 2001). Segments
    shorter than ``min_tokens`` are emitted but flagged by length so the
    overlap stage can ignore noise-sized matches.

    Shape: posexplode tokens → boundary flag (pure projection) → running
    anchor count AS the segment id (window partitioned by doc — ONE
    shuffle keyed by doc id; per-doc state only, giant single documents
    are the skew edge and would be pre-split upstream) → groupBy (doc,
    seg) to reassemble each segment's text and hash it."""
    from pyspark.sql import Window

    toked = df.where(F.trim(F.col(text_col)) != "").select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "tok")
    )
    is_anchor = (
        F.conv(F.substring(F.md5(F.concat(F.lit("cdc#"), F.col("tok"))), 1, 4), 16, 10)
        .cast("bigint") % avg_tokens == 0
    ).cast("int")
    w = Window.partitionBy(id_col).orderBy("pos")
    seg = toked.withColumn("_seg", F.sum(is_anchor).over(w))
    return (
        seg.groupBy(id_col, F.col("_seg").alias("seg_id"))
        .agg(
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "tok"))
                        ),
                        lambda s: s["tok"],
                    ),
                )
            ).alias("seg_hash"),
            F.count("*").alias("n_seg_tokens"),
        )
    )


def doc_segment_overlap(
    df: DataFrame,
    id_col: str,
    text_col: str,
    avg_tokens: int = 8,
    min_tokens: int = 4,
) -> DataFrame:
    """Shift-invariant span-duplication profile: (id, n_segments,
    n_dup_segments, dup_frac) over content-defined segments of ≥
    ``min_tokens`` tokens; a segment is "dup" when its hash occurs in
    ANOTHER document (cross-document sharing — the training-leakage
    signal; use :func:`doc_window_overlap` when internal repetition
    should count too)."""
    segs = content_defined_segments(df, id_col, text_col, avg_tokens, min_tokens)
    sized = segs.where(F.col("n_seg_tokens") >= min_tokens)
    counts = sized.groupBy("seg_hash").agg(
        F.countDistinct(id_col).alias("_n_docs")
    )
    per_doc = (
        sized.join(counts, "seg_hash")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_segments"),
            F.sum(F.when(F.col("_n_docs") >= 2, 1).otherwise(0)).alias(
                "n_dup_segments"
            ),
        )
    )
    base = df.select(F.col(id_col)).distinct()
    return base.join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_segments"), F.lit(0)).alias("n_segments"),
        F.coalesce(F.col("n_dup_segments"), F.lit(0)).alias("n_dup_segments"),
        (
            F.coalesce(F.col("n_dup_segments"), F.lit(0)).cast("double")
            / F.greatest(
                F.coalesce(F.col("n_segments"), F.lit(0)), F.lit(1)
            ).cast("double")
        ).alias("dup_frac"),
    )


def sql_doc_segment_overlap(
    src: str, id_expr: str, text_expr: str, avg_tokens: int = 8, min_tokens: int = 4
) -> str:
    """DuckDB twin of :func:`doc_segment_overlap` (same md5-anchor rule,
    window running-sum segmentation)."""
    toks = f"string_split_regex(trim({text_expr}), ' +')"
    from mini_data_platform_spark.operators.corpus import _HEX

    anchor = (
        "CASE WHEN ("
        + " + ".join(
            f"(strpos('{_HEX}', substr(md5('cdc#' || tok), {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
            for i in range(4)
        )
        + f") % {avg_tokens} = 0 THEN 1 ELSE 0 END"
    )
    return f"""
        WITH toked AS (
            SELECT {id_expr},
                   t[CAST(u.i + 1 AS BIGINT)] AS tok,
                   u.i + 1 AS pos
            FROM (
                SELECT {id_expr}, {toks} AS t FROM ({src})
                WHERE trim({text_expr}) <> ''
            ), unnest(range(len(t))) AS u(i)
        ),
        seg AS (
            SELECT {id_expr}, tok, pos,
                   SUM({anchor}) OVER (
                       PARTITION BY {id_expr} ORDER BY pos
                   ) AS seg_id
            FROM toked
        ),
        segs AS (
            SELECT {id_expr}, seg_id,
                   md5(string_agg(tok, ' ' ORDER BY pos)) AS seg_hash,
                   COUNT(*) AS n_seg_tokens
            FROM seg GROUP BY 1, 2
        ),
        sized AS (SELECT * FROM segs WHERE n_seg_tokens >= {min_tokens}),
        counts AS (
            SELECT seg_hash, COUNT(DISTINCT {id_expr}) AS n_docs
            FROM sized GROUP BY 1
        ),
        per_doc AS (
            SELECT s.{id_expr},
                   COUNT(*) AS n_segments,
                   CAST(SUM(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_dup_segments
            FROM sized s JOIN counts c USING (seg_hash)
            GROUP BY 1
        )
        SELECT b.{id_expr},
               COALESCE(p.n_segments, 0) AS n_segments,
               COALESCE(p.n_dup_segments, 0) AS n_dup_segments,
               CAST(COALESCE(p.n_dup_segments, 0) AS DOUBLE)
               / CAST(greatest(COALESCE(p.n_segments, 0), 1) AS DOUBLE)
                   AS dup_frac
        FROM (SELECT DISTINCT {id_expr} FROM ({src})) b
        LEFT JOIN per_doc p USING ({id_expr})
    """
