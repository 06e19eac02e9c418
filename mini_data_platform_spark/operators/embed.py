"""Feature-hashing document representation (the 'hashing trick') — a
model-free document embedding for the LLM-data-pipeline surface: each
token hashes to one of ``dim`` buckets and the document becomes its
bucket-count vector. Deterministic, vocabulary-free, and streamable —
the standard cheap featurization for near-dup triage, clustering, and
drift monitoring before any learned embedding exists.

Spark-first shape: explode tokens (narrow), md5-derived bucket (codegen'd
JVM hash — md5 is the engine-independent hash this repo standardizes on
for oracle parity, see operators/dedup_fuzzy.py), one conditional-count
aggregate per doc (single shuffle, map-side combine). Buckets are the
first hex nibble(s) of md5, so DuckDB reproduces them byte-for-byte.

Scale: cost is |tokens| explode rows + one groupBy(doc_id) — the same
profile as the MinHash signature pass, scan-dominated at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mini_data_platform_spark.functions import text as TX

HEX = "0123456789abcdef"


def hash_embed(
    df: DataFrame, id_col: str, text_col: str, dim: int = 16
) -> DataFrame:
    """Per-document token-hash count vector as ``dim`` integer columns
    ``h_<bucket>``. ``dim`` must be 16 or 256 (one or two md5 hex chars —
    keeping the bucket a hex prefix is what makes it exactly reproducible
    in any engine with md5). Empty documents embed as all-zeros."""
    if dim == 16:
        width = 1
    elif dim == 256:
        width = 2
    else:
        raise ValueError("dim must be 16 or 256 (md5 hex-prefix buckets)")
    buckets = (
        HEX if width == 1 else [a + b for a in HEX for b in HEX]
    )
    ex = (
        df.select(F.col(id_col), F.explode(TX.tokens(F.col(text_col))).alias("_tok"))
        .filter(F.length("_tok") > 0)
        .withColumn("_bkt", F.substring(F.md5(F.col("_tok")), 1, width))
    )
    counts = ex.groupBy(id_col).agg(
        *[
            F.count(F.when(F.col("_bkt") == b, 1)).alias(f"h_{b}")
            for b in buckets
        ]
    )
    # keep empty docs (no tokens -> no exploded rows) as zero vectors
    return df.select(id_col).join(counts, id_col, "left").select(
        F.col(id_col),
        *[F.coalesce(F.col(f"h_{b}"), F.lit(0)).alias(f"h_{b}") for b in buckets],
    )


def sql_hash_embed(table: str, id_col: str, text_col: str, dim: int = 16) -> str:
    """DuckDB twin of :func:`hash_embed` (same bucket definition)."""
    if dim == 16:
        width, buckets = 1, list(HEX)
    elif dim == 256:
        width, buckets = 2, [a + b for a in HEX for b in HEX]
    else:
        raise ValueError("dim must be 16 or 256")
    cols = ",\n               ".join(
        f"COUNT(CASE WHEN bkt = '{b}' THEN 1 END) AS h_{b}" for b in buckets
    )
    zeros = ",\n               ".join(
        f"COALESCE(h_{b}, 0) AS h_{b}" for b in buckets
    )
    return f"""
        WITH ex AS (
            SELECT {id_col}, substr(md5(u.t), 1, {width}) AS bkt
            FROM {table}, unnest({TX.sql_tokens(text_col)}) AS u(t)
            WHERE length(u.t) > 0
        ),
        counts AS (
            SELECT {id_col},
               {cols}
            FROM ex GROUP BY 1
        )
        SELECT d.{id_col},
               {zeros}
        FROM {table} d LEFT JOIN counts USING ({id_col})
    """
