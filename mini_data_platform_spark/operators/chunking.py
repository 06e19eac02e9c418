"""Document chunking — sliding-window token chunks for training/RAG.

The counterpart of sequence packing (operators/packing.py): packing lays
concatenated documents into fixed token budgets; chunking SPLITS each
long document into overlapping windows (context windows for pretraining
shards, passage windows for retrieval corpora). Per document with n
tokens, chunk k covers tokens [k·stride, k·stride + chunk_tokens) for
stride = chunk_tokens − overlap and k in [0, ceil((n − overlap) /
stride)) — the MINIMAL cover: every token belongs to ≥ 1 chunk,
consecutive chunks share ``overlap`` tokens, no chunk's content lies
entirely inside its predecessor, and a document shorter than one chunk
yields exactly one chunk.

Spark shape: ONE projection — tokenize, build the chunk index range
(``sequence``), slice per index (``transform`` + ``slice``), explode.
All JVM array expressions inside whole-stage codegen; zero shuffle, zero
Python — chunking runs at scan speed at any corpus size, which is the
entire design (a groupBy or window formulation would shuffle the corpus
to do per-row arithmetic).

Engine-independent semantics (whitespace tokens, arithmetic on counts)
make the DuckDB oracle exact: list slicing + range unnest reproduce the
chunk table row-for-row.

No reference-repo counterpart (the reference — see SURVEY.md — is an
ingest/clean/upsert pipeline with no text analytics); part of the
§2.8 LLM-pipeline extension surface mandated by the driver brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mini_data_platform_spark.functions.text import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int,
    overlap: int = 0,
) -> DataFrame:
    """(id, chunk_id, chunk_text, n_chunk_tokens) per sliding window of
    ``chunk_tokens`` whitespace tokens advancing by ``chunk_tokens -
    overlap``. Documents with zero tokens yield no rows (nothing to
    train on); ``0 ≤ overlap < chunk_tokens`` is enforced."""
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    stride = chunk_tokens - overlap
    # empty/null docs yield no rows — filtered explicitly because
    # split('') is [''] (one empty token) in Spark AND DuckDB, an
    # artifact neither side should chunk
    toked = df.where(F.trim(F.col(text_col)) != "").select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )
    n = F.size("_toks")
    # number of chunks: ceil((n - overlap) / stride), at least 1 (a doc
    # shorter than one chunk is one chunk)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1)
    )
    chunks = toked.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks.cast("int") - 1),
                lambda k: F.struct(
                    k.alias("chunk_id"),
                    F.slice(
                        F.col("_toks"), k * stride + 1, chunk_tokens
                    ).alias("_ct"),
                ),
            )
        ).alias("c"),
    )
    return chunks.select(
        F.col(id_col),
        F.col("c.chunk_id").alias("chunk_id"),
        F.concat_ws(" ", F.col("c._ct")).alias("chunk_text"),
        F.size("c._ct").alias("n_chunk_tokens"),
    )


def sql_chunk_documents(
    src: str, id_expr: str, text_expr: str, chunk_tokens: int, overlap: int = 0
) -> str:
    """DuckDB twin of :func:`chunk_documents` (1-indexed list slicing)."""
    stride = chunk_tokens - overlap
    toks = f"string_split_regex(trim({text_expr}), ' +')"
    return f"""
        WITH toked AS (
            SELECT {id_expr}, {toks} AS t,
                   len({toks}) AS n
            FROM ({src})
            WHERE trim({text_expr}) <> ''
        ),
        idx AS (
            SELECT {id_expr}, t,
                   unnest(range(CAST(greatest(
                       ceil((n - {overlap}) / CAST({stride} AS DOUBLE)), 1
                   ) AS BIGINT))) AS chunk_id
            FROM toked
        )
        SELECT {id_expr},
               chunk_id,
               array_to_string(
                   t[CAST(chunk_id * {stride} + 1 AS BIGINT):CAST(chunk_id * {stride} + {chunk_tokens} AS BIGINT)],
                   ' ') AS chunk_text,
               len(t[CAST(chunk_id * {stride} + 1 AS BIGINT):CAST(chunk_id * {stride} + {chunk_tokens} AS BIGINT)])
                   AS n_chunk_tokens
        FROM idx
    """
