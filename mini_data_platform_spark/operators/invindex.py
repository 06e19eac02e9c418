"""Persisted inverted index + BM25 serving lookups.

operators/ranking.py scores BM25 by SCANNING the corpus per query —
correct, and the right shape for one-off analytical ranking, but a
retrieval SERVICE answers thousands of queries against a settled corpus
and must not pay a corpus scan each time. This module is the
offline-build / online-serve split for lexical search (the Lucene
shape, reduced to its Spark-native core):

- BUILD (once): one tokenize pass over the corpus →
  * ``postings/`` — (term, id, tf, positions) rows, parquet PARTITIONED
    BY a term-hash bucket, so a query's terms prune to ≤ |terms| buckets
    at LISTING time (directory pruning; unprobed buckets are never even
    listed — the layout.py z-order/bloom discipline applied to terms).
    ``positions`` is the sorted 1-based token-offset list (the Lucene
    positional-postings shape) and feeds PHRASE queries; BM25 lookups
    never select it, so parquet column pruning keeps the scoring path's
    I/O identical to a tf-only index;
  * ``docstats/`` — (id, dl) document lengths;
  * ``invindex_meta.json`` — N and Σdl as INTEGERS (avgdl is derived at
    query time with the same float division the full scorer uses, so
    constants stay bit-identical).
- SERVE (per query): read the terms' buckets only → per-term df counts
  (|terms| scalars) → idf in Python (driver-side math.log, the
  ranking.py doctrine — ln() is the one libm call whose last ulp
  varies) → candidate docs = union of the terms' postings → per-term tf
  pivot → join docstats for dl → the SHARED ``bm25_score_expr``. Cost
  is O(matched postings), never O(corpus).

Scores are bit-identical to ``bm25_scores`` over the same corpus: tf
and dl are the same integers (a posting row is exactly
``size(filter(tokens, = term))``), the constants are the same Python
floats, and the scoring expression is literally the same code — which
is what lets the serving twin run against the full scorer's SQL oracle
restricted to candidate docs.

Documents with NO query term score exactly 0 under BM25 and emit no
posting, so the candidate restriction loses nothing — that equivalence
IS the inverted-index contract.

No reference-repo counterpart; part of the §2.8 LLM-pipeline extension
surface (retrieval/search serving).
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from mini_data_platform_spark.functions.text import tokens
from mini_data_platform_spark.operators.ranking import bm25_score_expr

META = "invindex_meta.json"
#: term-hash partition fan-out: small enough that a build's file count
#: stays sane, large enough that a few-term query prunes ~98% of the
#: postings at listing time
N_TERM_BUCKETS = 64


def _postings_from(toked: DataFrame) -> DataFrame:
    """(term, id, tf, positions, bucket) postings from a tokenized
    frame — the ONE schema build and add share, so an appended batch's
    rows are indistinguishable from a rebuild's. ``positions`` is
    1-based (SQL/DuckDB list indexing, so the phrase oracle reads
    ``tk[i]`` with no off-by-one) and array_sort'd: collect_list order
    is partition-nondeterministic, and the phrase intersection needs a
    canonical array for bit-stable plans."""
    return (
        toked.select("id", F.posexplode("_toks"))
        .groupBy(F.col("col").alias("term"), F.col("id"))
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.array_sort(F.collect_list(F.col("pos") + 1)).alias(
                "positions"
            ),
        )
        .withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(N_TERM_BUCKETS))
        )
    )


def invindex_build(
    docs: DataFrame, index_dir: str, id_col: str, text_col: str
) -> dict:
    """Build the index at ``index_dir`` (must not already hold one).
    One tokenize pass feeds both tables; the corpus never collects."""
    if os.path.exists(os.path.join(index_dir, META)):
        raise ValueError(f"index already exists at {index_dir}")
    os.makedirs(index_dir, exist_ok=True)
    toked = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_toks")
    ).persist()
    _postings_from(toked).write.partitionBy("bucket").mode(
        "overwrite"
    ).parquet(os.path.join(index_dir, "postings"))
    docstats = toked.select("id", F.size("_toks").alias("dl"))
    docstats.write.mode("overwrite").parquet(
        os.path.join(index_dir, "docstats")
    )
    row = docstats.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("dl_sum")
    ).collect()[0]
    toked.unpersist(False)
    meta = {"n": int(row["n"]), "dl_sum": int(row["dl_sum"] or 0)}
    with open(os.path.join(index_dir, META), "w", encoding="utf-8") as fh:
        json.dump(meta, fh)
    return meta


def invindex_add(
    docs: DataFrame, index_dir: str, id_col: str, text_col: str
) -> dict:
    """Append a document batch to a saved index WITHOUT rebuilding —
    O(batch): the batch's postings and docstats rows append into the
    existing tables (bucket partitioning keeps locality) and the
    integer N/Σdl meta advances. Because EVERYTHING a lookup consumes —
    tf, dl, per-term df, N, avgdl — is (re)derived from those tables and
    integers at query time, ``add`` then ``lookup`` equals a rebuild
    over the union EXACTLY, bit for bit (pinned in tests). Unlike the
    ANN indexes there is no trained state to freeze, so adds never
    degrade anything. New ids must be disjoint from indexed ids (an
    appended duplicate id would double its postings) AND from tombstoned
    ids (tombstones hide every posting for an id, so a re-added id would
    stay hidden — use a fresh id, the incremental.py terminal-id rule);
    returns the refreshed meta."""
    meta_path = os.path.join(index_dir, META)
    with open(meta_path, encoding="utf-8") as fh:
        meta = json.load(fh)
    toked = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_toks")
    ).persist()
    _postings_from(toked).write.partitionBy("bucket").mode(
        "append"
    ).parquet(os.path.join(index_dir, "postings"))
    docstats = toked.select("id", F.size("_toks").alias("dl"))
    docstats.write.mode("append").parquet(
        os.path.join(index_dir, "docstats")
    )
    row = docstats.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("dl_sum")
    ).collect()[0]
    toked.unpersist(False)
    meta = {
        "n": meta["n"] + int(row["n"]),
        "dl_sum": meta["dl_sum"] + int(row["dl_sum"] or 0),
    }
    tmp = meta_path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(meta, fh)
    os.replace(tmp, meta_path)
    return meta


def invindex_delete(
    del_ids: DataFrame, index_dir: str, id_col: str
) -> dict:
    """Retract documents from the index — the takedown path, O(delete
    set): the ids append to a ``tombstones/`` table and the integer
    corpus stats roll back by the deleted docs' recorded lengths (one
    semi-join against docstats — the postings are NOT rewritten; lookups
    filter them through the tombstone set, and physical purge is a
    rebuild's job, the incremental.py compaction split). Because df, N
    and avgdl all re-derive from live rows + adjusted integers,
    delete-then-lookup equals a rebuild over the remaining corpus
    EXACTLY (pinned in tests). Deleting an absent id is a no-op by
    construction; a re-deleted id is counted once (the tombstone scan
    deduplicates)."""
    spark = del_ids.sparkSession
    meta_path = os.path.join(index_dir, META)
    with open(meta_path, encoding="utf-8") as fh:
        meta = json.load(fh)
    ids = del_ids.select(F.col(id_col).alias("id")).distinct()
    docstats = spark.read.parquet(os.path.join(index_dir, "docstats"))
    # absent-id delete is a documented no-op — drop unknown ids BEFORE
    # the append, so repeated deletes of ids the index never held cannot
    # grow tombstones/ past what n_deleted (the _live broadcast gate's
    # measure) accounts for (round-10 advice, low): every appended row
    # is now counted in n_deleted exactly once
    ids = ids.join(docstats.select("id"), "id", "left_semi")
    tomb_path = os.path.join(index_dir, "tombstones")
    if os.path.exists(tomb_path):
        # only NEWLY-deleted docs may roll the stats back
        ids = ids.join(
            spark.read.parquet(tomb_path), "id", "left_anti"
        )
    ids = ids.persist()
    row = (
        docstats.join(ids, "id", "left_semi")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("dl_sum"))
        .collect()[0]
    )
    if int(row["n"]) > 0:
        # skip the all-absent append outright: a zero-row parquet append
        # can leave a part-less directory that later reads reject
        ids.write.mode("append").parquet(tomb_path)
    ids.unpersist(False)
    meta = {
        "n": meta["n"] - int(row["n"]),
        "dl_sum": meta["dl_sum"] - int(row["dl_sum"] or 0),
        "n_deleted": meta.get("n_deleted", 0) + int(row["n"]),
    }
    tmp = meta_path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(meta, fh)
    os.replace(tmp, meta_path)
    return meta


#: tombstone rows above which the live-filter anti-join loses its hard
#: broadcast hint (a takedown set is tiny; a bulk purge degrades to a
#: shuffle anti-join instead of OOM-ing the driver — the incremental.py
#: guard doctrine)
_TOMB_BROADCAST_MAX = 2_000_000


def _live(
    spark: SparkSession, index_dir: str, df: DataFrame, meta: dict
) -> DataFrame:
    """``df`` minus tombstoned ids — zero plan overhead for the common
    never-deleted index (no tombstones dir, no join)."""
    tomb_path = os.path.join(index_dir, "tombstones")
    if not os.path.exists(tomb_path):
        return df
    tombs = spark.read.parquet(tomb_path).distinct()
    if meta.get("n_deleted", 0) <= _TOMB_BROADCAST_MAX:
        tombs = F.broadcast(tombs)
    return df.join(tombs, "id", "left_anti")


def invindex_bm25_lookup(
    spark: SparkSession,
    index_dir: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, dl, bm25) for every document containing ≥1 query term —
    exactly ``bm25_scores``'s rows for those documents (zero-score docs
    emit no posting and are definitionally excluded). Read-only and
    idempotent; repeated lookups share the one-time build."""
    seen: dict[str, None] = {}
    for t in query_terms:
        seen.setdefault(t, None)
    terms = list(seen)
    if not terms:
        raise ValueError("invindex_bm25_lookup: empty query")
    with open(os.path.join(index_dir, META), encoding="utf-8") as fh:
        meta = json.load(fh)
    n = meta["n"]
    if n == 0:
        raise ValueError("invindex_bm25_lookup: empty corpus")
    avgdl = meta["dl_sum"] / n  # the same float division corpus_stats does

    bks = _query_buckets(spark, terms)
    postings = _live(
        spark,
        index_dir,
        spark.read.parquet(os.path.join(index_dir, "postings"))
        .where(F.col("bucket").isin(bks))  # listing-time pruning
        .where(F.col("term").isin(terms))
        # positions never selected — parquet prunes the column, so the
        # scoring path's I/O matches a tf-only index
        .select("id", "term", "tf"),
        meta,
    )
    # per-term document frequencies: |terms| scalars to the driver
    df_rows = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("_df")
    ).collect()
    dfs = {t: 0 for t in terms}
    dfs.update({r["term"]: int(r["_df"]) for r in df_rows})
    idf = {
        t: math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0) for t in terms
    }
    # candidate pivot: one row per matched doc, a tf column per term
    tf_frame = postings.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.col("term") == t, F.col("tf")).otherwise(F.lit(0))
            ).alias(f"_tf_{i}")
            for i, t in enumerate(terms)
        ]
    )
    # docstats joins INNER against live postings ids, so tombstoned docs
    # are already excluded via the postings filter; no second anti-join
    docstats = spark.read.parquet(os.path.join(index_dir, "docstats"))
    staged = tf_frame.join(docstats, "id")
    score = bm25_score_expr(terms, idf, avgdl, k1, b)
    return staged.select(F.col("id"), F.col("dl"), score.alias("bm25"))


def _query_buckets(spark: SparkSession, terms: list[str]) -> list[int]:
    """The terms' postings buckets via the SAME JVM hash the build used
    (one tiny driver job over |terms| literal rows — xxhash64 has no
    faithful Python twin, and guessing one risks silent full scans)."""
    return sorted(
        {
            r["b"]
            for r in spark.createDataFrame(
                [(t,) for t in terms], "term string"
            )
            .select(
                F.pmod(F.xxhash64("term"), F.lit(N_TERM_BUCKETS)).alias("b")
            )
            .collect()
        }
    )


def invindex_phrase_lookup(
    spark: SparkSession, index_dir: str, phrase: list[str]
) -> DataFrame:
    """(id, n_hits) for every live document containing the EXACT
    consecutive token sequence ``phrase``, n_hits = occurrence count —
    the positional-postings query BM25's bag-of-words scoring cannot
    answer (Lucene's PhraseQuery shape). Plan: the phrase's distinct
    terms prune to ≤|terms| of the 64 buckets at listing time, then ONE
    hash aggregate on id pivots each phrase offset's position list
    shifted by its offset (pos − i), and a document matches where the k
    shifted lists intersect — ``array_intersect`` over per-doc arrays,
    all JVM expressions, zero Python, cost O(matched postings) like the
    BM25 path. A document missing ANY phrase term leaves that offset's
    pivot NULL, the intersection NULL, and the row filtered — exactly
    the semantics (every term must appear). Repeated phrase terms work
    per-offset: each offset shifts the same posting row's positions by
    its own i, so "a b a" requires pos p, p+1, p+2 with t[p]=t[p+2]=a."""
    if not phrase:
        raise ValueError("invindex_phrase_lookup: empty phrase")
    with open(os.path.join(index_dir, META), encoding="utf-8") as fh:
        meta = json.load(fh)
    distinct_terms = list(dict.fromkeys(phrase))
    bks = _query_buckets(spark, distinct_terms)
    postings = _live(
        spark,
        index_dir,
        spark.read.parquet(os.path.join(index_dir, "postings"))
        .where(F.col("bucket").isin(bks))  # listing-time pruning
        .where(F.col("term").isin(distinct_terms))
        .select("id", "term", "positions"),
        meta,
    )
    def _shift(off: int):
        # single-arg lambda ON PURPOSE: a 2-arg transform lambda is
        # (element, array_index) in PySpark — a `lambda p, i=i:`
        # closure trick would silently receive the array index as i
        return lambda p: p - F.lit(off)

    staged = postings.groupBy("id").agg(
        *[
            F.first(
                F.when(
                    F.col("term") == t,
                    F.transform("positions", _shift(i)),
                ),
                ignorenulls=True,
            ).alias(f"_p{i}")
            for i, t in enumerate(phrase)
        ]
    )
    inter = F.col("_p0")
    for i in range(1, len(phrase)):
        inter = F.array_intersect(inter, F.col(f"_p{i}"))
    return staged.select(
        "id", F.size(inter).alias("n_hits")
    ).where(F.col("n_hits") > 0)


def invindex_compact(spark: SparkSession, index_dir: str) -> dict:
    """Physically purge tombstoned documents: rewrite ``postings/`` and
    ``docstats/`` minus the tombstone set and drop ``tombstones/`` —
    the rebuild half of the incremental.py tombstone/compaction split.
    Lookups before and after are BIT-IDENTICAL (pinned in tests): the
    live row set, the integer N/Σdl, and hence every folded constant
    are unchanged — compaction trades a one-time full rewrite for
    removing the per-lookup anti-join and the dead bytes takedowns left
    behind. No-op (and cheap) when nothing was ever deleted.

    Single-writer, like add/delete: the rewrite stages into fresh
    directories and publishes with two ``os.replace``-style renames; a
    reader holding the OLD DataFrames may fail mid-swap — run compaction
    in the same maintenance window rebuilds already need."""
    import shutil

    meta_path = os.path.join(index_dir, META)
    with open(meta_path, encoding="utf-8") as fh:
        meta = json.load(fh)
    tomb_path = os.path.join(index_dir, "tombstones")
    if not os.path.exists(tomb_path):
        return meta
    tombs = spark.read.parquet(tomb_path).distinct()
    if meta.get("n_deleted", 0) <= _TOMB_BROADCAST_MAX:
        tombs = F.broadcast(tombs)
    for table in ("postings", "docstats"):
        cur = os.path.join(index_dir, table)
        staging = cur + ".compact"
        shutil.rmtree(staging, ignore_errors=True)
        live = spark.read.parquet(cur).join(tombs, "id", "left_anti")
        writer = live.write.mode("overwrite")
        if table == "postings":
            writer = writer.partitionBy("bucket")
        writer.parquet(staging)
        old = cur + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(cur, old)
        os.rename(staging, cur)
        shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tomb_path, ignore_errors=True)
    meta = {
        "n": meta["n"],
        "dl_sum": meta["dl_sum"],
        "n_deleted": 0,
        "n_compactions": meta.get("n_compactions", 0) + 1,
    }
    tmp = meta_path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(meta, fh)
    os.replace(tmp, meta_path)
    return meta
