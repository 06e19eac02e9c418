"""Incremental near-duplicate dedup — new batch vs existing corpus,
without recomputing the corpus.

The batch pipeline (operators/dedup_fuzzy.near_dup_pairs) re-shingles
and re-signs the WHOLE corpus on every run. A production training corpus
ingests in batches: deduping batch N+1 against N batches of history must
not re-read 100 TB of settled text. This module is the batch/restartable
twin of streaming/neardup.py's TTL state (round-6 verdict item 1): the
LSH band-bucket table IS the index — persist it once, join each new
batch against it.

Index layout under ``index_dir`` (parquet + one JSON meta file):

- ``meta.json`` — the LSH hyperparameters (num_hashes, bands, shingle_n,
  threshold) plus id/text column names and running doc/batch counts.
  Signatures from different hyperparameters are incomparable, so the
  increment path always reads its parameters from here, never from
  arguments — an index can only ever be queried the way it was built.
- ``buckets/`` — (id, band_id, band_key): the stacked band-key frame
  (dedup_fuzzy.lsh_band_keys) of every indexed doc. Appended per batch.
- ``docs/`` — (id, text) of every indexed doc, appended per batch; read
  ONLY candidate-bounded (broadcast semi-join on candidate ids) for
  exact-Jaccard verification.
- ``pairs/batch=N/`` — each increment's verified output, written before
  the index is appended (see below) and returned as a parquet read, so
  an increment's result is durable and re-readable after restart.

Scale shape of one increment (new batch b against corpus C):

- signature + band keys for b only — one scan of b, no touch of C;
- new-vs-corpus candidates: ``buckets ⋈ broadcast(b_bands)`` on
  (band_id, band_key) — the corpus-sized side streams map-side against a
  broadcast of the batch-sized side: ZERO shuffle of the index;
- new-vs-new candidates: the ordinary LSH self-join within b;
- verification: exact shingle Jaccard over candidate docs only — the
  corpus text is read through a broadcast semi-join on candidate ids
  (parquet row-group pruning applies), so settled non-candidate text is
  never deserialized, let alone re-shingled;
- append: b's band keys and text append to ``buckets``/``docs`` so the
  NEXT increment sees them. The verified pairs are materialized BEFORE
  the append — the returned plan must never read its own batch from the
  "corpus" side.

Correctness contract (the driver-level equivalence oracle,
plans/llm.doc_neardup_incremental): for any split of a corpus into
batches, the union of every increment's pairs plus the within-batch-1
pairs equals the full-corpus ``near_dup_pairs`` recompute EXACTLY —
pair-for-pair, jaccard-for-jaccard. Pairs partition cleanly because
every pair has a unique earliest-batch member: (old,old) pairs come from
earlier rounds, (new,old) from the corpus join, (new,new) from the self
join. Dedup POLICY (survivors, clusters) stays downstream of the pairs,
exactly as in the batch pipeline — which is what makes the equivalence
exact rather than "incremental-flavored" (greedy drop-on-match would
diverge from full-recompute clustering on chains that span batches).

Restartability: each increment's verified pairs land in
``pairs/batch=N`` (overwrite mode) BEFORE the index appends, so a crash
before the appends is retryable as-is — rerun the increment and the
same batch number is recomputed and rewritten. A crash BETWEEN the two
appends (bucket table written, doc table not, or vice versa) leaves the
index inconsistent; that window is one parquet commit wide, and closing
it fully needs a transactional table format (Delta/Iceberg — whose
commit log is exactly this) rather than plain parquet dirs. Production
deployments should point the index at such a format; the operator logic
is unchanged.

No reference-repo counterpart (the reference ingests files, it has no
similarity ops); part of the §2.8 LLM-pipeline extension surface.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from mini_data_platform_spark.operators.dedup_fuzzy import (
    _staged_shingles,
    jaccard_pairs_from,
    lsh_band_keys,
    lsh_candidate_pairs,
    minhash_signatures_from,
)

_META = "meta.json"
_BUCKETS = "buckets"
_DOCS = "docs"
_PAIRS = "pairs"


def _read_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, _META), encoding="utf-8") as f:
        return json.load(f)


def _write_meta(index_dir: str, meta: dict) -> None:
    tmp = os.path.join(index_dir, _META + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, _META))


def neardup_index_build(
    docs: DataFrame,
    index_dir: str,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int | None = None,
) -> dict:
    """Create a near-dup index over ``docs`` at ``index_dir`` (must not
    already hold an index). Writes the band-bucket table and the doc text
    table; records the LSH hyperparameters in ``meta.json``. Returns the
    meta dict.

    Build does NOT emit within-corpus pairs — run the batch
    ``near_dup_pairs`` once over the initial corpus if those are needed
    (they are disjoint from every increment's output)."""
    if os.path.exists(os.path.join(index_dir, _META)):
        raise ValueError(f"index already exists at {index_dir}")
    os.makedirs(index_dir, exist_ok=True)
    base = docs.select(
        F.col(id_col).alias("id"), F.col(text_col).cast("string").alias("text")
    ).persist()
    sigs = minhash_signatures_from(
        _staged_shingles(base, "id", "text", shingle_n), "id", num_hashes
    )
    lsh_band_keys(sigs, "id", num_hashes, bands).write.parquet(
        os.path.join(index_dir, _BUCKETS)
    )
    base.write.parquet(os.path.join(index_dir, _DOCS))
    n_docs = base.count()
    base.unpersist(False)
    meta = {
        "id_col": id_col,
        "text_col": text_col,
        "threshold": threshold,
        "num_hashes": num_hashes,
        "bands": bands,
        "shingle_n": shingle_n,
        "max_bucket": max_bucket,
        "n_docs": n_docs,
        "n_batches": 1,
    }
    _write_meta(index_dir, meta)
    return meta


def neardup_index_increment(
    new_docs: DataFrame,
    index_dir: str,
) -> DataFrame:
    """Dedup a new batch against the indexed corpus: returns every
    verified near-dup pair INVOLVING the new batch — (id_a, id_b,
    jaccard) with id_a < id_b, covering new-vs-corpus and new-vs-new —
    then appends the batch to the index so the next increment sees it.

    All hyperparameters come from the index's ``meta.json`` (an index is
    only ever queried the way it was built). The result is materialized
    to ``pairs/batch=N/`` BEFORE the index append and returned as a
    parquet read: durable across restarts, and structurally incapable of
    seeing its own batch on the corpus side.

    New-batch ids must be disjoint from indexed ids (checked against the
    running count only at meta level; id collisions produce degenerate
    self-pairs which are filtered, but don't do that)."""
    meta = _read_meta(index_dir)
    id_col, text_col = meta["id_col"], meta["text_col"]
    num_hashes, bands = meta["num_hashes"], meta["bands"]
    shingle_n, threshold = meta["shingle_n"], meta["threshold"]
    max_bucket = meta.get("max_bucket")
    spark: SparkSession = new_docs.sparkSession

    batch = new_docs.select(
        F.col(id_col).alias("id"), F.col(text_col).cast("string").alias("text")
    ).persist()
    shingled_new = _staged_shingles(batch, "id", "text", shingle_n).persist()
    sigs_new = minhash_signatures_from(shingled_new, "id", num_hashes)
    bands_new = lsh_band_keys(sigs_new, "id", num_hashes, bands).persist()

    # new-vs-corpus: stream the corpus-sized bucket table against a
    # BROADCAST of the batch's band keys — no shuffle of the index, no
    # re-signing of the corpus
    buckets_old = spark.read.parquet(os.path.join(index_dir, _BUCKETS))
    if max_bucket is not None:
        # hot-bucket cap with FULL-corpus semantics: a bucket's size is
        # its OLD occupancy + the batch's — the same total the batch
        # pipeline's max_bucket sees, so capped-incremental ≡ capped-
        # recompute. Old occupancy is counted only for buckets the batch
        # touches (semi-filter first — cost ∝ matched buckets, never the
        # index), and the count aggregate's shuffle carries one row per
        # matched bucket.
        new_keys = bands_new.select("band_id", "band_key").distinct()
        old_sizes = (
            buckets_old.join(
                F.broadcast(new_keys), ["band_id", "band_key"], "left_semi"
            )
            .groupBy("band_id", "band_key")
            .agg(F.count("*").alias("_n_old"))
        )
        new_sizes = bands_new.groupBy("band_id", "band_key").agg(
            F.count("*").alias("_n_new")
        )
        ok_buckets = (
            new_sizes.join(old_sizes, ["band_id", "band_key"], "left")
            .where(
                F.coalesce(F.col("_n_old"), F.lit(0)) + F.col("_n_new")
                <= max_bucket
            )
            .select("band_id", "band_key")
            .persist()
        )
        bands_eff = bands_new.join(
            F.broadcast(ok_buckets), ["band_id", "band_key"], "left_semi"
        )
    else:
        ok_buckets = None
        bands_eff = bands_new
    cand_cross = (
        buckets_old.alias("o")
        .join(
            F.broadcast(bands_eff).alias("n"),
            (F.col("o.band_id") == F.col("n.band_id"))
            & (F.col("o.band_key") == F.col("n.band_key"))
            & (F.col("o.id") != F.col("n.id")),
        )
        .select(
            F.least(F.col("o.id"), F.col("n.id")).alias("id_a"),
            F.greatest(F.col("o.id"), F.col("n.id")).alias("id_b"),
        )
        .distinct()
    )
    # new-vs-new: the ordinary within-batch LSH self-join over the same
    # surviving buckets
    if ok_buckets is not None:
        nn_a = bands_eff.select(
            F.col("id").alias("id_a"), "band_id", "band_key"
        )
        nn_b = bands_eff.select(
            F.col("id").alias("id_b"), "band_id", "band_key"
        )
        cand_self = (
            nn_a.join(nn_b, ["band_id", "band_key"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
    else:
        cand_self = lsh_candidate_pairs(sigs_new, "id", num_hashes, bands)
    cands = cand_cross.unionByName(cand_self).distinct().persist()

    # verification shingles: the new batch's are already staged; the
    # corpus side re-shingles CANDIDATE docs only (broadcast semi-join on
    # the bounded candidate id set — settled text stays untouched)
    cand_ids = (
        cands.select(F.col("id_a").alias("id"))
        .unionByName(cands.select(F.col("id_b").alias("id")))
        .distinct()
    )
    docs_old = spark.read.parquet(os.path.join(index_dir, _DOCS))
    involved_old = docs_old.join(F.broadcast(cand_ids), "id", "left_semi")
    shingled_old = _staged_shingles(involved_old, "id", "text", shingle_n)
    shingled_all = shingled_new.unionByName(shingled_old)

    verified = (
        jaccard_pairs_from(shingled_all, cands, "id")
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )

    # materialize pairs BEFORE appending the batch to the index
    batch_no = meta["n_batches"]
    pairs_path = os.path.join(index_dir, _PAIRS, f"batch={batch_no}")
    verified.write.mode("overwrite").parquet(pairs_path)

    bands_new.write.mode("append").parquet(os.path.join(index_dir, _BUCKETS))
    batch.write.mode("append").parquet(os.path.join(index_dir, _DOCS))
    n_new = batch.count()

    for frame in (cands, bands_new, shingled_new, batch):
        frame.unpersist(False)
    if ok_buckets is not None:
        ok_buckets.unpersist(False)

    meta["n_docs"] = meta["n_docs"] + n_new
    meta["n_batches"] = batch_no + 1
    _write_meta(index_dir, meta)

    out = spark.read.parquet(pairs_path)
    return out.select(
        F.col("id_a").alias("id_a"),
        F.col("id_b").alias("id_b"),
        F.col("jaccard").alias("jaccard"),
    )


# ------------------------------------------------------- exact-hash index

_HASHES = "hashes"


def exact_index_build(
    docs: DataFrame,
    index_dir: str,
    id_col: str,
    text_col: str,
) -> dict:
    """Create an EXACT-dedup index (content-hash table) over ``docs`` at
    ``index_dir`` — the cheap first stage every corpus pipeline runs
    before near-dup: a new batch's exact copies of settled text are
    dropped by one hash join, no shingling at all. Stores
    (content_hash, id) per doc (sha2-256 over the normalized text, the
    same canonicalization as ``dedup_fuzzy.exact_dedup``). The index is
    hash+id only — corpus text is never stored or re-read here."""
    from mini_data_platform_spark.functions.text import normalize_text

    if os.path.exists(os.path.join(index_dir, _META)):
        raise ValueError(f"index already exists at {index_dir}")
    os.makedirs(index_dir, exist_ok=True)
    hashed = docs.select(
        F.sha2(normalize_text(F.col(text_col)), 256).alias("content_hash"),
        F.col(id_col).alias("id"),
    )
    hashed.write.parquet(os.path.join(index_dir, _HASHES))
    meta = {
        "kind": "exact",
        "id_col": id_col,
        "text_col": text_col,
        "n_docs": hashed.count(),
        "n_batches": 1,
    }
    _write_meta(index_dir, meta)
    return meta


def exact_index_increment(
    new_docs: DataFrame,
    index_dir: str,
) -> DataFrame:
    """Exact-dedup a new batch against the indexed corpus: returns
    (id, content_hash, dup_of) for EVERY new doc — ``dup_of`` is the
    smallest indexed-or-batch id sharing the content hash (itself when
    the doc is the first of its content), so surviving docs are the rows
    with ``dup_of = id``. Appends the batch's hashes to the index.

    Scale shape: hash the batch (one scan, no shuffle), join against the
    hash table on content_hash — the corpus side carries 64-byte hashes
    + ids, never text, and only hash-equal rows survive the join. The
    result is materialized to ``pairs/batch=N`` before the append (same
    no-self-reading discipline as the near-dup increment)."""
    from mini_data_platform_spark.functions.text import normalize_text

    meta = _read_meta(index_dir)
    if meta.get("kind") != "exact":
        raise ValueError(f"{index_dir} is not an exact-dedup index")
    id_col, text_col = meta["id_col"], meta["text_col"]
    spark: SparkSession = new_docs.sparkSession

    batch = new_docs.select(
        F.sha2(
            normalize_text(F.col(text_col).cast("string")), 256
        ).alias("content_hash"),
        F.col(id_col).alias("id"),
    ).persist()

    old = spark.read.parquet(os.path.join(index_dir, _HASHES))
    # min indexed id per hash, but ONLY for hashes present in the batch
    # (semi-filter first: the aggregate shuffles batch-hash rows, not the
    # whole index)
    batch_hashes = batch.select("content_hash").distinct()
    old_min = (
        old.join(F.broadcast(batch_hashes), "content_hash", "left_semi")
        .groupBy("content_hash")
        .agg(F.min("id").alias("_old_min"))
    )
    batch_min = batch.groupBy("content_hash").agg(
        F.min("id").alias("_batch_min")
    )
    resolved = (
        batch.join(F.broadcast(old_min), "content_hash", "left")
        .join(F.broadcast(batch_min), "content_hash", "left")
        .select(
            "id",
            "content_hash",
            F.least(
                F.coalesce(F.col("_old_min"), F.col("_batch_min")),
                F.col("_batch_min"),
            ).alias("dup_of"),
        )
    )

    batch_no = meta["n_batches"]
    out_path = os.path.join(index_dir, _PAIRS, f"batch={batch_no}")
    resolved.write.mode("overwrite").parquet(out_path)
    batch.select("content_hash", "id").write.mode("append").parquet(
        os.path.join(index_dir, _HASHES)
    )
    n_new = batch.count()
    batch.unpersist(False)
    meta["n_docs"] = meta["n_docs"] + n_new
    meta["n_batches"] = batch_no + 1
    _write_meta(index_dir, meta)
    return spark.read.parquet(out_path)


# --------------------------------------------------- embedding-LSH index

_EBUCKETS = "ebuckets"
_EVECS = "evecs"


def embdup_index_build(
    vecs: DataFrame,
    index_dir: str,
    id_col: str,
    vec_col: str,
    threshold: float = 0.4,
    n_planes: int = 4,
    planes: list[list[float]] | None = None,
) -> dict:
    """Create an embedding near-dup index: hyperplane-LSH bucket per
    vector (operators/similarity.lsh_bucket) + the vectors themselves
    (needed for exact-cosine verification, read candidate-bounded on
    increment). The PLANES are frozen into ``meta.json`` — every future
    batch buckets with the same planes, which is what makes incremental
    candidates ≡ full-recompute candidates (the same argument as the
    MinHash index: signatures from different hyperparameters are
    incomparable)."""
    from mini_data_platform_spark.functions.vectors import l2_norm
    from mini_data_platform_spark.operators.similarity import (
        lsh_bucket,
        planes_from_corpus,
    )

    if os.path.exists(os.path.join(index_dir, _META)):
        raise ValueError(f"index already exists at {index_dir}")
    os.makedirs(index_dir, exist_ok=True)
    if planes is None:
        planes = planes_from_corpus(vecs, id_col, vec_col, n_planes)
    base = vecs.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        l2_norm(F.col(vec_col)).alias("nrm"),
    ).persist()
    lsh_bucket(base, planes, "id", "vec").select("id", "bucket").write.parquet(
        os.path.join(index_dir, _EBUCKETS)
    )
    base.write.parquet(os.path.join(index_dir, _EVECS))
    n = base.count()
    base.unpersist(False)
    meta = {
        "kind": "embdup",
        "id_col": id_col,
        "vec_col": vec_col,
        "threshold": threshold,
        "planes": [[float(x) for x in p] for p in planes],
        "n_docs": n,
        "n_batches": 1,
    }
    _write_meta(index_dir, meta)
    return meta


def embdup_index_increment(
    new_vecs: DataFrame,
    index_dir: str,
) -> DataFrame:
    """Near-dup a new vector batch against the indexed corpus: every
    same-bucket pair involving the new batch with exact cosine ≥ the
    index threshold — (id_a, id_b, cos_sim), id_a < id_b — then append
    the batch. Same scale/durability shape as the MinHash increment:
    bucket the batch with the FROZEN planes, stream the corpus bucket
    table against a broadcast of the batch's buckets (no index shuffle),
    verify with candidate-bounded vector reads, materialize to
    ``pairs/batch=N`` before appending."""
    from mini_data_platform_spark.functions.vectors import cosine, l2_norm
    from mini_data_platform_spark.operators.similarity import lsh_bucket

    meta = _read_meta(index_dir)
    if meta.get("kind") != "embdup":
        raise ValueError(f"{index_dir} is not an embedding near-dup index")
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    threshold, planes = meta["threshold"], meta["planes"]
    spark: SparkSession = new_vecs.sparkSession

    batch = new_vecs.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        l2_norm(F.col(vec_col)).alias("nrm"),
    ).persist()
    bucketed_new = (
        lsh_bucket(batch, planes, "id", "vec")
        .select("id", "bucket")
        .persist()
    )

    buckets_old = spark.read.parquet(os.path.join(index_dir, _EBUCKETS))
    cand_cross = (
        buckets_old.alias("o")
        .join(
            F.broadcast(bucketed_new).alias("n"),
            (F.col("o.bucket") == F.col("n.bucket"))
            & (F.col("o.id") != F.col("n.id")),
        )
        .select(
            F.least(F.col("o.id"), F.col("n.id")).alias("id_a"),
            F.greatest(F.col("o.id"), F.col("n.id")).alias("id_b"),
        )
    )
    nn_a = bucketed_new.select(
        F.col("id").alias("id_a"), F.col("bucket").alias("_bk")
    )
    nn_b = bucketed_new.select(
        F.col("id").alias("id_b"), F.col("bucket").alias("_bk")
    )
    cand_self = (
        nn_a.join(nn_b, "_bk")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    cands = cand_cross.unionByName(cand_self).distinct().persist()

    cand_ids = (
        cands.select(F.col("id_a").alias("id"))
        .unionByName(cands.select(F.col("id_b").alias("id")))
        .distinct()
    )
    vecs_old = spark.read.parquet(os.path.join(index_dir, _EVECS)).join(
        F.broadcast(cand_ids), "id", "left_semi"
    )
    all_vecs = batch.unionByName(vecs_old)
    va = all_vecs.select(
        F.col("id").alias("id_a"), F.col("vec").alias("_va"),
        F.col("nrm").alias("_na"),
    )
    vb = all_vecs.select(
        F.col("id").alias("id_b"), F.col("vec").alias("_vb"),
        F.col("nrm").alias("_nb"),
    )
    verified = (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            cosine(
                F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )

    batch_no = meta["n_batches"]
    out_path = os.path.join(index_dir, _PAIRS, f"batch={batch_no}")
    verified.write.mode("overwrite").parquet(out_path)
    bucketed_new.write.mode("append").parquet(
        os.path.join(index_dir, _EBUCKETS)
    )
    batch.write.mode("append").parquet(os.path.join(index_dir, _EVECS))
    n_new = batch.count()
    for f in (cands, bucketed_new, batch):
        f.unpersist(False)
    meta["n_docs"] = meta["n_docs"] + n_new
    meta["n_batches"] = batch_no + 1
    _write_meta(index_dir, meta)
    return spark.read.parquet(out_path)


def compact_index(spark: SparkSession, index_dir: str) -> dict[str, int]:
    """Compact an incremental index's appended parquet directories
    (every increment appends one batch of files; after many batches the
    bucket/doc tables fragment into small files — each one a scan task
    and an object-store request). Rewrites each table dir to
    healthy-sized files via sinks/compact.compact_parquet (write-temp +
    atomic swap, so a failed compaction never corrupts the index).
    Returns {table: n_files_after}. Past increments' ``pairs/batch=N``
    outputs are left untouched (immutable results)."""
    from mini_data_platform_spark.sinks.compact import compact_parquet

    meta = _read_meta(index_dir)  # validates this IS an index
    tables = {
        "exact": [_HASHES],
        "embdup": [_EBUCKETS, _EVECS],
    }.get(meta.get("kind"), [_BUCKETS, _DOCS])
    out: dict[str, int] = {}
    for t in tables:
        path = os.path.join(index_dir, t)
        if os.path.isdir(path):
            out[t] = compact_parquet(spark, path)
    return out


def neardup_index_pairs(spark: SparkSession, index_dir: str) -> DataFrame:
    """All verified near-dup pairs WITHIN the indexed corpus AS OF NOW,
    computed from the index's own artifacts: candidate pairs from a
    self-join of the persisted band-bucket table (no re-signing of
    anything), then exact-Jaccard verification with candidate-bounded
    doc reads. With ``neardup_index_increment`` this completes the index
    algebra: pairs(full corpus) = index_pairs(after build) ∪ every
    increment's pairs — at no point is the corpus re-shingled wholesale.

    The result is MATERIALIZED to ``pairs/snapshot=N_batches`` and
    returned as a parquet read (the same durability discipline as the
    increments): the returned plan is a stable snapshot — future appends
    cannot leak into it, which is what makes
    ``index_pairs(build) ∪ increment`` safe to compose lazily."""
    meta = _read_meta(index_dir)
    threshold, shingle_n = meta["threshold"], meta["shingle_n"]
    buckets = spark.read.parquet(os.path.join(index_dir, _BUCKETS))
    a = buckets.alias("a")
    b = buckets.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
        .persist()
    )
    cand_ids = (
        cands.select(F.col("id_a").alias("id"))
        .unionByName(cands.select(F.col("id_b").alias("id")))
        .distinct()
    )
    docs = spark.read.parquet(os.path.join(index_dir, _DOCS)).join(
        F.broadcast(cand_ids), "id", "left_semi"
    )
    shingled = _staged_shingles(docs, "id", "text", shingle_n)
    out = (
        jaccard_pairs_from(shingled, cands, "id")
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    snap = os.path.join(
        index_dir, _PAIRS, f"snapshot={meta['n_batches']}"
    )
    out.write.mode("overwrite").parquet(snap)
    cands.unpersist(False)
    return spark.read.parquet(snap)
