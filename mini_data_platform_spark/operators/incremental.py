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
  threshold) plus id/text column names, running doc/batch counts, and
  the COMMIT LOG: ``segments`` maps each table to the list of its
  committed per-batch subdirectories. Readers only ever read committed
  segments, which is what makes increments atomic on plain parquet (see
  Restartability). Signatures from different hyperparameters are
  incomparable, so the increment path always reads its parameters from
  here, never from arguments — an index can only ever be queried the way
  it was built.
- ``buckets/batch-N/`` — (id, band_id, band_key): the stacked band-key
  frame (dedup_fuzzy.lsh_band_keys) of batch N's docs.
- ``docs/batch-N/`` — (id, text) of batch N's docs; read ONLY
  candidate-bounded (semi-join on candidate ids) for exact-Jaccard
  verification.
- ``pairs/batch=N/`` — each increment's verified output, written before
  the index commit and returned as a parquet read, so an increment's
  result is durable and re-readable after restart.

Scale shape of one increment (new batch b against corpus C):

- signature + band keys for b only — one scan of b, no touch of C;
- new-vs-corpus candidates: ``buckets ⋈ b_bands`` on (band_id,
  band_key) — when b is small (the common serving regime) its band-key
  frame is broadcast and the corpus-sized side streams map-side with
  ZERO shuffle of the index. The broadcast is GUARDED: ``F.broadcast``
  is a hard hint, so above a configurable row threshold
  (``MDP_INCR_BROADCAST_MAX_ROWS``, default 2M rows) the hint is
  dropped and the planner degrades to a shuffle join instead of
  OOM-ing the driver on an oversized batch (round-7 verdict item 1).
  The same guard covers the candidate-id semi-join frames, which can
  blow up independently when a hot batch explodes candidates;
- new-vs-new candidates: the ordinary LSH self-join within b;
- verification: exact shingle Jaccard over candidate docs only — the
  corpus text is read through a (guarded-broadcast) semi-join on
  candidate ids (parquet row-group pruning applies), so settled
  non-candidate text is never deserialized, let alone re-shingled;
- append: b's band keys and text land as NEW SEGMENT DIRS and are then
  committed in one meta.json swap, so the NEXT increment sees them. The
  verified pairs are materialized BEFORE the commit — the returned plan
  must never read its own batch from the "corpus" side.

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
With a finite ``max_bucket`` the equivalence narrows to SNAPSHOT
semantics: each increment's drop decision uses the occupancy as of THAT
increment (old + this batch — the same total a capped recompute of the
then-current corpus sees), but pairs already emitted by earlier
increments are never retracted when a later batch pushes a bucket over
the cap, so the multi-batch union tracks a capped recompute of each
snapshot, not one capped recompute of the final corpus.

Deletion (takedown propagation): ``index_delete`` retracts a doc-id
set from any of the three index kinds by committing a TOMBSTONE segment
(``tombstones/del-N``) in the same log — one atomic meta swap, O(delete
set) written, nothing rewritten. Every corpus-side read goes through
``_read_live`` (committed segments anti-joined against committed
tombstones, guarded-broadcast), so lookups, increments, hot-bucket
occupancy counts, and ``neardup_index_pairs`` all behave as if the
index had been built on the remaining corpus — the equivalence the
declared query ``doc_neardup_delete`` proves against a recompute
oracle. The logical delete is immediate; the PHYSICAL purge (the
GDPR/takedown erasure step — tombstoned text actually leaving disk)
happens at ``compact_index``, which rewrites every table through the
live filter and then drops the tombstones. Two documented limits: a
deleted id is terminal (tombstones hide every segment's rows for that
id, so re-adding it would stay hidden — use a fresh id), and pairs
already materialized under ``pairs/`` are immutable history (the index
stops SERVING the doc; artifacts already handed to consumers are theirs
to re-derive).

Replay protection (opt-in): every committing operation (the three
increments and ``index_delete``) accepts a ``batch_id``; an id already
in the commit log is NOT re-applied — increments return the original
batch's materialized ``pairs/batch=N`` and deletes no-op — which is the
ivm/mergetable exactly-once contract, and what lets a foreachBatch
stream (streaming/dedup_index.py) drive the index under Spark's
at-least-once micro-batch replays. Callers that never pass ids keep
the original semantics.

Restartability + MULTI-WRITER OCC (round-7 item 2; round-8 item 5):
each increment (a) writes its verified pairs and its bucket/doc
segments under WRITER-UNIQUE names (``batch-N-<token>``), then
(b) commits by publishing a put-if-absent ticket
``_commits/<version>.json`` — the merge-table protocol, shared via
operators/occlog.py. ``meta.json`` is a CHECKPOINT that
``_recover_meta`` rolls forward from unabsorbed tickets, and every
entry point reads through it. Readers construct their scan from the
committed segment log only, so a crash anywhere before the ticket
leaves orphan directories the index never serves (``vacuum_index``
sweeps them). Concurrent writers both land: the ticket loser
RECOMPUTES against the recovered snapshot and retries — re-committing
its stale pairs would drop (loser-batch × winner-batch) pairs and
break the union-equals-recompute equivalence, so conflict means
re-derive, exactly like the merge table's MERGE INTO. Compaction
serializes the same way and REFUSES a lost race (raises; re-run).
Read paths roll forward in memory and checkpoint only BEST-EFFORT —
a consumer with read-only filesystem access to the index dir can
always read (its checkpoint write is swallowed; tickets stay the
source of truth), it just leaves the replay work to the next writer.

No reference-repo counterpart (the reference ingests files, it has no
similarity ops); part of the §2.8 LLM-pipeline extension surface.
"""

from __future__ import annotations

import json
import os
import threading
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession, functions as F

from mini_data_platform_spark.operators.dedup_fuzzy import (
    _staged_shingles,
    jaccard_pairs_from,
    jaccard_pairs_from_hashes,
    lsh_band_keys,
    minhash_signatures_from,
    shingle_hash_sets,
)

_META = "meta.json"
_BUCKETS = "buckets"
_DOCS = "docs"
_PAIRS = "pairs"
_TOMBSTONES = "tombstones"
#: docs-table column holding each doc's distinct shingle-HASH set
#: (dedup_fuzzy.shingle_hash_sets) — written at build/increment commit
#: so lookups verify Jaccard from 8-byte hashes with the text column
#: pruned from the scan (round-9 verdict item 2)
_SHH = "_shh"

#: candidate-doc ceiling for the ZERO-SHUFFLE verify plan
#: (jaccard_pairs_from_hashes small_pairs=True): unlike the 2M-row id
#: broadcast dial, these frames carry shingle-hash ARRAYS (~KBs per
#: doc), so the bound is docs × array bytes, not rows — 20k docs ×
#: ~3 KB ≈ 60 MB worst case, safely under the driver budget. Above it
#: verification degrades to the ordinary shuffle joins.
_VERIFY_BROADCAST_MAX_DOCS = 20_000

#: Default row threshold above which batch-side frames LOSE their
#: F.broadcast hint. The hint is hard — Spark collects the frame to the
#: driver no matter its size — so an unguarded hint turns "large batch"
#: into a driver OOM instead of a slower shuffle join. 2M rows of
#: (id, band_id, band_key) is ~100 MB serialized: comfortably within a
#: production driver, far above any "batch ≪ corpus" serving increment.
_BROADCAST_MAX_ROWS_DEFAULT = 2_000_000


def _broadcast_max_rows() -> int:
    return int(
        os.environ.get(
            "MDP_INCR_BROADCAST_MAX_ROWS", _BROADCAST_MAX_ROWS_DEFAULT
        )
    )


def _hinted(df: DataFrame, n_rows: int) -> DataFrame:
    """``F.broadcast(df)`` only when ``n_rows`` (a cheaply-known upper
    bound — batch counts are taken once per increment anyway) is under
    the guard threshold; otherwise return ``df`` unhinted so the planner
    picks a shuffle join and a huge batch degrades instead of OOM-ing."""
    return F.broadcast(df) if n_rows <= _broadcast_max_rows() else df


#: Candidate-pair rows admissible as a driver-side literal frame: each
#: row is two ids (~32 B), so the cap is a few MB collected/broadcast —
#: DISTINCT from the id cap below because LSH pairs fan out quadratically
#: within hot buckets (sf0.1 emb serve: 27.8k pairs over 2.2k ids, which
#: the id-bounded regime has always admitted).
_VERIFY_BROADCAST_MAX_PAIRS = 200_000


def _pairs_local(
    cands: DataFrame, max_pairs: int, max_ids: int
) -> tuple[list, list] | None:
    """Materialize the (declared-)bounded candidate PAIR frame to a
    driver-side (rows, distinct-sorted-ids) pair, or ``None`` when it
    overflows either cap (a mis-declared small batch) so the caller
    degrades to the guarded semi-join instead of an unbounded collect.

    Why a literal list and not a broadcast semi-join: the serve paths'
    candidate frame carries the WHOLE candidate-generation lineage
    (LSH banding, bucket joins, distincts), and a broadcast build
    against it embeds that lineage into every frame that references the
    filtered result — the round-11 plan defect, where the
    twice-referenced verify frame compiled to a 76-exchange serve plan
    against the ≤4-exchange zero-shuffle contract
    (tests/test_plan_quality.py small_batch gate). A literal pair frame
    plus an InSet id filter are lineage-free, the filter pushes into
    the parquet candidate scan, and the one bounded collect is the ONLY
    action before the verify job — collecting PAIRS directly off the
    persisted cands frame (rather than a derived distinct-id frame, the
    first round-12 cut) saves a per-lookup union+distinct shuffle job,
    and handing the literal pairs back to the scorer keeps the
    candidate lineage out of the verify plan entirely."""
    rows = cands.limit(max_pairs + 1).collect()
    if len(rows) > max_pairs:
        return None
    ids = sorted({r[0] for r in rows} | {r[1] for r in rows})
    if len(ids) > max_ids:
        return None
    return rows, ids


def _isin_filter(ids: list, col: str = "id"):
    """``<col> IN (<ids>)`` as a pushable In predicate; empty candidate
    sets filter everything (``isin([])`` is not valid Spark).

    Built as ONE SQL expression string on purpose: ``Column.isin(ids)``
    creates a py4j literal per element — ~4 ms of driver↔JVM round trip
    EACH, measured 4.8 s of the serve wall at 1k candidate ids (the
    round-12 latency profile's top entry) — while the parser folds the
    same thousand-element list in one call, microseconds JVM-side."""
    if not ids:
        return F.lit(False)

    def fmt(v):
        if isinstance(v, str):
            esc = v.replace("\\", "\\\\").replace("'", "\\'")
            return f"'{esc}'"
        return str(v)

    quoted = "`" + col.replace("`", "``") + "`"
    return F.expr(f"{quoted} IN ({', '.join(fmt(v) for v in ids)})")


#: Corpus-side bucket entries a serving probe may pull to the driver:
#: the probe scan is already In-filtered to the batch's band keys, so
#: this only trips on pathological hot buckets — which the candidate
#: caps would reject anyway; overflowing degrades to the distributed
#: candidate join, never an unbounded collect.
_PROBE_MAX_ENTRIES = 200_000

#: Distinct bucket keys a probe will push as one In predicate (a
#: single parsed array — 32k strings is ~1 MB of plan, fine); past
#: this the batch is no point lookup: skip the probe entirely.
_PROBE_MAX_KEYS = 32_000





def _probe_entries(buckets_old, key_col: str, probe_keys: list):
    """The bounded corpus-side probe collect shared by the text and
    embedding point probes: the bucket table In-filtered to the batch's
    keys, pulled to the driver, or ``None`` when a bound trips (the
    caller falls back to the distributed candidate join).

    ONE limited collect on purpose: a count-before-collect variant was
    tried (round 12) and reverted — the batch's key count cannot
    predict overflow (the corpus side's bucket occupancy decides it),
    so counting first taxes EVERY steady increment one extra scan
    (~0.3 s × N increments in the curation funnel) to save a bounded
    ~1-2 s discarded collect in the rare overflow case, which precedes
    a multi-second distributed fallback anyway. Expected case wins."""
    if len(probe_keys) > _PROBE_MAX_KEYS:
        return None
    flt = buckets_old.where(_isin_filter(probe_keys, key_col))
    entries = flt.limit(_PROBE_MAX_ENTRIES + 1).collect()
    return entries if len(entries) <= _PROBE_MAX_ENTRIES else None


def _literal_pairs_frame(spark: SparkSession, pairs: list, schema):
    """Driver pairs → DataFrame via the Arrow path: pandas-backed
    ``createDataFrame`` serializes one Arrow batch instead of a py4j
    pickle per row — at the embedding serve's ~28k candidate pairs the
    row path alone cost ~0.4 s of lookup wall. Falls back to the plain
    row path when the pandas conversion rejects the id type."""
    rows = [tuple(p) for p in pairs]
    if rows:
        try:
            import pandas as pd

            pdf = pd.DataFrame(rows, columns=[f.name for f in schema.fields])
            return spark.createDataFrame(pdf, schema)
        except Exception:  # noqa: BLE001 — fall back to the row path
            pass
    return spark.createDataFrame(rows, schema)


def _local_bucket_pairs(
    new_rows: list,
    old_rows: list,
    max_bucket: int | None,
    max_pairs: int,
    max_ids: int,
) -> tuple[list, list] | None:
    """DRIVER-side candidate-pair generation for the declared-small
    serving probe: ``new_rows``/``old_rows`` are (id, bucket_key)
    tuples — the batch's band keys and the In-probed corpus bucket
    entries. Emits exactly the pairs the distributed form produces:
    new-vs-corpus (id != id, (least, greatest)) ∪ new-vs-new (a < b)
    over buckets surviving the hot-bucket cap (old occupancy + new
    occupancy ≤ ``max_bucket``; occupancies counted per touched bucket,
    the same current-corpus semantics as the distributed count
    aggregate), set-deduped. Returns (sorted pairs, sorted distinct
    ids) or ``None`` when either cap overflows — the caller then falls
    back to the distributed candidate join. Python ``<`` on the ids
    matches Spark's least/greatest for the integral and string id
    types an index carries (UTF-8 byte order ≡ code-point order)."""
    from collections import defaultdict

    new_by: dict = defaultdict(list)
    old_by: dict = defaultdict(list)
    for i, k in new_rows:
        new_by[k].append(i)
    for i, k in old_rows:
        old_by[k].append(i)
    pairs: set = set()
    for k, news in new_by.items():
        olds = old_by.get(k, ())
        if max_bucket is not None and len(olds) + len(news) > max_bucket:
            continue
        for n in news:
            for o in olds:
                if o != n:
                    pairs.add((o, n) if o < n else (n, o))
            if len(pairs) > max_pairs:
                return None
        for x in range(len(news)):
            a = news[x]
            for y in range(x + 1, len(news)):
                b = news[y]
                if a != b:
                    pairs.add((a, b) if a < b else (b, a))
        if len(pairs) > max_pairs:
            return None
    ids = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    if len(ids) > max_ids:
        return None
    return sorted(pairs), ids


def _read_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, _META), encoding="utf-8") as f:
        return json.load(f)


def _write_meta(index_dir: str, meta: dict) -> None:
    tmp = os.path.join(index_dir, _META + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, _META))


def _meta_as_of(meta: dict, as_of: int | None) -> dict:
    """TIME TRAVEL over the commit log: a meta snapshot restricted to
    the state after the first ``as_of`` committed batches. Segment lists
    are append-ordered, one entry per batch (plus at most one leading
    ``compact-*`` entry covering every batch up to
    ``meta['compacted_through']``), so an as-of state is a list PREFIX —
    no data copies, no tombstones; history is simply which suffix you
    ignore. Compaction collapses the batches it folds: ``as_of`` older
    than ``compacted_through`` is gone and raises (the Delta/Iceberg
    VACUUM-vs-time-travel trade, made explicit)."""
    if as_of is None:
        return meta
    n = meta["n_batches"]
    if not 1 <= as_of <= n:
        raise ValueError(f"as_of must be in [1, {n}], got {as_of}")
    if as_of == n:
        return meta
    ct = meta.get("compacted_through", 0)
    if as_of < ct:
        raise ValueError(
            f"history before batch {ct} was compacted away; "
            f"as_of={as_of} is not reconstructible"
        )
    out = dict(meta)
    out["segments"] = {}
    for t, segs in meta["segments"].items():
        # per-table: a crash between compact_index's per-table swaps can
        # leave one table compacted and another not; the leading
        # compact-* entry is the authoritative marker
        folded = segs and segs[0].startswith("compact-")
        if folded and ct == 0:
            # compacted by a pre-`compacted_through` version of this
            # module: the fold boundary is unrecorded, so NO historical
            # state is reconstructible — refuse rather than guess and
            # silently serve the wrong corpus
            raise ValueError(
                f"{t!r} was compacted without a recorded boundary; "
                "history is not reconstructible (re-run compaction with "
                "this version to record it)"
            )
        # every segment name carries the batch number it was committed
        # at (batch-K / del-K; compact-K folds everything before `ct`,
        # and as_of < ct was already refused above), so the as-of state
        # is a pure name filter — tables whose logs are SPARSE in batch
        # numbers (tombstones exist only for delete batches; bucket/doc
        # tables skip delete batches) time-travel correctly
        out["segments"][t] = [
            s for s in segs
            if s.startswith("compact-") or _seg_no(s) < as_of
        ]
    out["n_batches"] = as_of
    return out


def _seg_no(seg: str) -> int:
    """The commit batch number a segment name carries, right after the
    kind prefix (``batch-7`` / ``del-7`` → 7; the merge table's
    OCC-era writer-unique names ``seg-7-<token>`` → 7)."""
    return int(seg.split("-", 2)[1])


def vacuum_index(index_dir: str) -> list[str]:
    """Delete ORPHAN segment dirs — leftovers of crashed/ticket-losing
    increments and compactions whose best-effort deletes failed.
    Anything not in the committed segment log is invisible to every
    reader, so removal never changes any result. ``pairs/``: committed
    outputs (``meta['pairs_segs']`` values, plus every legacy
    ``batch=N``/``snapshot=N`` dir) are immutable results and are
    untouched; OCC-era token-named dirs NOT in the committed map are a
    ticket loser's stale results (computed against a superseded
    snapshot — wrong to serve, not merely redundant) and are swept.
    Do not vacuum while an increment is mid-flight, or its
    not-yet-committed segments get swept. Returns the removed paths."""
    import shutil

    meta = _recover_meta(index_dir)
    removed: list[str] = []
    for table, segs in meta["segments"].items():
        tdir = os.path.join(index_dir, table)
        if not os.path.isdir(tdir):
            continue
        committed = set(segs)
        for name in sorted(os.listdir(tdir)):
            p = os.path.join(tdir, name)
            if os.path.isdir(p) and name not in committed:
                shutil.rmtree(p, ignore_errors=True)
                removed.append(p)
    pdir = os.path.join(index_dir, _PAIRS)
    if os.path.isdir(pdir):
        committed_pairs = set(meta.get("pairs_segs", {}).values())
        for name in sorted(os.listdir(pdir)):
            p = os.path.join(pdir, name)
            if (
                os.path.isdir(p)
                and "=" not in name  # legacy batch=N / snapshot=N stay
                and name not in committed_pairs
            ):
                shutil.rmtree(p, ignore_errors=True)
                removed.append(p)
    return removed


def index_docs(spark: SparkSession, index_dir: str) -> DataFrame:
    """The LIVE indexed corpus — (id, text) for a near-dup index,
    (content_hash, id) for an exact index, (id, vec, nrm) for an
    embedding index — read from the committed segments minus
    tombstones. This IS the settled corpus in an incremental pipeline:
    downstream stages (survivor projection, curation output) read it
    from here instead of re-scanning and re-gating the raw sources."""
    meta = _recover_meta(index_dir)
    table = {
        "exact": _HASHES,
        "embdup": _EVECS,
    }.get(meta.get("kind"), _DOCS)
    live = _read_live(spark, index_dir, table, meta)
    # the shingle-hash column is verification state internal to the
    # index (lookup plumbing), not part of the settled-corpus contract
    return live.drop(_SHH) if _SHH in live.columns else live


def _segment_paths(index_dir: str, table: str, meta: dict) -> list[str]:
    """Absolute paths of ``table``'s COMMITTED segments (meta is the
    commit log: uncommitted/orphaned dirs on disk are invisible)."""
    return [
        os.path.join(index_dir, table, seg)
        for seg in meta["segments"][table]
    ]


def _read_table(
    spark: SparkSession, index_dir: str, table: str, meta: dict
) -> DataFrame:
    return spark.read.parquet(*_segment_paths(index_dir, table, meta))


def _write_segment(df: DataFrame, index_dir: str, table: str, seg: str) -> None:
    """Write one per-batch segment dir. OVERWRITE mode on purpose: a
    crashed increment leaves an orphan dir with this name, and the retry
    must replace it wholesale (append would double the batch)."""
    df.write.mode("overwrite").parquet(os.path.join(index_dir, table, seg))


#: Analyzed-plan cache for the live corpus views (serving-session
#: shape): a lookup loop re-reads the SAME committed segment set every
#: request, and each ``spark.read.parquet`` pays file listing, footer
#: schema reads, and plan analysis on the driver — pure latency at any
#: scale (the corpus itself never moves; this caches the *plan*, not
#: data). Keyed by (application, index, table, exact segment lists), so
#: any commit — increment, takedown, compaction — changes the key and
#: the stale entry simply ages out of the small LRU. DataFrames are
#: immutable, so handing the same object to concurrent lookups is safe.
_LIVE_PLAN_CACHE: "OrderedDict[tuple, DataFrame]" = OrderedDict()
_LIVE_PLAN_CACHE_MAX = 32
_LIVE_PLAN_LOCK = threading.Lock()


def _read_live(
    spark: SparkSession, index_dir: str, table: str, meta: dict
) -> DataFrame:
    """``_read_table`` minus tombstoned ids — the LIVE corpus view every
    lookup/increment/pairs read uses. With no committed tombstones this
    is ``_read_table`` verbatim (zero plan overhead for the common
    never-deleted index); otherwise one anti-join against the tombstone
    id set, guarded-broadcast on the running delete count (a takedown
    set is tiny next to the corpus; a bulk purge past the threshold
    degrades to a shuffle anti-join instead of OOM-ing the driver)."""
    # committed segments are immutable by the commit-log doctrine — the
    # exact segment lists in the key are what makes the cache sound.
    # The dir mtimes are extra ENTRY-LEVEL defense (a swapped dir, a
    # file added/removed out-of-band); they do NOT detect an in-place
    # rewrite of an existing file's bytes (dir mtime only moves on
    # entry add/remove — round-12 advice), which violates immutability
    # and is undefined for cached and uncached readers alike. Remote
    # (non-stat-able) index dirs cache on the segment lists alone,
    # same contract (round-12 verdict item 7); a transient LOCAL stat
    # failure instead degrades to an uncached read so the entry-level
    # defense is never silently dropped for local dirs (round-13
    # advice — the same rule as plancache.cached_parquet).
    from mini_data_platform_spark.operators.plancache import _is_remote

    tomb_segs = tuple(meta["segments"].get(_TOMBSTONES, []))
    if _is_remote(index_dir):
        stamps: tuple = ("unstatable",)
    else:
        try:
            stamps = tuple(
                os.stat(p).st_mtime_ns
                for p in _segment_paths(index_dir, table, meta)
                + [
                    os.path.join(index_dir, _TOMBSTONES, s)
                    for s in tomb_segs
                ]
            )
        except OSError:
            return _build_live(spark, index_dir, table, meta)
    key = (
        spark.sparkContext.applicationId,
        os.path.abspath(index_dir),
        table,
        tuple(meta["segments"][table]),
        tomb_segs,
        stamps,
        meta.get("n_deleted", 0),
    )
    with _LIVE_PLAN_LOCK:
        hit = _LIVE_PLAN_CACHE.get(key)
        if hit is not None:
            _LIVE_PLAN_CACHE.move_to_end(key)
            return hit
    df = _build_live(spark, index_dir, table, meta)
    with _LIVE_PLAN_LOCK:
        _LIVE_PLAN_CACHE[key] = df
        while len(_LIVE_PLAN_CACHE) > _LIVE_PLAN_CACHE_MAX:
            _LIVE_PLAN_CACHE.popitem(last=False)
    return df


def _live_tombstones(
    spark: SparkSession,
    index_dir: str,
    meta: dict,
    with_offsets: bool = False,
) -> DataFrame | None:
    """The tombstone table read as an EVENT LOG: ``del-N`` segments are
    takedowns (optionally stamped with the wire offset that ordered
    them), ``rev-N`` segments are revivals (``index_revive`` — a re-add
    that won log-compaction order). Per id, the LATEST event (by commit
    batch number, parsed from the segment name) decides: last event del
    ⇒ tombstoned, last event rev ⇒ live again. Returns the live
    tombstoned-id frame (plus each id's deciding offset when
    ``with_offsets``), or ``None`` when the table has no segments.

    Fast path: an index that has never revived (no ``rev-*`` segments —
    every batch-takedown-only index) reads all del segments as ONE
    multi-dir scan + distinct, exactly the pre-revive plan; the
    event-sequenced per-segment union runs only when revivals exist or
    offsets are requested (both delete-set-sized by design)."""
    segs = meta["segments"].get(_TOMBSTONES, [])
    if not segs:
        return None
    has_rev = any(s.startswith("rev-") for s in segs)
    if not has_rev and not with_offsets:
        return (
            spark.read.parquet(
                *[os.path.join(index_dir, _TOMBSTONES, s) for s in segs]
            )
            .select("id")
            .distinct()
        )
    frames = []
    for seg in segs:
        df = spark.read.parquet(os.path.join(index_dir, _TOMBSTONES, seg))
        off = (
            F.col("offset").cast("string")
            if "offset" in df.columns
            else F.lit(None).cast("string")  # legacy id-only segment
        )
        frames.append(
            df.select(
                "id",
                off.alias("offset"),
                F.lit(_seg_no(seg)).alias("_seq"),
                F.lit(seg.startswith("rev-")).alias("_rev"),
            )
        )
    events = frames[0]
    for f in frames[1:]:
        events = events.unionByName(f)
    last = events.groupBy("id").agg(
        # _seq is unique per commit, so the struct max IS the latest
        # event; _rev/offset ride along and are never tie-breakers
        F.max(F.struct("_seq", "_rev", "offset")).alias("_last")
    ).where(~F.col("_last._rev"))
    if with_offsets:
        return last.select("id", F.col("_last.offset").alias("offset"))
    return last.select("id")


def _build_live(
    spark: SparkSession, index_dir: str, table: str, meta: dict
) -> DataFrame:
    df = _read_table(spark, index_dir, table, meta)
    tombs = _live_tombstones(spark, index_dir, meta)
    if tombs is None:
        return df
    return df.join(
        _hinted(tombs, meta.get("n_deleted", 0)), "id", "left_anti"
    )


def _replayed_batch(meta: dict, batch_id: str | None) -> int | None:
    """Replay protection (opt-in, the ivm/mergetable contract): when the
    caller supplies a ``batch_id`` that is already in the commit log,
    return the batch NUMBER it committed as — the caller serves that
    batch's already-materialized ``pairs/batch=N`` instead of
    double-committing. ``meta['batches']`` maps batch_id → batch_no
    (absent on pre-protocol indexes and for callers that never pass
    ids — both keep the original at-most-once-caller semantics)."""
    if batch_id is None:
        return None
    no = meta.get("batches", {}).get(batch_id)
    return int(no) if no is not None else None


def _record_batch_id(meta: dict, batch_id: str | None, batch_no: int) -> None:
    if batch_id is not None:
        meta.setdefault("batches", {})[batch_id] = batch_no


# ------------------------------------------------ OCC commit log (r9)
#
# Multi-writer commits via the shared put-if-absent ticket protocol
# (operators/occlog.py — lifted from the merge table, round-8 verdict
# item 5): every committing operation (the three increments,
# index_delete, compact_index) publishes a commit RECORD as
# ``_commits/<version>.json``; meta.json demotes to a checkpoint that
# ``_recover_meta`` rolls forward. Because an increment's OUTPUT depends
# on the corpus snapshot it read (pairs vs the then-committed corpus —
# unlike the merge table's order-insensitive latest-wins applies), a
# loser does NOT re-commit its stale result: it RECOMPUTES against the
# recovered snapshot and retries, which is exactly what keeps the
# union-equals-recompute equivalence exact under concurrency. Segment
# dirs and pairs dirs carry a writer-unique token so racers never
# collide on a path; the loser's dirs are orphans for vacuum_index.

_OCC_MAX_RETRIES = 8


def _pairs_path(index_dir: str, meta: dict, batch_no: int) -> str:
    """The materialized pairs dir of committed batch ``batch_no`` —
    OCC-era batches record their writer-unique dir in
    ``meta['pairs_segs']``; legacy batches used ``batch=<no>``."""
    seg = meta.get("pairs_segs", {}).get(str(batch_no))
    return os.path.join(index_dir, _PAIRS, seg or f"batch={batch_no}")


def _apply_record(meta: dict, rec: dict) -> dict:
    """Replay one commit record onto a meta snapshot — the ONE place
    record semantics live (used by the winner to produce its checkpoint
    and by recovery to roll a crashed winner's ticket forward)."""
    m = json.loads(json.dumps(meta))  # deep copy
    if rec["type"] in ("increment", "delete", "revive"):
        if rec["seq"] != m["n_batches"]:  # ticket order guarantees this
            raise RuntimeError(
                f"commit record seq {rec['seq']} != n_batches "
                f"{m['n_batches']} — corrupted commit log"
            )
        if rec["type"] == "increment":
            for table, seg in rec["tables"].items():
                m["segments"].setdefault(table, []).append(seg)
            m["n_docs"] = m["n_docs"] + rec["n_docs_add"]
            if rec.get("pairs_seg"):
                m.setdefault("pairs_segs", {})[str(rec["seq"])] = rec[
                    "pairs_seg"
                ]
        elif rec["type"] == "delete":
            m["segments"].setdefault(_TOMBSTONES, []).append(rec["segment"])
            m["n_deleted"] = m.get("n_deleted", 0) + rec["n_del"]
        else:  # revive: append the rev event; running count re-based
            m["segments"].setdefault(_TOMBSTONES, []).append(rec["segment"])
            m["n_deleted"] = rec["n_del_after"]
        m["n_batches"] += 1
        _record_batch_id(m, rec.get("batch_id"), rec["seq"])
    elif rec["type"] == "compact":
        for table, segs in rec["tables"].items():
            m["segments"][table] = list(segs)
        m["compacted_through"] = rec["compacted_through"]
        if rec.get("clear_tombstones"):
            m["segments"][_TOMBSTONES] = []
            m["n_deleted"] = 0
    else:
        raise RuntimeError(f"unknown commit record type {rec['type']!r}")
    m["version"] = rec["version"] + 1
    return m


def _checkpoint_meta(index_dir: str, meta: dict) -> None:
    """Write the checkpoint, guarded against REGRESSING it (a slow
    recoverer must not overwrite a newer checkpoint; tickets are the
    source of truth, so the residual race is self-healing)."""
    cur = _read_meta(index_dir)
    if cur.get("version", cur["n_batches"]) <= meta["version"]:
        _write_meta(index_dir, meta)


def _recover_meta(index_dir: str) -> dict:
    """Read the checkpoint and roll any unabsorbed tickets forward.
    Indexes from before OCC have no ``version`` field — their version
    is ``n_batches`` (every commit was a meta swap).

    The roll-forward checkpoint is BEST-EFFORT (round-9 advice): this
    runs on every READ path (lookups, index_docs, view_read), and a
    read-only consumer — no write permission on the index dir — must
    still be able to read. Tickets are the source of truth; a skipped
    checkpoint only means the next recoverer replays a few more
    records. Writers re-checkpoint on their own commits."""
    from mini_data_platform_spark.operators import occlog

    meta = _read_meta(index_dir)
    meta["version"] = meta.get("version", meta["n_batches"])

    def _best_effort_checkpoint(m: dict) -> None:
        try:
            _checkpoint_meta(index_dir, m)
        except OSError:
            pass  # read-only consumer; tickets remain authoritative

    return occlog.roll_forward(
        index_dir,
        meta,
        _apply_record,
        _best_effort_checkpoint,
    )


def _try_ticket(index_dir: str, version: int, record: dict) -> bool:
    from mini_data_platform_spark.operators import occlog

    return occlog.try_ticket(index_dir, version, record)


def _commit_or_none(index_dir: str, meta: dict, rec: dict) -> dict | None:
    """Attempt to win ``meta['version']`` with ``rec``; on a win, apply
    + checkpoint and return the advanced meta, else None (caller
    recomputes against the recovered snapshot and retries)."""
    rec = dict(rec, version=meta["version"])
    if not _try_ticket(index_dir, meta["version"], rec):
        return None
    advanced = _apply_record(meta, rec)
    _checkpoint_meta(index_dir, advanced)
    return advanced


def index_delete(
    del_docs: DataFrame,
    index_dir: str,
    batch_id: str | None = None,
    offset_col: str | None = None,
) -> dict:
    """Retract a set of doc ids from ANY index kind (near-dup, exact,
    embedding) — the takedown/GDPR path: committing one TOMBSTONE
    segment (``tombstones/del-N``, O(delete set) rows, atomic meta swap)
    makes every subsequent lookup, increment, occupancy count, and
    ``neardup_index_pairs`` behave exactly as if the index had been
    built on the remaining corpus. Nothing is rewritten here — the
    PHYSICAL purge (text leaving disk) happens at the next
    ``compact_index``, which rewrites each table through the live filter
    and drops the tombstones.

    ``del_docs`` needs the index's id column (``meta['id_col']``, or an
    already-normalized ``id``); extra columns are ignored, ids absent
    from the index are harmless no-ops. Time travel composes: an
    ``as_of`` before the delete batch still serves the doc (audit what
    yesterday's dedup saw) until compaction erases the history.

    Two terminal semantics, by design: a deleted id stays deleted (the
    tombstone hides ALL segments' rows for it, including a later re-add
    — re-ingest under a fresh id), and already-materialized ``pairs/``
    outputs are immutable history. The one sanctioned exception is
    ``index_revive``: a WIRE-ordered re-add that provably post-dates
    its tombstone (``offset_col`` — the ``_src_file`` wire-order string
    stored alongside each id) may reverse it under the wire path's
    ``on_retombstoned='readd-wins'`` mode; offset-less tombstones (this
    function's default — every batch/GDPR takedown) carry no wire
    position, so no re-add can ever post-date them and they stay
    terminal under every mode."""
    import uuid

    ids = None
    try:
        for _ in range(_OCC_MAX_RETRIES):
            meta = _recover_meta(index_dir)
            if _replayed_batch(meta, batch_id) is not None:
                return meta
            if ids is None:  # snapshot-independent: compute once
                id_col = meta["id_col"]
                src = id_col if id_col in del_docs.columns else "id"
                if offset_col is not None and offset_col in del_docs.columns:
                    ids = (
                        del_docs.select(
                            F.col(src).alias("id"),
                            F.col(offset_col)
                            .cast("string")
                            .alias("offset"),
                        )
                        .groupBy("id")
                        .agg(F.max("offset").alias("offset"))
                        .persist()
                    )
                else:
                    ids = (
                        del_docs.select(F.col(src).alias("id"))
                        .distinct()
                        .persist()
                    )
                n_del = ids.count()
            seg = f"del-{meta['n_batches']}-{uuid.uuid4().hex[:8]}"
            _write_segment(ids, index_dir, _TOMBSTONES, seg)
            committed = _commit_or_none(
                index_dir,
                meta,
                {
                    "type": "delete",
                    "seq": meta["n_batches"],
                    "segment": seg,
                    "n_del": n_del,
                    "batch_id": batch_id,
                },
            )
            if committed is not None:
                return committed
        raise RuntimeError(
            f"index_delete: lost {_OCC_MAX_RETRIES} commit races in a "
            f"row at {index_dir} — pathological contention"
        )
    finally:
        if ids is not None:
            ids.unpersist(False)


def index_revive(
    revive_docs: DataFrame, index_dir: str, batch_id: str | None = None
) -> dict:
    """Reverse takedowns for ids whose re-add WON wire log-compaction
    order — the cross-epoch half of the wire path's
    ``on_retombstoned='readd-wins'`` mode (streaming/dedup_index).
    Appends one ``rev-N`` event segment (O(revive set)); the tombstone
    table is an event log and per id the LATEST del/rev event decides
    (``_live_tombstones``), so a revived id's rows become visible to
    every lookup/increment/pairs read again, a LATER ``index_delete``
    re-tombstones it, and ``_meta_as_of`` time travel replays the
    del→rev history faithfully. Reviving a never-tombstoned id is a
    harmless no-op row. Same OCC commit + ``batch_id`` replay
    protection as every other committing operation.

    This function records the OUTCOME of an ordering decision; it does
    not check offsets itself — the wire admission guard is the one
    place with both sides' wire positions, and batch callers have no
    standing to reverse a GDPR takedown (their tombstones are
    offset-less and terminal, see ``index_delete``)."""
    import uuid

    ids = None
    try:
        for _ in range(_OCC_MAX_RETRIES):
            meta = _recover_meta(index_dir)
            if _replayed_batch(meta, batch_id) is not None:
                return meta
            if ids is None:  # snapshot-independent: compute once
                id_col = meta["id_col"]
                src = id_col if id_col in revive_docs.columns else "id"
                ids = (
                    revive_docs.select(F.col(src).alias("id"))
                    .distinct()
                    .persist()
                )
                if ids.limit(1).count() == 0:
                    return meta  # empty revive: nothing to commit
            # snapshot-DEPENDENT: the running live-delete count after
            # this revive (the broadcast hint _hinted sizes by)
            spark = revive_docs.sparkSession
            live = _live_tombstones(spark, index_dir, meta)
            n_after = (
                0
                if live is None
                else live.join(ids, "id", "left_anti").count()
            )
            seg = f"rev-{meta['n_batches']}-{uuid.uuid4().hex[:8]}"
            _write_segment(ids, index_dir, _TOMBSTONES, seg)
            committed = _commit_or_none(
                index_dir,
                meta,
                {
                    "type": "revive",
                    "seq": meta["n_batches"],
                    "segment": seg,
                    "n_del_after": n_after,
                    "batch_id": batch_id,
                },
            )
            if committed is not None:
                return committed
        raise RuntimeError(
            f"index_revive: lost {_OCC_MAX_RETRIES} commit races in a "
            f"row at {index_dir} — pathological contention"
        )
    finally:
        if ids is not None:
            ids.unpersist(False)


def index_tombstoned_ids(
    spark: SparkSession,
    index_dir: str,
    batch_id: str | None = None,
    with_offsets: bool = False,
) -> DataFrame | None:
    """The index's LIVE tombstoned-id set, for wire-admission guarding
    (streaming/dedup_index re-add guard, round-13 verdict item 4):
    returns a broadcast-hinted single-column ``id`` frame, or ``None``
    when the guard has nothing to check — no index yet, no live
    tombstones (the common never-deleted fast path), or ``batch_id``
    already committed (an exactly-once REPLAY: the fold is a batch-id
    no-op, so re-judging its records would deadlock a crashed-epoch
    recovery against its own earlier delete half).

    ``with_offsets`` adds each id's deciding wire-order ``offset``
    column (null for offset-less batch takedowns) — what the
    ``readd-wins`` guard compares live records' ``_src_file`` against.

    Scope matches ``index_delete``'s terminal window: ``compact_index``
    physically purges tombstoned rows and clears the set, after which a
    re-add is a genuinely fresh doc — the same retention contract as a
    compacted Kafka topic dropping tombstones after delete.retention."""
    if not os.path.exists(os.path.join(index_dir, _META)):
        return None
    meta = _recover_meta(index_dir)
    if _replayed_batch(meta, batch_id) is not None:
        return None
    tombs = _live_tombstones(
        spark, index_dir, meta, with_offsets=with_offsets
    )
    if tombs is None:
        return None
    return _hinted(tombs, meta.get("n_deleted", 0))


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
    table as ``batch-0`` segments; records the LSH hyperparameters and
    the committed-segment log in ``meta.json``. Returns the meta dict.

    Build does NOT emit within-corpus pairs — run ``neardup_index_pairs``
    (or the batch ``near_dup_pairs``) over the initial corpus if those
    are needed (they are disjoint from every increment's output)."""
    if os.path.exists(os.path.join(index_dir, _META)):
        raise ValueError(f"index already exists at {index_dir}")
    os.makedirs(index_dir, exist_ok=True)
    base = docs.select(
        F.col(id_col).alias("id"), F.col(text_col).cast("string").alias("text")
    ).persist()
    shingled = _staged_shingles(base, "id", "text", shingle_n).persist()
    sigs = minhash_signatures_from(shingled, "id", num_hashes)
    # the docs segment carries the distinct shingle-HASH set alongside
    # the text (round-9 verdict item 2): verification at lookup time
    # reads these 8-byte-per-shingle arrays with the text column pruned
    # from the scan, instead of re-tokenizing candidate text per lookup.
    # The two segment writes and the count are independent actions over
    # the persisted base/shingled frames — overlapped from driver
    # threads (guide §2.6; cached-block locking keeps the shared
    # upstream computed once), r15.
    from mini_data_platform_spark.operators.resources import (
        run_concurrently,
    )

    _, _, n_docs = run_concurrently(
        lambda: _write_segment(
            lsh_band_keys(sigs, "id", num_hashes, bands),
            index_dir, _BUCKETS, "batch-0",
        ),
        lambda: _write_segment(
            base.join(shingle_hash_sets(shingled, "id"), "id"),
            index_dir, _DOCS, "batch-0",
        ),
        lambda: base.count(),
    )
    shingled.unpersist(False)
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
        "segments": {_BUCKETS: ["batch-0"], _DOCS: ["batch-0"]},
    }
    _write_meta(index_dir, meta)
    return meta


def _neardup_batch_pairs(
    spark: SparkSession,
    index_dir: str,
    meta: dict,
    batch: DataFrame,
    n_batch: int,
) -> tuple[DataFrame, DataFrame, list[DataFrame]]:
    """The shared lookup plan: every verified near-dup pair involving
    ``batch`` (already normalized to (id, text) and persisted, with
    ``n_batch`` rows) against the committed corpus — new-vs-corpus ∪
    new-vs-new, exact-Jaccard verified. Pure read: commits nothing.
    Used by both the committing increment and the serving lookup.
    Returns ``(verified_pairs, bands_new, hsets_new, pinned)`` —
    ``bands_new`` is the batch's band-key frame (the increment commits
    it as the new bucket segment), ``hsets_new`` the batch's distinct
    shingle-hash sets (the increment stores them in its docs segment so
    FUTURE lookups verify against hashes; None for a legacy index, whose
    docs schema must stay hash-free), and ``pinned`` the persisted
    frames backing the lazy plan (release after the action, resources.py
    contract).

    Verification (round-9 verdict item 2): when the index's docs table
    carries the ``_shh`` shingle-hash column (every index built/extended
    since round 10), the corpus side of Jaccard verification reads those
    arrays directly — the text column is PRUNED from the candidate scan
    and no tokenize/shingle work runs at lookup time. Pre-round-10
    indexes (no ``_shh``) fall back to re-shingling candidate text, the
    original path."""
    num_hashes, bands = meta["num_hashes"], meta["bands"]
    shingle_n, threshold = meta["shingle_n"], meta["threshold"]
    max_bucket = meta.get("max_bucket")

    # n_batch=None is the declared-small latency contract (see
    # neardup_index_lookup): hint every batch-derived frame broadcast
    # unconditionally instead of paying count() jobs for the guards
    declared_small = n_batch is None

    def _guard(df: DataFrame, bound) -> DataFrame:
        return F.broadcast(df) if declared_small else _hinted(df, bound)

    shingled_new = _staged_shingles(batch, "id", "text", shingle_n).persist()
    if declared_small:
        # zero-shuffle projection form of the signature (same hash
        # family, interchangeable output — dedup_fuzzy doctrine): a
        # broadcast-sized batch gains nothing from the explode/min-agg
        # shuffle, and dropping it removes one more stage barrier from
        # the serving path
        from mini_data_platform_spark.operators.dedup_fuzzy import (
            minhash_signature_columns,
        )

        sigs_new = minhash_signature_columns(shingled_new, ["id"], num_hashes)
    else:
        sigs_new = minhash_signatures_from(shingled_new, "id", num_hashes)
    bands_new = lsh_band_keys(sigs_new, "id", num_hashes, bands).persist()
    # lsh_band_keys emits exactly one row per (doc, band)
    n_bands_new = None if declared_small else n_batch * bands

    # new-vs-corpus: stream the corpus-sized bucket table against the
    # batch's band keys — broadcast (no index shuffle) while the batch
    # is under the guard threshold, shuffle join above it
    buckets_old = _read_live(spark, index_dir, _BUCKETS, meta)
    docs_old_early = _read_live(spark, index_dir, _DOCS, meta)
    # the probe also serves COUNTED small batches (steady incremental
    # ingest is exactly this regime): the band-row collect is bounded
    # by n_batch·bands, so the gate admits it only under the entry cap
    # — bulk backfills keep the distributed joins below
    probe_ok = declared_small or (
        n_batch is not None and n_batch * bands <= _PROBE_MAX_ENTRIES
    )
    if probe_ok and _SHH in docs_old_early.columns:
        # DRIVER-SIDE POINT PROBE — the declared-small serving fast
        # path (round-12): the batch's band keys are broadcast-sized by
        # contract, so candidate generation needs no distributed join
        # at all. One collect of the batch's band frame (materializing
        # the persisted shingle cache the verify reuses), ONE pushed-In
        # scan of the bucket table for the touched band keys, and the
        # hot-bucket cap + pair/self-join semantics run as plain Python
        # over those bounded lists (_local_bucket_pairs — identical
        # output to the distributed joins, set-deduped). The serve
        # lookup collapses from ~18 jobs (guard joins, broadcast
        # builds, distincts) to 3: batch bands, bucket probe, verify.
        # At cluster scale this is the shape a serving tier wants — the
        # corpus never shuffles, the bucket scan prunes to the probed
        # keys, and the verify scan prunes to candidate ids. Any cap
        # overflow (mis-declared batch, pathological bucket) falls
        # through to the distributed path below, never an error.
        # mis-declared-batch guard (round-12 advice): the probe's FIRST
        # collect is capped like every other probe collect — limit+1,
        # and a declared_small batch that actually exceeds the entry
        # cap degrades to the distributed joins below, never an
        # unbounded driver collect
        band_rows = bands_new.limit(_PROBE_MAX_ENTRIES + 1).collect()
        entries = (
            _probe_entries(
                buckets_old, "band_key", sorted({r[2] for r in band_rows})
            )
            if len(band_rows) <= _PROBE_MAX_ENTRIES
            else None
        )
        if entries is not None:
            loc = _local_bucket_pairs(
                [(r[0], (r[1], r[2])) for r in band_rows],
                [(r[0], (r[1], r[2])) for r in entries],
                max_bucket,
                _VERIFY_BROADCAST_MAX_PAIRS,
                min(_VERIFY_BROADCAST_MAX_DOCS, _broadcast_max_rows()),
            )
            if loc is not None:
                cand_pairs, cand_id_list = loc
                in_cands = _isin_filter(cand_id_list)
                idt = bands_new.schema["id"].dataType
                from pyspark.sql import types as T

                pair_schema = T.StructType(
                    [T.StructField("id_a", idt), T.StructField("id_b", idt)]
                )
                cands_v = _literal_pairs_frame(spark, cand_pairs, pair_schema)
                hsets_new = shingle_hash_sets(shingled_new, "id")
                h_old = docs_old_early.select("id", _SHH)
                # coalesce: the In-filtered union is candidate-sized
                # (≤ 2·max_ids rows) but inherits batch+corpus
                # partition counts; without it the verify's repeated
                # scans schedule hundreds of near-empty tasks
                sets_all = (
                    hsets_new.where(in_cands)
                    .unionByName(h_old.where(in_cands))
                    .coalesce(8)
                    .persist()
                )
                verified = (
                    jaccard_pairs_from_hashes(
                        sets_all, cands_v, "id",
                        small_pairs=True,
                        involved_filtered=True,
                    )
                    .filter(F.col("jaccard") >= threshold)
                    .select("id_a", "id_b", "jaccard")
                )
                return verified, bands_new, hsets_new, [
                    bands_new, shingled_new, sets_all,
                ]
    if max_bucket is not None:
        # hot-bucket cap with CURRENT-corpus semantics: a bucket's size
        # is its OLD occupancy + the batch's — the same total a capped
        # recompute of the as-of-now corpus sees. Old occupancy is
        # counted only for buckets the batch touches (semi-filter
        # first — cost ∝ matched buckets, never the index), and the
        # count aggregate's shuffle carries one row per matched bucket.
        new_keys = bands_new.select("band_id", "band_key").distinct()
        old_sizes = (
            buckets_old.join(
                _guard(new_keys, n_bands_new),
                ["band_id", "band_key"],
                "left_semi",
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
            _guard(ok_buckets, n_bands_new), ["band_id", "band_key"],
            "left_semi",
        )
    else:
        ok_buckets = None
        bands_eff = bands_new
    cand_cross = (
        buckets_old.alias("o")
        .join(
            _guard(bands_eff, n_bands_new).alias("n"),
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
    # new-vs-new: the within-batch LSH self-join over the same surviving
    # buckets — from the PERSISTED band-key frame, not a re-signing of
    # the batch (lsh_candidate_pairs would re-run the minhash aggregate
    # the bands_new cache already paid for; one fewer shuffle chain on
    # the serving path)
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
    cands = cand_cross.unionByName(cand_self).distinct().persist()
    n_cands = None if declared_small else cands.count()

    # verification state: the new batch's shingles are already staged;
    # the corpus side reads CANDIDATE docs only, from the persisted
    # hash sets when the index has them
    def _cand_ids() -> DataFrame:
        return (
            cands.select(F.col("id_a").alias("id"))
            .unionByName(cands.select(F.col("id_b").alias("id")))
            .distinct()
        )

    docs_old = _read_live(spark, index_dir, _DOCS, meta)
    hsets_new = shingle_hash_sets(shingled_new, "id")
    # the verify ceiling also honors the MDP_INCR_BROADCAST_MAX_ROWS
    # dial: it is the module's one "how much may hard-broadcast" knob,
    # and the oversized-batch degradation gate pins that setting it to 0
    # removes every hard hint from the lookup plan
    small_verify = declared_small or (
        2 * n_cands <= min(_VERIFY_BROADCAST_MAX_DOCS, _broadcast_max_rows())
    )
    if _SHH in docs_old.columns:
        # hash-verify path: candidate scan reads (id, _shh) — parquet
        # prunes the text column — and Jaccard runs on bigint sets.
        # The candidate-id FILTER applies in BOTH regimes: the scorer's
        # sb side is broadcast WHOLE under small_pairs (a broadcast hash
        # join prunes only the streamed side, never its own build side),
        # so an unfiltered h_old would broadcast the entire corpus — the
        # exact OOM _VERIFY_BROADCAST_MAX_DOCS exists to prevent
        # (round-10 advice, high). In the broadcast-verify regime the
        # bound comes from a LITERAL InSet filter (_pairs_local), not a
        # semi-join: the id set is small (2·n_cands under the verify
        # ceiling, or the declared-small contract), the filter pushes
        # into the candidate parquet scan, and — unlike a broadcast
        # build against _cand_ids() — it embeds no candidate-generation
        # lineage into the twice-referenced verify frame (the round-11
        # 76-exchange plan defect). A mis-declared batch whose id set
        # overflows the verify ceiling degrades to the guarded
        # shuffle-verify path instead of an unbounded driver collect.
        h_old = docs_old.select("id", _SHH)
        cands_v = cands
        if small_verify:
            loc = _pairs_local(
                cands, _VERIFY_BROADCAST_MAX_PAIRS,
                _VERIFY_BROADCAST_MAX_DOCS,
            )
            small_verify = loc is not None
        if small_verify:
            cand_pairs, cand_id_list = loc
            in_cands = _isin_filter(cand_id_list)
            # the scorer gets the LITERAL pair frame: the verify plan
            # then contains no candidate-generation lineage at all —
            # one cand-gen action (the collect above), one verify job
            cands_v = _literal_pairs_frame(spark, cand_pairs, cands.schema)
            sets_all = (
                hsets_new.where(in_cands)
                .unionByName(h_old.where(in_cands))
                .persist()
            )
        else:
            h_old = h_old.join(
                _cand_ids() if n_cands is None
                else _hinted(_cand_ids(), 2 * n_cands),
                "id", "left_semi",
            )
            sets_all = hsets_new.unionByName(h_old).persist()
        # sets_all is candidate-bounded and PERSISTED: the scorer
        # references it twice (sh_a stream side + sh_b broadcast side)
        # and without the pin each side would re-scan the docs segments
        # and re-hash the batch; involved_filtered skips the scorer's
        # redundant internal re-derivation of the same id set.
        verified = (
            jaccard_pairs_from_hashes(
                sets_all, cands_v, "id",
                small_pairs=small_verify,
                involved_filtered=True,
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
        pinned_extra = [sets_all]
    else:
        # legacy (pre-_shh) index: re-shingle candidate text, and keep
        # the docs table's legacy schema on future increments (a mixed
        # docs table would need mergeSchema on every read)
        hsets_new = None
        involved_old = docs_old.join(
            _guard(_cand_ids(), None if declared_small else 2 * n_cands),
            "id", "left_semi",
        )
        shingled_old = _staged_shingles(
            involved_old, "id", "text", shingle_n
        )
        verified = (
            jaccard_pairs_from(
                shingled_new.unionByName(shingled_old), cands, "id"
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
        pinned_extra = []
    pinned = [cands, bands_new, shingled_new, *pinned_extra]
    if ok_buckets is not None:
        pinned.append(ok_buckets)
    return verified, bands_new, hsets_new, pinned


def neardup_index_increment(
    new_docs: DataFrame,
    index_dir: str,
    batch_id: str | None = None,
) -> DataFrame:
    """Dedup a new batch against the indexed corpus: returns every
    verified near-dup pair INVOLVING the new batch — (id_a, id_b,
    jaccard) with id_a < id_b, covering new-vs-corpus and new-vs-new —
    then COMMITS the batch to the index (new bucket/doc segments +
    atomic meta swap) so the next increment sees it.

    All hyperparameters come from the index's ``meta.json`` (an index is
    only ever queried the way it was built). The result is materialized
    to ``pairs/batch=N/`` BEFORE the commit and returned as a parquet
    read: durable across restarts, and structurally incapable of seeing
    its own batch on the corpus side. A crash anywhere before the meta
    swap leaves only orphan dirs the index never serves; rerunning the
    increment overwrites them (see module docstring, Restartability).

    With a finite ``max_bucket`` the result has SNAPSHOT semantics: the
    drop decision uses old+this-batch occupancy, equal to a capped
    recompute of the corpus as of THIS increment; pairs emitted by
    earlier increments are never retracted when a later batch pushes a
    bucket over the cap.

    New-batch ids must be disjoint from indexed ids (checked against the
    running count only at meta level; id collisions produce degenerate
    self-pairs which are filtered, but don't do that).

    MULTI-WRITER (round-9): the commit is an OCC ticket
    (``_commits/<version>.json`` — the merge-table protocol via
    operators/occlog.py). A loser does NOT re-commit its stale pairs —
    they were computed against a corpus snapshot that now lacks the
    winner's batch, and committing them would silently drop
    (loser-batch × winner-batch) pairs — it RECOMPUTES against the
    recovered snapshot and retries; losers' segment/pairs dirs are
    vacuumable orphans. That recompute-on-conflict is what preserves
    the union-equals-recompute equivalence under concurrency."""
    import uuid

    spark: SparkSession = new_docs.sparkSession
    batch = None
    try:
        for _ in range(_OCC_MAX_RETRIES):
            meta = _recover_meta(index_dir)
            replay = _replayed_batch(meta, batch_id)
            if replay is not None:
                return spark.read.parquet(
                    _pairs_path(index_dir, meta, replay)
                )
            if batch is None:
                id_col, text_col = meta["id_col"], meta["text_col"]
                batch = new_docs.select(
                    F.col(id_col).alias("id"),
                    F.col(text_col).cast("string").alias("text"),
                ).persist()
                n_new = batch.count()

            verified, bands_new, hsets_new, pinned = _neardup_batch_pairs(
                spark, index_dir, meta, batch, n_new
            )

            # materialize pairs + segments (writer-unique names) BEFORE
            # the commit attempt; the docs segment carries the batch's
            # shingle-hash sets so future lookups hash-verify against it
            seg = f"batch-{meta['n_batches']}-{uuid.uuid4().hex[:8]}"
            pairs_path = os.path.join(index_dir, _PAIRS, seg)
            # three independent materializations over the persisted
            # batch/bands/shingle frames — overlap them (guide §2.6)
            from mini_data_platform_spark.operators.resources import (
                run_concurrently,
            )

            run_concurrently(
                lambda: verified.write.mode("overwrite").parquet(
                    pairs_path
                ),
                lambda: _write_segment(
                    bands_new, index_dir, _BUCKETS, seg
                ),
                lambda: _write_segment(
                    batch if hsets_new is None
                    else batch.join(hsets_new, "id"),
                    index_dir, _DOCS, seg,
                ),
            )
            for frame in pinned:
                frame.unpersist(False)

            committed = _commit_or_none(
                index_dir,
                meta,
                {
                    "type": "increment",
                    "seq": meta["n_batches"],
                    "tables": {_BUCKETS: seg, _DOCS: seg},
                    "pairs_seg": seg,
                    "n_docs_add": n_new,
                    "batch_id": batch_id,
                },
            )
            if committed is not None:
                out = spark.read.parquet(pairs_path)
                return out.select(
                    F.col("id_a").alias("id_a"),
                    F.col("id_b").alias("id_b"),
                    F.col("jaccard").alias("jaccard"),
                )
        raise RuntimeError(
            f"neardup_index_increment: lost {_OCC_MAX_RETRIES} commit "
            f"races in a row at {index_dir} — pathological contention"
        )
    finally:
        if batch is not None:
            batch.unpersist(False)


def neardup_index_lookup(
    new_docs: DataFrame,
    index_dir: str,
    as_of: int | None = None,
    small_batch: bool = False,
) -> DataFrame:
    """SERVING lookup: the same verified pairs an increment would return
    for ``new_docs`` — new-vs-corpus ∪ new-vs-new — WITHOUT committing
    anything. The index is read-only here: no pairs materialization, no
    segments, no meta update, so repeated lookups of the same batch are
    idempotent and concurrent lookups never conflict with a committing
    increment (they read the committed-segment snapshot their meta read
    pinned). This is the query-path twin of ``neardup_index_increment``
    (build/commit offline, look up online), and what a latency-sensitive
    caller should run — the equivalence-proof query keeps paying the
    build cost by design; this one measures the serving shape.

    ``as_of`` looks up against the index as it stood after that many
    committed batches (``_meta_as_of``) — reproduce yesterday's dedup
    decision, audit what an increment saw, or diff two index states.

    ``small_batch=True`` is the LATENCY contract (round-9 verdict
    item 2): the caller declares the batch and its candidate set
    driver-broadcast-sized (the point-lookup / dedup-one-shard regime
    serving actually runs in), and the plan drops its two blocking
    ``count()`` jobs — the counts exist only to feed broadcast guards,
    so a declared-small lookup broadcasts unconditionally and goes from
    ~10 sequential Spark jobs to the broadcast builds + one final
    stage. A mis-declared huge batch degrades to Spark's own broadcast
    limit error, never silence; committing increments keep the guarded
    path unconditionally."""
    meta = _meta_as_of(_recover_meta(index_dir), as_of)
    id_col, text_col = meta["id_col"], meta["text_col"]
    spark: SparkSession = new_docs.sparkSession
    batch = new_docs.select(
        F.col(id_col).alias("id"), F.col(text_col).cast("string").alias("text")
    ).persist()
    n_new = None if small_batch else batch.count()
    verified, _bands, _hsets, pinned = _neardup_batch_pairs(
        spark, index_dir, meta, batch, n_new
    )
    # caller runs the action on the lazy plan, then releases the pinned
    # frames via resources.release_plan (the standard operator contract)
    from mini_data_platform_spark.operators.resources import attach_plan

    return attach_plan(verified, batch, *pinned)


# ------------------------------------------------------- exact-hash index

_HASHES = "hashes"


def _exact_batch_resolved(
    spark: SparkSession,
    index_dir: str,
    meta: dict,
    batch: DataFrame,
    n_new: int,
) -> DataFrame:
    """The shared exact-dedup resolution plan over a hashed ``batch``
    ((content_hash, id), persisted, ``n_new`` rows): per new doc the
    smallest indexed-or-batch id sharing its content hash. Pure read;
    used by the committing increment and the serving lookup."""
    old = _read_live(spark, index_dir, _HASHES, meta)
    # min indexed id per hash, but ONLY for hashes present in the batch
    # (semi-filter first: the aggregate shuffles batch-hash rows, not the
    # whole index)
    batch_hashes = batch.select("content_hash").distinct()
    old_min = (
        old.join(_hinted(batch_hashes, n_new), "content_hash", "left_semi")
        .groupBy("content_hash")
        .agg(F.min("id").alias("_old_min"))
    )
    batch_min = batch.groupBy("content_hash").agg(
        F.min("id").alias("_batch_min")
    )
    return (
        batch.join(_hinted(old_min, n_new), "content_hash", "left")
        .join(_hinted(batch_min, n_new), "content_hash", "left")
        .select(
            "id",
            "content_hash",
            F.least(
                F.coalesce(F.col("_old_min"), F.col("_batch_min")),
                F.col("_batch_min"),
            ).alias("dup_of"),
        )
    )


def exact_index_lookup(
    new_docs: DataFrame,
    index_dir: str,
    as_of: int | None = None,
) -> DataFrame:
    """SERVING lookup against an exact-dedup index: the same
    (id, content_hash, dup_of) resolution ``exact_index_increment``
    returns, WITHOUT committing the batch — read-only, idempotent (the
    same query/commit split as ``neardup_index_lookup``, including its
    ``as_of`` time travel)."""
    from mini_data_platform_spark.functions.text import normalize_text
    from mini_data_platform_spark.operators.resources import attach_plan

    meta = _meta_as_of(_recover_meta(index_dir), as_of)
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
    n_new = batch.count()
    return attach_plan(
        _exact_batch_resolved(spark, index_dir, meta, batch, n_new), batch
    )


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
    ).persist()
    from mini_data_platform_spark.operators.resources import (
        run_concurrently,
    )

    _, n = run_concurrently(  # write ∥ count (guide §2.6), r15
        lambda: _write_segment(hashed, index_dir, _HASHES, "batch-0"),
        lambda: hashed.count(),
    )
    hashed.unpersist(False)
    meta = {
        "kind": "exact",
        "id_col": id_col,
        "text_col": text_col,
        "n_docs": n,
        "n_batches": 1,
        "segments": {_HASHES: ["batch-0"]},
    }
    _write_meta(index_dir, meta)
    return meta


def exact_index_increment(
    new_docs: DataFrame,
    index_dir: str,
    batch_id: str | None = None,
) -> DataFrame:
    """Exact-dedup a new batch against the indexed corpus: returns
    (id, content_hash, dup_of) for EVERY new doc — ``dup_of`` is the
    smallest indexed-or-batch id sharing the content hash (itself when
    the doc is the first of its content), so surviving docs are the rows
    with ``dup_of = id``. Commits the batch's hashes to the index (new
    segment + atomic meta swap).

    Scale shape: hash the batch (one scan, no shuffle), join against the
    hash table on content_hash — the corpus side carries 64-byte hashes
    + ids, never text, and only hash-equal rows survive the join. The
    batch-derived frames carry the guarded broadcast hint (dropped above
    the row threshold, so a huge batch shuffles instead of OOM-ing). The
    result is materialized to ``pairs/batch=N`` before the commit (same
    no-self-reading discipline as the near-dup increment)."""
    from mini_data_platform_spark.functions.text import normalize_text

    import uuid

    spark: SparkSession = new_docs.sparkSession
    batch = None
    try:
        for _ in range(_OCC_MAX_RETRIES):
            meta = _recover_meta(index_dir)
            if meta.get("kind") != "exact":
                raise ValueError(f"{index_dir} is not an exact-dedup index")
            replay = _replayed_batch(meta, batch_id)
            if replay is not None:
                return spark.read.parquet(
                    _pairs_path(index_dir, meta, replay)
                )
            if batch is None:
                id_col, text_col = meta["id_col"], meta["text_col"]
                batch = new_docs.select(
                    F.sha2(
                        normalize_text(F.col(text_col).cast("string")), 256
                    ).alias("content_hash"),
                    F.col(id_col).alias("id"),
                ).persist()
                n_new = batch.count()
            # resolution reads the snapshot's hash table: recompute per
            # attempt (a winner's batch may hold a smaller dup_of)
            resolved = _exact_batch_resolved(
                spark, index_dir, meta, batch, n_new
            )
            seg = f"batch-{meta['n_batches']}-{uuid.uuid4().hex[:8]}"
            out_path = os.path.join(index_dir, _PAIRS, seg)
            from mini_data_platform_spark.operators.resources import (
                run_concurrently,
            )

            run_concurrently(  # two independent writes (guide §2.6)
                lambda: resolved.write.mode("overwrite").parquet(
                    out_path
                ),
                lambda: _write_segment(
                    batch.select("content_hash", "id"),
                    index_dir, _HASHES, seg,
                ),
            )
            committed = _commit_or_none(
                index_dir,
                meta,
                {
                    "type": "increment",
                    "seq": meta["n_batches"],
                    "tables": {_HASHES: seg},
                    "pairs_seg": seg,
                    "n_docs_add": n_new,
                    "batch_id": batch_id,
                },
            )
            if committed is not None:
                return spark.read.parquet(out_path)
        raise RuntimeError(
            f"exact_index_increment: lost {_OCC_MAX_RETRIES} commit "
            f"races in a row at {index_dir} — pathological contention"
        )
    finally:
        if batch is not None:
            batch.unpersist(False)


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
    from mini_data_platform_spark.operators.resources import (
        run_concurrently,
    )

    _, _, n = run_concurrently(  # independent actions (guide §2.6)
        lambda: _write_segment(
            lsh_bucket(base, planes, "id", "vec").select("id", "bucket"),
            index_dir, _EBUCKETS, "batch-0",
        ),
        lambda: _write_segment(base, index_dir, _EVECS, "batch-0"),
        lambda: base.count(),
    )
    base.unpersist(False)
    meta = {
        "kind": "embdup",
        "id_col": id_col,
        "vec_col": vec_col,
        "threshold": threshold,
        "planes": [[float(x) for x in p] for p in planes],
        "n_docs": n,
        "n_batches": 1,
        "segments": {_EBUCKETS: ["batch-0"], _EVECS: ["batch-0"]},
    }
    _write_meta(index_dir, meta)
    return meta


def _embdup_batch_pairs(
    spark: SparkSession,
    index_dir: str,
    meta: dict,
    batch: DataFrame,
    n_new: int,
) -> tuple[DataFrame, DataFrame, list[DataFrame]]:
    """The shared embedding-lookup plan over a normalized ``batch``
    ((id, vec, nrm), persisted, ``n_new`` rows): every same-bucket pair
    involving the batch with exact cosine ≥ the index threshold, using
    the FROZEN planes. Pure read; used by the committing increment and
    the serving lookup. Returns (verified, bucketed_new, pinned)."""
    from mini_data_platform_spark.functions.vectors import cosine
    from mini_data_platform_spark.operators.similarity import lsh_bucket

    # n_new=None is the declared-small serving contract, mirroring
    # _neardup_batch_pairs: broadcast every batch-derived frame
    # unconditionally and skip the blocking guard counts
    declared_small = n_new is None

    def _guard(df: DataFrame, bound) -> DataFrame:
        return F.broadcast(df) if declared_small else _hinted(df, bound)

    threshold, planes = meta["threshold"], meta["planes"]
    bucketed_new = (
        lsh_bucket(batch, planes, "id", "vec")
        .select("id", "bucket")
        .persist()
    )

    buckets_old = _read_live(spark, index_dir, _EBUCKETS, meta)
    probe_loc = None
    if declared_small or (n_new is not None and n_new <= _PROBE_MAX_ENTRIES):
        # DRIVER-SIDE POINT PROBE (round-12, same design as the text
        # path): collect the broadcast-sized batch's bucket keys, probe
        # the corpus bucket table with ONE pushed-In scan, and generate
        # the candidate pairs in Python — the serve lookup drops the
        # distributed candidate joins entirely. Counted small batches
        # (steady increments) qualify under the same entry cap. Cap
        # overflow falls through to the distributed path below.
        # mis-declared-batch guard (round-12 advice): limit+1 collect;
        # over the cap -> entries stays None -> distributed path
        new_rows = bucketed_new.limit(_PROBE_MAX_ENTRIES + 1).collect()
        entries = (
            _probe_entries(
                buckets_old, "bucket", sorted({r[1] for r in new_rows})
            )
            if len(new_rows) <= _PROBE_MAX_ENTRIES
            else None
        )
        if entries is not None:
            probe_loc = _local_bucket_pairs(
                [(r[0], r[1]) for r in new_rows],
                [(r[0], r[1]) for r in entries],
                None,
                _VERIFY_BROADCAST_MAX_PAIRS,
                min(_VERIFY_BROADCAST_MAX_DOCS, _broadcast_max_rows()),
            )
    if probe_loc is None:
        cand_cross = (
            buckets_old.alias("o")
            .join(
                _guard(bucketed_new, n_new).alias("n"),
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
        n_cands = None if declared_small else cands.count()
    else:
        cands = None
        n_cands = None

    vecs_old = _read_live(spark, index_dir, _EVECS, meta)
    # the candidate-id filter applies in BOTH regimes: under
    # declared_small the vb side below is broadcast WHOLE, and a
    # broadcast hash join never prunes its own build side by the
    # streamed cands — an unfiltered vecs_old would broadcast every
    # indexed vector on a tiny lookup (round-10 advice, medium). Under
    # declared_small the bound is a LITERAL InSet filter (_pairs_local,
    # same rationale as the text path: a broadcast semi against the
    # cands frame embeds the whole bucketing lineage into the
    # broadcast vb side — the round-11 plan defect); a mis-declared
    # batch degrades to an unhinted semi-join. The counted path keeps
    # the 2·n_cands-guarded semi-join.
    cands_v = cands
    if probe_loc is not None:
        loc = probe_loc
    else:
        loc = (
            _pairs_local(
                cands, _VERIFY_BROADCAST_MAX_PAIRS, _VERIFY_BROADCAST_MAX_DOCS
            )
            if declared_small else None
        )
    if loc is not None:
        cand_pairs, cand_id_list = loc
        vecs_old = vecs_old.where(_isin_filter(cand_id_list))
        # literal pair frame for the verify joins: no candidate lineage
        # in the serve plan, no second action (see _pairs_local)
        from pyspark.sql import types as T

        idt = bucketed_new.schema["id"].dataType
        pair_schema = T.StructType(
            [T.StructField("id_a", idt), T.StructField("id_b", idt)]
        )
        cands_v = _literal_pairs_frame(spark, cand_pairs, pair_schema)
    else:
        cand_ids = (
            cands.select(F.col("id_a").alias("id"))
            .unionByName(cands.select(F.col("id_b").alias("id")))
            .distinct()
        )
        vecs_old = vecs_old.join(
            cand_ids if declared_small
            else _hinted(cand_ids, 2 * n_cands),
            "id", "left_semi",
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
    # a literal candidate frame is dial-bounded by construction
    # (max_ids ≤ min(verify ceiling, broadcast dial)), so it earns the
    # hard hint in the counted regime too — same bound _hinted enforces
    small_literal = declared_small or loc is not None
    cands_j = F.broadcast(cands_v) if small_literal else cands_v
    vb_j = F.broadcast(vb) if small_literal else vb
    verified = (
        cands_j.join(va, "id_a")
        .join(vb_j, "id_b")
        .select(
            "id_a",
            "id_b",
            cosine(
                F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
    pinned = (
        [bucketed_new] if cands is None else [cands, bucketed_new]
    )
    return verified, bucketed_new, pinned


def embdup_index_lookup(
    new_vecs: DataFrame,
    index_dir: str,
    as_of: int | None = None,
    small_batch: bool = False,
) -> DataFrame:
    """SERVING lookup against an embedding near-dup index: the same
    verified (id_a, id_b, cos_sim) pairs ``embdup_index_increment``
    returns, WITHOUT committing the batch — read-only, idempotent (the
    same query/commit split as ``neardup_index_lookup``, including its
    ``as_of`` time travel and the same ``small_batch`` latency
    contract: batch + candidates declared broadcast-sized, guard-count
    jobs dropped, verification collapses to broadcast joins)."""
    from mini_data_platform_spark.functions.vectors import l2_norm
    from mini_data_platform_spark.operators.resources import attach_plan

    meta = _meta_as_of(_recover_meta(index_dir), as_of)
    if meta.get("kind") != "embdup":
        raise ValueError(f"{index_dir} is not an embedding near-dup index")
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    spark: SparkSession = new_vecs.sparkSession
    batch = new_vecs.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        l2_norm(F.col(vec_col)).alias("nrm"),
    ).persist()
    n_new = None if small_batch else batch.count()
    verified, _bucketed, pinned = _embdup_batch_pairs(
        spark, index_dir, meta, batch, n_new
    )
    return attach_plan(verified, batch, *pinned)


def embdup_index_increment(
    new_vecs: DataFrame,
    index_dir: str,
    batch_id: str | None = None,
) -> DataFrame:
    """Near-dup a new vector batch against the indexed corpus: every
    same-bucket pair involving the new batch with exact cosine ≥ the
    index threshold — (id_a, id_b, cos_sim), id_a < id_b — then commit
    the batch. Same scale/durability shape as the MinHash increment:
    bucket the batch with the FROZEN planes, stream the corpus bucket
    table against the batch's buckets (guarded broadcast — hint dropped
    above the row threshold), verify with candidate-bounded vector
    reads, materialize to ``pairs/batch=N`` before the atomic segment
    commit."""
    from mini_data_platform_spark.functions.vectors import l2_norm

    import uuid

    spark: SparkSession = new_vecs.sparkSession
    batch = None
    try:
        for _ in range(_OCC_MAX_RETRIES):
            meta = _recover_meta(index_dir)
            if meta.get("kind") != "embdup":
                raise ValueError(
                    f"{index_dir} is not an embedding near-dup index"
                )
            replay = _replayed_batch(meta, batch_id)
            if replay is not None:
                return spark.read.parquet(
                    _pairs_path(index_dir, meta, replay)
                )
            if batch is None:
                id_col, vec_col = meta["id_col"], meta["vec_col"]
                batch = new_vecs.select(
                    F.col(id_col).alias("id"),
                    F.col(vec_col).alias("vec"),
                    l2_norm(F.col(vec_col)).alias("nrm"),
                ).persist()
                n_new = batch.count()
            verified, bucketed_new, pinned = _embdup_batch_pairs(
                spark, index_dir, meta, batch, n_new
            )
            seg = f"batch-{meta['n_batches']}-{uuid.uuid4().hex[:8]}"
            out_path = os.path.join(index_dir, _PAIRS, seg)
            from mini_data_platform_spark.operators.resources import (
                run_concurrently,
            )

            run_concurrently(  # independent writes (guide §2.6)
                lambda: verified.write.mode("overwrite").parquet(
                    out_path
                ),
                lambda: _write_segment(
                    bucketed_new, index_dir, _EBUCKETS, seg
                ),
                lambda: _write_segment(batch, index_dir, _EVECS, seg),
            )
            for f in pinned:
                f.unpersist(False)
            committed = _commit_or_none(
                index_dir,
                meta,
                {
                    "type": "increment",
                    "seq": meta["n_batches"],
                    "tables": {_EBUCKETS: seg, _EVECS: seg},
                    "pairs_seg": seg,
                    "n_docs_add": n_new,
                    "batch_id": batch_id,
                },
            )
            if committed is not None:
                return spark.read.parquet(out_path)
        raise RuntimeError(
            f"embdup_index_increment: lost {_OCC_MAX_RETRIES} commit "
            f"races in a row at {index_dir} — pathological contention"
        )
    finally:
        if batch is not None:
            batch.unpersist(False)


def compact_index(spark: SparkSession, index_dir: str) -> dict[str, int]:
    """Compact an incremental index's per-batch segments (every
    increment commits one segment dir; after many batches the
    bucket/doc tables fragment into many dirs of small files — each one
    a scan task and an object-store request). Each table's committed
    segments are read as one frame, rewritten to ~128 MB files in a
    fresh ``compact-N-<token>`` segment, and every rewrite (plus the
    tombstone clear) lands in ONE OCC commit record — a crash at any
    point leaves either the old committed state or the new one, never a
    mix; leftover dirs are invisible to readers. Returns
    {table: n_files_after}. Past increments' materialized ``pairs/``
    outputs are left untouched (immutable results).

    MULTI-WRITER (round-9): compaction serializes against concurrent
    increments via the shared ticket protocol (operators/occlog.py) —
    a ticket loss (an increment committed after compaction's read)
    RAISES rather than stomping the newer state; re-run to compact the
    advanced index. The abandoned compact dirs are vacuumable
    orphans."""
    import math
    import shutil
    import uuid

    from mini_data_platform_spark.sinks.compact import (
        DEFAULT_TARGET_BYTES,
        dir_parquet_stats,
    )

    meta = _recover_meta(index_dir)  # validates this IS an index
    tables = {
        "exact": [_HASHES],
        "embdup": [_EBUCKETS, _EVECS],
    }.get(meta.get("kind"), [_BUCKETS, _DOCS])
    tomb_segs = list(meta["segments"].get(_TOMBSTONES, []))
    out: dict[str, int] = {}
    token = uuid.uuid4().hex[:8]
    rewritten: dict[str, str] = {}
    superseded: dict[str, list[str]] = {}
    for t in tables:
        old_segs = meta["segments"][t]
        paths = _segment_paths(index_dir, t, meta)
        n_files = total = 0
        for p in paths:
            n, b = dir_parquet_stats(p)
            n_files += n
            total += b
        want = max(1, math.ceil(total / DEFAULT_TARGET_BYTES))
        # with tombstones pending, every table MUST rewrite (the purge
        # is the point), so the small-enough-already skip is disabled
        if len(old_segs) == 1 and n_files <= want and not tomb_segs:
            out[t] = n_files
            continue
        new_seg = f"compact-{meta['n_batches']}-{token}"
        # read through the LIVE filter: tombstoned rows are physically
        # dropped here — the erasure step of a takedown (index_delete
        # only hides; this removes the bytes from disk)
        df = _read_live(spark, index_dir, t, meta)
        _write_segment(df.repartition(want), index_dir, t, new_seg)
        rewritten[t] = new_seg
        superseded[t] = [s for s in old_segs if s != new_seg]
    if not rewritten and not tomb_segs:
        return out
    committed = _commit_or_none(
        index_dir,
        meta,
        {
            "type": "compact",
            "tables": {t: [seg] for t, seg in rewritten.items()},
            # time-travel boundary: folded batches are no longer
            # reconstructible (_meta_as_of refuses them)
            "compacted_through": meta["n_batches"],
            # tombstones drop in the SAME record as the rewrites they
            # were purged by — never cleared while a table still holds
            # tombstoned rows
            "clear_tombstones": bool(tomb_segs),
        },
    )
    if committed is None:
        for t, seg in rewritten.items():
            shutil.rmtree(
                os.path.join(index_dir, t, seg), ignore_errors=True
            )
        raise RuntimeError(
            "compact_index: a concurrent commit landed during "
            "compaction; the rewrite is stale — re-run to compact the "
            "advanced index"
        )
    for t, segs in superseded.items():
        for seg in segs:
            shutil.rmtree(
                os.path.join(index_dir, t, seg), ignore_errors=True
            )
    for t, seg in rewritten.items():
        out[t] = dir_parquet_stats(os.path.join(index_dir, t, seg))[0]
    if tomb_segs:
        for seg in tomb_segs:
            shutil.rmtree(
                os.path.join(index_dir, _TOMBSTONES, seg),
                ignore_errors=True,
            )
    return out



def neardup_index_pairs(
    spark: SparkSession, index_dir: str, as_of: int | None = None
) -> DataFrame:
    """All verified near-dup pairs WITHIN the indexed corpus AS OF NOW,
    computed from the index's own artifacts: candidate pairs from a
    self-join of the persisted band-bucket table (no re-signing of
    anything), then exact-Jaccard verification with candidate-bounded
    doc reads. Honors the index's ``max_bucket`` (full as-of-now
    occupancy — the same filter a capped recompute applies), so with
    ``neardup_index_increment`` this completes the index algebra:
    pairs(corpus as of now) = index_pairs(after build) ∪ every
    increment's pairs — at no point is the corpus re-shingled wholesale.
    (Under a finite cap the union carries each increment's SNAPSHOT
    semantics — see ``neardup_index_increment``.)

    The result is MATERIALIZED to ``pairs/snapshot=N_batches`` and
    returned as a parquet read (the same durability discipline as the
    increments): the returned plan is a stable snapshot — future appends
    cannot leak into it, which is what makes
    ``index_pairs(build) ∪ increment`` safe to compose lazily.

    ``as_of`` restricts to the corpus after that many committed batches
    (the snapshot file is keyed by the as-of batch count, so snapshots
    of different eras coexist)."""
    meta = _meta_as_of(_recover_meta(index_dir), as_of)
    threshold, shingle_n = meta["threshold"], meta["shingle_n"]
    max_bucket = meta.get("max_bucket")
    buckets = _read_live(spark, index_dir, _BUCKETS, meta)
    if max_bucket is not None:
        sizes = (
            buckets.groupBy("band_id", "band_key")
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") <= max_bucket)
            .select("band_id", "band_key")
        )
        buckets = buckets.join(sizes, ["band_id", "band_key"], "left_semi")
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
    n_cands = cands.count()
    cand_ids = (
        cands.select(F.col("id_a").alias("id"))
        .unionByName(cands.select(F.col("id_b").alias("id")))
        .distinct()
    )
    docs_live = _read_live(spark, index_dir, _DOCS, meta)
    if _SHH in docs_live.columns:
        # hash-verify from the persisted shingle-hash sets (text pruned)
        hsets = docs_live.select("id", _SHH).join(
            _hinted(cand_ids, 2 * n_cands), "id", "left_semi"
        )
        # same gate as the batch path: the MDP_INCR_BROADCAST_MAX_ROWS
        # dial is the module's ONE hard-broadcast knob — dial=0 must
        # strip every hard hint from this plan too (round-10 advice)
        scored = jaccard_pairs_from_hashes(
            hsets, cands, "id",
            small_pairs=2 * n_cands
            <= min(_VERIFY_BROADCAST_MAX_DOCS, _broadcast_max_rows()),
            involved_filtered=True,
        )
    else:
        docs = docs_live.join(
            _hinted(cand_ids, 2 * n_cands), "id", "left_semi"
        )
        scored = jaccard_pairs_from(
            _staged_shingles(docs, "id", "text", shingle_n), cands, "id"
        )
    out = (
        scored
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    snap = os.path.join(
        index_dir, _PAIRS, f"snapshot={meta['n_batches']}"
    )
    out.write.mode("overwrite").parquet(snap)
    cands.unpersist(False)
    return spark.read.parquet(snap)
