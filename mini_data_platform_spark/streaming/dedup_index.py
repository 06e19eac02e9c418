"""Streaming dedup driven THROUGH the persisted incremental indexes —
the last unification of batch and streaming dedup state.

streaming/neardup.py keeps TTL-bounded in-memory state and bridges to
the persisted index via seed export/drain; this module goes the other
way: each micro-batch IS an index increment. The index becomes the one
durable dedup state — batch backfills, streaming ingest, serving
lookups, and takedown deletes all see the same committed corpus, and a
restarted stream resumes against everything every other writer has
committed (single-writer discipline per index still applies: one
committing stream OR batch job at a time; read-only lookups are always
safe).

Exactly-once comes from composing two at-least-once halves, the same
argument as streaming/ivm.py: foreachBatch replays a crashed epoch
under the SAME epoch id, and the index increments' ``batch_id`` replay
protection makes the second apply a no-op that returns the original
batch's materialized ``pairs/batch=N``. The per-epoch resolution is
therefore durable and re-readable — downstream consumers read the
``pairs/`` log as the stream's output.

Scale per micro-batch = one index increment: sign/hash the batch only,
probe committed segments guarded-broadcast, candidate-bounded
verification — O(batch + candidates), never O(corpus). Run
``compact_index`` from a maintenance window to fold the
one-segment-per-epoch log (exactly the small-file story the IVM views
have).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from mini_data_platform_spark.streaming.ivm import checkpoint_key


def _maintain(fold, docs, index_dir, checkpoint_dir, available_now):
    ckpt_key = checkpoint_key(checkpoint_dir)

    def process(batch: DataFrame, epoch_id: int) -> None:
        fold(batch, index_dir, batch_id=f"epoch-{ckpt_key}-{epoch_id}")

    writer = (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def maintain_exact_index_stream(
    docs: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
) -> StreamingQuery:
    """Streaming EXACT dedup against a persisted hash index
    (``exact_index_build``): every micro-batch is resolved (each doc's
    ``dup_of`` = smallest indexed-or-batch id with its content hash) and
    committed, exactly-once. The per-epoch resolutions land in the
    index's ``pairs/`` log."""
    from mini_data_platform_spark.operators.incremental import (
        exact_index_increment,
    )

    return _maintain(
        exact_index_increment, docs, index_dir, checkpoint_dir,
        available_now,
    )


def maintain_neardup_index_stream(
    docs: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
) -> StreamingQuery:
    """Streaming NEAR-dup detection against a persisted MinHash-LSH
    index: each micro-batch's verified pairs (new-vs-corpus ∪
    new-vs-new) are materialized per epoch and the batch joins the
    corpus for every later epoch/batch/lookup. The durable-state
    counterpart of ``streaming/neardup.near_dup_candidates_stream``'s
    in-memory TTL operator — use that one for bounded-latency
    candidate flagging, this one when the corpus index is the source
    of truth."""
    from mini_data_platform_spark.operators.incremental import (
        neardup_index_increment,
    )

    return _maintain(
        neardup_index_increment, docs, index_dir, checkpoint_dir,
        available_now,
    )


def maintain_index_from_wire(
    wire: DataFrame,
    value_schema,
    columns: list[str],
    index_dir: str,
    checkpoint_dir: str,
    fold,
    key_type: str = "string",
    value_format: str = "json",
    available_now: bool = False,
    on_retombstoned: str = "fail",
) -> StreamingQuery:
    """Kafka-wire → incremental index, tombstones included — the
    real-time corpus-maintenance capstone (SURVEY §2.9 S10 + the
    incremental-index family): a frame carrying the Kafka wire schema
    (the real Kafka source in deployment; a wire-schema file stream in
    tests) decodes via ``streaming/kafka.kafka_records`` and each
    micro-batch becomes ONE index commit pair:

    - live records (non-null value) increment the index via ``fold``
      (``neardup_index_increment`` / ``exact_index_increment`` — the
      same O(batch + candidates) point-probe path serving uses);
    - TOMBSTONE records (null value — a compacted topic's deletion
      markers) become ``index_delete`` takedowns keyed by the record
      KEY cast to ``key_type`` (the indexed id type, e.g. ``bigint``).
      A compacted Kafka topic's retention contract thus maps onto the
      index's takedown/compaction contract: key deleted upstream ⇒
      doc retracted from every later lookup, physically purged at the
      next ``compact_index``.

    Compaction-order semantics (round-12 advice, made
    boundary-INDEPENDENT in round 15): WITHIN an epoch the per-key
    outcome follows wire order, exactly like log compaction — a key's
    LAST record (max ``_src_file``, which is zero-padded per-partition
    offset order, and Kafka keys a key to one partition) decides:
    tombstone-last ⇒ deleted, live-last ⇒ present, so a tombstone
    followed by a same-epoch re-add keeps the re-add. ACROSS epochs,
    tombstones are committed WITH the wire offset that ordered them
    (``index_delete(offset_col=...)``), and the admission GUARD probes
    each epoch's live ids against the index's live tombstone set
    (``index_tombstoned_ids`` — zero cost for the common never-deleted
    index, replay-aware so a crashed epoch's recovery is not refused
    by its own delete half). A re-add of a prior-epoch-tombstoned id
    is then resolved per ``on_retombstoned``:

    - ``"readd-wins"``: log-compaction order made GLOBAL — a live
      record at a LATER wire offset than its id's tombstone wins
      across epochs exactly as it would within one: the id is revived
      (``index_revive``, an O(revive-set) event-log commit) and the
      record folds; a live record at an EARLIER offset is superseded
      history and is dropped (logged). Identical topic contents now
      converge to the SAME index state wherever the epoch boundaries
      fall (trigger timing, maxOffsetsPerTrigger, checkpoint history).
      Offset-LESS tombstones — batch/GDPR takedowns via plain
      ``index_delete`` — carry no wire position, so no record can
      post-date them: they stay terminal even under this mode.
    - ``"fail"`` (default): raise, failing the epoch loudly BEFORE the
      fold — nothing commits, the operator fixes the producer (fresh
      id), or reruns with quarantine/readd-wins;
    - ``"quarantine"``: drop the offending records (logged with id
      samples) and commit the rest — the takedown stays terminal and
      the drop is observable, never silent.

    Under ``fail``/``quarantine`` a cross-epoch re-add is refused
    where a same-epoch one wins — honest but boundary-DEPENDENT;
    choose ``readd-wins`` when the topic is the source of truth and
    compacted-topic semantics are wanted end-to-end. After
    ``compact_index`` physically purges a tombstone, the id is
    genuinely fresh again — the compacted-topic delete.retention
    analogy.

    Malformed payloads (PERMISSIVE decode ⇒ null columns) and live
    records with a null id are dropped before the fold — the
    batch-runner's never-raise quarantine contract; nothing downstream
    exists here to absorb a null key. Live records whose Kafka KEY
    disagrees with their PAYLOAD id (producer bug, or a ``'01'`` vs
    ``'1'`` key surviving the cast) are excluded from the per-key
    delete decision — the payload id is what the fold indexes, so a
    mismatched live record must not veto the takedown of a different
    doc id (round-13 advice); it still folds under its payload id.

    Exactly-once: foreachBatch replays a crashed epoch under the same
    epoch id, and BOTH halves carry derived ``batch_id``s
    (``...-{epoch}`` / ``...-{epoch}-del``), so each is a no-op on
    replay — a crash between the two halves replays into
    increment-no-op + delete-apply, converging to the same state.

    ``columns`` are the payload fields to feed ``fold`` (e.g.
    ``[id_col, text_col]``); extra payload fields are dropped here so
    the index segments never absorb unrelated wire columns."""
    import logging

    from pyspark.sql import functions as F

    from mini_data_platform_spark.operators.incremental import (
        index_delete,
        index_revive,
        index_tombstoned_ids,
    )
    from mini_data_platform_spark.streaming.kafka import kafka_records

    if on_retombstoned not in ("fail", "quarantine", "readd-wins"):
        raise ValueError(
            "on_retombstoned must be 'fail', 'quarantine' or "
            f"'readd-wins', got {on_retombstoned!r}"
        )
    recs = kafka_records(
        wire, value_schema, value_format=value_format,
        drop_tombstones=False,
    )
    ckpt_key = checkpoint_key(checkpoint_dir)

    def process(batch: DataFrame, epoch_id: int) -> None:
        base = f"epoch-{ckpt_key}-{epoch_id}"
        # null-id quarantine (never-raise contract): malformed
        # PERMISSIVE-decoded payloads must not reach the fold — a null
        # id would either crash the probe's Python pair loop or commit
        # an unprobeable doc
        live = batch.where(~F.col("_tombstone")).where(
            F.col(columns[0]).isNotNull()
        )
        # re-add guard: a live id that a PRIOR epoch tombstoned would
        # fold into a segment the terminal tombstone hides — silent
        # divergence from the rebuild twin. None on the no-tombstone
        # fast path and on exactly-once replays (fold is a no-op then).
        tombs = index_tombstoned_ids(
            batch.sparkSession, index_dir, base,
            with_offsets=(on_retombstoned == "readd-wins"),
        )
        if tombs is not None and on_retombstoned == "readd-wins":
            # global log-compaction order: per record, LATER wire
            # offset than the id's tombstone ⇒ the re-add wins (revive
            # + fold); earlier-or-unknown ⇒ superseded history, drop.
            # Offset-less tombstones (null) are batch/GDPR takedowns
            # with no wire position — terminal under every mode.
            readds = tombs.withColumnRenamed(
                "id", columns[0]
            ).withColumnRenamed("offset", "_tomb_off")
            j = live.join(readds, columns[0], "left")
            wins = F.col("_tomb_off").isNotNull() & (
                F.col("_src_file") > F.col("_tomb_off")
            )
            lost = [
                r[0]
                for r in j.where(F.col("_tomb_off").isNotNull() & ~wins)
                .select(columns[0])
                .distinct()
                .limit(6)
                .collect()
            ]
            if lost:
                logging.getLogger(__name__).warning(
                    "wire epoch %s: dropped superseded re-add(s) of "
                    "tombstoned id(s) %s — record offset precedes the "
                    "tombstone, or the takedown is offset-less "
                    "(batch/GDPR) and terminal",
                    epoch_id, sorted(lost)[:5],
                )
            winners = j.where(wins).select(
                F.col(columns[0]).alias("id")
            ).distinct()
            if winners.limit(1).count() > 0:
                index_revive(winners, index_dir, batch_id=base + "-rev")
            live = j.where(F.col("_tomb_off").isNull() | wins).drop(
                "_tomb_off"
            )
        elif tombs is not None:
            readds = tombs.withColumnRenamed("id", columns[0])
            hit = [
                r[0]
                for r in live.select(columns[0])
                .join(readds, columns[0], "left_semi")
                .limit(6)
                .collect()
            ]
            if hit and on_retombstoned == "fail":
                raise RuntimeError(
                    f"wire epoch {epoch_id} re-adds tombstoned id(s) "
                    f"{sorted(hit)[:5]} — takedowns are terminal; "
                    "re-ingest under a fresh id, or run with "
                    "on_retombstoned='quarantine' to drop them, or "
                    "'readd-wins' for global log-compaction order"
                )
            if hit:
                logging.getLogger(__name__).warning(
                    "wire epoch %s: quarantined re-add(s) of tombstoned "
                    "id(s) %s — takedowns are terminal",
                    epoch_id, sorted(hit)[:5],
                )
                live = live.join(readds, columns[0], "left_anti")
        fold(live.select(*columns), index_dir, batch_id=base)
        # pure-append epochs (the steady state) pay ONE limit-1 scan
        # here and skip the per-key aggregate entirely — the delete-set
        # shuffle only runs for epochs that actually carry tombstones,
        # and only those commit a tombstone segment
        if batch.where(F.col("_tombstone")).limit(1).count() == 0:
            return
        # per-key LAST record decides (log-compaction order): a key
        # whose max-offset record is live was re-created after its
        # tombstone inside this epoch and must NOT enter the delete
        # set; _src_file is zero-padded per-partition offset order and
        # a key maps to one partition, so lexicographic max == latest.
        # Quarantined records (malformed payload -> null id) are
        # excluded from the aggregate BEFORE max_by: they never reach
        # the fold, so letting one outrank a tombstone would discard
        # the upstream deletion while adding nothing — the pre-
        # tombstone doc would be served forever. Same exclusion for
        # live records whose key disagrees with their payload id
        # (cast both to key_type): the fold indexes the PAYLOAD id, so
        # a mis-keyed live record vetoing this key's tombstone would
        # keep serving a DIFFERENT, deleted doc forever
        _kid = F.col("_kafka_key").cast(key_type)
        _pid = F.col(columns[0]).cast(key_type)
        dead = (
            batch.where(
                F.col("_tombstone")
                | (F.col(columns[0]).isNotNull() & (_kid == _pid))
            )
            .groupBy("_kafka_key")
            .agg(
                F.max_by(F.col("_tombstone"), F.col("_src_file")).alias(
                    "_dead"
                ),
                # when the key is dead its max offset IS the winning
                # tombstone's wire position — stored with the tombstone
                # so a later epoch's re-add can be ordered against it
                F.max(F.col("_src_file")).alias("offset"),
            )
            .where(F.col("_dead"))
            .select(
                F.col("_kafka_key").cast(key_type).alias("id"), "offset"
            )
            .where(F.col("id").isNotNull())
            .distinct()
            .persist()
        )
        try:
            # the max-offset rule can empty the delete set even when
            # tombstones exist (every tombstoned key re-added later in
            # the epoch) — still only commit a segment when non-empty
            if dead.limit(1).count() > 0:
                index_delete(
                    dead, index_dir, batch_id=base + "-del",
                    offset_col="offset",
                )
        finally:
            dead.unpersist()

    writer = (
        recs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def maintain_neardup_index_from_wire(
    wire: DataFrame,
    value_schema,
    id_col: str,
    text_col: str,
    index_dir: str,
    checkpoint_dir: str,
    key_type: str = "bigint",
    value_format: str = "json",
    available_now: bool = False,
    on_retombstoned: str = "fail",
) -> StreamingQuery:
    """``maintain_index_from_wire`` specialized to a near-dup index:
    live wire records near-dup-increment the corpus, tombstoned keys
    are taken down. See the generic for the exactly-once argument and
    the ``on_retombstoned`` re-add guard contract."""
    from mini_data_platform_spark.operators.incremental import (
        neardup_index_increment,
    )

    return maintain_index_from_wire(
        wire, value_schema, [id_col, text_col], index_dir,
        checkpoint_dir, neardup_index_increment, key_type=key_type,
        value_format=value_format, available_now=available_now,
        on_retombstoned=on_retombstoned,
    )
