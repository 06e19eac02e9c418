"""Batch ingestion runner — the reference's Airflow DAG re-expressed as one
Spark program (SURVEY.md §3.1, §7 M6).

Pipeline per batch: discover → validate (file granularity) → route
(clean+dedup+upsert | quarantine) → finalize moves → audit. Fault routing
matches the reference's prefix vocabulary
(/root/reference/dags/process_sales_dags.py:145-198):

- ``failed/validation_failed/``  invalid files, moved before any processing
- ``failed/processing_failed/``  read/clean errors
- ``failed/loading_failed/``     sink errors
- ``processed/``                 loaded files

Two execution modes:

- **scale mode** (default): ALL valid files are cleaned, deduped and
  upserted in ONE Spark job. Cross-file key collisions resolve exactly as
  the reference's sequential per-file upserts would (later file wins) via
  a file-rank precedence column in the dedup window — so the result is
  bit-identical to the file-loop, but the cluster sees a single
  clean→window→sink plan over every file at once. Per-file row counts
  come from one small groupBy on the file rank. This is the 100 TB path:
  no per-file driver round-trips, one shuffle (the dedup window), and the
  sink commits once (idempotent upsert makes retries safe). As of round
  14 the staging itself is file-count-scalable: files are read as a few
  signature-grouped MULTI-PATH scans (rank recovered from
  ``input_file_name``) instead of per-file reads chained through an
  O(n²)-analysis union — the 512-file wall the INGEST_SCALE file-count
  ladder measured (see ``_stage_valid_files``).
- **per-file mode** (``per_file=True``): the reference's loop, for
  deployments that need per-file transactions / fault isolation at the
  cost of one job per file.

Design deviations from the reference, on purpose (SURVEY.md §3.1(iv)):
files are routed to exactly ONE branch (the reference runs invalid files
through process_file too and catches the exception after quarantining);
validate and process read the file once each, not twice.

Moves are driver-side side effects performed AFTER the sink commit
(order: upsert → move → audit, process_sales_dags.py:186-190), never
inside Spark tasks, so task retries cannot double-move files.
"""

from __future__ import annotations

import logging
import os
import re
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from mini_data_platform_spark.operators.clean import clean_sales  # noqa: F401 — kept for API compat
from mini_data_platform_spark.operators.dedup import (
    INGEST_ORDER_COL,
    dedup_keep_latest,
    with_ingest_order,
)
from mini_data_platform_spark.registry import (
    SALES_SPEC,
    TableSpec,
    clean_table,
)
from mini_data_platform_spark.schema import SALES_COLUMNS  # noqa: F401
from mini_data_platform_spark.sinks.audit import AuditLog
from mini_data_platform_spark.sinks.objects import move_object
from mini_data_platform_spark.sources.readers import read_file_as_strings
from mini_data_platform_spark.sources.validate import validate_file

logger = logging.getLogger(__name__)

FILE_RANK_COL = "_file_rank"


@dataclass
class FileOutcome:
    path: str
    status: str  # loaded | validation_failed | processing_failed | load_failed
    rows: int | None = None
    error: str | None = None


@dataclass
class IngestReport:
    outcomes: list[FileOutcome] = field(default_factory=list)
    rows_upserted: int = 0
    #: wall time of the batch (set by run_batch_ingest) — feeds the
    #: metrics surface (metrics.ingest_metrics rows/min vs the
    #: reference's 10k baseline)
    duration_s: float | None = None

    @property
    def loaded(self) -> list[FileOutcome]:
        return [o for o in self.outcomes if o.status == "loaded"]

    @property
    def failed(self) -> list[FileOutcome]:
        return [o for o in self.outcomes if o.status != "loaded"]


def discover_files(incoming_dir: str) -> list[str]:
    """Deterministic (sorted) listing of the incoming prefix — local glob
    or paginated S3 listing. The order defines cross-file precedence
    exactly like the reference's list_objects order."""
    from mini_data_platform_spark.sinks.objects import list_objects

    return list_objects(incoming_dir)


def _quarantine(
    path: str, failed_dir: str, reason: str, audit: AuditLog | None, error: str
) -> FileOutcome:
    move_object(path, os.path.join(failed_dir, reason, os.path.basename(path)))
    if audit:
        audit.log_file_status(path, failed_dir, reason, error=error)
    return FileOutcome(path, reason, error=error)


def _prepare_one(
    spark: SparkSession, path: str, rank: int, spec: TableSpec
) -> DataFrame:
    """Read one validated file and stage it for the unioned clean: string
    cast, canonical columns, file-rank + ingest-order tags."""
    df = read_file_as_strings(spark, path)
    for c in spec.columns:
        if c not in df.columns:
            df = df.withColumn(c, F.lit(None).cast("string"))
    return with_ingest_order(df.select(*spec.columns)).withColumn(
        FILE_RANK_COL, F.lit(rank)
    )


class _NoSignature(Exception):
    """A file whose read-signature cannot be derived driver-side (remote
    path, unreadable head) — the batch falls back to the per-file union
    staging, which needs no signatures."""


#: basenames whose URI spelling (what ``input_file_name()`` reports) is
#: guaranteed identical to ``os.path.basename`` — the rank join's key
#: equality proof. Anything else falls back to per-file staging.
_SAFE_BASE = re.compile(r"^[A-Za-z0-9._=-]+$")


_FILE_BASE_COL = "_file_base"


def _csv_header_line(path: str) -> str:
    """The file's RAW first line — two CSVs with the identical header
    line parse to the identical column tuple, which is exactly the
    condition for reading them in ONE multi-path scan."""
    try:
        with open(path, "rb") as fh:
            line = fh.readline(1 << 20)
    except OSError as e:
        raise _NoSignature(path) from e
    return line.decode("utf-8", errors="replace").rstrip("\r\n")


#: JSON files above this size are staged as their own single-file scan
#: (per-file semantics trivially preserved) instead of paying a full
#: driver-side parse for the type signature; the file-count-scale regime
#: this path exists for is MANY SMALL files, so solo groups for the rare
#: big file cost one extra scan, not a per-file plan per batch.
_JSON_SIG_MAX_BYTES = 8 << 20


def _json_scalar_class(v) -> object:
    """Classify one parsed JSON value the way Spark's JSON schema
    inference types it (JsonInferSchema): null / bool / long (fits
    int64) / dec (integer wider than int64 → DecimalType) / double /
    string, with objects and arrays recursing."""
    if v is None:
        return "null"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "bool"
    if isinstance(v, int):
        return "long" if -(1 << 63) <= v < (1 << 63) else "dec"
    if isinstance(v, float):
        return "double"
    if isinstance(v, str):
        return "string"
    if isinstance(v, dict):
        return (
            "obj",
            tuple(
                sorted(
                    ((k, _json_scalar_class(x)) for k, x in v.items()),
                    key=lambda kv: kv[0],
                )
            ),
        )
    if isinstance(v, list):
        elem: object = "null"
        for x in v:
            elem = _json_merge_class(elem, _json_scalar_class(x))
        return ("arr", elem)
    raise ValueError(f"unclassifiable JSON value: {type(v)!r}")


def _json_merge_class(a, b):
    """Mirror of Spark's ``compatibleType`` merge lattice on the class
    encoding above: equal → same; null absorbs; long/double/dec widen
    numerically; obj+obj merge field-wise (a missing field is just
    nullable); arr+arr merge elements; every other pair falls back to
    string — exactly Spark's behavior, which is what makes "equal merged
    signatures ⇒ identical group-vs-per-file inferred schema" hold."""
    if a == b:
        return a
    if a == "null":
        return b
    if b == "null":
        return a
    if isinstance(a, str) and isinstance(b, str):
        pair = {a, b}
        if pair == {"long", "double"}:
            return "double"
        if pair == {"long", "dec"}:
            return "dec"
        if pair == {"double", "dec"}:
            return "double"
        return "string"
    if isinstance(a, tuple) and isinstance(b, tuple) and a[0] == b[0]:
        if a[0] == "obj":
            fields = dict(a[1])
            for k, c in b[1]:
                fields[k] = _json_merge_class(fields[k], c) if k in fields else c
            return ("obj", tuple(sorted(fields.items(), key=lambda kv: kv[0])))
        if a[0] == "arr":
            return ("arr", _json_merge_class(a[1], b[1]))
    return "string"


def _json_type_signature(path: str, layout: str) -> tuple | None:
    """Merged top-level key/type signature of a local JSON file, parsed
    WHOLE driver-side (no sampling — sampled signatures can miss drift
    later in the file). Returns ``None`` when the file can't be cleanly
    signed (too big, compressed, unparseable, non-object records, empty)
    — the caller stages it as its own solo group, which preserves
    per-file semantics by construction."""
    import json

    from mini_data_platform_spark.sources.formats import is_compressed_path

    try:
        if (
            is_compressed_path(path)
            or os.path.getsize(path) > _JSON_SIG_MAX_BYTES
        ):
            return None
        with open(path, "rb") as fh:
            raw = fh.read()
        if layout == "array":
            records = json.loads(raw)
            if not isinstance(records, list):
                return None
        else:
            records = [
                json.loads(line)
                for line in raw.splitlines()
                if line.strip()
            ]
    except Exception:  # noqa: BLE001 — unreadable/unparseable: solo group
        return None
    merged: object = "null"
    try:
        for rec in records:
            if not isinstance(rec, dict):
                return None
            merged = _json_merge_class(merged, _json_scalar_class(rec))
    except ValueError:  # exotic value type from the decoder — solo group
        return None
    if merged == "null":  # no records — contributes no rows either way
        return None
    return merged


def _file_signature(path: str) -> tuple:
    """Group key under which files are SAFE to read as one multi-path
    scan with per-file semantics preserved:

    - csv: identical raw header line (same parsed columns, same order —
      positional alignment under one inferred all-string schema);
      compressed CSVs (raw header bytes are codec garbage) stage solo;
    - json: same layout (array vs ndjson) AND same merged top-level
      key/type signature, parsed whole driver-side. Layout alone is NOT
      enough: Spark infers ONE schema per scan, so cross-file type
      drift (long in file A, double in file B) would widen group-wide
      and the cast-to-string would render different bytes than per-file
      staging ('123.0' vs '123'). Files whose signature can't be
      derived (big, compressed, unparseable) stage solo — per-file
      semantics by construction, no batch-wide fallback;
    - parquet: identical normalized footer schema (read driver-side via
      pyarrow — no py4j round trip); files with drifted footers land in
      separate groups and meet only AFTER the all-string cast, exactly
      like the per-file path;
    - orc / anything else: one group per file (rare here; keeps legacy
      per-file read semantics without a special case)."""
    from mini_data_platform_spark.sources.formats import (
        detect_format_path,
        is_compressed_path,
        sniff_json_layout_path,
    )

    try:
        fmt = detect_format_path(path)
        if fmt == "csv":
            if is_compressed_path(path):
                # Spark decompresses this transparently in the group
                # scan, but the raw header-line signature would be
                # codec bytes — give it a one-file group instead
                return ("csv", ("__solo__", path))
            return ("csv", _csv_header_line(path))
        if fmt == "json":
            layout = sniff_json_layout_path(path)
            type_sig = _json_type_signature(path, layout)
            if type_sig is None:
                return ("json", layout, ("__solo__", path))
            return ("json", layout, type_sig)
        if fmt == "parquet":
            import pyarrow.parquet as pq

            schema = pq.read_schema(path)
            return (
                "parquet",
                tuple(
                    (n.strip().lower(), str(t))
                    for n, t in zip(schema.names, schema.types)
                ),
            )
    except _NoSignature:
        raise
    except Exception as e:  # noqa: BLE001 — unreadable head/footer
        raise _NoSignature(path) from e
    return (fmt, path)


def _csv_group_schema(header_line: str):
    """Explicit all-string StructType from a CSV group's raw header
    line — the same names Spark's header pass would produce, minus the
    every-file name-inference scan. Returns ``None`` (let Spark infer)
    whenever the header can't be trusted driver-side: quoted
    multi-line header (odd quote count), unparseable, empty, an empty
    field name (Spark substitutes ``_cN``), or duplicate names (Spark
    dedups with suffixes) — the fallback read reproduces those edge
    semantics exactly."""
    import csv as _csv
    import io

    if not header_line or header_line.count('"') % 2:
        return None
    try:
        row = next(_csv.reader(io.StringIO(header_line)))
    except (StopIteration, _csv.Error):
        return None
    if not row or any(not c for c in row) or len(set(row)) != len(row):
        return None
    from pyspark.sql import types as T

    return T.StructType(
        [T.StructField(c, T.StringType()) for c in row]
    )


def _read_group(
    spark: SparkSession,
    sig: tuple,
    paths: list[str],
    stage_dirs: list[str] | None = None,
) -> DataFrame:
    """One multi-path scan for a signature group. Large LOCAL groups
    are hardlink-staged into a temp dir and read as ONE directory —
    explicit path lists pay a per-path JVM qualification round at
    reader-build time (~1.8 ms/path: 7 s of driver wall at 4096 paths,
    the INGEST_SCALE r15 ladder wall), while a directory is one
    ``listStatus``. Provenance is unchanged (links carry the original
    basenames). The staging dir is appended to ``stage_dirs`` — the
    caller keeps it alive until the batch's actions have run."""
    from mini_data_platform_spark.sources.readers import (
        normalize_column_names,
        read_file,
    )
    from mini_data_platform_spark.sources.scanstage import stage_link_dir

    fmt = sig[0]
    scan: list[str] | str = paths
    if stage_dirs is not None and fmt in ("csv", "json", "parquet"):
        d = stage_link_dir(paths)
        if d is not None:
            stage_dirs.append(d)
            scan = d
    if fmt == "csv":
        reader = spark.read.option("header", True).option(
            "mode", "PERMISSIVE"
        )
        # the group's raw header line IS the signature: derive the
        # explicit all-string schema from it driver-side — Spark's
        # column-NAME inference touches every file of the scan at
        # reader-build time (~7.5 s at 4096 files, measured r15) to
        # produce exactly this schema
        schema = (
            _csv_group_schema(sig[1]) if isinstance(sig[1], str) else None
        )
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.csv(scan)
    elif fmt == "json" and sig[1] == "array":
        df = spark.read.option("multiLine", True).json(scan)
    elif fmt == "json":
        df = spark.read.json(scan)
    elif fmt == "parquet":
        df = (
            spark.read.parquet(scan)
            if isinstance(scan, str)
            else spark.read.parquet(*scan)
        )
    else:  # single-file group (orc & friends): the legacy reader
        df = read_file(spark, paths[0], fmt)
    return normalize_column_names(df)


def _stage_valid_files(
    spark: SparkSession,
    valid: list[str],
    spec: TableSpec,
    stage_dirs: list[str] | None = None,
) -> DataFrame:
    """Stage ALL valid files as a handful of multi-path scans — the
    100 TB staging plan (round-14, replacing the per-file read +
    N-way chained union):

    - the old plan paid one py4j read/analysis per file plus an
      O(n²) left-deep unionByName analysis — measured 30 s of pure
      DRIVER time at 256 files and the dominant wall at 512+
      (INGEST_SCALE file_count_runs) — and executed 2+ tasks per file;
    - this plan groups files by :func:`_file_signature` (read-safe
      groups), issues ONE ``spark.read`` per group (Spark bin-packs
      small files into ``maxPartitionBytes`` splits — constant plan
      size, ~#cores tasks), and recovers each row's file rank by
      joining ``input_file_name()``'s basename against a broadcast
      (basename → listing rank) map, so cross-file precedence stays
      byte-identical to the reference's sequential loop.

    Raises :class:`_NoSignature` when any signature cannot be derived
    (remote/unreadable path) or basenames collide across directories —
    the caller falls back to the per-file union staging."""
    if _FILE_BASE_COL in spec.columns:  # provenance-name collision
        raise _NoSignature(_FILE_BASE_COL)
    base_ranks = []
    seen = set()
    for rank, path in enumerate(valid):
        base = os.path.basename(path)
        if base in seen:  # ambiguous rank map — e.g. recursive listing
            raise _NoSignature(f"duplicate basename: {base}")
        if not _SAFE_BASE.match(base):
            # input_file_name() reports the URI form; for names outside
            # the URI-safe set the two spellings can disagree (and a
            # blanket url_decode turns '+' into a space), so the rank
            # join could silently DROP rows — refuse and stage legacy
            raise _NoSignature(f"non-URI-safe basename: {base}")
        seen.add(base)
        base_ranks.append((base, rank))
    groups: dict[tuple, list[str]] = {}
    for path in valid:
        groups.setdefault(_file_signature(path), []).append(path)

    frames = []
    for sig, paths in groups.items():
        df = _read_group(spark, sig, paths, stage_dirs)
        # provenance BEFORE any projection: input_file_name() is only
        # defined over the scan's own rows (URI-encoded -> url_decode)
        df = df.withColumn(
            _FILE_BASE_COL,
            F.regexp_extract(F.input_file_name(), "([^/]+)$", 1),
        )
        data_cols = [c for c in df.columns if c != _FILE_BASE_COL]
        df = df.select(
            *[F.col(c).cast("string").alias(c) for c in data_cols],
            _FILE_BASE_COL,
        )
        for c in spec.columns:
            if c not in df.columns:
                df = df.withColumn(c, F.lit(None).cast("string"))
        frames.append(df.select(*spec.columns, _FILE_BASE_COL))
    staged = frames[0]
    for f in frames[1:]:  # one union per GROUP, not per file
        staged = staged.unionByName(f)
    ranks = spark.createDataFrame(
        base_ranks, f"{_FILE_BASE_COL} string, {FILE_RANK_COL} long"
    )
    return (
        with_ingest_order(staged)
        .join(F.broadcast(ranks), _FILE_BASE_COL)
        .drop(_FILE_BASE_COL)
    )


def run_batch_ingest(
    spark: SparkSession,
    incoming_dir: str,
    processed_dir: str,
    failed_dir: str,
    sink: Callable[[DataFrame], int],
    audit: AuditLog | None = None,
    per_file: bool = False,
    on_complete: Callable[[IngestReport], None] | None = None,
    spec: TableSpec = SALES_SPEC,
) -> IngestReport:
    """One ingestion batch over every file in ``incoming_dir``. ``sink``
    receives the cleaned, deduped, canonically-typed sales DataFrame and
    returns the row count it wrote (e.g. ``functools.partial(
    sinks.upsert_parquet, spark, target_dir=..., key_cols=["sale_id"])``
    adapted, or an upsert_dbapi closure).

    ``on_complete`` is the notification hook (reference
    notify_success/notify_failure, process_sales_dags.py:37-62, without
    baking in a transport): it receives the final IngestReport on EVERY
    exit path — success and failure alike; distinguish via
    ``report.failed`` — and, like the audit log, can never fail the
    pipeline (exceptions are logged and swallowed).

    ``spec`` selects the registered table contract
    (registry.SchemaRegistry) — validation, cleaning, coercion, key
    filtering and keep-latest dedup all derive from it; the default is
    the reference's sales table.

    Operational metrics: the report carries ``duration_s``; wire
    ``on_complete=metrics.prometheus_hook(...)`` to publish
    files/rows/throughput to a node_exporter textfile or a /metrics
    endpoint (metrics.py)."""
    import time as _time

    _t0 = _time.monotonic()
    report = _run_batch_ingest(
        spark, incoming_dir, processed_dir, failed_dir, sink, audit,
        per_file, spec,
    )
    report.duration_s = _time.monotonic() - _t0
    if on_complete is not None:
        try:
            on_complete(report)
        except Exception:  # noqa: BLE001 — notification must never fail the run
            logger.exception("on_complete notification hook raised")
    return report


#: the quarantine sub-prefixes a reprocess sweep requeues by default —
#: the runner's full fault-routing vocabulary (module docstring)
FAILURE_REASONS = ("validation_failed", "processing_failed", "loading_failed")


def reprocess_failed(
    spark: SparkSession,
    incoming_dir: str,
    processed_dir: str,
    failed_dir: str,
    sink: Callable[[DataFrame], int],
    audit: AuditLog | None = None,
    reasons: tuple[str, ...] = FAILURE_REASONS,
    per_file: bool = False,
    on_complete: Callable[[IngestReport], None] | None = None,
    spec: TableSpec = SALES_SPEC,
) -> IngestReport:
    """Requeue quarantined files and run one ordinary ingest batch over
    the incoming prefix — the reference's own declared future work
    ("Add reprocessing DAG for failed files",
    /root/reference/README.md Future Improvements), which its quarantine
    routing (this module) left as a dead end: after an operator fixes
    the cause (bad column header, sink credentials), nothing re-ran the
    files.

    Mechanics: every file under ``failed/<reason>/`` for the selected
    ``reasons`` moves back to ``incoming/`` with a ``requeued`` audit
    transition (keyed on the INCOMING path — the same key its original
    detection, quarantine, and eventual load use, so the audit table
    tells the file's whole story as one row), then a normal
    :func:`run_batch_ingest` runs. Files that fail AGAIN are
    re-quarantined by the ordinary routing; replays of files that
    already half-loaded are safe because the sink contract is an
    idempotent keyed upsert. New files that arrived in ``incoming/``
    meanwhile simply join the batch — exactly what a scheduled retry
    DAG would do.

    Returns the ingest report of the re-run; an empty report (no
    outcomes) means nothing was queued for the selected reasons."""
    from mini_data_platform_spark.sinks.objects import list_objects

    requeued: list[str] = []
    for reason in reasons:
        for path in list_objects(os.path.join(failed_dir, reason)):
            dst = os.path.join(incoming_dir, os.path.basename(path))
            move_object(path, dst)
            if audit:
                audit.log_file_status(
                    dst, incoming_dir, "requeued", error=f"was {reason}"
                )
            requeued.append(dst)
    if not requeued:
        return IngestReport()
    return run_batch_ingest(
        spark,
        incoming_dir,
        processed_dir,
        failed_dir,
        sink,
        audit=audit,
        per_file=per_file,
        on_complete=on_complete,
        spec=spec,
    )


def _run_batch_ingest(
    spark: SparkSession,
    incoming_dir: str,
    processed_dir: str,
    failed_dir: str,
    sink: Callable[[DataFrame], int],
    audit: AuditLog | None = None,
    per_file: bool = False,
    spec: TableSpec = SALES_SPEC,
) -> IngestReport:
    report = IngestReport()
    files = discover_files(incoming_dir)
    valid: list[str] = []
    # validation is a per-FILE verdict (sampled, O(1) data per file) —
    # but the naive loop pays 1-2 tiny driver-built Spark jobs per file
    # and serializes their py4j plan builds on the GIL, which at 10k
    # files is the wall (r9 finding; round-14 measured ~24 ms/file even
    # 16-wide). validate_files batches small-CSV header checks
    # driver-side and their date probes into one job per header group,
    # thread-pools the rest, and returns verdicts IN LISTING ORDER;
    # driver-side side effects (quarantine moves, audit writes) stay
    # sequential, so routing and precedence semantics are byte-identical
    # to the loop.
    from mini_data_platform_spark.sources.validate import validate_files

    verdicts = validate_files(spark, files, spec=spec) if files else []
    for path, (ok, err) in zip(files, verdicts):
        if ok:
            if audit:
                audit.log_file_status(path, incoming_dir, "validated")
            valid.append(path)
        else:
            report.outcomes.append(
                _quarantine(path, failed_dir, "validation_failed", audit, err)
            )
    if not valid:
        return report

    if per_file:
        for path in valid:
            report.outcomes.append(
                _ingest_one(
                    spark, path, processed_dir, failed_dir, sink, audit,
                    spec,
                )
            )
        report.rows_upserted = sum(o.rows or 0 for o in report.loaded)
        return report

    # ---- scale mode: one job over all valid files -------------------------
    # hardlink scan-staging dirs (sources/scanstage.py) must outlive
    # every action over the lazy staged plan — freed after the sink
    from mini_data_platform_spark.sources.scanstage import cleanup_dirs

    stage_dirs: list[str] = []
    persisted = False
    try:
        try:
            try:
                staged = _stage_valid_files(spark, valid, spec, stage_dirs)
            except _NoSignature:
                # remote/unreadable heads or basename collisions: the
                # signature-grouped multi-path scan cannot prove itself
                # safe — stage the legacy way (per-file read + union)
                staged = _prepare_one(spark, valid[0], 0, spec)
                for rank, path in enumerate(valid[1:], start=1):
                    staged = staged.unionByName(
                        _prepare_one(spark, path, rank, spec)
                    )
            # clean_table conforms to exactly the spec's canonical
            # columns; the batch job must keep the bookkeeping tags, so
            # the same P4-P8 stages are applied with the tags carried
            # through.
            cleaned = _clean_keep_tags(staged, spec)
        except Exception as e:  # noqa: BLE001 — read/plan failure: quarantine all
            for path in valid:
                report.outcomes.append(
                    _quarantine(
                        path, failed_dir, "processing_failed", audit, str(e)
                    )
                )
            return report
        # file-count regime: `cleaned` executes twice (the per-file row
        # counts below, then the sink's own pipeline) and each
        # execution re-opens every source file in the scan tasks — at
        # 10k files that rescan is seconds of wall (INGEST_SCALE r15).
        # Persist across the two uses when the batch is many-files;
        # volume-regime batches (few big files) keep the rescan, which
        # is cheaper there than caching the whole batch.
        from mini_data_platform_spark.sources.scanstage import (
            STAGE_MIN_FILES,
        )

        persisted = len(valid) >= STAGE_MIN_FILES
        if persisted:
            cleaned = cleaned.persist()
        deduped = dedup_keep_latest(
            cleaned,
            keys=spec.keys,
            order_col=spec.order_col or INGEST_ORDER_COL,
            null_wins=True,
            precedence_cols=(FILE_RANK_COL,),
        )

        per_file_rows = {
            int(r[FILE_RANK_COL]): int(r["n"])
            for r in cleaned.groupBy(FILE_RANK_COL)
            .agg(F.count("*").alias("n"))
            .collect()
        }
        final = deduped.drop(FILE_RANK_COL)

        try:
            report.rows_upserted = sink(final)
        except Exception as e:  # noqa: BLE001 — sink failure: batch-granular quarantine
            for path in valid:
                report.outcomes.append(
                    _quarantine(
                        path, failed_dir, "loading_failed", audit, str(e)
                    )
                )
            return report
    finally:
        try:
            if persisted:
                cleaned.unpersist(False)
        except Exception:  # noqa: BLE001 — cleanup is advisory
            pass
        cleanup_dirs(stage_dirs)

    for rank, path in enumerate(valid):
        move_object(path, os.path.join(processed_dir, os.path.basename(path)))
        rows = per_file_rows.get(rank, 0)
        if audit:
            audit.log_file_status(path, processed_dir, "loaded", rows=rows)
        report.outcomes.append(FileOutcome(path, "loaded", rows=rows))
    return report


def _clean_keep_tags(staged: DataFrame, spec: TableSpec) -> DataFrame:
    """The spec's cleaning bundle over the data columns while preserving
    the _file_rank/_ingest_order bookkeeping columns (positionally joined
    via a row tag would shuffle; instead the cleaning expressions are
    applied in-place — they are all narrow per-column transforms)."""
    from mini_data_platform_spark.operators.clean import (
        clean_strings,
        drop_null_keys,
    )
    from mini_data_platform_spark.registry import coerce_types

    tags = [FILE_RANK_COL, INGEST_ORDER_COL]
    out = clean_strings(staged, columns=list(spec.columns))
    out = coerce_types(out, spec)
    for k in spec.keys:
        out = drop_null_keys(out, k)
    return out.select(*spec.columns, *tags)


def _ingest_one(
    spark: SparkSession,
    path: str,
    processed_dir: str,
    failed_dir: str,
    sink: Callable[[DataFrame], int],
    audit: AuditLog | None,
    spec: TableSpec = SALES_SPEC,
) -> FileOutcome:
    """Per-file mode body (reference process_file + load_to_postgres,
    process_sales_dags.py:156-198)."""
    try:
        df = with_ingest_order(read_file_as_strings(spark, path))
        cleaned = clean_table(df, spec)
        if spec.order_col is None:
            # order-less spec: arrival order is the only precedence;
            # the typed conform dropped the tag, so re-stamp it (the
            # clean pipeline is narrow transforms — row order holds)
            cleaned = with_ingest_order(cleaned)
        cleaned = dedup_keep_latest(
            cleaned,
            keys=spec.keys,
            order_col=spec.order_col or INGEST_ORDER_COL,
        ).drop(INGEST_ORDER_COL)
        n = cleaned.count()
    except Exception as e:  # noqa: BLE001
        return _quarantine(path, failed_dir, "processing_failed", audit, str(e))
    try:
        sink(cleaned)
    except Exception as e:  # noqa: BLE001
        return _quarantine(path, failed_dir, "loading_failed", audit, str(e))
    move_object(path, os.path.join(processed_dir, os.path.basename(path)))
    if audit:
        audit.log_file_status(path, processed_dir, "loaded", rows=n)
    return FileOutcome(path, "loaded", rows=n)


def main(argv: list[str] | None = None) -> int:
    """CLI: ``python -m mini_data_platform_spark.runner --incoming DIR
    --target DIR`` runs one batch with the parquet-merge sink and a sqlite
    audit log (swap for JDBC/psycopg2 sinks in deployment)."""
    import argparse
    import functools
    import json

    from mini_data_platform_spark.session import get_spark
    from mini_data_platform_spark.sinks.upsert import (
        sqlite_conn_factory,
        upsert_parquet,
    )

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--incoming", required=True)
    ap.add_argument("--processed", default=None)
    ap.add_argument("--failed", default=None)
    ap.add_argument("--target", required=True, help="parquet upsert target dir")
    ap.add_argument("--audit-db", default=None, help="sqlite audit db path")
    ap.add_argument("--per-file", action="store_true")
    args = ap.parse_args(argv)

    base = os.path.dirname(args.incoming.rstrip("/"))
    processed = args.processed or os.path.join(base, "processed")
    failed = args.failed or os.path.join(base, "failed")
    spark = get_spark("batch_ingest")
    audit = (
        AuditLog(functools.partial(sqlite_conn_factory, args.audit_db))
        if args.audit_db
        else None
    )

    def sink(df: DataFrame) -> int:
        return upsert_parquet(spark, df, args.target, ["sale_id"])

    report = run_batch_ingest(
        spark, args.incoming, processed, failed,
        sink=sink, audit=audit, per_file=args.per_file,
    )
    print(
        json.dumps(
            {
                "loaded": len(report.loaded),
                "failed": len(report.failed),
                "rows_upserted": report.rows_upserted,
                "outcomes": [
                    {"file": o.path, "status": o.status, "rows": o.rows, "error": o.error}
                    for o in report.outcomes
                ],
            }
        )
    )
    return 1 if report.failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
