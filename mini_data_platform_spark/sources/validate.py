"""File-granularity validation (SURVEY.md §2.5 V1-V3).

Reproduces the reference's validator semantics
(/root/reference/dags/src/validator.py:37-99) Spark-first:

- CSV (V1): parse a 1000-row sample; required-column check on normalized
  names; the first 50 non-null ``sale_date`` values must ALL parse
  (pandas ``errors="raise"`` parity — one bad date fails the file).
- JSON (V2): each of the first 100 records must contain every required
  key. Spark's schema union can't distinguish missing-key from null, so
  the check reads lines as text and uses ``json_object_keys`` — still
  JVM-side, still a bounded sample.
- Parquet (V3): required-column check against the file footer schema —
  metadata-only, zero data read.

Verdicts are (valid: bool, error: str) per file, the unit the quarantine
router consumes. Sampling keeps validation O(1) per file no matter the
file size — at 100 TB the validator cost is bounded by file count.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from mini_data_platform_spark.registry import SALES_SPEC, TableSpec
from mini_data_platform_spark.schema import SALES_COLUMNS
from mini_data_platform_spark.sources import readers
from mini_data_platform_spark.sources.formats import detect_format_path

REQUIRED_COLUMNS = frozenset(SALES_COLUMNS)

CSV_SAMPLE_ROWS = 1000
DATE_SAMPLE_ROWS = 50
JSON_SAMPLE_RECORDS = 100

#: lenient timestamp probe: ISO timestamp, or bare date (pandas
#: ``to_datetime`` accepts both; ANSI-off try_* returns null, never raises)
def _parseable_ts(col):
    return F.coalesce(
        F.try_to_timestamp(col), F.to_date(col).cast("timestamp")
    )


def _missing(cols: list[str], spec: TableSpec) -> list[str]:
    have = {c.strip().lower() for c in cols}
    return sorted(spec.required - have)


def validate_csv(
    spark: SparkSession, path: str, spec: TableSpec = SALES_SPEC
) -> tuple[bool, str]:
    try:
        sample = readers.read_csv(spark, path).limit(CSV_SAMPLE_ROWS)
        cols = sample.columns
    except Exception as e:  # noqa: BLE001 — any parse failure quarantines the file
        return False, f"CSV parse error: {e}"
    missing = _missing(cols, spec)
    if missing:
        return False, f"Missing required columns: {missing}"
    # the reference's date probe (first 50 non-null must ALL parse),
    # applied to every timestamp column the spec declares
    lower = {c.strip().lower(): c for c in cols}
    for ts_col in spec.timestamp_columns:
        probe = lower.get(ts_col)
        if probe is None:
            continue
        bad = (
            sample.select(F.col(probe))
            .limit(DATE_SAMPLE_ROWS)
            .where(
                F.col(probe).isNotNull()
                & _parseable_ts(F.col(probe)).isNull()
            )
            .count()
        )
        if bad:
            return (
                False,
                f"{ts_col} parse issue: {bad} unparseable in first "
                f"{DATE_SAMPLE_ROWS}",
            )
    return True, ""


def validate_json(
    spark: SparkSession, path: str, spec: TableSpec = SALES_SPEC
) -> tuple[bool, str]:
    try:
        lines = (
            spark.read.text(path)
            .where(F.trim("value") != "")
            .limit(JSON_SAMPLE_RECORDS)
        )
        # strip array wrappers/commas so both ndjson and pretty arrays probe
        # as objects; json_object_keys -> null for anything unparseable
        obj = F.regexp_replace(F.trim("value"), r"^[\[,]+|[\],]+$", "")
        keyed = lines.select(obj.alias("obj")).where(F.col("obj") != "")
        rec = keyed.select(
            F.transform(
                F.coalesce(
                    F.json_object_keys("obj"), F.array().cast("array<string>")
                ),
                F.lower,
            ).alias("keys")
        )
        required = F.array(*[F.lit(c) for c in sorted(spec.required)])
        bad = rec.where(F.size(F.array_except(required, F.col("keys"))) > 0)
        first_bad = bad.select(
            F.array_except(required, F.col("keys")).alias("missing")
        ).first()
    except Exception as e:  # noqa: BLE001
        return False, f"JSON parse error: {e}"
    if first_bad is not None:
        return False, f"Missing columns: {sorted(first_bad['missing'])}"
    return True, ""


def validate_parquet(
    spark: SparkSession, path: str, spec: TableSpec = SALES_SPEC
) -> tuple[bool, str]:
    try:
        schema = spark.read.parquet(path).schema  # footer only — no data IO
    except Exception as e:  # noqa: BLE001
        return False, f"Parquet parse error: {e}"
    missing = _missing(schema.fieldNames(), spec)
    if missing:
        return False, f"Missing required columns: {missing}"
    return True, ""


def validate_orc(
    spark: SparkSession, path: str, spec: TableSpec = SALES_SPEC
) -> tuple[bool, str]:
    try:
        schema = spark.read.orc(path).schema  # metadata only — no data IO
    except Exception as e:  # noqa: BLE001
        return False, f"ORC parse error: {e}"
    missing = _missing(schema.fieldNames(), spec)
    if missing:
        return False, f"Missing required columns: {missing}"
    return True, ""


def validate_file(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    spec: TableSpec = SALES_SPEC,
) -> tuple[bool, str]:
    """Dispatch on detected format (reference validate_file task,
    /root/reference/dags/process_sales_dags.py:117-141). ``spec``
    selects the registered table contract to validate against
    (registry.REGISTRY; default: the reference's sales table)."""
    fmt = fmt or detect_format_path(path)
    if fmt == "csv":
        return validate_csv(spark, path, spec)
    if fmt == "json":
        return validate_json(spark, path, spec)
    if fmt == "parquet":
        return validate_parquet(spark, path, spec)
    if fmt == "orc":
        return validate_orc(spark, path, spec)
    return False, f"Unsupported format: {fmt}"
