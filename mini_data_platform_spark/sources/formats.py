"""File-format detection (SURVEY.md §2.1 S1).

Semantics match the reference's ``detect_format``
(/root/reference/dags/src/validator.py:17-34): extension first
(.csv / .json / .ndjson / .parquet), then magic bytes (``PK`` or ``PAR1``
⇒ parquet), default csv. This is a driver-side helper — it reads at most
a few bytes per file to route the file to the right Spark reader; the
data itself is only ever read by Spark.

Extension beyond the reference: ORC (.orc extension / ``ORC`` magic) —
Spark's second first-class columnar format, free to support since the
reader, schema metadata access, and predicate pushdown are all built in.
"""

from __future__ import annotations

import os

#: bytes to read for magic-number sniffing (PAR1 is 4; '[' sniff wants a
#: little slack for leading whitespace)
_HEAD_LEN = 64


def _head(path: str, n: int = _HEAD_LEN) -> bytes:
    with open(path, "rb") as f:
        return f.read(n)


def detect_format(key: str, data: bytes | None = None) -> str:
    """Detect csv/json/parquet from the key's extension, falling back to
    magic bytes, defaulting to csv. ``data`` is the file head (any length);
    pass None to skip content sniffing."""
    key_lower = key.lower()
    if key_lower.endswith(".csv"):
        return "csv"
    if key_lower.endswith(".json") or key_lower.endswith(".ndjson"):
        return "json"
    if key_lower.endswith(".parquet"):
        return "parquet"
    if key_lower.endswith(".orc"):
        return "orc"
    if data:
        head = data[:4]
        if head.startswith(b"PK") or head == b"PAR1":
            return "parquet"
        if head.startswith(b"ORC"):
            return "orc"
    return "csv"


def detect_format_path(path: str) -> str:
    """``detect_format`` for a local/posix path (reads the head lazily only
    when the extension is inconclusive)."""
    key_lower = path.lower()
    if key_lower.endswith((".csv", ".json", ".ndjson", ".parquet", ".orc")):
        return detect_format(path, None)
    return detect_format(path, _head(path) if os.path.exists(path) else None)


#: suffixes Spark's text/CSV readers decompress transparently — raw
#: driver-side byte reads of such files see compressed garbage, so every
#: local fast path must route them back to Spark
_COMPRESS_EXTS = (".gz", ".bz2", ".zst", ".xz", ".deflate", ".lz4", ".snappy")
#: gzip, bzip2, zstd, xz magic numbers (for compressed files that lost
#: their extension — the sniff is best-effort, the extension is primary)
_COMPRESS_MAGIC = (b"\x1f\x8b", b"BZh", b"\x28\xb5\x2f\xfd", b"\xfd7zXZ")


def is_compressed_path(path: str) -> bool:
    """True when ``path`` names a codec-compressed file whose raw bytes
    are NOT the logical content (Spark's readers decompress by extension;
    driver-side ``open().read()`` does not). Used to disqualify local
    fast paths — header parsing, type-signature sampling — that would
    otherwise operate on compressed garbage."""
    if path.lower().endswith(_COMPRESS_EXTS):
        return True
    try:
        head = _head(path, 6)
    except OSError:
        return False
    return any(head.startswith(m) for m in _COMPRESS_MAGIC)


def sniff_json_layout(data: bytes) -> str:
    """'array' (whole-file JSON array → multiLine read) vs 'ndjson'
    (one object per line). Mirrors the reference's first-line ``[`` probe
    (/root/reference/dags/src/processor.py:26-29)."""
    text = data.decode("utf-8", errors="replace")
    for line in text.splitlines():
        if line.strip():
            return "array" if line.strip().startswith("[") else "ndjson"
    return "ndjson"


def sniff_json_layout_path(path: str) -> str:
    return sniff_json_layout(_head(path, 4096))
