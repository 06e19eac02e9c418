"""PII detection and redaction expressions (emails, URLs, phone numbers)
for training-data scrubbing — pure JVM-side regex projections (zero
shuffle, scan-speed at 100 TB), each with a DuckDB-SQL twin for the
oracle. The patterns deliberately use only constructs shared by Java
regex (Spark) and RE2 (DuckDB): character classes, bounded repetition,
alternation — no backreferences or lookaround, which RE2 lacks.

Redaction replaces matches with typed placeholder tags so downstream
token statistics stay meaningful; counts are emitted alongside so a
pipeline can route high-PII documents to quarantine instead (the same
branch pattern as runner.py's validation quarantine).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
URL_RE = "https?://[A-Za-z0-9./_%-]+"
PHONE_RE = "\\+[0-9]{7,15}"

_TAGS = (("<URL>", URL_RE), ("<EMAIL>", EMAIL_RE), ("<PHONE>", PHONE_RE))


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def email_count(col: Column) -> Column:
    return _count(col, EMAIL_RE)


def url_count(col: Column) -> Column:
    return _count(col, URL_RE)


def phone_count(col: Column) -> Column:
    return _count(col, PHONE_RE)


def redact(col: Column) -> Column:
    """Replace URLs first (their charset excludes ``@`` and ``+``, so the
    later email/phone passes can't corrupt an already-redacted URL), then
    emails, then phone numbers."""
    out = col
    for tag, pattern in _TAGS:
        out = F.regexp_replace(out, pattern, tag)
    return out


def sql_count(expr: str, pattern: str) -> str:
    return f"len(regexp_extract_all({expr}, '{pattern}'))"


def sql_redact(expr: str) -> str:
    out = expr
    for tag, pattern in _TAGS:
        out = f"regexp_replace({out}, '{pattern}', '{tag}', 'g')"
    return out
