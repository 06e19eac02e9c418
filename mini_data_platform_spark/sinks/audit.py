"""File-ingestion audit log (SURVEY.md §2.4 K2).

Reproduces the reference's ``log_file_status``
(/root/reference/dags/src/db.py:70-99): one row per file keyed on
``file_key``, upserted on every status transition, and — critically — the
logger NEVER raises: an audit failure must not fail the pipeline
(db.py:92-96).

Backends: any DB-API connection factory (sqlite3 locally, psycopg2 in a
Postgres deployment). The audit table is driver-side tiny (one row per
file, not per record) so this is deliberately NOT a Spark job.
"""

from __future__ import annotations

import datetime
import logging
from collections.abc import Callable

logger = logging.getLogger(__name__)

DDL = """
CREATE TABLE IF NOT EXISTS file_ingestion_log (
    file_key TEXT PRIMARY KEY,
    bucket TEXT,
    detected_at TIMESTAMP,
    status TEXT,
    rows_processed INTEGER,
    error TEXT,
    updated_at TIMESTAMP
)
"""

_UPSERT = """
INSERT INTO file_ingestion_log
    (file_key, bucket, detected_at, status, rows_processed, error, updated_at)
VALUES (?, ?, ?, ?, ?, ?, ?)
ON CONFLICT (file_key) DO UPDATE SET
    status = EXCLUDED.status,
    rows_processed = EXCLUDED.rows_processed,
    error = EXCLUDED.error,
    updated_at = EXCLUDED.updated_at
"""


class AuditLog:
    """Never-raise audit logger over a DB-API connection factory."""

    def __init__(self, conn_factory: Callable[[], object], paramstyle: str = "qmark"):
        self._connect = conn_factory
        self._sql = _UPSERT if paramstyle == "qmark" else _UPSERT.replace("?", "%s")
        self.ensure_table()

    def ensure_table(self) -> None:
        try:
            conn = self._connect()
            try:
                conn.cursor().execute(DDL)
                conn.commit()
            finally:
                conn.close()
        except Exception as e:  # noqa: BLE001 — never-raise contract
            logger.exception("audit table bootstrap failed: %s", e)

    def log_file_status(
        self,
        file_key: str,
        bucket: str,
        status: str,
        rows: int | None = None,
        error: str | None = None,
    ) -> None:
        now = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
        try:
            conn = self._connect()
            try:
                conn.cursor().execute(
                    self._sql, (file_key, bucket, now, status, rows, error, now)
                )
                conn.commit()
            finally:
                conn.close()
        except Exception as e:  # noqa: BLE001 — db.py:92-96 parity
            logger.exception("Failed to log file status: %s", e)

    def statuses(self) -> dict[str, str]:
        """file_key -> current status (test/ops convenience; never raises)."""
        try:
            conn = self._connect()
            try:
                cur = conn.cursor()
                cur.execute("SELECT file_key, status FROM file_ingestion_log")
                return dict(cur.fetchall())
            finally:
                conn.close()
        except Exception as e:  # noqa: BLE001
            logger.exception("audit read failed: %s", e)
            return {}
