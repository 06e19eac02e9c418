"""Concrete notification transports for the ``on_complete`` ingest hook
(SURVEY.md §2: reference notify_success/notify_failure,
/root/reference/dags/src/../process_sales_dags.py:37-62, which wire an
SMTP email per run outcome).

The engine deliberately keeps the hook contract transport-agnostic
(``run_batch_ingest(on_complete=...)`` receives the final IngestReport on
every exit path and may never fail the run — runner.py:141-145); this
module ships the transports a deployment plugs in:

- :func:`format_report` — the subject/body rendering shared by every
  transport (success vs failure wording mirrors the reference's two
  notify functions).
- :func:`file_notifier` — append one JSON line per run to a local/NFS
  path: the audit-friendly default, and the ops "mailbox" in sandboxes
  with no SMTP egress.
- :func:`log_notifier` — route through :mod:`logging` (picked up by
  whatever log shipper the cluster already runs).
- :func:`smtp_notifier` — the reference's email transport on stdlib
  ``smtplib``; the SMTP client is injectable so the message assembly is
  unit-testable without a mail server.

All transports are driver-side only (an IngestReport is a handful of file
outcomes, never data), so none of this touches the Spark plan.
"""

from __future__ import annotations

import json
import logging
import time
from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # annotation-only: a runtime import would be circular
    # (runner imports sinks; this module ships in sinks.__init__)
    from mini_data_platform_spark.runner import IngestReport

logger = logging.getLogger(__name__)


def format_report(report: IngestReport) -> tuple[str, str]:
    """(subject, body) for a finished ingest run. Success subject when
    every file loaded; failure subject names the quarantine count —
    the reference's notify_success/notify_failure split, one renderer."""
    n_ok, n_bad = len(report.loaded), len(report.failed)
    if n_bad == 0:
        subject = f"[ingest] SUCCESS: {n_ok} file(s), {report.rows_upserted} rows"
    else:
        subject = f"[ingest] FAILURE: {n_bad} of {n_ok + n_bad} file(s) quarantined"
    lines = [f"rows_upserted={report.rows_upserted}"]
    for o in report.outcomes:
        line = f"{o.status}: {o.path}"
        if o.rows is not None:
            line += f" rows={o.rows}"
        if o.error:
            line += f" error={o.error}"
        lines.append(line)
    return subject, "\n".join(lines)


def file_notifier(path: str) -> Callable[[IngestReport], None]:
    """``on_complete`` hook appending one JSON line per run to ``path``.
    Append-only and schema-stable, so the file doubles as a poor-man's
    notification queue (tail -f, or a streaming file source)."""

    def notify(report: IngestReport) -> None:
        record = {
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "ok": not report.failed,
            "rows_upserted": report.rows_upserted,
            "outcomes": [
                {
                    "path": o.path,
                    "status": o.status,
                    "rows": o.rows,
                    "error": o.error,
                }
                for o in report.outcomes
            ],
        }
        with open(path, "a", encoding="utf-8") as fh:
            fh.write(json.dumps(record) + "\n")

    return notify


def log_notifier(
    log: logging.Logger | None = None,
) -> Callable[[IngestReport], None]:
    """``on_complete`` hook writing subject+body through :mod:`logging`
    (INFO on success, ERROR when any file quarantined)."""
    log = log or logger

    def notify(report: IngestReport) -> None:
        subject, body = format_report(report)
        level = logging.INFO if not report.failed else logging.ERROR
        log.log(level, "%s\n%s", subject, body)

    return notify


def smtp_notifier(
    host: str,
    port: int,
    sender: str,
    recipients: list[str],
    smtp_factory: Callable[[str, int], object] | None = None,
) -> Callable[[IngestReport], None]:
    """``on_complete`` hook emailing the run report — the reference's
    transport. ``smtp_factory(host, port)`` must return an object with
    ``sendmail(from, to, msg)`` and ``quit()`` (stdlib ``smtplib.SMTP``
    by default; tests inject a stub)."""

    def notify(report: IngestReport) -> None:
        subject, body = format_report(report)
        msg = (
            f"From: {sender}\r\nTo: {', '.join(recipients)}\r\n"
            f"Subject: {subject}\r\n\r\n{body}"
        )
        if smtp_factory is not None:
            client = smtp_factory(host, port)
        else:  # pragma: no cover — needs a live SMTP server
            import smtplib

            client = smtplib.SMTP(host, port, timeout=30)
        try:
            client.sendmail(sender, recipients, msg)
        finally:
            client.quit()

    return notify
