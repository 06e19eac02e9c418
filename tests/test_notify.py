"""Notification transports (sinks/notify.py) — concrete ``on_complete``
implementations mirroring the reference's notify_success/notify_failure
(process_sales_dags.py:37-62). Pure driver-side: no Spark session needed."""

import json
import logging

from mini_data_platform_spark.runner import FileOutcome, IngestReport
from mini_data_platform_spark.sinks.notify import (
    file_notifier,
    format_report,
    log_notifier,
    smtp_notifier,
)


def _ok_report():
    return IngestReport(
        outcomes=[FileOutcome("a.csv", "loaded", rows=10)], rows_upserted=10
    )


def _bad_report():
    return IngestReport(
        outcomes=[
            FileOutcome("a.csv", "loaded", rows=10),
            FileOutcome("b.csv", "validation_failed", error="missing sale_id"),
        ],
        rows_upserted=10,
    )


class TestFormatReport:
    def test_success_subject(self):
        subject, body = format_report(_ok_report())
        assert "SUCCESS" in subject and "10 rows" in subject
        assert "loaded: a.csv rows=10" in body

    def test_failure_subject_counts_quarantined(self):
        subject, body = format_report(_bad_report())
        assert "FAILURE" in subject and "1 of 2" in subject
        assert "validation_failed: b.csv" in body
        assert "missing sale_id" in body


class TestFileNotifier:
    def test_appends_one_json_line_per_run(self, tmp_path):
        out = tmp_path / "notify.ndjson"
        hook = file_notifier(str(out))
        hook(_ok_report())
        hook(_bad_report())
        lines = [json.loads(line) for line in out.read_text().splitlines()]
        assert [rec["ok"] for rec in lines] == [True, False]
        assert lines[1]["outcomes"][1]["status"] == "validation_failed"
        assert lines[0]["rows_upserted"] == 10


class TestLogNotifier:
    def test_levels(self, caplog):
        log = logging.getLogger("test_notify_levels")
        hook = log_notifier(log)
        with caplog.at_level(logging.INFO, logger="test_notify_levels"):
            hook(_ok_report())
            hook(_bad_report())
        levels = [r.levelno for r in caplog.records]
        assert levels == [logging.INFO, logging.ERROR]
        assert "SUCCESS" in caplog.records[0].message


class _StubSMTP:
    sent: list[tuple] = []
    quits: int = 0

    def __init__(self, host, port):
        self.host, self.port = host, port

    def sendmail(self, sender, recipients, msg):
        _StubSMTP.sent.append((self.host, self.port, sender, recipients, msg))

    def quit(self):
        _StubSMTP.quits += 1


class TestSmtpNotifier:
    def test_message_assembly_and_lifecycle(self):
        _StubSMTP.sent, _StubSMTP.quits = [], 0
        hook = smtp_notifier(
            "mail.local", 25, "etl@local", ["ops@local"], smtp_factory=_StubSMTP
        )
        hook(_bad_report())
        assert _StubSMTP.quits == 1
        (host, port, sender, rcpt, msg), = _StubSMTP.sent
        assert (host, port, sender, rcpt) == ("mail.local", 25, "etl@local", ["ops@local"])
        assert "Subject: [ingest] FAILURE" in msg
        assert "validation_failed: b.csv" in msg

    def test_quit_called_even_when_send_raises(self):
        class Boom(_StubSMTP):
            def sendmail(self, *a):
                raise RuntimeError("send failed")

        _StubSMTP.quits = 0
        hook = smtp_notifier("m", 25, "a@b", ["c@d"], smtp_factory=Boom)
        try:
            hook(_ok_report())
        except RuntimeError:
            pass
        assert _StubSMTP.quits == 1


class TestEndToEndHook:
    """file_notifier through the real runner path: run_batch_ingest must
    deliver the report to the transport on success and never fail the
    run when the transport itself raises (runner.py:141-145)."""

    def test_with_run_batch_ingest(self, spark, tmp_path):
        incoming = tmp_path / "incoming"
        incoming.mkdir()
        (incoming / "s.csv").write_text(
            "sale_id,sale_date,customer_id,product_id,quantity,amount\n"
            "s1,2024-01-01,c1,p1,2,5.5\n"
        )
        out = tmp_path / "notify.ndjson"
        from mini_data_platform_spark.runner import run_batch_ingest

        report = run_batch_ingest(
            spark,
            str(incoming),
            str(tmp_path / "processed"),
            str(tmp_path / "failed"),
            sink=lambda df: df.count(),
            on_complete=file_notifier(str(out)),
        )
        assert not report.failed
        rec = json.loads(out.read_text().splitlines()[0])
        assert rec["ok"] is True and rec["rows_upserted"] == 1
