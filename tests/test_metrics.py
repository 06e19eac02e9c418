"""Runner metrics surface (metrics.py — reference README.md:180/:204
Prometheus/monitoring declared future work; round-10 verdict item 7)."""

import re
import urllib.request

from mini_data_platform_spark.metrics import (
    MetricPoint,
    ingest_metrics,
    prometheus_hook,
    prometheus_text,
    start_metrics_server,
    write_textfile,
)
from mini_data_platform_spark.runner import FileOutcome, IngestReport


def _report():
    return IngestReport(
        outcomes=[
            FileOutcome("a.csv", "loaded", rows=10),
            FileOutcome("b.csv", "loaded", rows=5),
            FileOutcome("c.csv", "validation_failed", error="boom"),
        ],
        rows_upserted=15,
        duration_s=3.0,
    )


class TestPoints:
    def test_ingest_metrics_counts_and_throughput(self):
        pts = {
            (p.name, tuple(sorted(p.labels.items()))): p.value
            for p in ingest_metrics(_report(), table="sales")
        }
        key = lambda s: (  # noqa: E731
            "mdp_ingest_files_total",
            (("status", s), ("table", "sales")),
        )
        assert pts[key("loaded")] == 2
        assert pts[key("validation_failed")] == 1
        assert pts[key("processing_failed")] == 0  # zero-filled
        assert pts[
            ("mdp_ingest_rows_upserted_total", (("table", "sales"),))
        ] == 15
        assert pts[
            ("mdp_ingest_rows_per_minute", (("table", "sales"),))
        ] == 15 * 60 / 3.0

    def test_no_duration_no_throughput(self):
        r = _report()
        r.duration_s = None
        names = {p.name for p in ingest_metrics(r)}
        assert "mdp_ingest_rows_per_minute" not in names
        assert "mdp_ingest_duration_seconds" not in names


class TestExposition:
    def test_format_headers_and_samples(self):
        text = prometheus_text(ingest_metrics(_report(), table="t1"))
        assert text.endswith("\n")
        # one HELP/TYPE per metric name
        assert text.count("# HELP mdp_ingest_files_total ") == 1
        assert text.count("# TYPE mdp_ingest_files_total counter") == 1
        assert re.search(
            r'^mdp_ingest_files_total\{status="loaded",table="t1"\} 2$',
            text, re.M,
        )
        # every non-comment line is a valid sample
        for line in text.strip().splitlines():
            if line.startswith("#"):
                continue
            assert re.match(
                r'^[a-z_]+(\{[a-z_]+="[^"]*"(,[a-z_]+="[^"]*")*\})? '
                r"-?[0-9.e+naif]+$", line,
            ), line

    def test_label_escaping(self):
        p = MetricPoint("m", 1.0, "h", "gauge", {"x": 'a"b\\c\nd'})
        text = prometheus_text([p])
        assert r'x="a\"b\\c\nd"' in text

    def test_textfile_atomic_write(self, tmp_path):
        path = str(tmp_path / "mdp.prom")
        write_textfile(ingest_metrics(_report()), path)
        body = open(path).read()
        assert "mdp_ingest_rows_upserted_total" in body
        assert not (tmp_path / "mdp.prom.tmp").exists()


class TestServerAndHook:
    def test_metrics_endpoint_serves_latest(self):
        srv, port, state = start_metrics_server(0)
        try:
            hook = prometheus_hook(table="sales", state=state)
            hook(_report())
            body = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics", timeout=10
            ).read().decode()
            assert 'mdp_ingest_rows_upserted_total{table="sales"} 15' in body
            code = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics", timeout=10
            ).status
            assert code == 200
        finally:
            srv.shutdown()

    def test_hook_writes_textfile(self, tmp_path):
        path = str(tmp_path / "out.prom")
        prometheus_hook(table="x", textfile=path)(_report())
        assert 'mdp_ingest_duration_seconds{table="x"} 3' in open(path).read()


class TestRunnerIntegration:
    def test_run_batch_ingest_publishes_metrics(self, spark, tmp_path):
        """End to end: the runner's on_complete carries duration_s and
        the hook lands a scrapable textfile."""
        from mini_data_platform_spark.runner import run_batch_ingest
        from mini_data_platform_spark.sinks.upsert import upsert_parquet

        incoming = tmp_path / "incoming"
        incoming.mkdir()
        (incoming / "f.csv").write_text(
            "sale_id,sale_date,customer_id,product_id,quantity,amount\n"
            "a,2024-01-01 00:00:00,C1,P1,1,10.0\n"
        )
        prom = str(tmp_path / "ingest.prom")
        target = str(tmp_path / "target")
        report = run_batch_ingest(
            spark,
            str(incoming),
            str(tmp_path / "processed"),
            str(tmp_path / "failed"),
            lambda df: upsert_parquet(spark, df, target, ["sale_id"]),
            on_complete=prometheus_hook(textfile=prom),
        )
        assert report.duration_s and report.duration_s > 0
        body = open(prom).read()
        assert 'mdp_ingest_rows_upserted_total{table="sales"} 1' in body
        assert "mdp_ingest_rows_per_minute" in body
