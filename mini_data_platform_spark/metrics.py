"""Operational metrics for the ingestion runner (reference
README.md:180/:204 "Prometheus metrics" + "Monitoring dashboards" —
declared future work; round-10 verdict item 7).

The runner's :class:`~mini_data_platform_spark.runner.IngestReport`
already carries every per-file outcome; what operators lacked was a
SCRAPABLE surface. This module converts a report into Prometheus
metric points and exposes them two standard ways, both stdlib-only:

- **textfile collector** (:func:`write_textfile`): atomic write of the
  exposition format to a ``.prom`` file — the node_exporter
  ``--collector.textfile.directory`` route, the right fit for a batch
  job that exits (no server to keep alive, no missed scrapes).
- **pull endpoint** (:func:`start_metrics_server`): a background
  ``http.server`` thread serving ``/metrics`` for long-lived
  deployments (streaming ingest, scheduled loops).

``prometheus_hook`` adapts either into the runner's existing
``on_complete`` callback, so wiring is one argument:

    run_batch_ingest(..., on_complete=prometheus_hook(textfile=path))

Exposition format per the public Prometheus docs: ``# HELP`` / ``#
TYPE`` headers, ``name{label="v"} value`` samples, counters suffixed
``_total``. Label values escape backslash/quote/newline.

Scale note: metrics are O(report) driver-side bookkeeping — nothing
here touches Spark plans or adds jobs.
"""

from __future__ import annotations

import os
import threading
from collections.abc import Callable
from dataclasses import dataclass, field

#: the runner's terminal statuses (runner.FileOutcome.status vocabulary)
_STATUSES = (
    "loaded", "validation_failed", "processing_failed", "loading_failed"
)


@dataclass(frozen=True)
class MetricPoint:
    name: str
    value: float
    help: str
    type: str = "gauge"  # or "counter"
    labels: dict[str, str] = field(default_factory=dict)


def _escape(v: str) -> str:
    return (
        v.replace("\\", r"\\").replace('"', r'\"').replace("\n", r"\n")
    )


def ingest_metrics(
    report, table: str = "sales", duration_s: float | None = None
) -> list[MetricPoint]:
    """Metric points for one ingest batch. ``report`` is an
    IngestReport (duck-typed: ``outcomes`` with ``.status``,
    ``rows_upserted``, optional ``duration_s``)."""
    duration = duration_s
    if duration is None:
        duration = getattr(report, "duration_s", None)
    by_status = {s: 0 for s in _STATUSES}
    for o in report.outcomes:
        by_status[o.status] = by_status.get(o.status, 0) + 1
    pts = [
        MetricPoint(
            "mdp_ingest_files_total", float(n),
            "Files routed per terminal status in the last batch",
            "counter", {"table": table, "status": s},
        )
        for s, n in sorted(by_status.items())
    ]
    pts.append(
        MetricPoint(
            "mdp_ingest_rows_upserted_total", float(report.rows_upserted),
            "Rows upserted by the last batch", "counter",
            {"table": table},
        )
    )
    if duration is not None:
        pts.append(
            MetricPoint(
                "mdp_ingest_duration_seconds", float(duration),
                "Wall time of the last ingest batch", "gauge",
                {"table": table},
            )
        )
        if duration > 0:
            pts.append(
                MetricPoint(
                    "mdp_ingest_rows_per_minute",
                    report.rows_upserted * 60.0 / duration,
                    "Throughput of the last ingest batch "
                    "(reference baseline: 10k rows/min)", "gauge",
                    {"table": table},
                )
            )
    return pts


def prometheus_text(points: list[MetricPoint]) -> str:
    """Exposition-format text. HELP/TYPE emitted once per metric name,
    in first-appearance order; samples keep input order."""
    seen: list[str] = []
    by_name: dict[str, list[MetricPoint]] = {}
    for p in points:
        if p.name not in by_name:
            seen.append(p.name)
            by_name[p.name] = []
        by_name[p.name].append(p)
    lines: list[str] = []
    for name in seen:
        group = by_name[name]
        lines.append(f"# HELP {name} {group[0].help}")
        lines.append(f"# TYPE {name} {group[0].type}")
        for p in group:
            if p.labels:
                lbl = ",".join(
                    f'{k}="{_escape(v)}"'
                    for k, v in sorted(p.labels.items())
                )
                lines.append(f"{name}{{{lbl}}} {p.value:g}")
            else:
                lines.append(f"{name} {p.value:g}")
    return "\n".join(lines) + "\n"


def write_textfile(points: list[MetricPoint], path: str) -> None:
    """Atomic write (tmp + rename) of the exposition text — the
    node_exporter textfile contract requires readers never see a
    half-written file."""
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(prometheus_text(points))
    os.replace(tmp, path)


class _MetricsState:
    """Latest-points holder shared between the hook and the server."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._points: list[MetricPoint] = []

    def set(self, points: list[MetricPoint]) -> None:
        with self._lock:
            self._points = list(points)

    def text(self) -> str:
        with self._lock:
            return prometheus_text(self._points)


def start_metrics_server(
    port: int = 0, state: _MetricsState | None = None
) -> tuple[object, int, _MetricsState]:
    """Serve ``/metrics`` on a daemon thread. Returns (server,
    bound_port, state); ``port=0`` binds an ephemeral port. Call
    ``server.shutdown()`` to stop."""
    import http.server

    st = state or _MetricsState()

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 — http.server API
            if self.path.rstrip("/") not in ("", "/metrics"):
                self.send_response(404)
                self.end_headers()
                return
            body = st.text().encode()
            self.send_response(200)
            self.send_header(
                "Content-Type", "text/plain; version=0.0.4"
            )
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # silence per-scrape stderr noise
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", port), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1], st


def prometheus_hook(
    table: str = "sales",
    textfile: str | None = None,
    state: _MetricsState | None = None,
) -> Callable:
    """An ``on_complete`` callback for ``run_batch_ingest``: converts
    the report to metric points and publishes them to the textfile
    and/or a server's state holder. Like every runner hook it must
    never fail the pipeline — the runner already swallows exceptions
    from on_complete."""

    def hook(report) -> None:
        pts = ingest_metrics(report, table=table)
        if textfile:
            write_textfile(pts, textfile)
        if state is not None:
            state.set(pts)

    return hook
