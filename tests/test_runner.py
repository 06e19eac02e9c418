"""End-to-end batch ingestion: mixed formats, dirty data, quarantine
routing, cross-file precedence, idempotent re-runs. Golden semantics from
/root/reference/dags/process_sales_dags.py + processor.py."""

import functools
import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mini_data_platform_spark.runner import run_batch_ingest
from mini_data_platform_spark.sinks.audit import AuditLog
from mini_data_platform_spark.sinks.upsert import sqlite_conn_factory, upsert_parquet


@pytest.fixture()
def lake(tmp_path):
    d = {
        "incoming": str(tmp_path / "incoming"),
        "processed": str(tmp_path / "processed"),
        "failed": str(tmp_path / "failed"),
        "target": str(tmp_path / "sales_target"),
        "audit_db": str(tmp_path / "audit.db"),
    }
    os.makedirs(d["incoming"])
    return d


def _put(lake, name, text):
    p = os.path.join(lake["incoming"], name)
    with open(p, "w") as f:
        f.write(text)
    return p


def _sink(spark, lake):
    def sink(df):
        return upsert_parquet(spark, df, lake["target"], ["sale_id"])

    return sink


def _run(spark, lake, **kw):
    audit = AuditLog(functools.partial(sqlite_conn_factory, lake["audit_db"]))
    return run_batch_ingest(
        spark,
        lake["incoming"],
        lake["processed"],
        lake["failed"],
        sink=_sink(spark, lake),
        audit=audit,
        **kw,
    ), audit


# 49 clean filler rows keep the dirty rows outside the validator's 50-row
# date sample (the reference's errors="raise" probe would quarantine a file
# with a bad date in the first 50 rows — validator.py:56 parity).
_FILLER = "".join(
    f"f{i},2024-01-01 00:00:00,CF,PF,1,1.0\n" for i in range(49)
)
FILLER_KEYS = {f"f{i}" for i in range(49)}

DIRTY_CSV = (
    "Sale_ID , sale_date,customer_id,product_id,quantity,amount\n"
    "s1,2024-01-01 10:00:00,  C1  ,P1,2,20.0\n"        # clean row
    + _FILLER +
    "s2,not-a-date,C2,P2,12.5,oops\n"                   # bad date->null, qty 12.5->12, amount->0.0
    "s3,2024-01-03 00:00:00,nan,P3,,5\n"                # nan customer->null, empty qty->1
    ",2024-01-04 00:00:00,C4,P4,1,1\n"                  # null sale_id -> dropped
    "s1,2024-02-01 00:00:00,C1,P1,3,30.0\n"             # dup: later date wins
)

GOOD_NDJSON = "\n".join(
    json.dumps(
        {
            "sale_id": f"n{i}",
            "sale_date": f"2024-05-0{i} 00:00:00",
            "customer_id": f"C{i}",
            "product_id": "PX",
            "quantity": i,
            "amount": i * 10.0,
        }
    )
    for i in (1, 2)
)

BAD_CSV = "sale_id,amount\nx,1\n"


class TestBatchIngest:
    def test_mixed_batch(self, spark, lake):
        _put(lake, "a_dirty.csv", DIRTY_CSV)
        _put(lake, "b_good.json", GOOD_NDJSON)
        _put(lake, "c_bad.csv", BAD_CSV)
        pq.write_table(
            pa.table(
                {
                    "sale_id": ["p1"],
                    "sale_date": ["2024-06-01 00:00:00"],
                    "customer_id": ["CP"],
                    "product_id": ["PP"],
                    "quantity": [7],
                    "amount": [70.0],
                }
            ),
            os.path.join(lake["incoming"], "d_good.parquet"),
        )

        report, audit = _run(spark, lake)

        statuses = {os.path.basename(o.path): o.status for o in report.outcomes}
        assert statuses == {
            "a_dirty.csv": "loaded",
            "b_good.json": "loaded",
            "c_bad.csv": "validation_failed",
            "d_good.parquet": "loaded",
        }
        # physical routing
        assert sorted(os.listdir(lake["processed"])) == [
            "a_dirty.csv", "b_good.json", "d_good.parquet",
        ]
        assert os.listdir(os.path.join(lake["failed"], "validation_failed")) == ["c_bad.csv"]
        assert os.listdir(lake["incoming"]) == []

        # sink state: coercion + dedup semantics
        got = {r["sale_id"]: r.asDict() for r in spark.read.parquet(lake["target"]).collect()}
        assert set(got) == {"s1", "s2", "s3", "n1", "n2", "p1"} | FILLER_KEYS
        assert got["s1"]["amount"] == 30.0 and got["s1"]["quantity"] == 3  # latest date won
        assert got["s2"]["sale_date"] is None
        assert got["s2"]["quantity"] == 12 and got["s2"]["amount"] == 0.0
        assert got["s3"]["customer_id"] is None and got["s3"]["quantity"] == 1
        assert got["s1"]["customer_id"] == "C1"  # trimmed

        # audit trail
        st = audit.statuses()
        assert st[os.path.join(lake["incoming"], "c_bad.csv")] == "validation_failed"
        assert sum(1 for v in st.values() if v == "loaded") == 3

    def test_cross_file_precedence_later_file_wins(self, spark, lake):
        # same key, EARLIER date in the later file: the reference's
        # sequential upserts make the later file win anyway.
        _put(
            lake,
            "1_first.csv",
            "sale_id,sale_date,customer_id,product_id,quantity,amount\n"
            "k,2024-12-31 00:00:00,EARLY,P,1,1.0\n",
        )
        _put(
            lake,
            "2_second.csv",
            "sale_id,sale_date,customer_id,product_id,quantity,amount\n"
            "k,2024-01-01 00:00:00,LATE,P,2,2.0\n",
        )
        _run(spark, lake)
        rows = spark.read.parquet(lake["target"]).collect()
        assert len(rows) == 1 and rows[0]["customer_id"] == "LATE"

    def test_null_date_wins_within_file(self, spark, lake):
        _put(
            lake,
            "f.csv",
            "sale_id,sale_date,customer_id,product_id,quantity,amount\n"
            "k,2024-06-01 00:00:00,REAL,P,1,1.0\n"
            + _FILLER +
            "k,bogus-date,NULLED,P,2,2.0\n",
        )
        _run(spark, lake)
        rows = {r["sale_id"]: r for r in spark.read.parquet(lake["target"]).collect()}
        assert rows["k"]["customer_id"] == "NULLED"

    def test_idempotent_rerun(self, spark, lake):
        _put(lake, "f.csv", DIRTY_CSV)
        _run(spark, lake)
        first = sorted(
            (r["sale_id"], r["amount"]) for r in spark.read.parquet(lake["target"]).collect()
        )
        # same file re-lands (e.g. replayed upstream) -> same sink state
        _put(lake, "f.csv", DIRTY_CSV)
        report, _ = _run(spark, lake)
        assert [o.status for o in report.outcomes] == ["loaded"]
        second = sorted(
            (r["sale_id"], r["amount"]) for r in spark.read.parquet(lake["target"]).collect()
        )
        assert first == second

    def test_per_file_mode(self, spark, lake):
        _put(lake, "a.csv", DIRTY_CSV)
        _put(lake, "bad.csv", BAD_CSV)
        report, _ = _run(spark, lake, per_file=True)
        statuses = {os.path.basename(o.path): o.status for o in report.outcomes}
        assert statuses == {"a.csv": "loaded", "bad.csv": "validation_failed"}
        assert spark.read.parquet(lake["target"]).count() == 3 + len(FILLER_KEYS)

    def test_empty_incoming(self, spark, lake):
        report, _ = _run(spark, lake)
        assert report.outcomes == [] and report.rows_upserted == 0

    def test_grouped_staging_equals_per_file_mode(self, spark, lake):
        """Round-14 staging rewrite (signature-grouped multi-path scans
        replacing the per-file read + O(n²) union): the sink state of a
        heterogeneous batch — two CSV header signatures incl. a
        REORDERED one, ndjson, parquet, cross-file key collisions —
        must equal per-file mode's sequential loop exactly."""
        def land():
            _put(lake, "a_dirty.csv", DIRTY_CSV)
            _put(
                lake, "b_reordered.csv",
                "amount,sale_id,sale_date,customer_id,product_id,quantity\n"
                "55.0,s1,2025-01-01 00:00:00,CR,PR,5\n"  # beats a_dirty's s1
                "7.0,r1,2024-07-01 00:00:00,C7,P7,7\n",
            )
            _put(lake, "c_good.json", GOOD_NDJSON)
            pq.write_table(
                pa.table({
                    "sale_id": ["p1"], "sale_date": ["2024-06-01 00:00:00"],
                    "customer_id": ["CP"], "product_id": ["PP"],
                    "quantity": [7], "amount": [70.0],
                }),
                os.path.join(lake["incoming"], "d_good.parquet"),
            )

        land()
        _run(spark, lake)
        scale = sorted(
            tuple(sorted(r.asDict().items()))
            for r in spark.read.parquet(lake["target"]).collect()
        )
        shutil.rmtree(lake["target"])
        land()
        _run(spark, lake, per_file=True)
        per_file = sorted(
            tuple(sorted(r.asDict().items()))
            for r in spark.read.parquet(lake["target"]).collect()
        )
        assert scale == per_file
        # the reordered later file's s1 really won (rank precedence)
        s1 = dict([t for t in scale if dict(t)["sale_id"] == "s1"][0])
        assert s1["customer_id"] == "CR"

    def test_parquet_type_drift_and_json_layout_groups(self, spark, lake):
        """Signature grouping edges: two parquet files with the SAME
        columns but DRIFTED types land in different groups (footer
        signature includes types), meet only after the all-string cast
        — the legacy per-file semantics; a JSON array file and an
        ndjson file are separate layout groups read with the right
        reader each."""
        pq.write_table(
            pa.table({
                "sale_id": ["t1"], "sale_date": ["2024-06-01 00:00:00"],
                "customer_id": ["CA"], "product_id": ["PA"],
                "quantity": pa.array([7], type=pa.int64()),
                "amount": pa.array([70.0], type=pa.float64()),
            }),
            os.path.join(lake["incoming"], "a_int.parquet"),
        )
        pq.write_table(
            pa.table({
                "sale_id": ["t2"], "sale_date": ["2024-06-02 00:00:00"],
                "customer_id": ["CB"], "product_id": ["PB"],
                "quantity": pa.array(["8"], type=pa.string()),
                "amount": pa.array(["80.5"], type=pa.string()),
            }),
            os.path.join(lake["incoming"], "b_str.parquet"),
        )
        _put(
            lake, "c_array.json",
            json.dumps([
                {"sale_id": "t3", "sale_date": "2024-06-03 00:00:00",
                 "customer_id": "CC", "product_id": "PC",
                 "quantity": 9, "amount": 90.0},
            ]),
        )
        _put(lake, "d_nd.json", GOOD_NDJSON)
        report, _ = _run(spark, lake)
        assert {o.status for o in report.outcomes} == {"loaded"}
        got = {r["sale_id"]: r.asDict()
               for r in spark.read.parquet(lake["target"]).collect()}
        assert set(got) == {"t1", "t2", "t3", "n1", "n2"}
        assert got["t1"]["quantity"] == 7 and got["t2"]["quantity"] == 8
        assert got["t2"]["amount"] == 80.5 and got["t3"]["quantity"] == 9

    def test_json_type_drift_groups_stage_like_per_file(self, spark, lake):
        """JSON grouping must key on the merged top-level key/type
        signature, not layout alone: sale_id is a long in file A and a
        double in file B, so one shared scan would infer double
        group-wide and render A's key '123.0' where per-file staging
        gives '123' — silently splitting dedup keys. Drifted files land
        in separate groups; sink state equals per-file mode exactly."""
        def land():
            _put(lake, "a_long.json", json.dumps(
                {"sale_id": 123, "sale_date": "2024-06-01 00:00:00",
                 "customer_id": "CA", "product_id": "PA",
                 "quantity": 1, "amount": 10.0}))
            _put(lake, "b_double.json", json.dumps(
                {"sale_id": 456.5, "sale_date": "2024-06-02 00:00:00",
                 "customer_id": "CB", "product_id": "PB",
                 "quantity": 2, "amount": 20.0}))

        land()
        _run(spark, lake)
        scale = sorted(
            tuple(sorted(r.asDict().items()))
            for r in spark.read.parquet(lake["target"]).collect()
        )
        shutil.rmtree(lake["target"])
        land()
        _run(spark, lake, per_file=True)
        per_file = sorted(
            tuple(sorted(r.asDict().items()))
            for r in spark.read.parquet(lake["target"]).collect()
        )
        assert scale == per_file
        ids = {dict(t)["sale_id"] for t in scale}
        assert "123" in ids and "456.5" in ids  # no group-wide widening

    def test_same_signature_json_files_share_one_scan(self, spark, lake,
                                                      monkeypatch):
        """The drift guard must not tax the homogeneous common case:
        ndjson files with identical key/type signatures still batch
        into ONE multi-path scan (plus one for the drifted layout)."""
        import mini_data_platform_spark.runner as runner_mod

        calls = []
        real = runner_mod._read_group

        def spy(spark_, sig, paths, stage_dirs=None):
            calls.append(sorted(os.path.basename(p) for p in paths))
            return real(spark_, sig, paths, stage_dirs)

        monkeypatch.setattr(runner_mod, "_read_group", spy)
        _put(lake, "a_nd.json", GOOD_NDJSON)
        _put(lake, "b_nd.json", GOOD_NDJSON.replace("n1", "m1")
             .replace("n2", "m2"))
        report, _ = _run(spark, lake)
        assert {o.status for o in report.outcomes} == {"loaded"}
        assert calls == [["a_nd.json", "b_nd.json"]]

    def test_large_group_hardlink_staged_scan(self, spark, lake):
        """Groups at/above scanstage.STAGE_MIN_FILES read through a
        hardlink-staged DIRECTORY (one listStatus) instead of an
        explicit path list (~1.8 ms/path JVM qualification each — the
        INGEST_SCALE r15 4096/10k-file wall). Semantics must be
        unchanged: per-file provenance ranks (later file wins), all
        rows present, and the staging dirs removed after the batch."""
        import glob as _glob
        import tempfile

        from mini_data_platform_spark.sources.scanstage import (
            STAGE_MIN_FILES,
        )

        hdr = "sale_id,sale_date,customer_id,product_id,quantity,amount\n"
        n = STAGE_MIN_FILES + 4
        for i in range(n):
            # same key 'k' in every file: the LAST file must win
            _put(
                lake, f"{i:04d}.csv",
                hdr + f"k,2024-01-01 00:00:00,C{i},P,1,{i}.0\n"
                f"u{i},2024-01-02 00:00:00,CU,P,1,1.0\n",
            )
        before = set(
            _glob.glob(os.path.join(tempfile.gettempdir(), "mdp_scanstage_*"))
        )
        report, _ = _run(spark, lake)
        after = set(
            _glob.glob(os.path.join(tempfile.gettempdir(), "mdp_scanstage_*"))
        )
        assert {o.status for o in report.outcomes} == {"loaded"}
        assert after == before, "staging dirs leaked"
        got = {r["sale_id"]: r.asDict()
               for r in spark.read.parquet(lake["target"]).collect()}
        assert len(got) == n + 1  # k + one unique key per file
        assert got["k"]["customer_id"] == f"C{n - 1}"  # last file won

    def test_gzip_csv_stages_correctly(self, spark, lake):
        """A .csv.gz lands as its own solo group (the raw header-line
        signature would be codec bytes), Spark decompresses it in the
        scan, and validation must not falsely quarantine it."""
        import gzip

        p = os.path.join(lake["incoming"], "g.csv.gz")
        with gzip.open(p, "wb") as fh:
            fh.write(DIRTY_CSV.encode())
        report, _ = _run(spark, lake)
        assert [o.status for o in report.outcomes] == ["loaded"]
        got = {r["sale_id"]
               for r in spark.read.parquet(lake["target"]).collect()}
        assert {"s1", "s2", "s3"} <= got

    def test_non_uri_safe_basename_falls_back_losslessly(self, spark, lake):
        """A filename whose URI spelling differs from its basename
        (space -> %20) must not silently drop rows through the rank
        join — such batches stage the legacy per-file way."""
        _put(lake, "sp ace.csv", DIRTY_CSV)
        report, _ = _run(spark, lake)
        assert [o.status for o in report.outcomes] == ["loaded"]
        got = {r["sale_id"] for r in spark.read.parquet(lake["target"]).collect()}
        assert {"s1", "s2", "s3"} | FILLER_KEYS <= got

    def test_stage_fallback_on_unreadable_signature(
        self, spark, lake, monkeypatch
    ):
        """When any file's read-signature cannot be derived (remote
        paths in deployment — simulated by a raising signature), the
        batch stages the legacy per-file way and the result is
        unchanged."""
        import mini_data_platform_spark.runner as runner_mod

        def no_sig(path):
            raise runner_mod._NoSignature(path)

        monkeypatch.setattr(runner_mod, "_file_signature", no_sig)
        _put(lake, "a_dirty.csv", DIRTY_CSV)
        report, _ = _run(spark, lake)
        assert [o.status for o in report.outcomes] == ["loaded"]
        got = {r["sale_id"] for r in spark.read.parquet(lake["target"]).collect()}
        assert {"s1", "s2", "s3"} <= got

    def test_sink_failure_quarantines_to_loading_failed(self, spark, lake):
        _put(lake, "f.csv", DIRTY_CSV)
        audit = AuditLog(functools.partial(sqlite_conn_factory, lake["audit_db"]))

        def boom(df):
            raise RuntimeError("sink down")

        report = run_batch_ingest(
            spark, lake["incoming"], lake["processed"], lake["failed"],
            sink=boom, audit=audit,
        )
        assert [o.status for o in report.outcomes] == ["loading_failed"]
        assert os.listdir(os.path.join(lake["failed"], "loading_failed")) == ["f.csv"]


class TestNotificationHook:
    """on_complete parity with the reference's notify_success/notify_failure
    callbacks (process_sales_dags.py:37-62): fires on success AND failure
    outcomes with the final report, and can never fail the pipeline."""

    def test_invoked_on_success(self, spark, lake):
        _put(lake, "good.ndjson", GOOD_NDJSON)
        seen = []
        audit = AuditLog(functools.partial(sqlite_conn_factory, lake["audit_db"]))
        report = run_batch_ingest(
            spark, lake["incoming"], lake["processed"], lake["failed"],
            sink=_sink(spark, lake), audit=audit, on_complete=seen.append,
        )
        assert seen == [report]
        assert not report.failed and len(report.loaded) == 1

    def test_invoked_on_failure(self, spark, lake):
        _put(lake, "bad.csv", BAD_CSV)
        seen = []
        report = run_batch_ingest(
            spark, lake["incoming"], lake["processed"], lake["failed"],
            sink=_sink(spark, lake), on_complete=seen.append,
        )
        assert seen == [report]
        assert report.failed and report.failed[0].status == "validation_failed"

    def test_raising_hook_never_fails_run(self, spark, lake):
        _put(lake, "good.ndjson", GOOD_NDJSON)

        def hook(_report):
            raise RuntimeError("smtp down")

        report = run_batch_ingest(
            spark, lake["incoming"], lake["processed"], lake["failed"],
            sink=_sink(spark, lake), on_complete=hook,
        )
        assert len(report.loaded) == 1  # pipeline outcome unaffected


class TestReprocessFailed:
    """Failed-file reprocessing (round-9 verdict item 5; the reference's
    own declared future work — README.md "Add reprocessing DAG for
    failed files"): quarantine -> fix -> requeue -> loaded, with the
    audit table telling the file's whole story under ONE key."""

    def _audit_rows(self, lake):
        import sqlite3

        conn = sqlite3.connect(lake["audit_db"])
        try:
            return dict(
                conn.execute(
                    "SELECT file_key, status FROM file_ingestion_log"
                ).fetchall()
            )
        finally:
            conn.close()

    def test_sink_outage_fix_reprocess_loads(self, spark, lake):
        from mini_data_platform_spark.runner import reprocess_failed

        _put(lake, "f.csv", DIRTY_CSV)
        audit = AuditLog(functools.partial(sqlite_conn_factory, lake["audit_db"]))

        def boom(df):
            raise RuntimeError("sink down")

        run_batch_ingest(
            spark, lake["incoming"], lake["processed"], lake["failed"],
            sink=boom, audit=audit,
        )
        key = os.path.join(lake["incoming"], "f.csv")
        assert self._audit_rows(lake)[key] == "loading_failed"
        # "fix the sink", then reprocess: requeued out of quarantine,
        # re-validated, loaded; quarantine dir drains
        report = reprocess_failed(
            spark, lake["incoming"], lake["processed"], lake["failed"],
            sink=_sink(spark, lake), audit=audit,
        )
        assert [o.status for o in report.outcomes] == ["loaded"]
        assert os.listdir(os.path.join(lake["failed"], "loading_failed")) == []
        assert os.listdir(lake["processed"]) == ["f.csv"]
        assert self._audit_rows(lake)[key] == "loaded"
        # the upserted rows are the ordinary full-pipeline result
        got = {
            r["sale_id"]
            for r in spark.read.parquet(lake["target"]).collect()
        }
        assert got == {"s1", "s2", "s3"} | FILLER_KEYS

    def test_validation_failure_fix_reprocess(self, spark, lake):
        """A file quarantined for a BAD SCHEMA is fixed in place inside
        the quarantine dir (the operator's edit), requeued, and loads."""
        from mini_data_platform_spark.runner import reprocess_failed

        _put(lake, "bad.csv", BAD_CSV)
        audit = AuditLog(functools.partial(sqlite_conn_factory, lake["audit_db"]))
        run_batch_ingest(
            spark, lake["incoming"], lake["processed"], lake["failed"],
            sink=_sink(spark, lake), audit=audit,
        )
        q = os.path.join(lake["failed"], "validation_failed", "bad.csv")
        assert os.path.exists(q)
        with open(q, "w") as f:  # the fix
            f.write(DIRTY_CSV)
        report = reprocess_failed(
            spark, lake["incoming"], lake["processed"], lake["failed"],
            sink=_sink(spark, lake), audit=audit,
        )
        assert [o.status for o in report.outcomes] == ["loaded"]

    def test_noop_when_no_quarantined_files(self, spark, lake):
        from mini_data_platform_spark.runner import reprocess_failed

        report = reprocess_failed(
            spark, lake["incoming"], lake["processed"], lake["failed"],
            sink=_sink(spark, lake),
        )
        assert report.outcomes == [] and report.rows_upserted == 0

    def test_refailing_file_requarantines(self, spark, lake):
        """A requeued file whose cause was NOT fixed goes straight back
        to quarantine through the ordinary routing — reprocessing loops
        are safe to schedule blindly."""
        from mini_data_platform_spark.runner import reprocess_failed

        _put(lake, "bad.csv", BAD_CSV)
        audit = AuditLog(functools.partial(sqlite_conn_factory, lake["audit_db"]))
        run_batch_ingest(
            spark, lake["incoming"], lake["processed"], lake["failed"],
            sink=_sink(spark, lake), audit=audit,
        )
        report = reprocess_failed(
            spark, lake["incoming"], lake["processed"], lake["failed"],
            sink=_sink(spark, lake), audit=audit,
        )
        assert [o.status for o in report.outcomes] == ["validation_failed"]
        assert os.listdir(
            os.path.join(lake["failed"], "validation_failed")
        ) == ["bad.csv"]
