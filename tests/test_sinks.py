"""Sinks: keyed upsert (K1, three strategies), audit log (K2, never-raise),
object moves (K5). Upsert semantics parity target:
/root/reference/dags/src/db.py:22-99."""

import functools
import sqlite3

from pyspark.sql import Row

from mini_data_platform_spark.sinks import (
    AuditLog,
    merge_into_sql,
    move_object,
    on_conflict_sql,
    upsert_dbapi,
    upsert_parquet,
)
from mini_data_platform_spark.sinks.upsert import sqlite_conn_factory

COLS = ["sale_id", "sale_date", "customer_id", "product_id", "quantity", "amount"]


def _rows(spark, data):
    return spark.createDataFrame(
        [Row(**dict(zip(COLS, d))) for d in data]
    )


class TestSqlBuilders:
    def test_on_conflict_values_form(self):
        sql = on_conflict_sql("sales", COLS, ["sale_id"])
        assert "VALUES %s" in sql
        assert "ON CONFLICT (sale_id) DO UPDATE SET" in sql
        assert "sale_id = EXCLUDED.sale_id" not in sql  # key never updated
        assert "amount = EXCLUDED.amount" in sql

    def test_on_conflict_staging_form(self):
        sql = on_conflict_sql("sales", COLS, ["sale_id"], source="sales_staging")
        assert "SELECT" in sql and "FROM sales_staging" in sql

    def test_merge_into(self):
        sql = merge_into_sql("sales", "staging", COLS, ["sale_id"])
        assert sql.startswith("MERGE INTO sales t USING staging s ON t.sale_id = s.sale_id")
        assert "WHEN MATCHED THEN UPDATE SET" in sql
        assert "WHEN NOT MATCHED THEN INSERT" in sql


class TestUpsertDbapi:
    def _setup_db(self, path):
        conn = sqlite3.connect(path)
        conn.execute(
            "CREATE TABLE sales (sale_id TEXT PRIMARY KEY, sale_date TEXT, "
            "customer_id TEXT, product_id TEXT, quantity INTEGER, amount REAL)"
        )
        conn.commit()
        conn.close()

    def test_insert_then_update(self, spark, tmp_path):
        db = str(tmp_path / "sales.db")
        self._setup_db(db)
        factory = functools.partial(sqlite_conn_factory, db)

        df1 = _rows(
            spark,
            [
                ("a", "2024-01-01", "C1", "P1", 1, 10.0),
                ("b", "2024-01-02", "C2", "P2", 2, 20.0),
            ],
        ).coalesce(2)
        n = upsert_dbapi(df1, factory, "sales", ["sale_id"], batch_size=1)
        assert n == 2

        # second batch: updates a, inserts c
        df2 = _rows(
            spark,
            [
                ("a", "2024-02-01", "C1", "P1", 5, 50.0),
                ("c", "2024-01-03", "C3", "P3", 3, 30.0),
            ],
        ).coalesce(1)
        upsert_dbapi(df2, factory, "sales", ["sale_id"])

        got = dict(
            sqlite3.connect(db).execute("SELECT sale_id, amount FROM sales").fetchall()
        )
        assert got == {"a": 50.0, "b": 20.0, "c": 30.0}

    def test_idempotent_rerun(self, spark, tmp_path):
        db = str(tmp_path / "re.db")
        self._setup_db(db)
        factory = functools.partial(sqlite_conn_factory, db)
        df = _rows(spark, [("x", "2024-01-01", "C", "P", 1, 1.0)]).coalesce(1)
        upsert_dbapi(df, factory, "sales", ["sale_id"])
        upsert_dbapi(df, factory, "sales", ["sale_id"])
        rows = sqlite3.connect(db).execute("SELECT * FROM sales").fetchall()
        assert len(rows) == 1


class TestUpsertParquet:
    def test_merge_and_idempotence(self, spark, tmp_path):
        target = str(tmp_path / "sales_pq")
        df1 = _rows(
            spark,
            [
                ("a", "2024-01-01", "C1", "P1", 1, 10.0),
                ("b", "2024-01-02", "C2", "P2", 2, 20.0),
            ],
        )
        assert upsert_parquet(spark, df1, target, ["sale_id"]) == 2

        df2 = _rows(
            spark,
            [
                ("b", "2024-03-03", "C2", "P9", 9, 99.0),
                ("c", "2024-01-03", "C3", "P3", 3, 30.0),
            ],
        )
        upsert_parquet(spark, df2, target, ["sale_id"])
        got = {
            r["sale_id"]: (r["product_id"], r["amount"])
            for r in spark.read.parquet(target).collect()
        }
        assert got == {"a": ("P1", 10.0), "b": ("P9", 99.0), "c": ("P3", 30.0)}

        # re-running the same batch changes nothing
        upsert_parquet(spark, df2, target, ["sale_id"])
        assert spark.read.parquet(target).count() == 3


class TestAuditLog:
    def test_status_transitions(self, tmp_path):
        db = str(tmp_path / "audit.db")
        log = AuditLog(functools.partial(sqlite_conn_factory, db))
        log.log_file_status("incoming/f1.csv", "lake", "validated")
        log.log_file_status("incoming/f1.csv", "lake", "loaded", rows=100)
        log.log_file_status("incoming/f2.csv", "lake", "validation_failed", error="bad")
        assert log.statuses() == {
            "incoming/f1.csv": "loaded",
            "incoming/f2.csv": "validation_failed",
        }

    def test_never_raises(self):
        def broken():
            raise OSError("db down")

        log = AuditLog(broken)  # bootstrap swallow
        log.log_file_status("k", "b", "loaded")  # write swallow
        assert log.statuses() == {}


class TestMoveObject:
    def test_local_move_creates_prefix(self, tmp_path):
        src = tmp_path / "incoming" / "f.csv"
        src.parent.mkdir()
        src.write_text("x")
        dst = tmp_path / "processed" / "deep" / "f.csv"
        move_object(str(src), str(dst))
        assert dst.read_text() == "x"
        assert not src.exists()
