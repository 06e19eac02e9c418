"""Ordered funnel + cohort retention (operators/funnel.py)."""

import datetime as dt

import pytest

from mini_data_platform_spark.operators.funnel import (
    cohort_retention,
    funnel_steps,
)

_BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    """rows: (user, minute_offset, type)."""
    return spark.createDataFrame(
        [(u, _BASE + dt.timedelta(minutes=m), y) for u, m, y in rows],
        "user_id string, ts timestamp, event_type string",
    )


class TestFunnel:
    def test_order_sensitive_counts(self, spark):
        ev = _events(
            spark,
            [
                # u1: full ordered chain
                ("u1", 0, "view"), ("u1", 5, "click"), ("u1", 9, "purchase"),
                # u2: click BEFORE the first view only → stops at view
                ("u2", 10, "click"), ("u2", 20, "view"),
                # u3: view only
                ("u3", 0, "view"),
                # u4: never viewed (purchase alone) → not even step 0
                ("u4", 3, "purchase"),
            ],
        )
        rows = {
            r["step"]: r
            for r in funnel_steps(
                ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]
            ).collect()
        }
        assert rows["view"]["users"] == 3
        assert rows["click"]["users"] == 1
        assert rows["purchase"]["users"] == 1
        assert rows["view"]["conversion"] == pytest.approx(1.0)
        assert rows["click"]["conversion"] == pytest.approx(1 / 3)

    def test_greedy_earliest_completion(self, spark):
        # click at -5 (before view) must not satisfy step 2, but the
        # later click at +5 does — greedy matches the earliest AFTER
        ev = _events(
            spark,
            [
                ("u1", 0, "view"),
                ("u1", -5, "click"),
                ("u1", 5, "click"),
                ("u1", 7, "purchase"),
            ],
        )
        rows = {
            r["step"]: r["users"]
            for r in funnel_steps(
                ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]
            ).collect()
        }
        assert rows == {"view": 1, "click": 1, "purchase": 1}

    def test_strictly_after(self, spark):
        # click at the SAME instant as the view does not count
        ev = _events(spark, [("u1", 0, "view"), ("u1", 0, "click")])
        rows = {
            r["step"]: r["users"]
            for r in funnel_steps(
                ev, "user_id", "ts", "event_type", ["view", "click"]
            ).collect()
        }
        assert rows == {"view": 1, "click": 0}

    def test_empty_steps_rejected(self, spark):
        ev = _events(spark, [("u1", 0, "view")])
        with pytest.raises(ValueError, match="non-empty"):
            funnel_steps(ev, "user_id", "ts", "event_type", [])


class TestCohortRetention:
    def test_triangle(self, spark):
        day = 24 * 60
        ev = _events(
            spark,
            [
                # cohort day D: u1 active D and D+2; u2 active D only
                ("u1", 0, "view"), ("u1", 2 * day, "click"),
                ("u2", 30, "view"),
                # cohort day D+1: u3 active D+1 and D+2
                ("u3", day, "view"), ("u3", 2 * day, "view"),
            ],
        )
        rows = {
            (r["cohort_day"], r["day_offset"]): (
                r["active_users"],
                r["cohort_size"],
                r["retention"],
            )
            for r in cohort_retention(ev, "user_id", "ts").collect()
        }
        d0 = min(c for c, _ in rows)
        assert rows[(d0, 0)] == (2, 2, pytest.approx(1.0))
        assert rows[(d0, 2)] == (1, 2, pytest.approx(0.5))
        assert rows[(d0 + 1, 0)] == (1, 1, pytest.approx(1.0))
        assert rows[(d0 + 1, 1)] == (1, 1, pytest.approx(1.0))
        assert len(rows) == 4

    def test_multiple_events_one_day_count_once(self, spark):
        ev = _events(
            spark,
            [("u1", 0, "view"), ("u1", 10, "click"), ("u1", 20, "view")],
        )
        rows = cohort_retention(ev, "user_id", "ts").collect()
        assert len(rows) == 1
        assert (rows[0]["active_users"], rows[0]["cohort_size"]) == (1, 1)


class TestCompositeKeyFunnel:
    def test_session_scoped_counts(self, spark):
        # same user, two "sessions" (keyed explicitly): the full chain
        # in session 1; in session 2 the purchase precedes the view —
        # the composite key must keep the sessions apart
        ev = spark.createDataFrame(
            [
                ("u1", 1, _BASE, "view"),
                ("u1", 1, _BASE + dt.timedelta(minutes=1), "click"),
                ("u1", 1, _BASE + dt.timedelta(minutes=2), "purchase"),
                ("u1", 2, _BASE + dt.timedelta(hours=2), "purchase"),
                ("u1", 2, _BASE + dt.timedelta(hours=2, minutes=1), "view"),
            ],
            "user_id string, sess int, ts timestamp, event_type string",
        )
        rows = {
            r["step"]: r["users"]
            for r in funnel_steps(
                ev,
                ["user_id", "sess"],
                "ts",
                "event_type",
                ["view", "click", "purchase"],
            ).collect()
        }
        assert rows == {"view": 2, "click": 1, "purchase": 1}

    def test_single_key_string_still_works(self, spark):
        ev = _events(spark, [("u1", 0, "view"), ("u1", 1, "click")])
        rows = {
            r["step"]: r["users"]
            for r in funnel_steps(
                ev, "user_id", "ts", "event_type", ["view", "click"]
            ).collect()
        }
        assert rows == {"view": 1, "click": 1}

    def test_empty_step_zero_yields_null_conversion(self, spark):
        ev = _events(spark, [("u1", 0, "click")])  # nobody viewed
        rows = funnel_steps(
            ev, "user_id", "ts", "event_type", ["view", "click"]
        ).collect()
        assert all(r["users"] == 0 for r in rows)
        assert all(r["conversion"] is None for r in rows)


class TestHourlyAnomalies:
    def test_warmup_excluded_and_spike_flagged(self, spark):
        from mini_data_platform_spark.plans.analytics import (
            events_hourly_anomalies,
        )
        import mini_data_platform_spark.plans.analytics as A

        # synthetic: 30 steady hours of 5 events, then one 50-event
        # spike hour — built inline and routed through the same plan
        rows = []
        for h in range(30):
            for i in range(50 if h == 29 else 5):
                rows.append(
                    ("t", _BASE + dt.timedelta(hours=h, seconds=i), "x%d" % i)
                )
        ev = spark.createDataFrame(
            rows, "event_type string, ts timestamp, user_id string"
        )
        import tempfile, os, uuid

        d = os.path.join(tempfile.gettempdir(), f"anom_{uuid.uuid4().hex[:8]}")
        ev.write.parquet(os.path.join(d, "events.parquet"))
        out = {r["hour"]: r for r in events_hourly_anomalies(spark, d).collect()}
        # 30 hourly rows, first 24 are warmup → 6 judged
        assert len(out) == 6
        spike_hour = max(out)
        assert out[spike_hour]["n_events"] == 50
        assert out[spike_hour]["is_anomaly"] == 1
        steady = [r for h, r in out.items() if h != spike_hour]
        assert all(r["is_anomaly"] == 0 for r in steady)

    def test_zero_variance_yields_null_judgment(self, spark):
        from mini_data_platform_spark.plans.analytics import (
            events_hourly_anomalies,
        )

        rows = []
        for h in range(26):
            rows.append(("t", _BASE + dt.timedelta(hours=h), "u"))
        ev = spark.createDataFrame(
            rows, "event_type string, ts timestamp, user_id string"
        )
        import tempfile, os, uuid

        d = os.path.join(tempfile.gettempdir(), f"anom_{uuid.uuid4().hex[:8]}")
        ev.write.parquet(os.path.join(d, "events.parquet"))
        out = events_hourly_anomalies(spark, d).collect()
        # constant series: variance 0 → no z-score (never a
        # divide-by-zero), but equality with the constant history IS a
        # verdict: normal
        assert len(out) == 2
        assert all(r["zscore"] is None and r["is_anomaly"] == 0 for r in out)
