"""Time-series resample/gap-fill (operators/timeseries.py)."""

import datetime as dt

import pytest

from mini_data_platform_spark.operators.timeseries import resample_fill


def _obs(spark, rows):
    return spark.createDataFrame(
        [(k, dt.date.fromisoformat(d), float(v)) for k, d, v in rows],
        "k string, day date, v double",
    )


def _by_day(df):
    return {
        (r["k"], r["day"].isoformat()): (r["value"], r["filled"])
        for r in df.collect()
    }


class TestResampleFill:
    def test_linear_interpolation(self, spark):
        obs = _obs(
            spark,
            [("a", "2024-01-01", 10.0), ("a", "2024-01-04", 40.0)],
        )
        got = _by_day(resample_fill(obs, "k", "day", "v", "linear"))
        assert got == {
            ("a", "2024-01-01"): (10.0, 0),
            ("a", "2024-01-02"): (20.0, 1),
            ("a", "2024-01-03"): (30.0, 1),
            ("a", "2024-01-04"): (40.0, 0),
        }

    def test_locf(self, spark):
        obs = _obs(
            spark,
            [("a", "2024-01-01", 10.0), ("a", "2024-01-04", 40.0)],
        )
        got = _by_day(resample_fill(obs, "k", "day", "v", "locf"))
        assert got[("a", "2024-01-02")] == (10.0, 1)
        assert got[("a", "2024-01-03")] == (10.0, 1)
        assert got[("a", "2024-01-04")] == (40.0, 0)

    def test_keys_have_independent_grids(self, spark):
        obs = _obs(
            spark,
            [
                ("a", "2024-01-01", 1.0),
                ("a", "2024-01-03", 3.0),
                ("b", "2024-02-10", 5.0),  # single observation
            ],
        )
        got = _by_day(resample_fill(obs, "k", "day", "v", "linear"))
        assert len([1 for (k, _) in got if k == "a"]) == 3
        assert len([1 for (k, _) in got if k == "b"]) == 1
        assert got[("b", "2024-02-10")] == (5.0, 0)
        assert got[("a", "2024-01-02")] == (2.0, 1)

    def test_multiple_gaps_between_observations(self, spark):
        obs = _obs(
            spark,
            [
                ("a", "2024-01-01", 0.0),
                ("a", "2024-01-05", 8.0),
                ("a", "2024-01-07", 4.0),
            ],
        )
        got = _by_day(resample_fill(obs, "k", "day", "v", "linear"))
        assert got[("a", "2024-01-02")] == (2.0, 1)
        assert got[("a", "2024-01-03")] == (4.0, 1)
        assert got[("a", "2024-01-04")] == (6.0, 1)
        assert got[("a", "2024-01-06")] == (6.0, 1)

    def test_observed_rows_never_rewritten(self, spark):
        obs = _obs(
            spark,
            [
                ("a", "2024-01-01", 7.5),
                ("a", "2024-01-02", -1.25),
                ("a", "2024-01-03", 0.0),
            ],
        )
        got = _by_day(resample_fill(obs, "k", "day", "v", "linear"))
        assert got == {
            ("a", "2024-01-01"): (7.5, 0),
            ("a", "2024-01-02"): (-1.25, 0),
            ("a", "2024-01-03"): (0.0, 0),
        }

    def test_bad_mode_raises(self, spark):
        obs = _obs(spark, [("a", "2024-01-01", 1.0)])
        with pytest.raises(ValueError, match="mode"):
            resample_fill(obs, "k", "day", "v", "cubic")
