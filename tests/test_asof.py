"""as-of join operator semantics: backward direction, inclusive <=,
left vs inner, suffixing."""

from mini_data_platform_spark.operators.asof import asof_join


def _dfs(spark):
    left = spark.createDataFrame(
        [("u1", 100, "p1"), ("u1", 205, "p2"), ("u2", 50, "p3"), ("u3", 10, "p4")],
        "user string, ts_us long, pid string",
    )
    right = spark.createDataFrame(
        [("u1", 90, "c1"), ("u1", 100, "c2"), ("u1", 200, "c3"), ("u2", 60, "c4")],
        "user string, click_ts long, cid string",
    )
    return left, right


def test_backward_inclusive(spark):
    left, right = _dfs(spark)
    out = {
        r.pid: (r.cid, r.click_ts)
        for r in asof_join(left, right, ["user"], "ts_us", "click_ts").collect()
    }
    assert out["p1"] == ("c2", 100)  # simultaneous right row visible (<=)
    assert out["p2"] == ("c3", 200)  # most recent prior
    assert out["p3"] == (None, None)  # right exists only later (60 > 50)
    assert out["p4"] == (None, None)  # key has no right rows at all


def test_inner_drops_unmatched(spark):
    left, right = _dfs(spark)
    out = asof_join(left, right, ["user"], "ts_us", "click_ts", how="inner")
    assert sorted(r.pid for r in out.collect()) == ["p1", "p2"]


def test_nullable_payload_not_resurrected(spark):
    """The winning right row's NULL payload fields must stay NULL, and all
    payload columns must come from the SAME right row (struct carry — a
    per-column last(ignorenulls) would resurrect stale values)."""
    left = spark.createDataFrame(
        [("u1", 300, "p1")], "user string, ts_us long, pid string"
    )
    right = spark.createDataFrame(
        [("u1", 100, "old-a", "old-b"), ("u1", 200, None, "new-b")],
        "user string, click_ts long, a string, b string",
    )
    row = asof_join(left, right, ["user"], "ts_us", "click_ts").collect()[0]
    assert row.click_ts == 200
    assert row.a is None  # NOT "old-a" from the stale row
    assert row.b == "new-b"


def test_collision_suffix(spark):
    left = spark.createDataFrame([("u1", 100, "L")], "user string, ts long, v string")
    right = spark.createDataFrame([("u1", 90, "R")], "user string, rts long, v string")
    out = asof_join(left, right, ["user"], "ts", "rts", right_cols=["v"])
    row = out.collect()[0]
    assert row.v == "L" and row.v_right == "R"
