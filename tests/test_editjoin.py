"""Edit-distance join: exactness vs the naive predicate on random
strings (the load-bearing test — the filter must be a provable
superset), hand-checked distances, short/mixed-length coverage."""

import pytest

from pyspark.sql import functions as F

from mini_data_platform_spark.operators.editjoin import edit_distance_pairs


def _naive(rows, d):
    import itertools

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    out = set()
    for (ia, sa), (ib, sb) in itertools.combinations(rows, 2):
        if sa is None or sb is None:
            continue
        dd = lev(sa, sb)
        if dd <= d:
            out.add((min(ia, ib), max(ia, ib), dd))
    return out


class TestEditJoin:
    def test_hand_checked(self, spark):
        rows = [
            (1, "spark engine"),
            (2, "spark enginee"),   # dist 1
            (3, "spark. engine"),   # dist 1 from 1, 2 from 2
            (4, "flink runtime"),   # far from all
            (5, "spark engine"),    # exact dup of 1 -> dist 0
        ]
        df = spark.createDataFrame(rows, "id long, s string")
        got = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in edit_distance_pairs(df, "id", "s", max_dist=2).collect()
        }
        assert got == _naive(rows, 2)
        assert (1, 5, 0) in got
        assert (1, 2, 1) in got

    def test_exactness_on_random_strings(self, spark):
        """Superset filter + exact verify == naive all-pairs, across
        lengths straddling every regime (empty, < q, short block,
        guarantee threshold, long)."""
        import random

        rng = random.Random(11)
        alpha = "abcdef"
        rows = [
            (i, "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12))))
            for i in range(90)
        ]
        df = spark.createDataFrame(rows, "id long, s string")
        for d in (0, 1, 2, 3):
            got = {
                (r["id_a"], r["id_b"], r["dist"])
                for r in edit_distance_pairs(
                    df, "id", "s", max_dist=d
                ).collect()
            }
            assert got == _naive(rows, d), f"max_dist={d}"

    def test_nulls_excluded_and_negative_rejected(self, spark):
        df = spark.createDataFrame(
            [(1, "abc"), (2, None), (3, "abd")], "id long, s string"
        )
        got = edit_distance_pairs(df, "id", "s", max_dist=1).collect()
        assert {(r["id_a"], r["id_b"]) for r in got} == {(1, 3)}
        with pytest.raises(ValueError):
            edit_distance_pairs(df, "id", "s", max_dist=-1)

    def test_no_python_in_plan(self, spark):
        df = spark.createDataFrame([(1, "abc")], "id long, s string")
        plan = (
            edit_distance_pairs(df, "id", "s", 2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "EvalPython" not in plan


class TestFreqOrder:
    """gram_order='freq' (rarest-first prefixes, the Ed-Join production
    order) must be EXACTLY equal to the md5 order — any universal total
    order is sound; the order only changes candidate counts."""

    def test_exactness_on_random_strings(self, spark):
        import random

        rng = random.Random(23)
        alpha = "abcd"  # tiny alphabet = hot-gram regime on purpose
        rows = [
            (i, "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12))))
            for i in range(90)
        ]
        df = spark.createDataFrame(rows, "id long, s string")
        for d in (0, 1, 2):
            got = {
                (r["id_a"], r["id_b"], r["dist"])
                for r in edit_distance_pairs(
                    df, "id", "s", max_dist=d, gram_order="freq"
                ).collect()
            }
            assert got == _naive(rows, d), f"max_dist={d}"

    def test_matches_md5_order_and_rejects_unknown(self, spark):
        rows = [
            (1, "spark engine"), (2, "spark enginee"), (3, "sp"),
            (4, ""), (5, "spark engine"), (6, "flink"),
        ]
        df = spark.createDataFrame(rows, "id long, s string")
        md5 = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in edit_distance_pairs(df, "id", "s", 2).collect()
        }
        freq = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in edit_distance_pairs(
                df, "id", "s", 2, gram_order="freq"
            ).collect()
        }
        assert md5 == freq == _naive(rows, 2)
        with pytest.raises(ValueError):
            edit_distance_pairs(df, "id", "s", 2, gram_order="rand")

    def test_subq_strings_emit_no_gram_keys(self, spark):
        """len(s) < q must produce an EMPTY gram array (advice fix: the
        unguarded descending F.sequence emitted whole-string keys)."""
        from mini_data_platform_spark.operators.editjoin import _grams

        df = spark.createDataFrame(
            [(1, "a"), (2, ""), (3, "ab"), (4, "abc")], "id long, s string"
        )
        got = {
            r["id"]: r["g"]
            for r in df.select(
                "id", _grams(F.col("s"), 3).alias("g")
            ).collect()
        }
        assert got[1] == [] and got[2] == [] and got[3] == []
        assert got[4] == ["abc"]
