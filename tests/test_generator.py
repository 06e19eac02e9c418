"""Generator (S9): determinism, distribution bounds, validator round-trip."""

import os

from mini_data_platform_spark.generator import generate_sales_data
from mini_data_platform_spark.sources.validate import validate_csv


class TestGenerator:
    def test_deterministic_across_partitioning(self, spark):
        a = generate_sales_data(spark, 500, seed=7, num_partitions=1).collect()
        b = generate_sales_data(spark, 500, seed=7, num_partitions=8).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_seed_changes_data(self, spark):
        a = {r["sale_id"] for r in generate_sales_data(spark, 100, seed=1).collect()}
        b = {r["sale_id"] for r in generate_sales_data(spark, 100, seed=2).collect()}
        assert a.isdisjoint(b)

    def test_distributions(self, spark):
        rows = generate_sales_data(spark, 2000, seed=42).collect()
        assert len({r["sale_id"] for r in rows}) == 2000  # unique ids
        for r in rows[:200]:
            assert 1 <= r["quantity"] <= 20
            assert r["customer_id"].startswith("CUST-")
            assert 1000 <= int(r["customer_id"][5:]) <= 9999
            assert 100 <= int(r["product_id"][5:]) <= 999
            assert r["sale_date"].startswith("2024") or r["sale_date"].startswith("2025-01-01")
            assert 10 * 1 <= r["amount"] <= 500 * 20
            # uuid4 shape
            parts = r["sale_id"].split("-")
            assert [len(p) for p in parts] == [8, 4, 4, 4, 12]

    def test_output_passes_validation(self, spark, tmp_path):
        out = str(tmp_path / "gen.csv")
        df = generate_sales_data(spark, 100, seed=3)
        pdf = df.toPandas()
        pdf.to_csv(out, index=False)
        ok, err = validate_csv(spark, out)
        assert ok, err
