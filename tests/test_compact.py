"""Compaction: many small files -> few right-sized files, data unchanged."""

from pyspark.sql import functions as F

from mini_data_platform_spark.sinks.compact import compact_parquet, dir_parquet_stats


class TestCompact:
    def test_compacts_small_files(self, spark, tmp_path):
        path = str(tmp_path / "many")
        spark.range(10_000).select(
            "id", (F.col("id") * 2).alias("v")
        ).repartition(40).write.parquet(path)
        before_files, before_bytes = dir_parquet_stats(path)
        assert before_files == 40
        checksum = spark.read.parquet(path).agg(F.sum("v")).first()[0]

        n = compact_parquet(spark, path, target_file_bytes=before_bytes)
        assert n == 1
        after = spark.read.parquet(path)
        assert after.count() == 10_000
        assert after.agg(F.sum("v")).first()[0] == checksum

    def test_noop_when_already_compact(self, spark, tmp_path):
        path = str(tmp_path / "one")
        spark.range(100).coalesce(1).write.parquet(path)
        assert compact_parquet(spark, path) == 1
