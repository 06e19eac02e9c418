"""Z-order layout: data round-trips exactly, and every output file spans
a narrow min/max box so footer stats prune files on EITHER clustered
column — the property a linear sort can only provide for its leading
column."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from mini_data_platform_spark.sinks.layout import write_zordered, zorder_key


def _two_dim(spark, n=40_000, domain=1024):
    # decorrelated dims: x cycles, y is a Knuth-hash scramble of id
    return spark.range(n).select(
        (F.col("id") % domain).cast("long").alias("x"),
        ((F.col("id") * 2654435761) % domain).cast("long").alias("y"),
    )


def _files_hit(target_dir, col, lo, hi):
    """(files whose [min,max] for col intersects [lo,hi], total files) —
    read straight from parquet footers, engine-agnostic."""
    hit, total = 0, 0
    for path in glob.glob(os.path.join(target_dir, "*.parquet")):
        meta = pq.ParquetFile(path).metadata
        idx = meta.schema.names.index(col)
        fmin = min(
            meta.row_group(g).column(idx).statistics.min
            for g in range(meta.num_row_groups)
        )
        fmax = max(
            meta.row_group(g).column(idx).statistics.max
            for g in range(meta.num_row_groups)
        )
        total += 1
        if not (fmax < lo or fmin > hi):
            hit += 1
    return hit, total


class TestZOrder:
    def test_roundtrip_exact(self, spark, tmp_path):
        df = _two_dim(spark, n=5_000)
        target = str(tmp_path / "z")
        write_zordered(df, target, ["x", "y"], num_files=4, bits=4)
        back = spark.read.parquet(target)
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, df.collect())
        )
        assert back.columns == ["x", "y"]  # key column dropped

    def test_cut_points_are_sketch_sized(self, spark):
        df = _two_dim(spark, n=5_000)
        _, cuts = zorder_key(df, ["x", "y"], bits=5)
        assert set(cuts) == {"x", "y"}
        assert all(len(c) <= 31 for c in cuts.values())

    def test_prunes_both_dimensions(self, spark, tmp_path):
        df = _two_dim(spark)
        n_files = 16
        zdir = str(tmp_path / "zorder")
        ldir = str(tmp_path / "linear")
        write_zordered(df, zdir, ["x", "y"], num_files=n_files, bits=5)
        (
            df.repartitionByRange(n_files, "x")
            .sortWithinPartitions("x")
            .write.parquet(ldir)
        )
        lo, hi = 100, 131  # ~3% of the y domain
        z_hit, z_total = _files_hit(zdir, "y", lo, hi)
        l_hit, l_total = _files_hit(ldir, "y", lo, hi)
        # linear-by-x layout: every file covers ~the full y range
        assert l_hit == l_total
        # z-order: a 16-file layout tiles the plane ~4x4, so a narrow
        # y band intersects ~one row of tiles
        assert z_hit < l_hit
        assert z_hit <= z_total // 2
        # and the leading dimension still prunes too
        zx_hit, _ = _files_hit(zdir, "x", lo, hi)
        assert zx_hit <= z_total // 2


class TestZOrderReader:
    def test_manifest_prunes_at_listing_time(self, spark, tmp_path):
        """read_zordered skips files via the write-time manifest BEFORE
        Spark lists them: a selective 2-column predicate reads a strict
        subset of files yet returns exactly the predicate's rows."""
        from mini_data_platform_spark.sinks.layout import (
            read_zordered,
            zorder_prune_files,
        )

        df = _two_dim(spark)
        zdir = str(tmp_path / "z")
        write_zordered(df, zdir, ["x", "y"], num_files=16, bits=5)
        assert os.path.exists(os.path.join(zdir, "_zorder_manifest.json"))

        preds = {"x": (100, 131), "y": (100, 131)}
        kept, total = zorder_prune_files(zdir, preds)
        assert total == 16
        # a ~3% x ~3% box hits ~one tile of a 4x4-ish tiling
        assert 0 < len(kept) <= total // 2

        got = read_zordered(spark, zdir, preds)
        want = df.where(
            (F.col("x").between(100, 131)) & (F.col("y").between(100, 131))
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
        # the pruned read touches only the kept files
        files_read = {
            r[0]
            for r in got.select(
                F.input_file_name()
            ).distinct().collect()
        }
        assert len(files_read) <= len(kept)

    def test_open_ended_and_no_predicate(self, spark, tmp_path):
        from mini_data_platform_spark.sinks.layout import read_zordered

        df = _two_dim(spark, n=4_000)
        zdir = str(tmp_path / "z2")
        write_zordered(df, zdir, ["x", "y"], num_files=4, bits=4)
        # open-ended hi
        got = read_zordered(spark, zdir, {"x": (1000, None)})
        want = df.where(F.col("x") >= 1000)
        assert got.count() == want.count()
        # no predicates -> plain read
        assert read_zordered(spark, zdir).count() == 4_000

    def test_empty_prune_returns_empty_with_schema(self, spark, tmp_path):
        from mini_data_platform_spark.sinks.layout import read_zordered

        df = _two_dim(spark, n=2_000)
        zdir = str(tmp_path / "z3")
        write_zordered(df, zdir, ["x", "y"], num_files=4, bits=4)
        got = read_zordered(spark, zdir, {"x": (99999, None)})
        assert got.count() == 0
        assert got.columns == ["x", "y"]


class TestManifestStatTypes:
    def test_non_json_native_stats_record_none_not_strings(
        self, spark, tmp_path
    ):
        """Date/timestamp/decimal footer stats must be recorded as None
        (never prune), not silently stringified — a string min/max
        compared against a typed predicate bound raises TypeError or
        prunes lexicographically (advice fix, round 7)."""
        import datetime
        import json
        import os

        from pyspark.sql import functions as F

        from mini_data_platform_spark.sinks.layout import (
            ZORDER_MANIFEST,
            _write_manifest,
            zorder_prune_files,
        )

        d = str(tmp_path / "zt")
        df = spark.range(100).select(
            F.col("id"),
            F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias("dt"),
            F.col("id").cast("decimal(10,2)").alias("amt"),
            (F.col("id") * 1.5).alias("x"),
        )
        df.coalesce(2).write.parquet(d)
        _write_manifest(d, ["id", "dt", "amt", "x"])
        man = json.load(open(os.path.join(d, ZORDER_MANIFEST)))
        for stats in man["files"].values():
            assert stats["dt"] is None          # date -> no pruning
            assert stats["amt"] is None         # decimal -> no pruning
            assert stats["id"] is not None      # ints keep stats
            assert isinstance(stats["id"][0], int)
            assert stats["x"] is not None and isinstance(stats["x"][0], float)
        # typed predicate bounds on the stat-less columns never raise
        # and never prune (all files kept on those dims)
        kept, total = zorder_prune_files(
            d,
            {
                "dt": (datetime.date(2024, 1, 5), datetime.date(2024, 1, 9)),
                "id": (None, 10**9),
            },
        )
        assert len(kept) == total


class TestBloomManifest:
    """Per-file Bloom manifest (sinks/layout.py): point lookups must
    skip files at listing time with ZERO false negatives — results
    always equal the plain filtered read."""

    def _write(self, spark, d, n=20_000, files=8):
        from mini_data_platform_spark.sinks.layout import (
            write_bloom_manifest,
        )

        # ids hash-scattered across files: every file spans ~the full id
        # range, so min/max stats prune NOTHING — the bloom's regime
        df = spark.range(n).select(
            F.col("id").alias("k"),
            (F.col("id") % 97).cast("string").alias("tag"),
        )
        (
            df.repartition(files, (F.col("k") * 2654435761) % 1_000_003)
            .write.mode("overwrite")
            .parquet(d)
        )
        write_bloom_manifest(spark, d, ["k", "tag"])

    def test_lookup_equals_plain_filter_and_prunes(self, spark, tmp_path):
        from mini_data_platform_spark.sinks.layout import (
            bloom_prune_files,
            read_bloom_filtered,
        )

        d = str(tmp_path / "bl")
        self._write(spark, d)
        keys = [3, 4444, 19_999]
        got = sorted(
            r["k"] for r in read_bloom_filtered(
                spark, d, {"k": keys}
            ).collect()
        )
        assert got == keys  # no false negatives, exact rows
        kept, total = bloom_prune_files(spark, d, {"k": keys})
        assert total == 8 and len(kept) < total  # listing-time skipping

    def test_incremental_update_equals_rebuild(self, spark, tmp_path):
        """update_bloom_manifest indexes ONLY the appended files
        (O(batch) at a 10^6-file lake) yet must prune and read exactly
        like a full rebuild over the grown directory."""
        import os as _os
        import shutil as _shutil

        from mini_data_platform_spark.sinks.layout import (
            bloom_prune_files,
            read_bloom_filtered,
            update_bloom_manifest,
            write_bloom_manifest,
        )

        d = str(tmp_path / "bl")
        self._write(spark, d, n=10_000, files=4)
        # "append a batch": write 4 more files elsewhere, move them in
        extra = str(tmp_path / "extra")
        (
            spark.range(10_000, 20_000)
            .select(
                F.col("id").alias("k"),
                (F.col("id") % 97).cast("string").alias("tag"),
            )
            .repartition(4, (F.col("k") * 2654435761) % 1_000_003)
            .write.mode("overwrite")
            .parquet(extra)
        )
        moved = []
        for fn in sorted(_os.listdir(extra)):
            if fn.endswith(".parquet"):
                dst = _os.path.join(d, f"app-{fn}")
                _shutil.move(_os.path.join(extra, fn), dst)
                moved.append(dst)
        meta = update_bloom_manifest(spark, d, moved)
        assert meta["n_files"] == 8
        # lookups spanning old AND new files: exact rows, real pruning
        keys = [3, 4444, 15_000, 19_999]
        got = sorted(
            r["k"] for r in read_bloom_filtered(
                spark, d, {"k": keys}
            ).collect()
        )
        assert got == keys
        kept, total = bloom_prune_files(spark, d, {"k": keys})
        assert total == 8 and 0 < len(kept) < total
        # ...and byte-for-byte the same decisions as a full rebuild
        rebuilt = str(tmp_path / "bl2")
        _shutil.copytree(
            d, rebuilt,
            ignore=_shutil.ignore_patterns("_bloom*"),
        )
        write_bloom_manifest(spark, rebuilt, ["k", "tag"])
        kept2, total2 = bloom_prune_files(spark, rebuilt, {"k": keys})
        assert total2 == total
        assert sorted(_os.path.basename(p) for p in kept) == sorted(
            _os.path.basename(p) for p in kept2
        )
        # re-appending an already-indexed file name must refuse
        import pytest as _pytest

        with _pytest.raises(ValueError, match="already indexed"):
            update_bloom_manifest(spark, d, [moved[0]])

    def test_absent_key_keeps_nothing(self, spark, tmp_path):
        from mini_data_platform_spark.sinks.layout import (
            bloom_prune_files,
            read_bloom_filtered,
        )

        d = str(tmp_path / "bl")
        self._write(spark, d)
        kept, total = bloom_prune_files(spark, d, {"k": [10_000_001]})
        # an absent key may survive per-file fpp, but at 2^17 bits the
        # chance any of 8 files false-positives is ~0 for one key
        assert kept == []
        assert read_bloom_filtered(
            spark, d, {"k": [10_000_001]}
        ).count() == 0

    def test_multi_column_and_semantics(self, spark, tmp_path):
        from mini_data_platform_spark.sinks.layout import (
            read_bloom_filtered,
        )

        d = str(tmp_path / "bl")
        self._write(spark, d)
        rows = read_bloom_filtered(
            spark, d, {"k": [500, 501], "tag": [str(500 % 97)]}
        ).collect()
        assert [(r["k"], r["tag"]) for r in rows] == [(500, str(500 % 97))]

    def test_type_and_null_guards(self, spark, tmp_path):
        import pytest

        from mini_data_platform_spark.sinks.layout import (
            bloom_prune_files,
            write_bloom_manifest,
        )

        d = str(tmp_path / "bl")
        spark.range(10).select(
            F.col("id").cast("double").alias("f")
        ).write.mode("overwrite").parquet(d)
        with pytest.raises(ValueError, match="string/integer"):
            write_bloom_manifest(spark, d, ["f"])
        self._write(spark, d2 := str(tmp_path / "bl2"), n=100, files=2)
        with pytest.raises(ValueError, match="None"):
            bloom_prune_files(spark, d2, {"k": [1, None]})
        with pytest.raises(ValueError, match="not in bloom manifest"):
            bloom_prune_files(spark, d2, {"missing": [1]})

    def test_nulls_never_built_still_exact(self, spark, tmp_path):
        from mini_data_platform_spark.sinks.layout import (
            read_bloom_filtered,
            write_bloom_manifest,
        )

        d = str(tmp_path / "bln")
        spark.createDataFrame(
            [(1, "a"), (None, "b"), (2, None)], "k bigint, tag string"
        ).write.mode("overwrite").parquet(d)
        write_bloom_manifest(spark, d, ["k"])
        # the null-key row is never in the filter (and isin can't select
        # it); the null-TAG row still comes back by its k
        got = sorted(
            (r["k"], r["tag"])
            for r in read_bloom_filtered(spark, d, {"k": [1, 2]}).collect()
        )
        assert got == [(1, "a"), (2, None)]


class TestBloomSidecarScale:
    """Round-9 rework (r8 verdict item 3): the Bloom index must stay off
    the driver at lake-scale file counts — distributed build (no
    collect), broadcast-join probe over a partition-pruned sidecar scan,
    driver memory flat at 10k files."""

    def test_probe_plan_shape(self, spark, tmp_path):
        from mini_data_platform_spark.sinks.layout import (
            _bloom_survivors_df,
            write_bloom_manifest,
        )

        d = str(tmp_path / "blp")
        df = spark.range(2_000).select(
            F.col("id").alias("k"),
            (F.col("id") % 97).cast("string").alias("tag"),
        )
        df.repartition(4).write.mode("overwrite").parquet(d)
        write_bloom_manifest(spark, d, ["k", "tag"])
        survivors, _meta = _bloom_survivors_df(spark, d, {"k": [7, 8]})
        plan = survivors._jdf.queryExecution().executedPlan().toString()
        # the probe side must broadcast (never shuffle the sidecar by key)
        assert "BroadcastHashJoin" in plan, plan
        # the sidecar scan must prune unprobed columns at listing time
        assert "PartitionFilters" in plan and "col#" in plan, plan

    def test_10k_file_probe_driver_flat(self, spark, tmp_path):
        """A synthetic 10k-file sidecar (each fake file indexes exactly
        one key): the probe must return exactly the planted file, and
        Python-side allocations must stay key-sized — nothing
        file-count-sized may materialize on the driver (the old JSON
        manifest loaded files x <=2Ki longs here)."""
        import json as _json
        import os
        import tracemalloc

        from mini_data_platform_spark.sinks.layout import (
            BLOOM_META,
            BLOOM_SIDECAR,
            _bloom_positions_col,
            bloom_prune_files,
        )

        d = str(tmp_path / "bl10k")
        os.makedirs(d)
        n_files, num_bits, num_hashes = 10_000, 1 << 17, 5
        side = (
            spark.range(n_files)
            .select(
                F.concat(F.lit("f"), F.col("id"), F.lit(".parquet")).alias(
                    "file"
                ),
                F.explode(
                    _bloom_positions_col("id", num_bits, num_hashes)
                ).alias("h"),
            )
            .select(
                "file",
                (F.col("h") / 64).cast("int").alias("word"),
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(h % 64 AS INT))"
                ).alias("mask"),
            )
            .groupBy("file", "word")
            .agg(F.bit_or("mask").alias("bits"))
            .select(F.lit("k").alias("col"), "file", "word", "bits")
        )
        side.write.mode("overwrite").partitionBy("col").parquet(
            os.path.join(d, BLOOM_SIDECAR)
        )
        with open(os.path.join(d, BLOOM_META), "w", encoding="utf-8") as fh:
            _json.dump(
                {
                    "num_bits": num_bits,
                    "num_hashes": num_hashes,
                    "cols": ["k"],
                    "n_files": n_files,
                },
                fh,
            )
        tracemalloc.start()
        base, _ = tracemalloc.get_traced_memory()
        kept, total = bloom_prune_files(spark, d, {"k": [4242]})
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert total == n_files
        assert [os.path.basename(p) for p in kept] == ["f4242.parquet"]
        # 10k files x 2 Ki words would be ~160 MB as Python objects; the
        # distributed probe should allocate well under 8 MB
        assert peak - base < 8 * 1024 * 1024, peak - base


class TestBloomManifestCensus:
    """21a02db regressions (round-10 verdict item): the manifest must
    refuse an empty key-column list, and its file census must count
    data files RECURSIVELY — a partitionBy layout keeps them below
    partition dirs, where the old flat listdir recorded n_files=0 while
    the sidecar indexed them."""

    def test_empty_cols_refused(self, spark, tmp_path):
        from mini_data_platform_spark.sinks.layout import (
            write_bloom_manifest,
        )

        d = str(tmp_path / "bc")
        spark.range(100).select(F.col("id").alias("k")).write.mode(
            "overwrite"
        ).parquet(d)
        with pytest.raises(ValueError, match="at least one key column"):
            write_bloom_manifest(spark, d, [])

    def test_partitioned_layout_census_counts_nested_files(
        self, spark, tmp_path
    ):
        import os

        from mini_data_platform_spark.sinks.layout import (
            BLOOM_SIDECAR,
            bloom_prune_files,
            write_bloom_manifest,
        )

        d = str(tmp_path / "bp")
        df = spark.range(5_000).select(
            F.col("id").alias("k"),
            (F.col("id") % 4).alias("p"),
        )
        df.repartition(4).write.mode("overwrite").partitionBy(
            "p"
        ).parquet(d)
        meta = write_bloom_manifest(spark, d, ["k"])

        # ground truth: walk the layout ourselves, excluding the sidecar
        want = 0
        for root, dirs, names in os.walk(d):
            dirs[:] = [
                x for x in dirs
                if not x.startswith((".", "_")) and x != BLOOM_SIDECAR
            ]
            want += sum(
                1 for nm in names
                if nm.endswith(".parquet") and not nm.startswith((".", "_"))
            )
        assert want > 0
        assert meta["n_files"] == want  # flat listdir recorded 0 here

        # and the probe still prunes correctly on the nested layout
        kept, total = bloom_prune_files(spark, d, {"k": [7]})
        assert total == want
        assert kept and len(kept) < want
