"""Micro-benchmark: driver-side plan-construction cost of the serve
batch pipeline (Column API chain vs consolidated SQL strings)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .appName("profile_plan")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from mini_data_platform_spark.operators import incremental as inc
    from mini_data_platform_spark.operators.dedup_fuzzy import (
        _staged_shingles,
        lsh_band_keys,
        minhash_signature_columns,
    )

    base = spark.createDataFrame(
        [(i, "some text tokens here for shingles yes") for i in range(10)],
        "id bigint, text string",
    )

    # warm both paths
    for _ in range(2):
        sh = _staged_shingles(base, "id", "text", 3)
        bands = lsh_band_keys(minhash_signature_columns(sh, ["id"], 16), "id", 16, 4)

    t0 = time.perf_counter()
    for _ in range(5):
        sh = _staged_shingles(base, "id", "text", 3)
        bands = lsh_band_keys(minhash_signature_columns(sh, ["id"], 16), "id", 16, 4)
    t_col = (time.perf_counter() - t0) / 5
    print(f"column-api band plan build: {t_col*1000:.1f} ms")

    # consolidated SQL-string version
    num_hashes, bands_n, n = 16, 4, 3
    r = num_hashes // bands_n
    mh = [
        f"array_min(transform(_sh, s -> substring(md5(concat('{i // 4}#', s)), "
        f"{(i % 4) * 8 + 1}, 8))) AS mh_{i}"
        for i in range(num_hashes)
    ]
    band_exprs = [
        "md5(concat_ws('|', " + ", ".join(f"mh_{b * r + j}" for j in range(r)) + f")) AS band_{b}"
        for b in range(bands_n)
    ]
    stack = ", ".join(f"{b}, band_{b}" for b in range(bands_n))

    def sql_bands(df):
        toked = df.selectExpr("id", "split(trim(text), ' +') AS _toks")
        sh = toked.selectExpr(
            "id",
            f"if(size(_toks) >= {n}, transform(sequence(0, size(_toks) - {n}), "
            f"i -> concat_ws(' ', slice(_toks, i + 1, {n}))), "
            "cast(array() as array<string>)) AS _sh",
        )
        sigs = sh.selectExpr("id", *mh)
        banded = sigs.selectExpr("id", *band_exprs)
        return banded.selectExpr(
            "id", f"stack({bands_n}, {stack}) AS (band_id, band_key)"
        )

    for _ in range(2):
        b2 = sql_bands(base)
    t0 = time.perf_counter()
    for _ in range(5):
        b2 = sql_bands(base)
    t_sql = (time.perf_counter() - t0) / 5
    print(f"sql-string band plan build:  {t_sql*1000:.1f} ms")

    # equivalence check
    import pandas as pd

    a = bands.orderBy("id", "band_id").toPandas()
    b = b2.orderBy("id", "band_id").toPandas()
    b["band_id"] = b["band_id"].astype(a["band_id"].dtype)
    same = a.equals(b[a.columns])
    print("equal:", same)
    if not same:
        print(a.head())
        print(b.head())
    spark.stop()


if __name__ == "__main__":
    main()
