"""Multimodal-column queries for the driver contract (SURVEY.md §2.8 X4).

The fixture set has no binary asset table, so assets are DERIVED
deterministically from ``documents``: content = modality magic bytes ‖
UTF-8 text bytes, modality cycling image/audio/video by doc_id. Both the
Spark query and the DuckDB oracle construct the identical bytes, which
makes the binary plumbing (concat, byte length, magic-prefix sniffing,
content digests) fully oracle-checkable. Hashes compare via
``sha2(hex(content))`` — both engines emit uppercase hex, and DuckDB's
sha256 only accepts VARCHAR.

``asset_features`` exercises the real multimodal hot path — binary
columns through Arrow-batched ``mapInPandas`` with an injected decoder
(the deterministic fake; real decode libs are not in this container) —
and is oracle-omitted by design (driver records the rows-only check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mini_data_platform_spark.catalog import load_table
from mini_data_platform_spark.operators import multimodal as MM

#: modality by doc_id % 3, and its magic prefix (hex)
_MODS = (("image", "89504E47"), ("audio", "494433"), ("video", "1A45DFA3"))
_EXPECT_MIME = {"image": "image/png", "audio": "audio/mpeg", "video": "video/webm"}


def assets_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic binary asset table derived from documents."""
    docs = load_table(spark, sf_dir, "documents")
    mod = F.pmod(F.col("doc_id"), F.lit(3))
    modality = (
        F.when(mod == 0, _MODS[0][0]).when(mod == 1, _MODS[1][0]).otherwise(_MODS[2][0])
    )
    magic = (
        F.when(mod == 0, F.unhex(F.lit(_MODS[0][1])))
        .when(mod == 1, F.unhex(F.lit(_MODS[1][1])))
        .otherwise(F.unhex(F.lit(_MODS[2][1])))
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.concat(magic, F.encode(F.col("text"), "UTF-8")).alias("content"),
    )


_SQL_ASSETS = """
    SELECT doc_id AS asset_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
           (CASE doc_id % 3 WHEN 0 THEN unhex('89504E47')
                            WHEN 1 THEN unhex('494433')
                            ELSE unhex('1A45DFA3') END) || encode(text) AS content
    FROM documents
"""


def asset_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte length + content digest + magic-byte mime sniff — the cheap
    no-decode metadata pass every asset pipeline starts with."""
    assets = MM.sniff_mime(assets_from_documents(spark, sf_dir))
    return assets.select(
        "asset_id",
        "modality",
        "sniffed_mime",
        F.length("content").alias("n_bytes"),
        F.sha2(F.hex("content"), 256).alias("content_sha"),
    )


def asset_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary → feature vectors through mapInPandas with the deterministic
    fake decoder (real plumbing, stubbed decode). No SQL oracle — custom
    Python batch operator."""
    out = MM.extract_features(
        assets_from_documents(spark, sf_dir), decoder=MM.fake_feature_decoder
    )
    return out.select("asset_id", "modality", "n_bytes", "features")


QUERIES = {
    "asset_binary_stats": asset_binary_stats,
    "asset_features": asset_features,
}

_MIME_CASES = " ".join(
    f"WHEN hex(content) LIKE '{magic}%' THEN '{_EXPECT_MIME[name]}'"
    for name, magic in _MODS
)

ORACLE = {
    "asset_binary_stats": f"""
        WITH assets AS ({_SQL_ASSETS})
        SELECT asset_id, modality,
               CASE {_MIME_CASES} ELSE 'application/octet-stream' END AS sniffed_mime,
               octet_length(content) AS n_bytes,
               sha256(hex(content)) AS content_sha
        FROM assets
    """,
}
