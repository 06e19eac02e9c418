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
(the deterministic fake; real decode libs are not in this container).
The fake decoder's stride-mean features are plain IEEE divisions over
byte sums, so the DuckDB oracle reproduces them bit-exactly by exploding
byte positions (``unnest(range(octet_length(...)))``) and decoding each
byte from the hex dump. Features are emitted as eight unpacked double
columns ``f0..f7`` — the driver's pandas canonicalizer cannot sort/hash
raw ``array`` cells.
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
    fake decoder (real plumbing, stubbed decode). The array column is
    unpacked to scalar doubles f0..f7 so the result is canonicalizable
    (and row-shape-stable) for the driver's value-hash compare."""
    out = MM.extract_features(
        assets_from_documents(spark, sf_dir), decoder=MM.fake_feature_decoder
    )
    return out.select(
        "asset_id",
        "modality",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        *[F.col("features")[i].alias(f"f{i}") for i in range(MM.N_FEATURES)],
    )


def asset_ppm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real decode→resize→features END-TO-END with the DEFAULT decoder
    (round-14 verdict item 4): documents are planted as genuine binary
    PPM (P6) images — header ``P6\\n{w} {h}\\n255\\n`` with w,h derived
    from doc_id and the RGB grid filled from the doc's repeated UTF-8
    bytes — and ``extract_features`` runs with NO injected decoder:
    ``operators/multimodal.ppm_decoder`` parses the header from the
    bytes and features come from the decoded pixel grid (channel
    means, dimensions, half-plane luma means = a 2×1/1×2 area-average
    resize). The oracle reconstructs the expected features from the
    CONSTRUCTION (it knows w,h from doc_id and never parses a header),
    so a mis-parse — wrong width, header-length drift, channel
    misalignment — breaks the value hash."""
    docs = load_table(spark, sf_dir, "documents")
    assets = docs.selectExpr(
        "doc_id AS asset_id",
        "'image' AS modality",
        # header ‖ first 3*w*h bytes of the doc's repeated UTF-8 text
        # (byte slicing AFTER encode — multi-byte chars stay exact)
        """concat(
             encode(printf('P6\\n%d %d\\n255\\n',
                           4 + doc_id % 5, 3 + doc_id % 4), 'utf-8'),
             substring(
               encode(repeat(coalesce(nullif(text, ''), 'x'),
                             greatest(1, cast(ceil(
                               (3.0 * (4 + doc_id % 5) * (3 + doc_id % 4))
                               / octet_length(encode(coalesce(nullif(text, ''), 'x'), 'utf-8'))
                             ) as int))), 'utf-8'),
               1, cast(3 * (4 + doc_id % 5) * (3 + doc_id % 4) as int))
           ) AS content""",
    )
    out = MM.extract_features(assets)  # DEFAULT decoder — the point
    return out.select(
        "asset_id",
        "modality",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        *[F.col("features")[i].alias(f"f{i}") for i in range(MM.N_FEATURES)],
    )


#: frame-sampling geometry shared by the query and its oracle
_FRAME_SIZE, _EVERY_N, _MAX_FRAMES = 256, 2, 4


def asset_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (1→N mapInPandas expansion) over the
    video-modality assets, with the deterministic positional sampler —
    frame bytes are pure slices, so the oracle reproduces them with
    substring arithmetic and the digests match exactly."""
    import functools

    vids = assets_from_documents(spark, sf_dir).filter(
        F.col("modality") == "video"
    )
    frames = MM.sample_frames(
        vids,
        sampler=functools.partial(
            MM.fake_frame_sampler,
            frame_size=_FRAME_SIZE,
            every_n=_EVERY_N,
            max_frames=_MAX_FRAMES,
        ),
    )
    return frames.select(
        "asset_id",
        "frame_no",
        F.length("frame").alias("n_bytes"),
        F.sha2(F.hex("frame"), 256).alias("frame_sha"),
    )


QUERIES = {
    "asset_binary_stats": asset_binary_stats,
    "asset_features": asset_features,
    "asset_frame_samples": asset_frame_samples,
    "asset_ppm_features": asset_ppm_features,
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
    # Bit-exact oracle for the fake decoder (operators/multimodal.py
    # fake_feature_decoder): feature i = sum(content[i::8]) / (255*len) as
    # one IEEE double division. Bytes decode from the uppercase hex dump
    # (DuckDB blobs have no direct byte accessor); missing strides -> 0.0,
    # matching the decoder's b"\\x00" fallback.
    "asset_features": f"""
        WITH assets AS ({_SQL_ASSETS}),
        positions AS (
            SELECT asset_id, modality,
                   CAST(octet_length(content) AS BIGINT) AS n_bytes,
                   hex(content) AS h, u.j AS j
            FROM assets, unnest(range(octet_length(content))) AS u(j)
        ),
        byte_vals AS (
            SELECT asset_id, modality, n_bytes,
                   CAST(j % 8 AS INT) AS slot,
                   (strpos('0123456789ABCDEF',
                           substr(h, CAST(2 * j + 1 AS INT), 1)) - 1) * 16
                   + (strpos('0123456789ABCDEF',
                             substr(h, CAST(2 * j + 2 AS INT), 1)) - 1) AS b
            FROM positions
        ),
        stride_means AS (
            SELECT asset_id, modality, n_bytes, slot,
                   CAST(SUM(b) AS DOUBLE) / (255.0 * COUNT(*)) AS f
            FROM byte_vals GROUP BY 1, 2, 3, 4
        )
        SELECT asset_id, modality, n_bytes,
               COALESCE(MAX(CASE WHEN slot = 0 THEN f END), 0.0) AS f0,
               COALESCE(MAX(CASE WHEN slot = 1 THEN f END), 0.0) AS f1,
               COALESCE(MAX(CASE WHEN slot = 2 THEN f END), 0.0) AS f2,
               COALESCE(MAX(CASE WHEN slot = 3 THEN f END), 0.0) AS f3,
               COALESCE(MAX(CASE WHEN slot = 4 THEN f END), 0.0) AS f4,
               COALESCE(MAX(CASE WHEN slot = 5 THEN f END), 0.0) AS f5,
               COALESCE(MAX(CASE WHEN slot = 6 THEN f END), 0.0) AS f6,
               COALESCE(MAX(CASE WHEN slot = 7 THEN f END), 0.0) AS f7
        FROM stride_means GROUP BY 1, 2, 3
    """,
    # The PPM oracle never parses a header: it rebuilds the expected
    # pixel bytes from the fixture construction (w,h from doc_id; RGB
    # grid = repeated encoded text bytes, hex-decoded per position) and
    # aggregates the same exact-integer sums ppm_decoder divides. The
    # header is always 11 bytes (single-digit w,h by construction), so
    # n_bytes = 11 + 3*w*h. Every feature denominator is an
    # exact-integer-valued double, so the single division is bit-exact.
    "asset_ppm_features": """
        WITH params AS (
            SELECT doc_id AS asset_id,
                   4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
                   coalesce(nullif(text, ''), 'x') AS t
            FROM documents
        ),
        sized AS (
            SELECT asset_id, w, h, 3 * w * h AS n,
                   hex(encode(repeat(t, CAST(greatest(1, ceil(
                       (3.0 * w * h) / octet_length(encode(t))
                   )) AS INT)))) AS hx
            FROM params
        ),
        bytes AS (
            SELECT asset_id, w, h, n, u.j AS j,
                   (strpos('0123456789ABCDEF',
                           substr(hx, CAST(2 * j + 1 AS INT), 1)) - 1) * 16
                   + (strpos('0123456789ABCDEF',
                             substr(hx, CAST(2 * j + 2 AS INT), 1)) - 1) AS b
            FROM sized, unnest(range(n)) AS u(j)
        ),
        agg AS (
            SELECT asset_id, w, h, n,
                   SUM(CASE WHEN j % 3 = 0 THEN b ELSE 0 END) AS sr,
                   SUM(CASE WHEN j % 3 = 1 THEN b ELSE 0 END) AS sg,
                   SUM(CASE WHEN j % 3 = 2 THEN b ELSE 0 END) AS sb,
                   SUM(CASE WHEN (j // 3) // w < h // 2 THEN b ELSE 0 END) AS stp,
                   SUM(CASE WHEN (j // 3) // w >= h // 2 THEN b ELSE 0 END) AS sbt,
                   SUM(CASE WHEN (j // 3) % w < w // 2 THEN b ELSE 0 END) AS slf
            FROM bytes GROUP BY 1, 2, 3, 4
        )
        SELECT asset_id, 'image' AS modality,
               CAST(11 + n AS BIGINT) AS n_bytes,
               CAST(sr AS DOUBLE) / (255.0 * w * h) AS f0,
               CAST(sg AS DOUBLE) / (255.0 * w * h) AS f1,
               CAST(sb AS DOUBLE) / (255.0 * w * h) AS f2,
               w / 4096.0 AS f3,
               h / 4096.0 AS f4,
               CAST(stp AS DOUBLE) / (255.0 * 3 * (h // 2) * w) AS f5,
               CAST(sbt AS DOUBLE) / (255.0 * 3 * (h - h // 2) * w) AS f6,
               CAST(slf AS DOUBLE) / (255.0 * 3 * (w // 2) * h) AS f7
        FROM agg
    """,
    "asset_frame_samples": f"""
        WITH assets AS ({_SQL_ASSETS}),
        vids AS (
            SELECT asset_id, content FROM assets WHERE modality = 'video'
        ),
        frames AS (
            -- DuckDB has no BLOB substring: slice the hex dump instead.
            -- hex() is uppercase in both engines and Spark hashes
            -- sha2(hex(frame)), so hashing the hex slice is identical.
            SELECT asset_id, CAST(u.k AS INT) AS frame_no,
                   substr(hex(content),
                          CAST(u.k * {2 * _EVERY_N * _FRAME_SIZE} + 1 AS INT),
                          {2 * _FRAME_SIZE}) AS fh
            FROM vids, unnest(range({_MAX_FRAMES})) AS u(k)
            WHERE u.k * {_EVERY_N * _FRAME_SIZE} < octet_length(content)
        )
        SELECT asset_id, frame_no,
               CAST(length(fh) // 2 AS INT) AS n_bytes,
               sha256(fh) AS frame_sha
        FROM frames
    """,
}
