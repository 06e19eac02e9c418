"""Multimodal column support (SURVEY.md §2.8 X4): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
Pandas functions over ``mapInPandas``.

The Spark-side plumbing here is real and tested: asset schema, binary
parquet round-trip, header sniffing as JVM expressions, the mapInPandas
batch contract (schema, signature, batch shape), and partition sizing
guidance. Pixel decoding is REAL for one dependency-free container —
binary PPM (``ppm_decoder``, the default) — and STUBBED for everything
that needs external libraries (PIL/ffmpeg/torchaudio are not in this
container) behind ``decoder=`` hooks: pass a real decoder in
production, use ``fake_feature_decoder`` (deterministic,
content-derived) in tests, or get a clear NotImplementedError.

Scale notes:
- binary payloads dominate row size: cap ``spark.sql.files.maxPartitionBytes``
  (session.py default 128 MB) so a partition holds a bounded number of
  assets; for >100 MB single assets store pointers (URI column) instead
  and stream bytes inside the Pandas batch.
- mapInPandas streams Arrow record batches — decode never materializes a
  whole partition of images in memory at once.
- ``spark.read.format("binaryFile")`` ingests raw asset directories
  (path/length/content columns) for the landing-zone path.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("source_uri", T.StringType(), True),
    ]
)

#: magic-byte prefixes -> mime (same sniff-don't-trust-the-extension idea as
#: the reference's format detection, /root/reference/dags/src/validator.py:17-34,
#: applied to media containers instead of csv/json/parquet).
_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mpeg"),
    (b"\x1a\x45\xdf\xa3", "video/webm"),
]


def sniff_mime(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Magic-byte mime detection as a JVM expression chain (hex-prefix
    compare on the binary column; no Python)."""
    c = F.hex(F.substring(F.col(content_col), 1, 8))
    expr = F.lit("application/octet-stream")
    for magic, mime in reversed(_MAGIC):
        prefix = magic.hex().upper()
        expr = F.when(c.startswith(prefix), F.lit(mime)).otherwise(expr)
    return df.withColumn("sniffed_mime", expr)


def binary_stats(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap metadata without decoding: byte length + content digest
    (dedup key for exact asset dedup)."""
    return df.withColumn("n_bytes", F.length(F.col(content_col))).withColumn(
        "content_sha", F.sha2(F.col(content_col), 256)
    )


N_FEATURES = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def fake_feature_decoder(content: bytes, modality: str) -> list[float]:
    """Deterministic stand-in for a real decode→embed step: derives
    N_FEATURES floats from byte statistics. Content-dependent and stable,
    so tests can assert real values through the full Spark plumbing.

    Each feature is a single IEEE-754 division ``sum(stride)/(255*len)``
    (exact int numerator/denominator — no rounding step), so an SQL oracle
    can reproduce the values bit-exactly."""
    if content is None:
        return [0.0] * N_FEATURES
    n = len(content)
    out = []
    for i in range(N_FEATURES):
        stride = content[i::N_FEATURES] or b"\x00"
        out.append(sum(stride) / (255.0 * len(stride)))
    return out if n else [0.0] * N_FEATURES


def real_decoder_unavailable(content: bytes, modality: str) -> list[float]:
    raise NotImplementedError(
        "media decode libraries (PIL/ffmpeg) are not available in this "
        "environment; inject a decoder via extract_features(decoder=...)"
    )


def ppm_decoder(content: bytes, modality: str) -> list[float]:
    """REAL, dependency-free image decode for netpbm P6 (binary PPM):
    parses the header byte-by-byte (magic, whitespace, ``#`` comments,
    width/height/maxval per the netpbm spec), recovers the RGB byte
    grid, and derives :data:`N_FEATURES` features from the DECODED
    pixels — global per-channel means, normalized dimensions, and
    half-plane luma means (the area-average of a 2×1 / 1×2 downsample,
    i.e. a genuine decode→resize→feature pipeline). A wrong header
    parse scrambles the grid geometry and every spatial feature with
    it, which is what makes the oracle a real decode check.

    Every feature is a single IEEE division of exact integer sums
    (products stay far below 2^53), so an SQL oracle that knows the
    fixture's construction reproduces the values bit-exactly.

    This is the executable DEFAULT for one trivial container; anything
    non-PPM still routes to the injectable-decoder seam
    (:func:`default_decoder`). Pure-Python per-pixel loops are fine
    here — assets are decoded inside Arrow batches and a production
    decoder replaces this callable, not the operator."""
    if content is None:
        return [0.0] * N_FEATURES
    if not content.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    i, size, fields = 2, len(content), []
    while len(fields) < 3 and i < size:
        c = content[i]
        if c == 0x23:  # '#' comment runs to end-of-line
            while i < size and content[i] != 0x0A:
                i += 1
        elif c in (0x20, 0x09, 0x0A, 0x0B, 0x0C, 0x0D):
            i += 1
        elif 0x30 <= c <= 0x39:
            j = i
            while j < size and 0x30 <= content[j] <= 0x39:
                j += 1
            fields.append(int(content[i:j]))
            i = j
        else:
            raise ValueError(f"bad PPM header byte {c:#04x}")
    if len(fields) < 3:
        raise ValueError("truncated PPM header")
    w, h, maxval = fields
    if not (w > 0 and h > 0 and 0 < maxval < 256):
        raise ValueError(f"unsupported PPM geometry {w}x{h}/{maxval}")
    i += 1  # exactly ONE whitespace byte separates maxval from data
    pix = content[i : i + 3 * w * h]
    if len(pix) < 3 * w * h:
        raise ValueError("truncated PPM pixel data")
    npix = w * h
    sum_r = sum(pix[0::3])
    sum_g = sum(pix[1::3])
    sum_b = sum(pix[2::3])
    top_rows, left_cols = h // 2, w // 2
    sum_top = sum(pix[: 3 * w * top_rows])
    sum_bot = sum(pix[3 * w * top_rows :])
    sum_left = sum(
        pix[3 * (r * w + c) + ch]
        for r in range(h)
        for c in range(left_cols)
        for ch in range(3)
    )
    return [
        sum_r / (maxval * 1.0 * npix),
        sum_g / (maxval * 1.0 * npix),
        sum_b / (maxval * 1.0 * npix),
        w / 4096.0,
        h / 4096.0,
        sum_top / (maxval * 3.0 * top_rows * w) if top_rows else 0.0,
        sum_bot / (maxval * 3.0 * (h - top_rows) * w),
        sum_left / (maxval * 3.0 * left_cols * h) if left_cols else 0.0,
    ]


def default_decoder(content: bytes, modality: str) -> list[float]:
    """Executable default for :func:`extract_features`: binary PPM (P6)
    decodes for real via :func:`ppm_decoder` — no external libraries —
    and every other container raises the documented
    ``NotImplementedError`` (inject a PIL/ffmpeg decoder; the seam is
    unchanged)."""
    if content is not None and content.startswith(b"P6"):
        return ppm_decoder(content, modality)
    return real_decoder_unavailable(content, modality)


def real_resizer_unavailable(content: bytes, width: int, height: int) -> bytes:
    raise NotImplementedError(
        "image resize libraries (PIL/opencv) are not available in this "
        "environment; inject a resizer via resize_images(resizer=...)"
    )


def fake_resizer(content: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode→resize→re-encode: emits a tagged
    header + an evenly-strided byte sample of the source sized w×h//64.
    Content-derived and stable so tests pin real values through the
    mapInPandas plumbing."""
    if not content:
        return b""
    target = max(1, (width * height) // 64)
    stride = max(1, len(content) // target)
    return b"RSZ" + bytes([width % 256, height % 256]) + content[::stride][:target]


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] = real_resizer_unavailable,
    content_col: str = "content",
) -> DataFrame:
    """Batch image resize through mapInPandas (binary in → binary out, 1:1
    rows). Same operator contract as a real GPU/PIL resizer: swap the
    ``resizer`` callable, schema and batching stay fixed. Non-image rows
    pass through untouched (transform only what decodes)."""
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("modality", T.StringType(), False),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("resized", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "content": pdf[content_col],
                    "resized": [
                        resizer(c, width, height) if m == "image" else None
                        for c, m in zip(pdf[content_col], pdf["modality"])
                    ],
                }
            )

    return df.mapInPandas(run, schema)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def real_frame_sampler_unavailable(content: bytes):
    raise NotImplementedError(
        "video decode libraries (ffmpeg) are not available in this "
        "environment; inject a sampler via sample_frames(sampler=...)"
    )


def fake_frame_sampler(
    content: bytes, frame_size: int = 256, every_n: int = 2, max_frames: int = 4
) -> list[bytes]:
    """Deterministic stand-in for container demux + frame decode: 'frames'
    are fixed-size byte windows at offsets of ``every_n × frame_size``.
    Pure positional slicing, so an SQL oracle reproduces the exact frame
    bytes with substring arithmetic."""
    if not content:
        return []
    out = []
    for k in range(max_frames):
        off = k * every_n * frame_size
        if off >= len(content):
            break
        out.append(content[off : off + frame_size])
    return out


def sample_frames(
    df: DataFrame,
    sampler: Callable[[bytes], list[bytes]] = real_frame_sampler_unavailable,
    content_col: str = "content",
) -> DataFrame:
    """Video frame sampling through mapInPandas — the 1→N multimodal
    expansion (one input asset yields a row per sampled frame). Arrow
    batches stream in; the output batch is rebuilt with one row per frame,
    so memory is bounded by batch × max_frames × frame size regardless of
    partition size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for aid, content in zip(pdf["asset_id"], pdf[content_col]):
                for k, fr in enumerate(sampler(content)):
                    ids.append(aid)
                    nos.append(k)
                    frames.append(fr)
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(nos, dtype="int32"),
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    return df.mapInPandas(run, FRAME_SCHEMA)


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes, str], list[float]] = default_decoder,
    batch_hint: int | None = None,
) -> DataFrame:
    """Decode/feature-extract binary assets via mapInPandas (Arrow batch
    iterator — the canonical multimodal hot path). The ``decoder`` runs
    per asset inside each batch; swap in a vectorized/GPU decoder without
    changing the operator contract. The default decodes binary PPM for
    real (:func:`default_decoder`) and raises the documented
    ``NotImplementedError`` for containers that need external libs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["content"].map(lambda b: 0 if b is None else len(b)),
                    "features": [
                        decoder(content, modality)
                        for content, modality in zip(pdf["content"], pdf["modality"])
                    ],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)
