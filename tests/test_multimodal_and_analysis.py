"""Multimodal binary-column plumbing (mapInPandas batch shapes) and the
optional analysis kernels."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from snapcrawler_spark.kernels.analysis import (
    ai_tags_cols,
    classify_content,
    content_type_udf,
)
from snapcrawler_spark.kernels.codecs import encode_bmp, encode_png
from snapcrawler_spark.pipeline.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    frame_sample_stub,
    resize_images,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rng = np.random.Generator(np.random.PCG64(7))
    rows = []
    px = rng.integers(0, 256, size=(40, 60, 3), dtype=np.uint8)
    rows.append(("m_png", encode_png(px), "image", ("png", 60, 40, None, None)))
    rows.append(("m_bmp", encode_bmp(px), "image", ("bmp", 60, 40, None, None)))
    rows.append(("m_jpg", b"\xff\xd8\xff\xe0fakejpeg", "image",
                 ("jpeg", None, None, None, None)))
    rows.append(("m_vid", b"\x00\x00\x00\x18ftypmp42xx", "video",
                 ("mp4", 640, 480, 3500, None)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


class TestMultimodal:
    def test_extract_features_batch_shape(self, media_df):
        out = {r.media_id: r for r in extract_features(media_df).collect()}
        assert out["m_png"].decoded and len(out["m_png"].thumb8) == 64
        assert out["m_bmp"].decoded
        # identical pixels → identical thumbnails regardless of container
        assert np.allclose(out["m_png"].thumb8, out["m_bmp"].thumb8)
        # stubbed codec: sniffed correctly, decode gracefully refused
        assert out["m_jpg"].fmt == "jpeg" and not out["m_jpg"].decoded
        assert out["m_jpg"].n_bytes == 12

    def test_resize_roundtrip(self, media_df, spark):
        from snapcrawler_spark.kernels.codecs import decode_png

        out = {r.media_id: r for r in resize_images(media_df, side=16).collect()}
        assert out["m_png"].resized
        px, mode, _ = decode_png(bytes(out["m_png"].bytes))
        assert px.shape == (16, 16) and mode == "L"
        assert not out["m_jpg"].resized  # stub passthrough

    def test_frame_sample_one_to_many(self, media_df):
        frames = frame_sample_stub(media_df, every_ms=1000).collect()
        vid = [r for r in frames if r.media_id == "m_vid"]
        assert [r.frame_ms for r in sorted(vid, key=lambda r: r.frame_ms)] == [
            0, 1000, 2000, 3000,
        ]


class TestAnalysisKernels:
    def test_ai_tags_pure_columns(self, spark):
        df = spark.createDataFrame(
            [(2000, 100, "RGB"), (100, 100, "L"), (200, 640, "RGB")],
            "w int, h int, mode string",
        ).select(ai_tags_cols(F.col("w"), F.col("h"), F.col("mode")).alias("tags"))
        tags = [r.tags for r in df.collect()]
        assert tags[0] == ["high_resolution", "landscape", "color"]
        assert tags[1] == ["low_resolution", "square", "grayscale"]
        assert tags[2] == ["medium_resolution", "portrait", "color"]

    def test_classify_content_rules(self):
        rng = np.random.Generator(np.random.PCG64(3))
        banner = rng.integers(0, 256, size=(50, 400, 3), dtype=np.uint8)
        assert classify_content(banner) == "banner"
        icon = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        assert classify_content(icon) == "icon"
        flat = np.full((200, 200, 3), 128, dtype=np.uint8)
        assert classify_content(flat) == "logo"
        noise = rng.integers(0, 256, size=(200, 200, 3), dtype=np.uint8)
        assert classify_content(noise) == "photo"

    def test_content_type_udf(self, spark):
        noise = np.random.Generator(np.random.PCG64(5)).integers(
            0, 256, size=(150, 150, 3), dtype=np.uint8
        )
        df = spark.createDataFrame(
            [(encode_png(noise),), (b"junk",)], "bytes binary"
        ).select(content_type_udf(F.col("bytes")).alias("ct"))
        got = [r.ct for r in df.collect()]
        assert got[0] == "photo" and got[1] is None


class TestColorPalette:
    def test_kmeans_palette_deterministic_and_bounded(self):
        from snapcrawler_spark.kernels.analysis import kmeans_palette

        rng = np.random.Generator(np.random.PCG64(7))
        colors = rng.integers(0, 256, size=(20, 3), dtype=np.uint8)
        a = kmeans_palette(colors)
        b = kmeans_palette(colors.copy())
        assert np.array_equal(a, b)
        assert a.shape == (8, 3)
        assert a.min() >= 0 and a.max() <= 255
        # fewer colors than k → one center per color
        two = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
        pal = kmeans_palette(two)
        assert pal.shape == (2, 3)
        assert {tuple(c) for c in pal} == {(0, 0, 0), (255, 255, 255)}

    def test_color_palette_udf(self, spark):
        from snapcrawler_spark.kernels.analysis import color_palette_udf

        # a two-tone image clusters to exactly its two colors
        img = np.zeros((64, 64, 3), dtype=np.uint8)
        img[:, 32:] = [200, 10, 10]
        df = spark.createDataFrame(
            [(encode_png(img),), (b"junk",)], "bytes binary"
        ).select(color_palette_udf(F.col("bytes")).alias("pal"))
        got = [r.pal for r in df.collect()]
        assert got[1] is None
        assert set(got[0]) == {"#000000", "#c80a0a"}


def _glyph_grid(n: int = 8, cell: int = 30, glyph: int = 10) -> np.ndarray:
    """n×n grid of dark glyph blocks (area glyph² ≥ cv2's min_area=60
    each — real MSER correctly ignores sub-min_area specks, so the old
    3×3-dot fixtures would yield ZERO regions under faithful
    semantics)."""
    side = n * cell
    img = np.full((side, side), 240, dtype=np.uint8)
    for i in range(n):
        for j in range(n):
            y, x = 5 + i * cell, 5 + j * cell
            img[y : y + glyph, x : x + glyph] = 15
    return img


class TestWatermark:
    def test_region_count_separates_busy_overlay_from_flat(self):
        from snapcrawler_spark.kernels.analysis import (
            has_watermark,
            region_count,
        )

        flat = np.full((96, 96, 3), 240, dtype=np.uint8)
        # a constant image has at most the two whole-frame extremal
        # regions (one per polarity)
        assert region_count(flat) <= 2
        assert not has_watermark(flat)
        dotted = _glyph_grid()  # 64 glyphs ≥ min_area
        got = region_count(np.stack([dotted] * 3, -1))
        # 64 glyph MSERs (+ at most a few background-scale regions)
        assert 64 <= got <= 70
        assert has_watermark(np.stack([dotted] * 3, -1))

    def test_mser_parameters_behave(self):
        """cv2-parameter semantics: min_area excludes sub-threshold
        specks; a clean gradient yields no high-count structure."""
        from snapcrawler_spark.kernels.mser import mser_region_count

        specks = np.full((120, 120), 240, dtype=np.uint8)
        for i in range(6):
            for j in range(6):
                specks[5 + i * 18 : 8 + i * 18, 5 + j * 18 : 8 + j * 18] = 10
        # 3×3 specks (area 9 < min_area 60) → only frame-scale regions
        assert mser_region_count(specks) <= 3
        ramp = (
            np.linspace(60, 200, 160)[None, :]
            + np.linspace(0, 40, 120)[:, None]
        ).astype(np.uint8)
        assert mser_region_count(ramp) <= 3

    def test_watermark_udf_rejects_in_pipeline(self, spark):
        from snapcrawler_spark.kernels.analysis import watermark_udf

        dotted = _glyph_grid()
        flat = np.full((64, 64, 3), 240, dtype=np.uint8)
        df = spark.createDataFrame(
            [(encode_png(np.stack([dotted] * 3, -1)),), (encode_png(flat),)],
            "bytes binary",
        ).select(watermark_udf(F.col("bytes")).alias("wm"))
        assert [r.wm for r in df.collect()] == [True, False]
