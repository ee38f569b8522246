"""Kernel correctness: codecs round-trip, pHash bit-exactness vs the
independent fixture implementation, format sniffing, quality score."""

from __future__ import annotations

import numpy as np
import pytest

from snapcrawler_spark.fixtures.images import _ref_phash, generate_images
from snapcrawler_spark.kernels.codecs import (
    decode_bmp,
    decode_image,
    decode_png,
    encode_bmp,
    encode_png,
)
from snapcrawler_spark.kernels.phash import bin_resize, hamming64, phash64
from snapcrawler_spark.kernels.sniff import sniff_format
from snapcrawler_spark.kernels.udfs import quality_score


def _rand_px(seed, h, w, gray=False):
    rng = np.random.Generator(np.random.PCG64(seed))
    shape = (h, w) if gray else (h, w, 3)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


class TestCodecs:
    @pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (17, 33), (64, 64), (5, 128)])
    def test_bmp_roundtrip(self, h, w):
        px = _rand_px(h * 1000 + w, h, w)
        out, mode, dpi = decode_bmp(encode_bmp(px))
        assert mode == "RGB" and dpi is None
        assert np.array_equal(out, px)

    def test_bmp_dpi(self):
        px = _rand_px(7, 10, 10)
        _, _, dpi = decode_bmp(encode_bmp(px, dpi=144))
        assert dpi == 144

    @pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (31, 17), (64, 64)])
    def test_png_rgb_roundtrip(self, h, w):
        px = _rand_px(h * 991 + w, h, w)
        out, mode, dpi = decode_png(encode_png(px))
        assert mode == "RGB" and dpi is None
        assert np.array_equal(out, px)

    def test_png_gray_roundtrip(self):
        px = _rand_px(11, 20, 30, gray=True)
        out, mode, dpi = decode_png(encode_png(px, dpi=72))
        assert mode == "L" and dpi == 72
        assert np.array_equal(out, px)

    def test_png_filters_decoded(self):
        # hand-build a 2-row PNG with Sub and Up filters
        import struct
        import zlib

        from snapcrawler_spark.kernels.codecs import _chunk

        w, h = 4, 2
        row0 = np.array([10, 20, 30, 5, 5, 5, 1, 2, 3, 200, 1, 2], dtype=np.uint8)
        row1 = np.array([7, 7, 7, 0, 0, 0, 9, 9, 9, 1, 1, 1], dtype=np.uint8)
        # filter 1 (Sub) on row0, filter 2 (Up) on row1
        f0 = row0.astype(np.int32).copy()
        f0[3:] = (row0[3:].astype(np.int32) - row0[:-3]) % 256
        f1 = (row1.astype(np.int32) - row0) % 256
        raw = bytes([1]) + bytes(f0.astype(np.uint8)) + bytes([2]) + bytes(
            f1.astype(np.uint8)
        )
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        data = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b"")
        )
        out, mode, _ = decode_png(data)
        assert np.array_equal(out.reshape(2, 12), np.stack([row0, row1]))

    def test_decode_dispatch_rejects_junk(self):
        with pytest.raises(ValueError):
            decode_image(b"\x00junkjunkjunk")


class TestGif:
    """From-scratch GIF87a/89a + LZW codec (kernels/gif.py, round 6):
    ground-truth pixel equality like BMP/PNG, plus the LZW edge cases
    (variable code width growth, table-full clear/reset, interlace)."""

    @pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (17, 33), (64, 64), (5, 128)])
    def test_gif_roundtrip(self, h, w):
        from snapcrawler_spark.kernels.gif import decode_gif, encode_gif

        rng = np.random.Generator(np.random.PCG64(h * 7919 + w))
        pal = rng.integers(0, 256, (12, 3), dtype=np.uint8)
        px = pal[rng.integers(0, 12, (h, w))]
        out, mode, dpi = decode_gif(encode_gif(px))
        assert mode == "P" and dpi is None
        assert np.array_equal(out, px)

    @pytest.mark.parametrize("version", [b"GIF87a", b"GIF89a"])
    def test_gif_interlaced_and_versions(self, version):
        from snapcrawler_spark.kernels.gif import decode_gif, encode_gif

        px = _rand_px(99, 37, 23) // 64 * 64  # ≤4³=64-color palette
        out, _, _ = decode_gif(encode_gif(px, interlace=True, version=version))
        assert np.array_equal(out, px)

    def test_gif_lzw_width_growth_and_table_full(self):
        """A large high-entropy image walks the code width 9→12 bits
        and forces mid-stream CLEAR resets (table full at 4096)."""
        from snapcrawler_spark.kernels.gif import (
            _lzw_decode,
            _lzw_encode,
            decode_gif,
            encode_gif,
        )

        gray = _rand_px(5, 300, 300, gray=True)
        px = np.stack([gray] * 3, -1)  # 256-entry palette
        out, _, _ = decode_gif(encode_gif(px))
        assert np.array_equal(out, px)
        # raw LZW at the minimum alphabet (mcs=2): maximal width churn
        rng = np.random.Generator(np.random.PCG64(13))
        idx = bytes(rng.integers(0, 4, 60_000, dtype=np.uint8))
        assert _lzw_decode(_lzw_encode(idx, 2), 2) == idx

    def test_gif_truncated_raises(self):
        from snapcrawler_spark.kernels.gif import decode_gif, encode_gif

        body = encode_gif(_rand_px(3, 20, 20) // 64 * 64)
        with pytest.raises(ValueError):
            decode_gif(body[: len(body) // 2] + b"\x00\x3b")
        with pytest.raises(ValueError):
            decode_gif(b"GIF89a" + bytes(32))  # no image block

    def test_gif_dispatch_and_fixture_ground_truth(self):
        """decode_image routes GIFs, and every fixture img_gif* row
        decodes bit-exactly to its images_pixels ground truth with the
        fixture phash (lossless format → exact, like BMP/PNG)."""
        from snapcrawler_spark.fixtures import load_fixture

        web = load_fixture(42, "xs")
        imgs = web["images"]
        gifs = imgs[imgs.image_id.str.startswith("img_gif")]
        assert len(gifs) == 4
        pix = {r.image_id: r for r in web["images_pixels"].itertuples()}
        for r in gifs.itertuples():
            px, mode, dpi = decode_image(bytes(r.bytes))
            assert mode == "P" and dpi is None
            gt = pix[r.image_id]
            want = np.frombuffer(gt.px, np.uint8).reshape(gt.h, gt.w, 3)
            assert np.array_equal(px, want)
            assert phash64(px) == r.phash


class TestTiff:
    """From-scratch uncompressed-TIFF codec (kernels/tiff.py, round 6):
    both byte orders, gray/RGB, multi-strip reassembly, DPI rationals."""

    @pytest.mark.parametrize("big_endian", [False, True])
    @pytest.mark.parametrize("rps", [None, 1, 7])
    def test_tiff_roundtrip(self, big_endian, rps):
        from snapcrawler_spark.kernels.tiff import decode_tiff, encode_tiff

        for gray in (False, True):
            px = _rand_px(31 + rps.__hash__() % 97 if rps else 31, 23, 37, gray=gray)
            out, mode, dpi = decode_tiff(
                encode_tiff(px, rows_per_strip=rps, big_endian=big_endian)
            )
            assert np.array_equal(out, px)
            assert mode == ("L" if gray else "RGB") and dpi is None

    def test_tiff_dpi_and_dispatch(self):
        from snapcrawler_spark.kernels.tiff import encode_tiff

        px = _rand_px(5, 10, 12)
        out, mode, dpi = decode_image(encode_tiff(px, dpi=300))
        assert np.array_equal(out, px) and mode == "RGB" and dpi == 300

    def test_tiff_malformed_raises(self):
        from snapcrawler_spark.kernels.tiff import decode_tiff, encode_tiff

        px = _rand_px(6, 8, 8)
        with pytest.raises(ValueError):
            decode_tiff(encode_tiff(px)[:40])  # truncated IFD
        with pytest.raises(ValueError):
            decode_tiff(b"II\x2a\x00" + bytes(10))
        with pytest.raises(ValueError):
            decode_tiff(b"garbage!")


class TestPhash:
    def test_bit_exact_vs_independent_impl(self):
        for s in range(25):
            h = 5 + s * 13 % 200
            w = 5 + s * 29 % 300
            px = _rand_px(s, h, w, gray=(s % 5 == 0))
            assert phash64(px) == _ref_phash(px), f"seed {s} {h}x{w}"

    def test_resize_preserves_mean(self):
        px = _rand_px(3, 64, 64)
        from snapcrawler_spark.kernels.phash import to_gray

        g = to_gray(px)
        small = bin_resize(g, 32)
        assert abs(small.mean() - g.mean()) < 1e-6

    def test_identical_pixels_identical_hash(self):
        px = _rand_px(4, 50, 70)
        assert phash64(px) == phash64(px.copy())

    def test_different_images_differ(self):
        a = phash64(_rand_px(1, 64, 64))
        b = phash64(_rand_px(2, 64, 64))
        assert hamming64(a, b) > 0

    def test_small_image_upsampling(self):
        px = _rand_px(9, 8, 8)  # smaller than 32 → upsampling path
        v = phash64(px)
        assert isinstance(v, int)
        assert v == _ref_phash(px)

    def test_corpus_ground_truth_bit_exact(self):
        images, pixels = generate_images(42, 60)
        checked = 0
        for (_, r), (_, p) in zip(images.iterrows(), pixels.iterrows()):
            if r.fmt in ("unknown", "gif", "svg"):
                continue
            px, _, _ = decode_image(bytes(r["bytes"]))
            assert phash64(px) == r.phash
            checked += 1
        assert checked > 30


class TestSniff:
    @pytest.mark.parametrize(
        "prefix,expect",
        [
            (b"\xff\xd8\xff\xe0junk", "jpeg"),
            (b"\x89PNG\r\n\x1a\njunk", "png"),
            (b"GIF89ajunk", "gif"),
            (b"RIFF\x00\x00\x00\x00WEBPjunk", "webp"),
            (b"BMjunkjunk", "bmp"),
            (b"II*\x00junk", "tiff"),
            (b"MM\x00*junk", "tiff"),
            (b"\x00\x00\x00\x18ftypavifjunk", "avif"),
            (b"\x00\x00\x00\x18ftypheicjunk", "heic"),
            (b"<svg xmlns='x'></svg>", "svg"),
            (b'<?xml version="1.0"?><svg></svg>', "svg"),
            (b"\xff\x0ajunkjunk", "jxl"),
            (b"plain text here", "unknown"),
            (b"", "unknown"),
        ],
    )
    def test_signatures(self, prefix, expect):
        assert sniff_format(prefix) == expect


class TestQuality:
    def test_flat_image_scores_low(self):
        flat = np.full((64, 64, 3), 128, dtype=np.uint8)
        noisy = _rand_px(5, 64, 64)
        assert quality_score(flat) < quality_score(noisy)

    def test_score_bounded(self):
        for s in range(5):
            v = quality_score(_rand_px(s, 40, 40))
            assert 0.0 <= v <= 1.0
