"""From-scratch baseline JPEG codec: round-trip, PSNR invariant, and the
corpus-level decoded-pixel ground-truth contract.

North rule input_hint: "per-row invariant vs the reference:
decoded-pixel allclose (PSNR≥40dB for lossy) + caption equality" — the
PSNR bound is asserted here against the pre-encode source across every
synthetic pattern family the fixture generates (noise is the worst
case for DCT coding), and the fixture's stored pixels are pinned to be
the exact decode of the stored bytes.
"""

from __future__ import annotations

import numpy as np
import pytest

from snapcrawler_spark.fixtures.images import _make_pixels, generate_images
from snapcrawler_spark.kernels.codecs import decode_image
from snapcrawler_spark.kernels.jpeg import decode_jpeg, encode_jpeg, psnr

KINDS = ["flat", "hgrad", "checker", "blocks", "noise"]


class TestRoundTrip:
    @pytest.mark.parametrize("kind", KINDS)
    @pytest.mark.parametrize("size", [(8, 8), (41, 53), (64, 200), (17, 9)])
    def test_psnr_at_least_40db(self, kind, size):
        rng = np.random.Generator(np.random.PCG64(hash((kind, size)) % 2**32))
        h, w = size
        px = _make_pixels(rng, w, h, kind, gray=False)
        if px.ndim == 2:
            px = np.stack([px] * 3, -1)
        out = decode_jpeg(encode_jpeg(px, quality=98))
        assert out.shape == px.shape
        assert psnr(px, out) >= 40.0, f"{kind} {size}: {psnr(px, out):.1f} dB"

    def test_grayscale_roundtrip(self):
        rng = np.random.Generator(np.random.PCG64(5))
        px = rng.integers(0, 256, size=(33, 47), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(px, quality=98))
        assert out.shape == px.shape and out.ndim == 2
        assert psnr(px, out) >= 40.0

    def test_lossless_on_flat(self):
        px = np.full((24, 40, 3), 97, dtype=np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(px, quality=95)), px)

    def test_decode_image_dispatch(self):
        px = np.full((16, 16, 3), 50, dtype=np.uint8)
        got, mode, dpi = decode_image(encode_jpeg(px))
        assert mode == "RGB" and dpi is None
        assert np.array_equal(got, px)

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"\xff\xd8\xff\xe0junk")


class TestCorpusContract:
    def test_fixture_jpg_pixels_are_exact_decode_of_bytes(self):
        """The stored pixel/phash ground truth for lossy rows must be
        the decode of the stored bytes — bit-exact, so engine-computed
        metadata (dims, phash) matches the oracle columns."""
        images, pixels = generate_images(42, 120)
        jpgs = images[images.fmt == "jpg"]
        assert len(jpgs) >= 5, "fixture should carry jpg rows"
        px_by_id = {
            r.image_id: (bytes(r.px), int(r.w), int(r.h), int(r.channels))
            for r in pixels.itertuples()
        }
        for r in jpgs.itertuples():
            raw, w, h, ch = px_by_id[r.image_id]
            truth = np.frombuffer(raw, dtype=np.uint8).reshape(
                (h, w) if ch == 1 else (h, w, 3)
            )
            dec = decode_jpeg(bytes(r.bytes))
            assert np.array_equal(dec, truth), r.image_id
