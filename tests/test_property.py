"""Property-based kernel tests (hypothesis)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from snapcrawler_spark.fixtures.images import _ref_phash
from snapcrawler_spark.kernels.codecs import (
    decode_bmp,
    decode_png,
    encode_bmp,
    encode_png,
)
from snapcrawler_spark.kernels.phash import IMG_SIZE, bin_resize, phash64, to_gray

dims = st.integers(min_value=1, max_value=80)


@st.composite
def rgb_images(draw):
    h = draw(dims)
    w = draw(dims)
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@settings(max_examples=40, deadline=None)
@given(rgb_images())
def test_bmp_roundtrip_property(px):
    out, mode, dpi = decode_bmp(encode_bmp(px))
    assert np.array_equal(out, px) and mode == "RGB"


@settings(max_examples=40, deadline=None)
@given(rgb_images())
def test_png_roundtrip_property(px):
    out, mode, dpi = decode_png(encode_png(px))
    assert np.array_equal(out, px) and mode == "RGB"


@settings(max_examples=25, deadline=None)
@given(rgb_images())
def test_phash_spec_agreement_property(px):
    """The engine kernel and the independent fixture implementation are
    bit-identical on arbitrary shapes (the core dedup invariant)."""
    assert phash64(px) == _ref_phash(px)


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_resize_identity_at_target_size(seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    px = rng.integers(0, 256, size=(IMG_SIZE, IMG_SIZE, 3), dtype=np.uint8)
    g = to_gray(px)
    assert np.array_equal(bin_resize(g, IMG_SIZE), g)


@settings(max_examples=25, deadline=None)
@given(rgb_images())
def test_phash_deterministic_property(px):
    assert phash64(px) == phash64(px.copy())
