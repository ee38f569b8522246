"""numpy/Arrow image kernels.

All pixel math is numpy over Arrow batches — no per-row Python UDFs on
the hot path (BASELINE.json north rule). The codecs are from-scratch
encoders/decoders for the two container formats the sandbox can handle
without Pillow (uncompressed BMP, zlib PNG); the pHash is an independent
DCT implementation matching the *semantics* used by the reference at
filtering_module.py:337 (imagehash.phash: grayscale → 32×32 → DCT-II →
8×8 low-frequency block → median threshold → 64 bits).
"""

from snapcrawler_spark.kernels.codecs import (  # noqa: F401
    decode_image,
    encode_bmp,
    encode_png,
)
from snapcrawler_spark.kernels.phash import phash64  # noqa: F401
from snapcrawler_spark.kernels.sniff import sniff_format  # noqa: F401
