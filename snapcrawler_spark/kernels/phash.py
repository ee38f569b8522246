"""64-bit DCT perceptual hash.

Semantics follow the reference's use of ``imagehash.phash`` at
filtering_module.py:337 / pipelines.py:213: grayscale → 32×32 resize →
2-D DCT-II → top-left 8×8 block (DC included) → median threshold →
64 bits. The implementation is from scratch (no scipy/imagehash).

Bit-exactness spec (shared with the independent fixture-generator
implementation; every step below is part of the spec so that two
independent implementations agree bit-for-bit):

1. luma: integer-scaled ITU-R 601-2, ``L = 299·R + 587·G + 114·B``
   (grayscale input: ``L = 1000·pixel``). Integers are exact in
   float64, so resize block sums are exact regardless of summation
   order — this is why the scale factor exists. The uniform ×1000
   cannot change any median comparison.
2. resize to 32×32: target cell (i, j) is the mean of the half-open
   source block rows ``[floor(i·h/32), max(floor((i+1)·h/32),
   floor(i·h/32)+1))`` (same for columns) — blocks are non-empty, so
   both down- and up-sampling are defined.
3. DCT-II: basis ``B[k, m] = 2·cos(angle)`` with the angle computed as
   ``(π / (2·32)) · (k·(2m+1))`` (integer product first, one multiply
   by the constant) — matches scipy.fftpack.dct(norm=None) up to a
   uniform positive constant. Coefficients = ``B @ small @ B.T``
   evaluated left-to-right with numpy matmul.
4. threshold: strict ``>`` against ``np.median`` of the 8×8 block
   (DC term included, as in imagehash).
5. packing: row-major 8×8 bits, MSB first, into one int64 (two's
   complement — hashes with bit 63 set are negative LongType values).
"""

from __future__ import annotations

import numpy as np

HASH_SIZE = 8
IMG_SIZE = 32


def to_gray(px: np.ndarray) -> np.ndarray:
    """(h, w[, 3]) uint8 → (h, w) float64 integer-scaled luma (×1000)."""
    if px.ndim == 2:
        return px.astype(np.float64) * 1000.0
    return (
        299.0 * px[:, :, 0].astype(np.float64)
        + 587.0 * px[:, :, 1].astype(np.float64)
        + 114.0 * px[:, :, 2].astype(np.float64)
    )


def _block_edges(n_src: int, size: int) -> np.ndarray:
    return (np.arange(size + 1) * n_src) // size


def bin_resize(gray: np.ndarray, size: int = IMG_SIZE) -> np.ndarray:
    """Half-open block area-mean resize to (size, size) — spec step 2."""
    h, w = gray.shape
    re = _block_edges(h, size)
    ce = _block_edges(w, size)
    out = np.empty((size, size), dtype=np.float64)
    for i in range(size):
        r0 = int(re[i])
        r1 = max(int(re[i + 1]), r0 + 1)
        band = gray[r0:r1, :].sum(axis=0)
        for j in range(size):
            c0 = int(ce[j])
            c1 = max(int(ce[j + 1]), c0 + 1)
            out[i, j] = band[c0:c1].sum() / ((r1 - r0) * (c1 - c0))
    return out


def dct_basis(n: int = IMG_SIZE) -> np.ndarray:
    """Spec step 3 basis: angle = (π/(2n)) · (k·(2m+1)), B = 2·cos(angle)."""
    k = np.arange(n, dtype=np.float64)[:, None]
    m = np.arange(n, dtype=np.float64)[None, :]
    angle = (np.pi / (2.0 * n)) * (k * (2.0 * m + 1.0))
    return 2.0 * np.cos(angle)


_DCT32 = dct_basis(IMG_SIZE)


def pack_bits64(bits: np.ndarray) -> int:
    """Row-major 64 bools, MSB first → signed int64 (spec step 5)."""
    v = 0
    for idx in range(64):
        if bits[idx]:
            v |= 1 << (63 - idx)
    return v - (1 << 64) if v >= (1 << 63) else v


def phash64(px: np.ndarray) -> int:
    """Perceptual hash of a decoded pixel array → signed int64."""
    small = bin_resize(to_gray(px), IMG_SIZE)
    coeffs = _DCT32 @ small @ _DCT32.T
    low = coeffs[:HASH_SIZE, :HASH_SIZE]
    med = np.median(low)
    return pack_bits64((low > med).flatten())


def hamming64(a: int, b: int) -> int:
    """Hamming distance between two packed 64-bit hashes."""
    return int(bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1"))
