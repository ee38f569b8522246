"""Synthetic image corpus in the mandated input-table shape
(image_id, bytes, w, h, fmt, caption, phash) — BASELINE.json input_hint.

The ``phash`` column is ground truth computed by an *independent*
implementation (explicit cosine-basis einsum + loop-binned resize) so
the engine kernel (matrix-product DCT + reduceat-style binning) is
cross-validated bit-for-bit. Pixel ground truth is kept in a companion
``images_pixels`` table for the decoded-pixel allclose invariant.

Coverage knobs mirror the reference filter chain (FIXTURES.md §1):
sizes straddle min_side, aspect ratios cover all banner buckets,
grayscale rows for the color filter, null/low DPI rows, phash-duplicate
pairs for first-wins dedup, and gif/svg/unknown payloads for the format
whitelist / content-type gates.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from snapcrawler_spark.kernels.codecs import encode_bmp, encode_png

HASH_SIZE = 8
IMG_SIZE = 32

_ADJECTIVES = ["red", "tiny", "vast", "зелёный", "quiet", "möbius", "plain", ""]
_NOUNS = ["fox", "bridge", "поле", "harbor", "glacier", "atrium", "kiln", "dune"]


def _ref_phash(px: np.ndarray) -> int:
    """Independent pHash implementing the spec in kernels/phash.py.

    Deliberately different code paths where the spec permits: integer
    luma via int64 arithmetic, per-cell np.ix_ block means, meshgrid
    basis construction, plain-int bit packing. The DCT basis argument
    construction and matmul evaluation are spec-mandated to be shared.
    """
    if px.ndim == 3:
        luma = (
            299 * px[:, :, 0].astype(np.int64)
            + 587 * px[:, :, 1].astype(np.int64)
            + 114 * px[:, :, 2].astype(np.int64)
        )
    else:
        luma = px.astype(np.int64) * 1000
    gray = luma.astype(np.float64)
    h, w = gray.shape
    small = np.zeros((IMG_SIZE, IMG_SIZE), dtype=np.float64)
    for i in range(IMG_SIZE):
        r0 = (i * h) // IMG_SIZE
        r1 = max(((i + 1) * h) // IMG_SIZE, r0 + 1)
        for j in range(IMG_SIZE):
            c0 = (j * w) // IMG_SIZE
            c1 = max(((j + 1) * w) // IMG_SIZE, c0 + 1)
            block = gray[np.ix_(range(r0, r1), range(c0, c1))]
            small[i, j] = block.sum() / block.size
    n = IMG_SIZE
    kk, mm = np.meshgrid(
        np.arange(n, dtype=np.float64), np.arange(n, dtype=np.float64), indexing="ij"
    )
    basis = 2.0 * np.cos((np.pi / (2.0 * n)) * (kk * (2.0 * mm + 1.0)))
    coeffs = basis @ small @ basis.T
    low = coeffs[:HASH_SIZE, :HASH_SIZE]
    med = np.median(low)
    bits = (low > med).flatten()
    v = 0
    for idx in range(64):
        if bits[idx]:
            v |= 1 << (63 - idx)
    return v - (1 << 64) if v >= (1 << 63) else v


def _make_pixels(rng: np.random.Generator, w: int, h: int, kind: str, gray: bool):
    if gray:
        shape = (h, w)
    else:
        shape = (h, w, 3)
    if kind == "flat":
        base = rng.integers(0, 256, size=(1, 1) if gray else (1, 1, 3), dtype=np.uint8)
        return np.broadcast_to(base, shape).copy()
    if kind == "hgrad":
        ramp = np.linspace(0, 255, w, dtype=np.float64)
        px = np.tile(ramp, (h, 1))
        if not gray:
            px = np.stack([px, px[:, ::-1], np.full_like(px, rng.integers(0, 256))], -1)
        return px.astype(np.uint8)
    if kind == "checker":
        cell = max(1, int(rng.integers(1, 9)))
        yy, xx = np.mgrid[0:h, 0:w]
        mask = ((yy // cell) + (xx // cell)) % 2 == 0
        a = rng.integers(0, 256, size=3, dtype=np.uint8)
        b = rng.integers(0, 256, size=3, dtype=np.uint8)
        if gray:
            return np.where(mask, int(a[0]), int(b[0])).astype(np.uint8)
        out = np.where(mask[..., None], a[None, None, :], b[None, None, :])
        return out.astype(np.uint8)
    if kind == "blocks":
        bh, bw = max(1, h // 4), max(1, w // 4)
        small = rng.integers(0, 256, size=(4, 4) if gray else (4, 4, 3), dtype=np.uint8)
        out = np.repeat(np.repeat(small, bh, axis=0), bw, axis=1)
        return out[:h, :w]
    # noise
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


# aspect buckets per FIXTURES.md: <0.1, 0.1-0.4, 0.4-3.0, 3-10, >10
_ASPECTS = [(0.05, 0.02), (0.25, 0.08), (1.0, 0.60), (0.6, 0.10), (2.0, 0.08),
            (5.0, 0.07), (15.0, 0.05)]


def generate_images(seed: int = 42, n: int = 200) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Return (images, images_pixels) pandas DataFrames."""
    root = np.random.Generator(np.random.PCG64(seed))
    kinds = ["flat", "hgrad", "checker", "blocks", "noise"]
    aspect_vals = np.array([a for a, _ in _ASPECTS])
    aspect_p = np.array([p for _, p in _ASPECTS])
    aspect_p = aspect_p / aspect_p.sum()

    img_rows, px_rows = [], []
    pixel_cache: list[tuple[np.ndarray, str, int | None]] = []
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + i))
        image_id = f"img_{i:08d}"
        caption = f"{_ADJECTIVES[i % len(_ADJECTIVES)]} {_NOUNS[(i * 7) % len(_NOUNS)]} {i}".strip()
        roll = rng.random()

        if roll < 0.03 and pixel_cache:
            # exact-pixel duplicate of an earlier image → phash collision row
            px, mode, dpi = pixel_cache[int(rng.integers(0, len(pixel_cache)))]
            fmt = "png" if mode == "L" else ("bmp" if rng.random() < 0.5 else "png")
        elif roll < 0.06:
            # non-image payload (content-type gate coverage)
            junk = bytes(rng.integers(0, 256, size=64, dtype=np.uint8))
            img_rows.append((image_id, b"\x00junk" + junk, 0, 0, "unknown", caption, 0))
            px_rows.append((image_id, b"", 0, 0, 0, "NONE", None))
            continue
        elif roll < 0.09:
            # gif stub: sniffs as gif, rejected by the format whitelist
            body = b"GIF89a" + bytes(rng.integers(0, 256, size=32, dtype=np.uint8))
            img_rows.append((image_id, body, 0, 0, "gif", caption, 0))
            px_rows.append((image_id, b"", 0, 0, 0, "NONE", None))
            continue
        elif roll < 0.12:
            # svg stub: svg_processor unavailable in sandbox → svg_unsupported
            body = (f'<svg xmlns="http://www.w3.org/2000/svg" width="100" '
                    f'height="80"><rect id="r{i}"/></svg>').encode()
            img_rows.append((image_id, body, 100, 80, "svg", caption, 0))
            px_rows.append((image_id, b"", 0, 0, 0, "NONE", None))
            continue
        else:
            gray = rng.random() < 0.07
            aspect = float(rng.choice(aspect_vals, p=aspect_p))
            # log-uniform min side 8..192 so ~15% fall under the test
            # min_side=64 (filter coverage); a few larger rows
            side = int(round(math.exp(rng.uniform(math.log(8), math.log(192)))))
            if rng.random() < 0.04:
                side = int(rng.integers(200, 420))
            if aspect >= 1:
                h = max(4, side)
                w = max(4, int(round(side * aspect)))
            else:
                w = max(4, side)
                h = max(4, int(round(side / aspect)))
            w, h = min(w, 2048), min(h, 2048)
            kind = kinds[int(rng.integers(0, len(kinds)))]
            px = _make_pixels(rng, w, h, kind, gray)
            dpi = None
            r = rng.random()
            if r < 0.15:
                dpi = int(rng.integers(30, 90))    # below min_dpi when enabled
            elif r < 0.45:
                dpi = int(rng.integers(90, 350))
            mode = "L" if gray else "RGB"
            froll = rng.random()  # one draw, three buckets (stream-stable)
            fmt = "png" if gray else (
                "bmp" if froll < 0.25 else ("jpg" if froll < 0.45 else "png")
            )
            pixel_cache.append((px, mode, dpi))

        if fmt == "bmp":
            body = encode_bmp(px if px.ndim == 3 else np.stack([px] * 3, -1), dpi)
            if px.ndim == 2:  # BMP is RGB-only in our codec
                px = np.stack([px] * 3, -1)
                mode = "RGB"
        elif fmt == "jpg":
            # lossy: the stored pixel/phash ground truth is the DECODED
            # round-trip (what any consumer of the bytes sees); the
            # PSNR>=40dB vs the pre-encode source is pinned in
            # tests/test_jpeg.py. Baseline JPEG carries no density → the
            # dpi ground truth is None.
            from snapcrawler_spark.kernels.jpeg import decode_jpeg, encode_jpeg

            if px.ndim == 2:
                px = np.stack([px] * 3, -1)
                mode = "RGB"
            body = encode_jpeg(px, quality=98)
            px = decode_jpeg(body)
            dpi = None
        else:
            body = encode_png(px, dpi)
        hh, ww = px.shape[:2]
        ph = _ref_phash(px)
        img_rows.append((image_id, body, ww, hh, fmt, caption, ph))
        px_rows.append(
            (image_id, px.tobytes(), ww, hh, 1 if px.ndim == 2 else 3, mode, dpi)
        )

    # ---- near-dup JPEG twin pairs (round-5: opt-in near_dup_images
    # crawl stage). The "recompressed copy" case: a source image
    # encoded at q=96 and again at a lower quality until the decoded
    # round-trip's phash lands within hamming 1..3 of the original.
    # Deterministic search (fixed RNG stream independent of every
    # pre-existing draw; fixed quality ladder; first hit wins), ids
    # img_nd{pair}{a|b} — web.py excludes the img_nd* ids from the
    # random-pick pool so all pre-existing fixture draws stay
    # byte-identical. Dimensions/aspect/format chosen to pass every
    # default test filter (min_side 64, jpg, aspect 4:3).
    from snapcrawler_spark.kernels.jpeg import decode_jpeg, encode_jpeg

    nd_rng = np.random.Generator(np.random.PCG64(seed * 424_243))
    made, attempt = 0, 0
    while made < 2 and attempt < 60:
        attempt += 1
        w, h = 160, 120
        ramp = (
            np.linspace(40, 215, w)[None, :]
            + np.linspace(0, 30, h)[:, None]
        )
        noise = nd_rng.normal(0, 14, size=(h, w, 3))
        px = np.clip(ramp[:, :, None] + noise, 0, 255).astype(np.uint8)
        body_a = encode_jpeg(px, quality=96)
        px_a = decode_jpeg(body_a)
        ph_a = _ref_phash(px_a)
        for q in (88, 80, 72, 64, 55, 45, 35):
            body_b = encode_jpeg(px, quality=q)
            px_b = decode_jpeg(body_b)
            ph_b = _ref_phash(px_b)
            d = bin((ph_a ^ ph_b) & ((1 << 64) - 1)).count("1")
            if 1 <= d <= 3:
                for suf, body, pxx, ph in (
                    ("a", body_a, px_a, ph_a),
                    ("b", body_b, px_b, ph_b),
                ):
                    iid = f"img_nd{made}{suf}"
                    hh, ww = pxx.shape[:2]
                    img_rows.append(
                        (iid, body, ww, hh, "jpg",
                         f"near dup {made}{suf}", ph)
                    )
                    px_rows.append(
                        (iid, pxx.tobytes(), ww, hh, 3, "RGB", None)
                    )
                made += 1
                break

    # ---- round-6: REAL decodable GIF rows (kernels/gif.py). The gif
    # STUB rows above (GIF89a magic + random bytes) stay as decode_error
    # coverage; these ids (img_gif*) are appended after every earlier
    # draw with an independent RNG stream and are excluded from web.py's
    # random-pick pool, so all pre-existing fixture draws remain
    # byte-identical. Variants cover the decoder surface: 87a plain,
    # 89a + Graphic Control Extension, interlaced, and a max-palette
    # noise image that forces LZW code-width growth. GIF pixels are
    # lossless → the stored pixel/phash ground truth is exact; mode is
    # 'P' (what PIL reports for GIFs) and dpi is None (GIF carries no
    # density; missing DPI passes the filter).
    from snapcrawler_spark.kernels.gif import encode_gif

    g_rng = np.random.Generator(np.random.PCG64(seed * 555_557))
    gif_specs = [
        ("img_gif0", 128, 96, "checker", False, b"GIF87a"),
        ("img_gif1", 120, 80, "blocks", True, b"GIF89a"),
        ("img_gif2", 150, 100, "noise", False, b"GIF89a"),
        ("img_gif3", 96, 96, "hgrad", True, b"GIF87a"),
    ]
    for gid, gw, gh, kind, interlace, ver in gif_specs:
        px = _make_pixels(g_rng, gw, gh, kind, gray=False)
        if kind == "noise":
            # quantize into a full 256-entry palette (4 levels/channel)
            px = (px // 64) * 64
        body = encode_gif(px, interlace=interlace, version=ver)
        hh, ww = px.shape[:2]
        img_rows.append(
            (gid, body, ww, hh, "gif", f"animated-free {gid}", _ref_phash(px))
        )
        px_rows.append((gid, px.tobytes(), ww, hh, 3, "P", None))

    images = pd.DataFrame(
        img_rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    )
    pixels = pd.DataFrame(
        px_rows, columns=["image_id", "px", "w", "h", "channels", "mode", "dpi"]
    )
    images["w"] = images["w"].astype("int32")
    images["h"] = images["h"].astype("int32")
    images["phash"] = images["phash"].astype("int64")
    return images, pixels
