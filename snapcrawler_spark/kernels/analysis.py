"""Optional image-analysis kernels (feature-flagged, off by default in
the crawl config, mirroring config.yaml:31 ai_optimization.enabled).

- ``ai_tags_cols``: resolution/orientation/colorness buckets — pure
  column expressions, not even a UDF (advanced_formats.py:342-374).
- ``content_type_udf``: rule tree over edge density / color diversity /
  aspect (advanced_formats.py:305-340), Sobel edges replacing Canny.
- ``dominant_colors_udf``: downsample + top-5 colors as hex
  (advanced_formats.py:254-287).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from snapcrawler_spark.kernels.codecs import decode_image
from snapcrawler_spark.kernels.phash import to_gray


def ai_tags_cols(w: Column, h: Column, mode: Column) -> Column:
    """ARRAY<STRING> of bucket tags from already-decoded metadata."""
    res_tag = (
        F.when((w >= 1920) | (h >= 1920), F.lit("high_resolution"))
        .when((w >= 640) | (h >= 640), F.lit("medium_resolution"))
        .otherwise(F.lit("low_resolution"))
    )
    orient_tag = (
        F.when(w > h, F.lit("landscape"))
        .when(h > w, F.lit("portrait"))
        .otherwise(F.lit("square"))
    )
    color_tag = F.when(mode == "L", F.lit("grayscale")).otherwise(F.lit("color"))
    return F.array(res_tag, orient_tag, color_tag)


def _sobel_edge_density(gray: np.ndarray) -> float:
    if gray.shape[0] < 3 or gray.shape[1] < 3:
        return 0.0
    gx = (
        gray[:-2, 2:] + 2 * gray[1:-1, 2:] + gray[2:, 2:]
        - gray[:-2, :-2] - 2 * gray[1:-1, :-2] - gray[2:, :-2]
    )
    gy = (
        gray[2:, :-2] + 2 * gray[2:, 1:-1] + gray[2:, 2:]
        - gray[:-2, :-2] - 2 * gray[:-2, 1:-1] - gray[:-2, 2:]
    )
    mag = np.hypot(gx, gy)
    return float((mag > 128.0).mean())


def classify_content(px: np.ndarray) -> str:
    """{text, banner, icon, logo, photo, illustration} rule tree."""
    h, w = px.shape[:2]
    gray = to_gray(px) / 1000.0
    edges = _sobel_edge_density(gray)
    if px.ndim == 3:
        sample = px[:: max(1, h // 50), :: max(1, w // 50)]
        diversity = len(np.unique(sample.reshape(-1, 3), axis=0)) / max(
            sample.shape[0] * sample.shape[1], 1
        )
    else:
        diversity = 0.0
    aspect = w / h if h else 1.0
    if aspect > 4 or aspect < 0.25:
        return "banner"
    if max(w, h) <= 64:
        return "icon"
    if edges > 0.25 and diversity < 0.1:
        return "text"
    if diversity < 0.05:
        return "logo"
    if diversity > 0.5:
        return "photo"
    return "illustration"


@F.pandas_udf(T.StringType())
def content_type_udf(data: pd.Series) -> pd.Series:
    out = []
    for b in data:
        try:
            px, _, _ = decode_image(bytes(b))
            out.append(classify_content(px))
        except Exception:
            out.append(None)
    return pd.Series(out)


def region_count(px: np.ndarray, max_side: int = 256) -> int:
    """MSER region count — REAL Maximally-Stable-Extremal-Region
    semantics since round 6 (kernels/mser.py: intensity-order
    union-find component tree, Δ-variation stability with local-minimum
    detection, min/max area and min_diversity pruning, both polarities)
    at cv2.MSER_create() default parameters, matching the reference's
    ``len(mser.detectRegions(gray)) > sensitivity`` check
    (filtering_module.py:442-457). This replaces the round-1
    three-threshold component-count stand-in — the remaining documented
    deviation vs cv2 is the ≤max_side block-mean downsample (with
    area thresholds rescaled) that bounds the Python-side sweep."""
    from snapcrawler_spark.kernels.mser import mser_region_count

    gray = to_gray(px) / 1000.0
    return mser_region_count(gray, max_side=max_side)


def has_watermark(px: np.ndarray, sensitivity: int = 50) -> bool:
    """region_count > sensitivity (filtering_module.py:454-456)."""
    return region_count(px) > sensitivity


@F.pandas_udf(T.BooleanType())
def watermark_udf(data: pd.Series) -> pd.Series:
    out = []
    for b in data:
        try:
            px, _, _ = decode_image(bytes(b))
            out.append(bool(has_watermark(px)))
        except Exception:
            out.append(False)
    return pd.Series(out)


def kmeans_palette(
    colors: np.ndarray, k: int = 8, iters: int = 10
) -> np.ndarray:
    """Deterministic Lloyd k-means over an (n,3) color array — the
    from-scratch analog of advanced_formats.py:289-302 (sklearn KMeans,
    random_state=42) with reproducible initialization: centers start at
    the k most frequent colors (the input arrives frequency-sorted), so
    identical input → identical palette on every run/executor."""
    n = len(colors)
    if n == 0:
        return colors.reshape(0, 3)
    k = min(k, n)
    pts = colors.astype(np.float64)
    centers = pts[:k].copy()
    for _ in range(iters):
        d = ((pts[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            sel = pts[assign == c]
            if len(sel):
                centers[c] = sel.mean(axis=0)
    order = np.lexsort((centers[:, 2], centers[:, 1], centers[:, 0]))
    return np.clip(centers[order], 0, 255).astype(np.int64)


@F.pandas_udf(T.ArrayType(T.StringType()))
def color_palette_udf(data: pd.Series) -> pd.Series:
    """Top-20 dominant colors → k-means palette as hex strings
    (advanced_formats.py:277-302)."""
    out = []
    for b in data:
        try:
            px, _, _ = decode_image(bytes(b))
            if px.ndim == 2:
                px = np.stack([px] * 3, -1)
            h, w = px.shape[:2]
            sample = px[:: max(1, h // 100), :: max(1, w // 100)].reshape(-1, 3)
            colors, counts = np.unique(sample, axis=0, return_counts=True)
            top = colors[np.argsort(-counts)[:20]]
            pal = kmeans_palette(top)
            out.append([f"#{r:02x}{g:02x}{b_:02x}" for r, g, b_ in pal])
        except Exception:
            out.append(None)
    return pd.Series(out)


@F.pandas_udf(T.ArrayType(T.StringType()))
def dominant_colors_udf(data: pd.Series) -> pd.Series:
    out = []
    for b in data:
        try:
            px, _, _ = decode_image(bytes(b))
            if px.ndim == 2:
                px = np.stack([px] * 3, -1)
            h, w = px.shape[:2]
            sample = px[:: max(1, h // 100), :: max(1, w // 100)].reshape(-1, 3)
            colors, counts = np.unique(sample, axis=0, return_counts=True)
            top = colors[np.argsort(-counts)[:5]]
            out.append([f"#{r:02x}{g:02x}{b_:02x}" for r, g, b_ in top])
        except Exception:
            out.append(None)
    return pd.Series(out)
