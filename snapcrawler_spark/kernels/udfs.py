"""Vectorized Arrow/pandas UDFs over BINARY image columns.

One decode pass produces everything downstream filters need
(w/h/mode/dpi/phash), so no image is decoded twice — this replaces the
reference's md5-keyed result cache (advanced_formats.py:521-531).

All UDFs are Arrow-batched (`pandas_udf`); the inner loop iterates the
batch in Python but every per-image computation is numpy-vectorized.
Per the scale rule the *metadata* filter chain never calls these — only
rows that survive the cheap column predicates reach decode.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from snapcrawler_spark.kernels.codecs import decode_image
from snapcrawler_spark.kernels.phash import phash64, to_gray
from snapcrawler_spark.kernels.sniff import sniff_format

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("mode", T.StringType()),
        T.StructField("dpi", T.IntegerType()),
        T.StructField("phash", T.LongType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


@F.pandas_udf(T.StringType())
def sniff_fmt_udf(data: pd.Series) -> pd.Series:
    return data.map(lambda b: sniff_format(b) if b is not None else "unknown")


@F.pandas_udf(DECODE_SCHEMA)
def decode_meta_udf(data: pd.Series) -> pd.DataFrame:
    """bytes → (w, h, mode, dpi, phash, ok). Undecodable rows get ok=False."""
    rows = []
    for b in data:
        try:
            px, mode, dpi = decode_image(bytes(b))
            h, w = px.shape[:2]
            rows.append((w, h, mode, dpi, phash64(px), True))
        except Exception:
            rows.append((None, None, None, None, None, False))
    # dtype=object first: plain inference promotes int+None columns to
    # float64, silently truncating 64-bit phashes to 53-bit mantissas
    out = pd.DataFrame(rows, columns=["w", "h", "mode", "dpi", "phash", "ok"],
                       dtype=object)
    return out.astype(
        {"w": "Int32", "h": "Int32", "dpi": "Int32", "phash": "Int64", "ok": "boolean"}
    )


def _laplacian_var(gray: np.ndarray) -> float:
    """Variance of the 4-neighbour Laplacian (sharpness proxy).

    Same role as the cv2.Laplacian variance in advanced_formats.py:225,
    implemented as a shift-difference stencil.
    """
    if gray.shape[0] < 3 or gray.shape[1] < 3:
        return 0.0
    core = gray[1:-1, 1:-1]
    lap = (
        gray[:-2, 1:-1] + gray[2:, 1:-1] + gray[1:-1, :-2] + gray[1:-1, 2:]
        - 4.0 * core
    )
    return float(lap.var())


def quality_score(px: np.ndarray) -> float:
    """0..1 quality score, weights per advanced_formats.py:215-252:
    0.3·sharpness + 0.25·contrast + 0.2·brightness-centering +
    0.25·color-diversity."""
    gray = to_gray(px) / 1000.0  # undo the pHash-spec integer scaling
    sharp = min(_laplacian_var(gray) / 1000.0, 1.0)
    contrast = min(float(gray.std()) / 128.0, 1.0)
    brightness = 1.0 - abs(float(gray.mean()) / 255.0 - 0.5) * 2.0
    if px.ndim == 3:
        sample = px[:: max(1, px.shape[0] // 64), :: max(1, px.shape[1] // 64)]
        uniq = len(np.unique(sample.reshape(-1, 3), axis=0))
        diversity = min(uniq / 256.0, 1.0)
    else:
        diversity = 0.0
    return 0.3 * sharp + 0.25 * contrast + 0.2 * brightness + 0.25 * diversity


@F.pandas_udf(T.DoubleType())
def quality_udf(data: pd.Series) -> pd.Series:
    out = []
    for b in data:
        try:
            px, _, _ = decode_image(bytes(b))
            out.append(quality_score(px))
        except Exception:
            out.append(None)
    return pd.Series(out, dtype="float64")
