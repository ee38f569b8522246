"""Multimodal binary-column plumbing.

Image/audio/video payloads are opaque BINARY columns with typed
metadata structs. The Spark-side plumbing — schemas, mapInPandas batch
shape, partition sizing — is real and tested; the codec-dependent
decode steps are deterministic stubs behind feature detection (this
container ships no image/audio libs beyond our own BMP/PNG codecs;
plug Pillow/ffmpeg in by replacing the ``_decode_*`` internals).

Batch sizing note (100 TB tier): Arrow batches are capped by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (2048 in session.py)
so a batch of 1 MB payloads stays ≈2 GB; for larger payloads reduce
per-file row-group sizes at write time and keep the BINARY column last
in the schema so metadata-only scans prune it (Parquet column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from snapcrawler_spark.kernels.codecs import decode_image
from snapcrawler_spark.kernels.phash import bin_resize, to_gray
from snapcrawler_spark.kernels.sniff import sniff_format

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("fmt", T.StringType()),
                    T.StructField("w", T.IntegerType()),
                    T.StructField("h", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("fmt", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("thumb8", T.ArrayType(T.FloatType())),  # 8×8 luma grid
        T.StructField("decoded", T.BooleanType()),
    ]
)


def _decode_any(data: bytes) -> np.ndarray:
    """Decode to pixels. BMP/PNG/JPEG/GIF are real from-scratch codecs
    (kernels/codecs.py, kernels/jpeg.py, kernels/gif.py); remaining
    formats raise NotImplementedError (STUB: plug a codec lib here)."""
    fmt = sniff_format(data)
    if fmt in ("bmp", "png", "jpeg", "gif", "tiff"):
        px, _, _ = decode_image(data)
        return px
    raise NotImplementedError(f"no in-sandbox codec for {fmt}")


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: sniff + 8×8 luma thumbnail.

    The batch shape is the part that matters at scale: one Arrow batch
    in, one out, numpy per payload, nothing row-at-a-time in Spark."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["bytes"]):
                b = bytes(data)
                fmt = sniff_format(b)
                try:
                    px = _decode_any(b)
                    thumb = (
                        bin_resize(to_gray(px), 8).astype(np.float32) / 1000.0
                    ).flatten().tolist()
                    rows.append((mid, fmt, len(b), thumb, True))
                except (NotImplementedError, ValueError):
                    rows.append((mid, fmt, len(b), None, False))
            yield pd.DataFrame(
                rows, columns=["media_id", "fmt", "n_bytes", "thumb8", "decoded"]
            )

    return media.select("media_id", "bytes").mapInPandas(fn, FEATURE_SCHEMA)


def resize_images(media: DataFrame, side: int = 64) -> DataFrame:
    """Decode → area-mean resize → re-encode PNG. Real for BMP/PNG rows;
    other formats pass through with resized=False."""
    from snapcrawler_spark.kernels.codecs import encode_png

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType()),
            T.StructField("resized", T.BooleanType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["bytes"]):
                b = bytes(data)
                try:
                    px = _decode_any(b)
                    gray = to_gray(px) / 1000.0
                    small = np.clip(bin_resize(gray, side), 0, 255).astype(np.uint8)
                    rows.append((mid, encode_png(small), True))
                except (NotImplementedError, ValueError):
                    rows.append((mid, b, False))
            yield pd.DataFrame(rows, columns=["media_id", "bytes", "resized"])

    return media.select("media_id", "bytes").mapInPandas(fn, out_schema)


def frame_sample_stub(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling — pure plumbing stub: emits the frame
    *timestamps* a real decoder would extract (deterministic from
    meta.duration_ms), with bytes left NULL (STUB: ffmpeg goes here).
    One-to-many mapInPandas shape (the UDTF pattern, SURVEY §2.9)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("frame_ms", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, dur in zip(pdf["media_id"], pdf["duration_ms"]):
                d = int(dur) if pd.notna(dur) else 0
                for ts in range(0, max(d, 1), every_ms):
                    rows.append((mid, ts, None))
            yield pd.DataFrame(rows, columns=["media_id", "frame_ms", "frame"])

    return media.select(
        "media_id", F.col("meta.duration_ms").alias("duration_ms")
    ).mapInPandas(fn, out_schema)
