"""Fixture tables ↔ Spark DataFrames."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SCHEMAS = {
    "pages": T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("host", T.StringType(), False),
            T.StructField("status", T.IntegerType(), False),
            T.StructField("html", T.StringType(), True),
            T.StructField("content_md5", T.StringType(), False),
            T.StructField("transient_fails", T.IntegerType(), False),
        ]
    ),
    "links": T.StructType(
        [
            T.StructField("src_url", T.StringType(), False),
            T.StructField("link_idx", T.IntegerType(), False),
            T.StructField("href_raw", T.StringType(), False),
            T.StructField("dst_url", T.StringType(), False),
            T.StructField("anchor_text", T.StringType(), True),
        ]
    ),
    "page_items": T.StructType(
        [
            T.StructField("src_url", T.StringType(), False),
            T.StructField("item_idx", T.IntegerType(), False),
            T.StructField("channel", T.StringType(), False),
            T.StructField("url", T.StringType(), False),
        ]
    ),
    "image_fetch": T.StructType(
        [
            T.StructField("image_url", T.StringType(), False),
            T.StructField("image_id", T.StringType(), True),
            T.StructField("status", T.IntegerType(), False),
            T.StructField("content_type", T.StringType(), False),
        ]
    ),
    "images": T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
            T.StructField("w", T.IntegerType(), False),
            T.StructField("h", T.IntegerType(), False),
            T.StructField("fmt", T.StringType(), False),
            T.StructField("caption", T.StringType(), True),
            T.StructField("phash", T.LongType(), False),
        ]
    ),
    "robots": T.StructType(
        [
            T.StructField("host", T.StringType(), False),
            T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), False),
            T.StructField("crawl_delay", T.DoubleType(), False),
            T.StructField("sitemap_urls", T.ArrayType(T.StringType()), False),
            T.StructField("robots_txt", T.StringType(), True),
        ]
    ),
    "seeds": T.StructType(
        [
            T.StructField("seed_url", T.StringType(), False),
            T.StructField("seed_idx", T.IntegerType(), False),
        ]
    ),
    "sitemaps": T.StructType(
        [
            T.StructField("sitemap_url", T.StringType(), False),
            T.StructField("host", T.StringType(), False),
            T.StructField("xml", T.StringType(), False),
        ]
    ),
}


def fixture_to_spark(spark: SparkSession, web: dict) -> dict[str, DataFrame]:
    """Fixture pandas tables → Spark DataFrames with explicit schemas."""
    out = {}
    for name, schema in SCHEMAS.items():
        pdf: pd.DataFrame = web[name]
        out[name] = spark.createDataFrame(pdf[[f.name for f in schema.fields]], schema)
    return out


def write_fixture_parquet(web: dict, root: str) -> None:
    import os

    os.makedirs(root, exist_ok=True)
    for name in list(SCHEMAS) + ["images_pixels"]:
        if name in web:
            pdf = web[name].copy()
            schema = SCHEMAS.get(name)
            if schema is None:
                pdf.to_parquet(f"{root}/{name}.parquet", index=False)
                continue
            for f in schema.fields:
                if f.name in pdf.columns and isinstance(
                    f.dataType, T.IntegerType
                ):
                    # nullable Int32 (not astype('int32')): a column
                    # carrying None — including the all-None degenerate
                    # case — survives the cast as pd.NA instead of
                    # crashing int() on NoneType
                    pdf[f.name] = pd.array(pdf[f.name], dtype="Int32")
            # an all-None column (html at table-backend scales) infers
            # as a null parquet type, which the schema-pinned read then
            # rejects — pin EVERY schema-declared field's arrow type,
            # not just strings (same all-null failure class for ints,
            # doubles, binaries, ...)
            import pyarrow as pa

            _PA = {
                T.StringType: pa.string(),
                T.IntegerType: pa.int32(),
                T.LongType: pa.int64(),
                T.DoubleType: pa.float64(),
                T.BinaryType: pa.binary(),
                T.BooleanType: pa.bool_(),
            }
            pa_schema = pa.Schema.from_pandas(pdf)
            for f in schema.fields:
                if f.name not in pdf.columns or not pdf[f.name].isna().all():
                    continue
                if isinstance(f.dataType, T.ArrayType):
                    # unmapped element types (nested arrays, structs)
                    # skip the pin, same as the scalar path below
                    elem = _PA.get(type(f.dataType.elementType))
                    pa_type = pa.list_(elem) if elem is not None else None
                else:
                    pa_type = _PA.get(type(f.dataType))
                if pa_type is not None:
                    idx = pa_schema.get_field_index(f.name)
                    pa_schema = pa_schema.set(
                        idx, pa.field(f.name, pa_type)
                    )
            pdf.to_parquet(
                f"{root}/{name}.parquet", index=False, schema=pa_schema
            )


def read_fixture_parquet(spark: SparkSession, root: str) -> dict[str, DataFrame]:
    return {
        name: spark.read.schema(schema).parquet(f"{root}/{name}.parquet")
        for name, schema in SCHEMAS.items()
    }
