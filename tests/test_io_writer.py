"""Fixture parquet writer edge cases (io.py): all-None columns of any
schema-declared type must round-trip under the schema-pinned read
(ADVICE r4: the string-only pin left an asymmetric guard — an all-None
IntegerType column crashed astype('int32') before ever reaching the
pyarrow schema pin)."""

from __future__ import annotations

import pandas as pd

from snapcrawler_spark.io import SCHEMAS, write_fixture_parquet


def test_all_none_int_and_string_columns_roundtrip(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "url": ["https://a.test/1", "https://a.test/2"],
            "host": ["a.test", "a.test"],
            "status": [None, None],           # all-None IntegerType
            "html": [None, None],             # all-None StringType
            "content_md5": ["m1", "m2"],
            "transient_fails": [None, None],  # all-None IntegerType
        }
    )
    root = str(tmp_path / "fx")
    write_fixture_parquet({"pages": pdf}, root)
    got = spark.read.schema(SCHEMAS["pages"]).parquet(f"{root}/pages.parquet")
    rows = {r.url: r for r in got.collect()}
    assert len(rows) == 2
    assert rows["https://a.test/1"].status is None
    assert rows["https://a.test/1"].html is None
    assert rows["https://a.test/2"].transient_fails is None


def test_mixed_none_int_column_roundtrip(spark, tmp_path):
    """A partially-None int column keeps its non-null values exact."""
    pdf = pd.DataFrame(
        {
            "url": ["https://a.test/1", "https://a.test/2"],
            "host": ["a.test", "a.test"],
            "status": [200, None],
            "html": ["<html></html>", None],
            "content_md5": ["m1", "m2"],
            "transient_fails": [3, None],
        }
    )
    root = str(tmp_path / "fx2")
    write_fixture_parquet({"pages": pdf}, root)
    got = spark.read.schema(SCHEMAS["pages"]).parquet(f"{root}/pages.parquet")
    rows = {r.url: r for r in got.collect()}
    assert rows["https://a.test/1"].status == 200
    assert rows["https://a.test/1"].transient_fails == 3
    assert rows["https://a.test/2"].status is None
