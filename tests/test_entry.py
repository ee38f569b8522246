"""Replicates the driver's correctness gate locally: every queries()
entry runs on Spark AND its oracle_sql() on DuckDB over the same
parquet; results must match after column-name sort + row sort
(value-level, not just counts)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


QUERY_NAMES = sorted(entry_mod.queries().keys())


# ops whose semantics are not SQL-expressible (iterative algorithms);
# each must carry its own pytest correctness hook. Empty since round 3:
# ann_ivf's fixed-point unrolled-Lloyd oracle made the last one exact.
ROWS_ONLY: set[str] = set()


def test_every_query_has_an_oracle():
    q = set(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    assert o <= q, f"oracle without query: {o - q}"
    missing = q - o
    assert missing == ROWS_ONLY, (
        f"add oracles (or justify rows-only): {missing ^ ROWS_ONLY}"
    )


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    qfn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    sdf = qfn(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    if sql is None:
        assert len(srows) >= 0
        return
    rel = duck.sql(sql)
    dcols = rel.columns
    drows = rel.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch"
    s_norm = _norm_rows(scols, [tuple(r) for r in srows])
    d_norm = _norm_rows(dcols, drows)
    assert len(s_norm[1]) == len(d_norm[1]), (
        f"{name}: row count {len(s_norm[1])} vs {len(d_norm[1])}"
    )
    if s_norm != d_norm:
        diffs = [
            (a, b) for a, b in zip(s_norm[1], d_norm[1]) if a != b
        ][:3]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "count_order"}


def test_fixture_parquet_roundtrip_allnull_html(spark, tmp_path):
    """Table-backend scales drop html (all-None column): the writer must
    pin it to parquet string, or the schema-pinned read fails with
    PARQUET_COLUMN_DATA_TYPE_MISMATCH (hit at scale l in round 4)."""
    from snapcrawler_spark.fixtures import load_fixture
    from snapcrawler_spark.io import read_fixture_parquet, write_fixture_parquet

    web = load_fixture(42, "xs")
    web = dict(web)
    pages = web["pages"].copy()
    pages["html"] = None
    web["pages"] = pages
    root = str(tmp_path / "webnull")
    write_fixture_parquet(web, root)
    tables = read_fixture_parquet(spark, root)
    got = tables["pages"].select("url", "html").limit(5).collect()
    assert all(r.html is None for r in got)
