"""Driver-faithful gate check: run queries() on Spark and oracle_sql()
on DuckDB over the same sf dir, fetch BOTH through pandas, and compare
values the strict way the driver's value-hash does (dtype-sensitive:
DuckDB HUGEINT -> float64 vs Spark BIGINT -> int64 is a FAIL here even
though values print the same).

Usage: python jobs/gatecheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod  # noqa: E402
from snapcrawler_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cell_key(v):
    # the driver hashes stringified values; float64(3.0) renders "3.0",
    # int64(3) renders "3" -> mismatch. repr() captures that.
    return repr(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or sorted(entry_mod.queries().keys())
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracles = entry_mod.oracle_sql()
    qs = entry_mod.queries()
    n_bad = 0
    for name in names:
        sdf = qs[name](spark, sf_dir).toPandas()
        sql = oracles.get(name)
        if sql is None:
            print(f"{name}: rows-only ({len(sdf)} rows)")
            continue
        ddf = con.sql(sql).df()
        s, d = norm(sdf), norm(ddf)
        ok_rows = len(s) == len(d)
        ok_cols = list(s.columns) == list(d.columns)
        ok_hash = ok_rows and ok_cols
        if ok_hash:
            for c in s.columns:
                sv = [cell_key(v) for v in s[c].tolist()]
                dv = [cell_key(v) for v in d[c].tolist()]
                if sv != dv:
                    ok_hash = False
                    bad = next(
                        (i, a, b) for i, (a, b) in enumerate(zip(sv, dv)) if a != b
                    )
                    print(
                        f"  {name}.{c}: first diff row {bad[0]}: "
                        f"spark={bad[1]} oracle={bad[2]} "
                        f"(dtypes {s[c].dtype} vs {d[c].dtype})"
                    )
        status = "OK " if ok_hash else "BAD"
        if not ok_hash:
            n_bad += 1
        print(
            f"{status} {name}: rows {len(s)}/{len(d)} "
            f"cols={'ok' if ok_cols else list(s.columns) + list(d.columns)}"
        )
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
