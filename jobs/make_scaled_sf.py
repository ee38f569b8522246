"""Build a larger SF dir by shard-replicating an existing one.

Usage: python jobs/make_scaled_sf.py [src_sf_dir] [dst_dir] [shards]

Takes each fact table and writes `shards` copies with per-shard key
offsets (foreign keys shifted consistently: orders follow customer,
lineitem follows orders/part/supplier, events/documents/embeddings
shift their own ids). Dimension tables (region, nation) are shared
and copied as-is. Fully deterministic — no RNG.

Purpose (round 7): the driver's round-end measurement may run at a
larger, driver-generated SF; the session-local sf1.0 the in-round
numbers were validated on does not survive reboots. This produces a
reproducible at-scale stand-in for gatechecking (Spark vs DuckDB read
the SAME parquet, so oracle equivalence is meaningful on any data) and
for timing. Shard replication also makes every document/embedding an
exact N-way duplicate — deliberately the mass-duplication regime the
round-7 dedup collapses are built for.
"""

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> {column: offset_base_table}; offset units are per-table
SHIFTS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
SHARED = ["region", "nation"]


def _offset_unit(tbl: pa.Table, key_cols) -> int:
    m = 0
    for c in key_cols:
        m = max(m, pc.max(tbl[c]).as_py() or 0)
    unit = 1
    while unit <= m:
        unit *= 10
    return unit


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/sfx/sf1.0r"
    shards = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)

    for t in SHARED:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        pq.write_table(tbl, f"{dst}/{t}.parquet")
        print(f"{t}: shared, {tbl.num_rows} rows")

    # one offset unit per base table, derived from ITS OWN key columns
    units: dict[str, int] = {}
    for t, cols in SHIFTS.items():
        own = [c for c, base in cols.items() if base == t]
        if own:
            tbl = pq.read_table(f"{src}/{t}.parquet", columns=own)
            units[t] = _offset_unit(tbl, own)
    print("offset units:", units)

    for t, cols in SHIFTS.items():
        tbl = pq.read_table(f"{src}/{t}.parquet")
        parts = []
        for i in range(shards):
            sh = tbl
            for c, base in cols.items():
                if i:
                    shifted = pc.add(
                        sh[c], pa.scalar(i * units[base], type=sh[c].type)
                    )
                    sh = sh.set_column(
                        sh.schema.get_field_index(c), sh.field(c), shifted
                    )
            parts.append(sh)
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(f"{t}: {tbl.num_rows} -> {out.num_rows} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
