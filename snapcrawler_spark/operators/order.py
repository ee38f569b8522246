"""Distributed order keys without single-partition windows.

``Window.orderBy(...)`` with no partitionBy moves every row to one
partition — fine at fixture scale, a straggler at 10^10 rows. The
replacement is the classic zipWithIndex construction, expressed on
DataFrames:

1. range-repartition on the order columns (partition p holds a
   contiguous key range, ranges ascend with p);
2. count rows per partition — a tiny (P-row) collect;
3. prefix-sum the counts on the driver into per-partition offsets;
4. rank within each partition (a *partitioned* window) + offset.

The resulting key is the global dense 1-based rank over the order
columns — identical to ``row_number() OVER (ORDER BY ...)`` — and is
deterministic even though range-boundary sampling is not: any split of
the sorted order into consecutive ranges yields the same dense rank.
Requires the order columns to form a unique key (ties would make the
within-partition rank nondeterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_order_key(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "seq",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = dense global 1-based rank by ``order_cols``.

    One extra small job (per-partition counts, P rows collected);
    everything else stays partition-parallel. Replaces the reference's
    driver-side item counter (crawling_module.py:132-136 sequential
    enumeration) for the wave path.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    parts = df.repartitionByRange(num_partitions, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    # pin partition placement: spark_partition_id is only stable against
    # recomputation once the blocks are materialized
    parts = parts.localCheckpoint()
    counts = {
        r["__pid"]: r["n"]
        for r in parts.groupBy("__pid").agg(F.count("*").alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if not offsets:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    omap = F.create_map(
        *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        parts.withColumn(
            out_col,
            (omap[F.col("__pid")] + F.row_number().over(w)).cast("long"),
        )
        .drop("__pid")
    )
