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


def prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "prefix",
    exclusive: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = global running sum of ``value_col`` by
    ``order_cols`` — same zipWithIndex-style construction as
    ``dense_order_key`` (range-repartition, per-partition value totals
    collected as P rows, driver prefix-sums the offsets, partitioned
    window adds the within-partition running sum), so no
    single-partition window at any scale.

    ``exclusive=True`` yields the sum of all STRICTLY-PRECEDING rows
    (0 for the first row) — the form shard packing wants: a row's shard
    is decided by the tokens before it, so every shard's first row
    starts exactly at a budget boundary. Requires ``order_cols`` to be
    a unique key, like ``dense_order_key``.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    parts = df.repartitionByRange(num_partitions, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    parts = parts.localCheckpoint()
    totals = {
        r["__pid"]: r["t"]
        for r in parts.groupBy("__pid")
        .agg(F.sum(value_col).cast("long").alias("t"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid] or 0
    if not offsets:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    omap = F.create_map(
        *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
    )
    end = -1 if exclusive else 0
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    running = F.coalesce(
        F.sum(F.col(value_col).cast("long")).over(w), F.lit(0)
    )
    return parts.withColumn(
        out_col, (omap[F.col("__pid")] + running).cast("long")
    ).drop("__pid")
