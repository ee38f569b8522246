"""Streaming frontier building blocks.

- ``candidate_stream``: file-source stream of discovered URLs
  (the queue boundary at parallel_manager.py:48-49 becomes a stream).
- ``dedup_candidates``: watermarked event-time URL dedup —
  ``dropDuplicates`` with state eviction under the watermark (the
  streaming analog of the URL-seen set for in-flight windows; the
  durable cross-run set stays in operators/seen.py).
- ``per_host_window_counts``: tumbling-window per-host fetch counts
  (politeness metrics; late data handled by the watermark).
- ``host_budget_stateful``: applyInPandasWithState carrying the
  adaptive per-host budget across micro-batches — the control law of
  middlewares_advanced.py:394-408 in streaming state.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CANDIDATE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("status", T.IntegerType(), True),
    ]
)

BUDGET_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("budget", T.IntegerType(), False),
        T.StructField("n_ok", T.LongType(), False),
        T.StructField("n_err", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("budget", T.IntegerType(), False)])


def candidate_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(CANDIDATE_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .json(path)
    )


def dedup_candidates(stream: DataFrame, watermark: str = "30 seconds") -> DataFrame:
    return stream.withWatermark("ts", watermark).dropDuplicates(["url"])


def per_host_window_counts(
    stream: DataFrame, window: str = "10 seconds", watermark: str = "30 seconds"
) -> DataFrame:
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "host")
        .agg(F.count("*").alias("n_fetches"))
        .select(F.col("w.start").alias("win_start"), "host", "n_fetches")
    )


def host_budget_stateful(
    stream: DataFrame,
    base: int = 8,
    base_max: int = 256,
    backoff: float = 2.0,
) -> DataFrame:
    """Adaptive per-host budget as custom streaming state.

    Per micro-batch and host: errors (status 429/5xx) halve the budget,
    pure-success batches grow it ×1/0.9 — identical recurrence to
    operators/politeness.adapt_budgets, but carried in GroupState."""

    def fn(key, pdfs, state: GroupState):
        n_ok = 0
        n_err = 0
        for pdf in pdfs:
            st = pdf["status"].fillna(200)
            err = ((st == 429) | (st >= 500)).sum()
            n_err += int(err)
            n_ok += int(len(pdf) - err)
        if state.exists:
            (budget,) = state.get
        else:
            budget = base
        if n_err > 0:
            budget = max(1, int(budget / backoff))
        elif n_ok > 0:
            import math

            budget = min(base_max, math.ceil(budget / 0.9))
        state.update((budget,))
        yield pd.DataFrame(
            [(key[0], budget, n_ok, n_err)],
            columns=["host", "budget", "n_ok", "n_err"],
        )

    return stream.groupBy("host").applyInPandasWithState(
        fn,
        outputStructType=BUDGET_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
