"""Per-host politeness buckets, priority wave selection, skew salting.

The reference throttles with a global ``time.sleep(request_delay)``
(crawling_module.py:180-181) plus per-domain adaptive delays
(middlewares_advanced.py:348-422: success → delay×0.9 floored at base,
429/5xx → delay×backoff capped at max). In logical time that control
law becomes a **per-host fetch budget per wave**:

    budget(host, 0)    = base
    budget(host, w+1)  = min(base_max, budget·(1/backoff))  on errors
                         max(base,     budget·(1/0.9))      on success

(delay↓ ⇔ budget↑). Wave selection is then a rank window:

    row_number() OVER (PARTITION BY host ORDER BY priority, enq_seq)
        <= budget(host)

Hot-host skew (north rule): a single hot host makes that window's
partition a straggler; rows for hosts above ``hot_threshold`` pending
URLs get ``salt = pmod(xxhash64(url), S)`` and the window partitions on
(host, salt) with budget ÷ S per salt — S× parallelism for the skewed
key at the cost of approximate (per-salt) FIFO order, which is the
documented wave-mode tradeoff. AQE handles join-side skew; the *window*
salt must be explicit (SURVEY §4 custom-work item 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def select_wave(
    frontier: DataFrame,
    budgets: DataFrame | None = None,
    default_budget: int = 64,
    hot_threshold: int = 0,
    salt_buckets: int = 8,
) -> DataFrame:
    """frontier(url, host, depth, priority, enq_seq, ...) → rows selected
    for this wave, honoring per-host budgets with hot-host salting.

    ``budgets``: optional (host, budget) table; hosts absent fall back
    to default_budget. Returns the input columns + ``host_rank``.
    """
    df = frontier
    if hot_threshold > 0:
        # per-host tables are small at fixture scale but O(hosts) at
        # web scale (10^8 rows) — no forced broadcast hint; AQE picks
        # broadcast when the aggregated side is genuinely small and a
        # skew-handled shuffle join otherwise
        counts = df.groupBy("host").agg(F.count("*").alias("pending_n"))
        df = df.join(counts, "host")
        df = df.withColumn(
            "salt",
            F.when(
                F.col("pending_n") > hot_threshold,
                F.pmod(F.xxhash64("url"), F.lit(salt_buckets)),
            ).otherwise(F.lit(0)),
        )
        df = df.withColumn(
            "salt_div",
            F.when(F.col("pending_n") > hot_threshold, F.lit(salt_buckets)).otherwise(
                F.lit(1)
            ),
        ).drop("pending_n")
    else:
        df = df.withColumn("salt", F.lit(0)).withColumn("salt_div", F.lit(1))

    if budgets is not None:
        df = df.join(budgets, "host", "left").withColumn(
            "budget", F.coalesce("budget", F.lit(default_budget))
        )
    else:
        df = df.withColumn("budget", F.lit(default_budget))

    w = Window.partitionBy("host", "salt").orderBy("priority", "enq_seq")
    per_salt_budget = F.greatest(
        F.lit(1), F.ceil(F.col("budget") / F.col("salt_div"))
    )
    return (
        df.withColumn("host_rank", F.row_number().over(w))
        .where(F.col("host_rank") <= per_salt_budget)
        .drop("salt", "salt_div", "budget")
    )


def adapt_budgets(
    budgets: DataFrame,
    wave_status: DataFrame,
    base: int = 8,
    base_max: int = 256,
    backoff: float = 2.0,
    speedup: float = 1.0 / 0.9,
) -> DataFrame:
    """Budget recurrence from the previous wave's per-host status tally.

    wave_status: (host, n_ok, n_err) where n_err counts 429/5xx.
    Mirrors the adaptive-delay control law of middlewares_advanced.py:
    394-408 in budget space (delay ∝ 1/budget).
    """
    joined = budgets.join(wave_status, "host", "full").select(
        F.col("host"),
        F.coalesce("budget", F.lit(base)).alias("budget"),
        F.coalesce("n_ok", F.lit(0)).alias("n_ok"),
        F.coalesce("n_err", F.lit(0)).alias("n_err"),
    )
    new_budget = (
        F.when(
            F.col("n_err") > 0,
            F.greatest(F.lit(1), (F.col("budget") / backoff).cast("int")),
        )
        .when(
            F.col("n_ok") > 0,
            F.least(F.lit(base_max), F.ceil(F.col("budget") * speedup).cast("int")),
        )
        .otherwise(F.col("budget"))
    )
    return joined.select("host", new_budget.alias("budget"))
