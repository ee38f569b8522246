"""SparkSession factory.

Local-mode defaults are tuned for the sandbox (single JVM, 32 cores,
128 GiB); every knob that matters at cluster scale is set explicitly so
the same builder works under ``spark-submit --py-files`` on a real
multi-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "snapcrawler_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores=None`` uses ``local[*]``; pass an int to pin parallelism
    (the bench uses 8 vs 32 to evidence N→4N scaling efficiency).
    """
    cores_str = "*" if cores is None else str(cores)
    sp = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.master(f"local[{cores_str}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # image payloads are large; keep Arrow batches bounded so a batch of
        # decoded pixels fits comfortably in executor memory at 100 TB scale
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # NOTE (round 7): spark.cleaner.periodicGC.interval=2min was
        # trialled to reclaim out-of-scope checkpoint blocks sooner and
        # REVERTED on measurement — each forced GC floods the
        # ContextCleaner with a session's worth of accumulated
        # references whose (blocking) cleanup RPCs stall the driver
        # mid-crawl: the second same-session crawl degraded 113 s →
        # 187-289 s across three runs with it on, and recovered with
        # the 30 min default. Keep the default. The drag the trial
        # aimed at is instead solved deterministically BETWEEN crawls
        # by plans.wave_crawl._reclaim_stale_session_state (which also
        # explains why a JVM-only GC cannot work: the Python-side
        # cycles must be collected first or py4j keeps the bindings).
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
