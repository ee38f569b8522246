from pyspark.sql import DataFrame, SparkSession

from snapcrawler_spark.conf import CrawlConfig
from snapcrawler_spark.plans.crawl import CrawlEngine  # noqa: F401
from snapcrawler_spark.plans.wave_crawl import WaveCrawl  # noqa: F401


def crawl(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    cfg: CrawlConfig,
    **kw,
) -> dict:
    """Run a crawl in the mode selected by ``cfg.ordering``.

    - ``wave`` (default): fully relational frontier — the scale path.
    - ``strict``: driver-replay of the reference's exact FIFO/cascade
      order (plans/crawl.py) — the bit-exactness parity mode.
    """
    if cfg.ordering == "strict":
        return CrawlEngine(spark, tables, cfg, **kw).run()
    return WaveCrawl(spark, tables, cfg, **kw).run()
