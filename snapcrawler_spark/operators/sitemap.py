"""Sitemap feeder (navigation_module.py:147-225 analog).

Parses sitemap XML bodies into frontier-candidate rows with priority —
all JVM-side regexp extraction, one posexplode. Feeding the frontier is
an engine capability switched by cfg.extra['sitemap_enabled'] (the
reference only probes sitemaps in its auto-navigation module; here the
parsed URLs become priority-0 candidates at depth 1, subject to the
same seen-set / robots gates as any other candidate)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_sitemaps(sitemaps: DataFrame) -> DataFrame:
    """(sitemap_url, host, xml) → (url, host, priority, changefreq)."""
    x = F.col("xml")
    entries = F.regexp_extract_all(
        x, F.lit(r"<url>(.*?)</url>"), 1
    )
    out = sitemaps.select(
        "sitemap_url", "host", F.explode(entries).alias("entry")
    )
    return out.select(
        "host",
        F.regexp_extract("entry", r"<loc>([^<]+)</loc>", 1).alias("url"),
        F.regexp_extract("entry", r"<priority>([^<]+)</priority>", 1)
        .cast("double")
        .alias("priority"),
        F.regexp_extract("entry", r"<changefreq>([^<]+)</changefreq>", 1).alias(
            "changefreq"
        ),
    ).where(F.col("url") != "")
