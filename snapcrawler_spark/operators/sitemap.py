"""Sitemap feeder (navigation_module.py:147-225 analog).

Parses sitemap XML bodies into frontier-candidate rows with priority —
all JVM-side regexp extraction, one posexplode. Feeding the frontier is
an engine capability switched by cfg.extra['sitemap_enabled'] (the
reference only probes sitemaps in its auto-navigation module; here the
parsed URLs become priority-0 candidates at depth 1, subject to the
same seen-set / robots gates as any other candidate).

Three entry points:

- ``parse_sitemaps``        — ``<urlset>`` entry rows (page URLs)
- ``resolve_sitemaps``      — follows ``<sitemapindex>`` → child
  ``<sitemap><loc>`` references (navigation_module.py:176-186), one
  join-back pass per level; real-world sitemap trees are ≤2 deep
- ``sitemaps_from_robots``  — ``Sitemap:`` lines in robots.txt bodies
  (navigation_module.py:211-225)
"""

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


def sitemap_index_children(sitemaps: DataFrame) -> DataFrame:
    """(sitemap_url, host, xml) → (host, sitemap_url) child references
    from ``<sitemapindex>`` documents (navigation_module.py:176-186);
    empty for plain urlset documents."""
    entries = F.regexp_extract_all(
        F.col("xml"), F.lit(r"<sitemap>(.*?)</sitemap>"), 1
    )
    return (
        sitemaps.where(F.col("xml").contains("<sitemapindex"))
        .select("host", F.explode(entries).alias("e"))
        .select(
            "host",
            F.regexp_extract("e", r"<loc>([^<]+)</loc>", 1).alias(
                "sitemap_url"
            ),
        )
        .where(F.col("sitemap_url") != "")
    )


def resolve_sitemaps(
    roots: DataFrame, corpus: DataFrame, max_depth: int = 2
) -> DataFrame:
    """roots(host, sitemap_url) × corpus(sitemap_url, host, xml) →
    urlset entry rows, following sitemap-index references.

    Each level is one equi-join back onto the corpus (in production:
    the fetch stage keyed by sitemap URL) followed by the urlset parse;
    ``max_depth`` bounds the recursion (the sitemap protocol nests
    indexes at most once in practice). No driver-side iteration over
    rows — the loop unrolls a fixed, small number of joins."""
    docs = roots.join(corpus, ["sitemap_url", "host"])
    out = parse_sitemaps(docs)
    for _ in range(max_depth - 1):
        kids = sitemap_index_children(docs).distinct()
        docs = kids.join(corpus, ["sitemap_url", "host"])
        out = out.unionByName(parse_sitemaps(docs))
    return out


def sitemaps_from_robots(robots: DataFrame) -> DataFrame:
    """robots(host, robots_txt) → (host, sitemap_url) from ``Sitemap:``
    lines (navigation_module.py:211-225: startswith check, split once
    on ':', strip)."""
    lines = robots.select(
        "host",
        F.explode(F.split(F.coalesce("robots_txt", F.lit("")), "\n")).alias(
            "line"
        ),
    ).select("host", F.trim("line").alias("line"))
    return lines.where(
        F.lower(F.col("line")).startswith("sitemap:")
    ).select(
        "host",
        F.trim(F.expr("substring(line, 9)")).alias("sitemap_url"),
    ).where(F.col("sitemap_url") != "")
