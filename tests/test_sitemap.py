"""Sitemap feeder: XML parsing, index recursion, robots.txt discovery."""

from __future__ import annotations

from pyspark.sql import functions as F

from snapcrawler_spark.io import fixture_to_spark
from snapcrawler_spark.operators.sitemap import (
    parse_sitemaps,
    resolve_sitemaps,
    sitemap_index_children,
    sitemaps_from_robots,
)


def test_parse_sitemaps(spark, web_s):
    tables = fixture_to_spark(spark, web_s)
    parsed = parse_sitemaps(tables["sitemaps"]).collect()
    assert len(parsed) > 5
    page_urls = set(web_s["pages"].url)
    for r in parsed:
        assert r.url in page_urls
        assert 0.0 < r.priority <= 1.0
        assert r.changefreq == "daily"
    hosts = {r.host for r in parsed}
    assert len(hosts) >= 2


def test_sitemaps_from_robots(spark, web_s):
    """Sitemap: lines in robots.txt bodies are discovered
    (navigation_module.py:211-225)."""
    tables = fixture_to_spark(spark, web_s)
    rows = sitemaps_from_robots(tables["robots"]).collect()
    advertised = {
        (r.host, s)
        for r in web_s["robots"].itertuples()
        for s in r.sitemap_urls
    }
    assert {(r.host, r.sitemap_url) for r in rows} == advertised
    # the index-rooted host (k % 8 == 0) advertises the INDEX
    assert any(r.sitemap_url.endswith("/sitemap_index.xml") for r in rows)


def test_sitemap_index_recursion(spark, web_s):
    """An index-rooted host whose robots advertises ONLY
    <sitemapindex> still yields page entries — via the child urlsets
    (navigation_module.py:176-186 one-join-back recursion)."""
    tables = fixture_to_spark(spark, web_s)
    roots = sitemaps_from_robots(tables["robots"])
    entries = resolve_sitemaps(roots, tables["sitemaps"]).collect()
    page_urls = set(web_s["pages"].url)
    assert all(r.url in page_urls for r in entries)

    idx_host = web_s["robots"].host[0]  # k=0 → index-rooted
    got_idx = [r for r in entries if r.host == idx_host]
    assert len(got_idx) > 0
    # both children contribute: resolve ≥ the first child alone, and
    # the union covers sitemap2.xml-only URLs
    c1 = {
        r.url
        for r in parse_sitemaps(
            tables["sitemaps"].where(
                F.col("sitemap_url") == f"https://{idx_host}/sitemap.xml"
            )
        ).collect()
    }
    c2 = {
        r.url
        for r in parse_sitemaps(
            tables["sitemaps"].where(
                F.col("sitemap_url") == f"https://{idx_host}/sitemap2.xml"
            )
        ).collect()
    }
    got_urls = {r.url for r in got_idx}
    assert got_urls == c1 | c2
    # the index document itself contributes its children, not pages
    kids = sitemap_index_children(tables["sitemaps"]).collect()
    assert {r.sitemap_url for r in kids if r.host == idx_host} == {
        f"https://{idx_host}/sitemap.xml",
        f"https://{idx_host}/sitemap2.xml",
    }


def test_sitemap_feeder_joins_wave_zero(spark, web_xs):
    """cfg.extra['sitemap_enabled']: resolved sitemap entries enter the
    wave-0 frontier as priority-0/depth-1 rows through the same
    seen-set probe — with unlimited budget they are all fetched in the
    first wave alongside the seeds."""
    from snapcrawler_spark.conf import CrawlConfig
    from snapcrawler_spark.plans.wave_crawl import WaveCrawl

    tables = fixture_to_spark(spark, web_xs)
    seeds = tuple(web_xs["seeds"].seed_url)
    entries = {
        r.url
        for r in resolve_sitemaps(
            sitemaps_from_robots(tables["robots"]), tables["sitemaps"]
        ).collect()
    }
    assert entries, "fixture must advertise at least one sitemap"
    extra_urls = entries - set(seeds)

    cfg_on = CrawlConfig(
        seeds=seeds, host_budget=0, extra={"sitemap_enabled": True}
    )
    wc = WaveCrawl(spark, tables, cfg_on, seen_kind="bloom")
    run = wc.run(max_waves=1)
    seen = {r.url for r in wc.seen.exact.select("url").collect()}
    assert extra_urls <= seen
    assert run["total_fetched"] == len(seeds) + len(extra_urls)

    cfg_off = CrawlConfig(seeds=seeds, host_budget=0)
    run_off = WaveCrawl(spark, tables, cfg_off, seen_kind="bloom").run(
        max_waves=1
    )
    assert run_off["total_fetched"] == len(seeds)
