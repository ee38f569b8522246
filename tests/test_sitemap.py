"""Sitemap feeder: XML parsing and frontier discovery value."""

from __future__ import annotations

from snapcrawler_spark.io import fixture_to_spark
from snapcrawler_spark.operators.sitemap import parse_sitemaps


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
