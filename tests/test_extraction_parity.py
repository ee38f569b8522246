"""Round-4 extraction-parity pins (VERDICT r3 next-round #6-8 + ext set).

Each case builds a tiny synthetic page and runs the html regexp backend
directly, asserting the exact reference semantics:

- per-<img>-tag src fallback chain (crawling_module.py:271):
  ``img.get('src') or img.get('data-src') or img.get('data-lazy-src')``
  — one URL per tag, losers NOT extracted;
- <picture><source srcset>/<source data-srcset> (image_spider.py:283-316);
- standalone lazy attrs data-original/-lazy/-image/-thumb/-full-src
  (image_spider.py:264-272);
- relative + single-quoted JS image URLs (image_spider.py:199-206);
- extended modern extension set (image_spider.py:326-337).

The xs fixture seeds the same shapes (channels img_lazysrc /
picture_srcset / lazy_attr / ajax_rel / modern-ext img_src), so the
full-crawl html≡tables≡oracle equivalence in test_crawl_equivalence.py
exercises them end-to-end; the coverage tests here pin that the fixture
actually contains them.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snapcrawler_spark.conf import CrawlConfig
from snapcrawler_spark.operators.extract import (
    extract_from_html,
    valid_image_url_col,
)

BASE = "https://site0.test/p/1"
HOSTS = ["site0.test"]


def _extract(spark, html: str) -> list[str]:
    cfg = CrawlConfig(seeds=(f"https://{HOSTS[0]}/",))
    df = spark.createDataFrame([(BASE, html)], "url string, html string")
    row = extract_from_html(df, cfg, HOSTS).collect()[0]
    return sorted(row.images)


class TestImgTagFallbackChain:
    def test_src_beats_data_src(self, spark):
        html = ('<img src="https://site0.test/a.jpg" '
                'data-src="https://site0.test/b.jpg"/>')
        assert _extract(spark, html) == ["https://site0.test/a.jpg"]

    def test_data_src_beats_data_lazy_src(self, spark):
        html = ('<img data-src="https://site0.test/c.png" '
                'data-lazy-src="https://site0.test/d.png"/>')
        assert _extract(spark, html) == ["https://site0.test/c.png"]

    def test_data_lazy_src_alone_is_extracted(self, spark):
        html = '<img data-lazy-src="https://site0.test/e.webp"/>'
        assert _extract(spark, html) == ["https://site0.test/e.webp"]

    def test_two_tags_yield_two_urls(self, spark):
        html = ('<img src="https://site0.test/a.jpg"/>'
                '<img data-src="https://site0.test/b.jpg"/>')
        assert _extract(spark, html) == [
            "https://site0.test/a.jpg", "https://site0.test/b.jpg"
        ]


class TestPictureAndLazyAttrs:
    def test_picture_source_srcset(self, spark):
        html = ('<picture><source srcset="/p1.jpg 1x, /p2.jpg 2x"/>'
                '<source data-srcset="/p3.png 1x"/>'
                '<img src="/pf.jpg"/></picture>')
        assert _extract(spark, html) == [
            "https://site0.test/p1.jpg", "https://site0.test/p2.jpg",
            "https://site0.test/p3.png", "https://site0.test/pf.jpg",
        ]

    @pytest.mark.parametrize(
        "attr", ["data-original", "data-lazy", "data-image",
                 "data-thumb", "data-full-src"]
    )
    def test_standalone_lazy_attr(self, spark, attr):
        html = f'<div {attr}="https://site0.test/lz.gif">z</div>'
        assert _extract(spark, html) == ["https://site0.test/lz.gif"]

    def test_data_lazy_does_not_eat_data_lazy_src(self, spark):
        # data-lazy-src is a per-<img> fallback member, not a standalone
        # attr: on a DIV (no <img> tag) it must extract nothing, and the
        # data-lazy standalone pattern must not partially match it
        html = '<div data-lazy-src="https://site0.test/x.jpg">z</div>'
        assert _extract(spark, html) == []


class TestJsSweep:
    def test_single_quoted_relative_path(self, spark):
        html = "<script>var p = '/img/x.jpg'; preload(p);</script>"
        assert _extract(spark, html) == ["https://site0.test/img/x.jpg"]

    def test_double_quoted_relative_path(self, spark):
        html = '<script>load("assets/pics/y.png");</script>'
        # urljoin against https://site0.test/p/1 → /p/assets/pics/y.png
        assert _extract(spark, html) == [
            "https://site0.test/p/assets/pics/y.png"
        ]

    def test_string_without_slash_not_swept(self, spark):
        html = "<script>var n = 'x.jpg';</script>"
        assert _extract(spark, html) == []


class TestMultilineScripts:
    """(?s) in the script-body regexes (ADVICE r4, medium): Java regex
    '.' stops at line terminators, so multi-line <script> blocks — the
    common real-world case — were silently skipped by the ajax sweep,
    the JS sweep and the JSON-LD channel. The reference matches across
    newlines (it regexes the full response text)."""

    def test_multiline_ajax_sweep(self, spark):
        html = (
            "<script>\nvar g = {\n"
            '  "gallery": ["https://site0.test/ml.jpg"],\n'
            '  "page": 1\n};\n</script>'
        )
        assert _extract(spark, html) == ["https://site0.test/ml.jpg"]

    def test_multiline_js_sweep_relative(self, spark):
        html = "<script>\nvar p = '/x/ml2.png';\npreload(p);\n</script>"
        assert _extract(spark, html) == ["https://site0.test/x/ml2.png"]

    def test_multiline_jsonld(self, spark):
        html = (
            '<script type="application/ld+json">\n'
            '{"@type": "ImageObject",\n'
            ' "content": {"url": "https://site0.test/ml3.png"}}\n'
            "</script>"
        )
        assert _extract(spark, html) == ["https://site0.test/ml3.png"]

    def test_two_scripts_do_not_bleed(self, spark):
        """Non-greedy body match must still stop at the FIRST
        </script> even in DOTALL mode — text between two script blocks
        is not swept."""
        html = (
            "<script>\nvar a = 1;\n</script>"
            '<p>"https://site0.test/not-in-script.jpg"</p>'
            "<script>\nvar b = 2;\n</script>"
        )
        assert _extract(spark, html) == []


class TestExtendedExtensions:
    @pytest.mark.parametrize(
        "ext", ["avif", "heic", "heif", "jxl", "tif", "cur", "avifs", "webp2"]
    )
    def test_modern_ext_passes_url_predicate(self, spark, ext):
        cfg = CrawlConfig(seeds=("https://site0.test/",))
        df = spark.createDataFrame(
            [(f"https://site0.test/x.{ext}",)], "url string"
        ).select(valid_image_url_col(F.col("url"), cfg).alias("ok"))
        assert df.collect()[0].ok is True

    def test_non_image_ext_still_rejected(self, spark):
        cfg = CrawlConfig(seeds=("https://site0.test/",))
        df = spark.createDataFrame(
            [("https://site0.test/x.css",), ("https://site0.test/x.webm",)],
            "url string",
        ).select(valid_image_url_col(F.col("url"), cfg).alias("ok"))
        assert [r.ok for r in df.collect()] == [False, False]


class TestFixtureCoverage:
    """The xs fixture must seed every new shape so the end-to-end
    html≡tables≡oracle equivalence is non-vacuous on them."""

    @pytest.mark.parametrize(
        "channel", ["img_lazysrc", "picture_srcset", "lazy_attr", "ajax_rel"]
    )
    def test_channel_present(self, web_xs, channel):
        items = web_xs["page_items"]
        assert (items.channel == channel).any(), f"no {channel} rows in xs"

    def test_fallback_loser_is_not_a_row(self, web_xs):
        # conflicting-attr tags exist and their losing URL is absent
        items = web_xs["page_items"]
        urls = set(items.url)
        assert any("/x4/fbwin_" in u for u in urls)
        assert not any("/x4/fblose_" in u or "/x4/fbdl_" in u for u in urls)

    def test_modern_ext_row_present(self, web_xs):
        assert any("/x4/modern_" in u for u in web_xs["page_items"].url)


class TestQuoteStyles:
    """BeautifulSoup parses either quote style; the regexp backend must
    too (the fixture emits double quotes, so html≡tables equivalence is
    unaffected by accepting both)."""

    def test_single_quoted_img_src(self, spark):
        html = "<img src='https://site0.test/sq.jpg'/>"
        assert _extract(spark, html) == ["https://site0.test/sq.jpg"]

    def test_single_quoted_fallback_chain(self, spark):
        html = ("<img src='https://site0.test/sa.jpg' "
                "data-src='https://site0.test/sb.jpg'/>")
        assert _extract(spark, html) == ["https://site0.test/sa.jpg"]

    def test_single_quoted_lazy_attr_and_srcset(self, spark):
        html = ("<div data-original='https://site0.test/so.png'>z</div>"
                "<picture><source srcset='/sp.jpg 1x'/></picture>")
        assert _extract(spark, html) == [
            "https://site0.test/so.png", "https://site0.test/sp.jpg"
        ]
