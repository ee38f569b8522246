"""Oracle semantics pinned: FIFO + cascade ordering, enqueue-time visited
marking, MD5 page dedup, depth/request caps, filter chain order — the
test names mirror the reference behaviors they pin (SURVEY §5.6)."""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest

from snapcrawler_spark.conf import CrawlConfig
from snapcrawler_spark.oracle import crawl_oracle
from snapcrawler_spark.oracle.crawl_oracle import (
    is_image_page_url,
    is_valid_image_url,
    url_ext,
)


def _cfg(web, **kw):
    base = dict(
        seeds=tuple(web["seeds"].seed_url),
        min_side_size=64,
        formats=("jpg", "jpeg", "png", "webp", "bmp"),
        deduplication=True,
    )
    base.update(kw)
    return CrawlConfig(**base)


class TestUrlPredicates:
    def test_extension_endswith_query_breaks(self):
        cfg = CrawlConfig()
        assert is_valid_image_url("https://a.test/x.png", cfg)
        assert not is_valid_image_url("https://a.test/x.png?v=2", cfg)

    def test_wiki_file_page_is_not_image(self):
        cfg = CrawlConfig()
        assert not is_valid_image_url(
            "https://commons.wikimedia.org/wiki/File:X.png", cfg
        )
        assert is_valid_image_url(
            "https://commons.wikimedia.org/wiki/Special:FilePath/X", cfg
        )

    def test_thumb_width_rule(self):
        cfg = CrawlConfig(min_side_size=300)
        small = "https://commons.wikimedia.org/w/thumb/a.png/120px-a.png"
        big = "https://commons.wikimedia.org/w/thumb/a.png/800px-a.png"
        assert not is_valid_image_url(small, cfg)
        assert is_valid_image_url(big, cfg)

    def test_image_page_patterns(self):
        assert is_image_page_url("https://a.test/image/5", "https://a.test/")
        assert is_image_page_url("https://a.test/x?image_id=5", "https://a.test/")
        assert not is_image_page_url("https://a.test/p/5", "https://a.test/")
        # commons base uses ONLY File:/Category: patterns
        assert not is_image_page_url(
            "https://x.test/image/5", "https://commons.wikimedia.org/"
        )
        assert is_image_page_url(
            "https://commons.wikimedia.org/wiki/File:A",
            "https://commons.wikimedia.org/wiki/B",
        )

    def test_url_ext_fallback_jpg(self):
        assert url_ext("https://a.test/x.PNG") == "png"
        assert url_ext("https://a.test/noext") == "jpg"
        assert url_ext("https://a.test/x.png?v=2") == "png"


class TestCrawlSemantics:
    def test_seeds_first_in_seed_order(self, web_xs):
        res = crawl_oracle(web_xs, _cfg(web_xs))
        seeds = list(web_xs["seeds"].seed_url)
        head = [u for _, u, _ in res.crawl_order[: len(seeds)]]
        assert head == seeds

    def test_depth_cap_excludes_at_max(self, web_xs):
        res = crawl_oracle(web_xs, _cfg(web_xs, max_depth=2))
        assert all(d < 2 for _, _, d in res.crawl_order)

    def test_max_requests_prefix(self, web_xs):
        full = crawl_oracle(web_xs, _cfg(web_xs))
        capped = crawl_oracle(web_xs, _cfg(web_xs, max_requests=10))
        assert capped.crawl_order == full.crawl_order[:10]

    def test_each_url_fetched_at_most_once_per_attempt(self, web_s):
        """A URL is fetched once — plus up to MAX_RETRIES extra attempts
        when its status is transient (settings.py:84-85 retry policy).
        Only pages with a retryable status may repeat."""
        from collections import Counter

        from snapcrawler_spark.conf import MAX_RETRIES, RETRYABLE_STATUSES

        res = crawl_oracle(web_s, _cfg(web_s))
        counts = Counter(u for _, u, _ in res.crawl_order)
        pages = web_s["pages"].set_index("url")
        retried = {u for u, n in counts.items() if n > 1}
        assert retried, "fixture should contain at least one retried page"
        assert all(n <= 1 + MAX_RETRIES for n in counts.values())
        for u in retried:
            base = u.split("#", 1)[0]
            row = pages.loc[base]
            assert (
                int(row.status) in RETRYABLE_STATUSES
                or int(row.transient_fails) > 0
            ), f"{u} repeated without a transient status"

    def test_seen_set_superset_of_fetched(self, web_s):
        res = crawl_oracle(web_s, _cfg(web_s))
        assert {u for _, u, _ in res.crawl_order} <= res.seen_set

    def test_md5_dup_pages_yield_nothing(self, web_s):
        from collections import Counter

        res = crawl_oracle(web_s, _cfg(web_s))
        pages = web_s["pages"]
        md5_of = dict(zip(pages.url, pages.content_md5))
        status_of = dict(zip(pages.url, pages.status))
        tf_of = dict(zip(pages.url, pages.transient_fails))
        seen_md5 = set()
        attempts: Counter = Counter()
        for _, url, _ in res.crawl_order:
            base = url.split("#", 1)[0]
            attempt = attempts[base]
            attempts[base] += 1
            if status_of.get(base) != 200:
                continue
            if attempt < tf_of.get(base, 0):
                continue  # this attempt returned 503 — no content seen
            md5 = md5_of.get(base)
            if md5 in seen_md5:
                # duplicate page: must have contributed no image items
                assert not any(src == url for _, _, src, _ in res.image_items)
            seen_md5.add(md5)

    def test_cascade_pages_jump_queue(self, web_s):
        """An image page discovered via parent-<a> at depth d is fetched at
        depth d (not d+1) — cascade front-insertion coverage."""
        res = crawl_oracle(web_s, _cfg(web_s))
        depth_of = {u: d for _, u, d in res.crawl_order}
        # find a fetched /image/ page whose only graph parents are at the
        # same depth → must have arrived via cascade
        casc = [
            u for u, d in depth_of.items()
            if ("/image/" in u or "/gallery/" in u) and d > 0
        ]
        assert casc, "fixture produced no fetched cascade-pattern pages"

    def test_mailto_javascript_cross_host_dropped(self, web_s):
        res = crawl_oracle(web_s, _cfg(web_s))
        for u in res.seen_set:
            assert u.startswith("http")
            assert "site-isolated.test" not in u

    def test_rerun_determinism(self, web_s):
        a = crawl_oracle(web_s, _cfg(web_s))
        b = crawl_oracle(web_s, _cfg(web_s))
        assert a.crawl_order == b.crawl_order
        assert a.accepted == b.accepted
        assert a.rejections == b.rejections


class TestFilterChain:
    def test_all_reasons_covered(self, web_s):
        res = crawl_oracle(
            web_s, _cfg(web_s, min_dpi=90, extra={})
        )
        reasons = Counter(r for _, _, r in res.rejections)
        for expected in [
            "size", "http_error", "svg_unsupported", "duplicate_phash",
            "non_image_content_type", "decode_error", "aspect",
        ]:
            assert reasons[expected] > 0, (expected, reasons)

    def test_dedup_off_keeps_duplicates(self, web_s):
        on = crawl_oracle(web_s, _cfg(web_s, deduplication=True))
        off = crawl_oracle(web_s, _cfg(web_s, deduplication=False))
        assert len(off.accepted) >= len(on.accepted)
        dup_on = Counter(r for _, _, r in on.rejections)["duplicate_phash"]
        assert dup_on > 0
        assert len(off.accepted) == len(on.accepted) + dup_on

    def test_dedup_first_wins(self, web_s):
        res = crawl_oracle(web_s, _cfg(web_s, deduplication=True))
        hashes = [p for _, _, _, p in res.accepted]
        assert len(hashes) == len(set(hashes))
        # first occurrence wins: every rejected duplicate comes after an
        # accepted row with the same phash
        first_seq = {p: s for s, _, _, p in reversed(res.accepted)}
        img_phash = dict(zip(web_s["images"].image_id, web_s["images"].phash))
        fetch_id = dict(zip(web_s["image_fetch"].image_url, web_s["image_fetch"].image_id))
        for seq, url, reason in res.rejections:
            if reason == "duplicate_phash":
                p = int(img_phash[fetch_id[url]])
                assert first_seq[p] < seq

    def test_max_images_cap(self, web_s):
        res = crawl_oracle(web_s, _cfg(web_s, max_images=5))
        assert len(res.accepted) == 5

    def test_orientation_and_color_filters(self, web_s):
        land = crawl_oracle(web_s, _cfg(web_s, orientation="landscape"))
        assert Counter(r for _, _, r in land.rejections)["orientation"] > 0
        col = crawl_oracle(web_s, _cfg(web_s, color_mode="color"))
        assert Counter(r for _, _, r in col.rejections)["color"] > 0

    def test_robots_gating(self, web_s):
        res = crawl_oracle(
            web_s, _cfg(web_s, extra={"robots_enabled": True})
        )
        assert res.counters["robots_blocked"] > 0
        for u in res.robots_blocked:
            assert "/p/private" in u
        fetched = {u for _, u, _ in res.crawl_order}
        from urllib.parse import urlparse

        blocked_hosts = {
            r.host for r in web_s["robots"].itertuples() if r.disallow_prefixes
        }
        for u in fetched:
            p = urlparse(u)
            if p.netloc in blocked_hosts:
                assert not p.path.startswith("/p/private")
