"""Navigation pattern detection/caps, CAPTCHA gate, fetch-tally lineage,
adaptive politeness in the live crawl loop, and the shingle-frequency
skew cap."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from snapcrawler_spark.conf import CrawlConfig
from snapcrawler_spark.io import fixture_to_spark
from snapcrawler_spark.operators.navigation import (
    MAX_ML_LINKS,
    MAX_PAGINATION_LINKS,
    MAX_PATTERNS_PER_PAGE,
    MAX_REQUESTS_PER_PAGE,
    detect_patterns,
    navigation_requests,
)
from snapcrawler_spark.oracle import crawl_oracle
from snapcrawler_spark.plans import CrawlEngine
from snapcrawler_spark.plans.wave_crawl import WaveCrawl


# ---------------------------------------------------------------------------
# navigation (navigation_module.py:99-145, 375-415)
# ---------------------------------------------------------------------------

_PAGINATED_HTML = (
    '<html><body><nav aria-label="pagination" class="pagination pager">'
    + "".join(f'<a href="/list?page={i}">{i}</a>' for i in range(1, 12))
    + '<a rel="next" href="/list?page=2">Next</a>'
    + '<a href="/list/page/3">&gt;</a>'
    + '<a href="/list?start=40">more</a></nav>'
    + "".join(f'<a href="/gallery/photos/{i}.jpg">g{i}</a>' for i in range(15))
    + "</body></html>"
)
_PLAIN_HTML = '<html><body><a href="/about">about</a></body></html>'


@pytest.fixture(scope="module")
def nav_tables(spark):
    pages = spark.createDataFrame(
        [
            ("https://n.test/list", _PAGINATED_HTML),
            ("https://n.test/plain", _PLAIN_HTML),
        ],
        "url string, html string",
    )
    link_rows = []
    for i in range(1, 12):
        link_rows.append(("https://n.test/list", i, f"https://n.test/list?page={i}"))
    link_rows.append(("https://n.test/list", 50, "https://n.test/list/page/3"))
    link_rows.append(("https://n.test/list", 51, "https://n.test/list?start=40"))
    for i in range(15):
        link_rows.append(
            ("https://n.test/list", 100 + i, f"https://n.test/gallery/photos/{i}.jpg")
        )
    link_rows.append(("https://n.test/plain", 0, "https://n.test/about"))
    links = spark.createDataFrame(
        link_rows, "src_url string, link_idx int, dst_url string"
    )
    return pages, links


class TestNavigation:
    def test_detects_pagination_with_confidence(self, nav_tables):
        pages, _ = nav_tables
        det = detect_patterns(pages).collect()
        by_url = {}
        for r in det:
            by_url.setdefault(r.url, []).append(r)
        hits = by_url.get("https://n.test/list", [])
        assert any(r.pattern_type == "pagination" for r in hits)
        assert all(r.confidence_e4 > 5000 for r in hits)
        # plain page: nothing above threshold
        assert "https://n.test/plain" not in by_url

    def test_top2_pattern_cap(self, nav_tables):
        pages, _ = nav_tables
        det = detect_patterns(pages)
        counts = det.groupBy("url").count().collect()
        assert all(r["count"] <= MAX_PATTERNS_PER_PAGE for r in counts)

    def test_request_caps(self, nav_tables):
        pages, links = nav_tables
        reqs = navigation_requests(pages, links).collect()
        per_page = {}
        for r in reqs:
            per_page.setdefault(r.src_url, []).append(r)
        lst = per_page["https://n.test/list"]
        pag = [r for r in lst if r.source == "pagination"]
        ml = [r for r in lst if r.source == "ml"]
        # 11 page= links exist; cap keeps ≤5 per (page, pattern) — the
        # page may carry ≤2 patterns, so ≤10 pagination requests total
        assert 1 <= len(pag) <= MAX_PAGINATION_LINKS * MAX_PATTERNS_PER_PAGE
        # 15 gallery/photo links qualify (class+indicator); ≤10 kept
        assert 1 <= len(ml) <= MAX_ML_LINKS
        assert len(lst) <= MAX_REQUESTS_PER_PAGE
        # dedup: no URL twice per page
        urls = [r.request_url for r in lst]
        assert len(urls) == len(set(urls))

    def test_deterministic(self, nav_tables):
        pages, links = nav_tables
        a = sorted(map(tuple, navigation_requests(pages, links).collect()))
        b = sorted(map(tuple, navigation_requests(pages, links).collect()))
        assert a == b

    def test_anchor_text_term_flips_relevance(self, spark):
        """The +0.4 anchor-text term (navigation_module.py:302-308): a
        URL with no signal of its own qualifies through its text —
        text family hit (+0.4) + image indicator in text (+0.3) = 0.7
        > 0.5 — while a neutral-text sibling does not."""
        pages = spark.createDataFrame(
            [("https://n.test/list2", _PAGINATED_HTML)],
            "url string, html string",
        )
        links = spark.createDataFrame(
            [
                ("https://n.test/list2", 0, "https://n.test/x/1",
                 "Photo gallery"),
                ("https://n.test/list2", 1, "https://n.test/x/2",
                 "click here"),
            ],
            "src_url string, link_idx int, dst_url string, "
            "anchor_text string",
        )
        reqs = navigation_requests(pages, links).collect()
        ml = {r.request_url for r in reqs if r.source == "ml"}
        assert "https://n.test/x/1" in ml
        assert "https://n.test/x/2" not in ml

    def test_fixture_links_carry_anchor_text(self, spark, web_xs):
        links = web_xs["links"]
        assert "anchor_text" in links.columns
        texts = set(links.anchor_text)
        assert any(t in texts for t in ("Gallery", "More images"))


# ---------------------------------------------------------------------------
# CAPTCHA gate (middlewares.py:109-157)
# ---------------------------------------------------------------------------

def _cfg(web, **kw):
    base = dict(
        seeds=tuple(web["seeds"].seed_url),
        min_side_size=64,
        formats=("jpg", "jpeg", "png", "webp", "bmp"),
        deduplication=True,
        host_budget=0,
    )
    base.update(kw)
    return CrawlConfig(**base)


class TestCaptcha:
    def test_captcha_page_dropped_engine_equals_oracle(self, spark, web_xs):
        """A 200 page whose body carries a CAPTCHA marker is dropped
        (no extraction, no retry) identically in oracle and engine."""
        import hashlib

        web = dict(web_xs)
        pages = web_xs["pages"].copy()
        # pick a deterministic 200-status page that is actually fetched
        # and has unique content (not a dup twin)
        md5_counts = pages.content_md5.value_counts()
        cand = pages[
            (pages.status == 200)
            & (pages.transient_fails == 0)
            & pages.content_md5.map(lambda m: md5_counts[m] == 1)
            & pages.url.str.contains("/p/")
        ]
        assert len(cand) > 0
        idx = cand.index[0]
        url = pages.at[idx, "url"]
        new_html = (pages.at[idx, "html"] or "") + "<!-- robot check -->"
        pages.at[idx, "html"] = new_html
        pages.at[idx, "content_md5"] = hashlib.md5(
            new_html.encode()
        ).hexdigest()
        web["pages"] = pages

        cfg = _cfg(web)
        oracle = crawl_oracle(web, cfg)
        run = CrawlEngine(spark, fixture_to_spark(spark, web), cfg).run()
        if url in oracle.seen_set:  # page reachable in this fixture
            assert url in oracle.captcha_blocked
            assert url in run["captcha_blocked"]
        # full equivalence still holds with the captcha page present
        got_order = [
            (r.fetch_seq, r.url, r.depth)
            for r in run["crawl_order"].orderBy("fetch_seq").collect()
        ]
        assert got_order == oracle.crawl_order
        assert run["seen_set"] == oracle.seen_set
        assert sorted(run["captcha_blocked"]) == sorted(oracle.captcha_blocked)


# ---------------------------------------------------------------------------
# fetch tally + adaptive politeness (wave mode)
# ---------------------------------------------------------------------------

def _wcfg(web, **kw):
    base = dict(
        seeds=tuple(web["seeds"].seed_url),
        min_side_size=64,
        formats=("jpg", "jpeg", "png", "webp", "bmp"),
        deduplication=False,
        host_budget=0,
    )
    base.update(kw)
    return CrawlConfig(**base)


class TestWaveLineageAndAdaptive:
    def test_fetch_tally_accounts_for_every_fetch(self, spark, web_xs):
        cfg = _wcfg(web_xs)
        wc = WaveCrawl(
            spark, fixture_to_spark(spark, web_xs), cfg, seen_kind="exact"
        )
        run = wc.run()
        tally = run["fetch_tally"]
        total = tally.agg(F.sum("n")).collect()[0][0]
        assert total == run["total_fetched"]
        outcomes = {r.outcome for r in tally.select("outcome").distinct().collect()}
        assert "ok" in outcomes
        # the fixture has 429/503 pages → transient outcomes must appear
        assert "transient" in outcomes

    def test_derived_stats_consistent(self, spark, web_xs):
        cfg = _wcfg(web_xs)
        wc = WaveCrawl(
            spark, fixture_to_spark(spark, web_xs), cfg, seen_kind="exact"
        )
        run = wc.run()
        s = wc.stats()
        assert s["fetched"] == run["total_fetched"]
        assert s["new_urls"] <= s["candidates"]
        assert 0 <= s["dedup_rate_e4"] <= 10000
        assert 0 < s["ok_rate_e4"] <= 10000
        assert s["items"] > 0

    def test_adaptive_budgets_follow_control_law(self, spark, web_xs):
        base = 3
        cfg = _wcfg(
            web_xs,
            host_budget=base,
            extra={"adaptive_politeness": True, "budget_backoff": 2.0},
        )
        wc = WaveCrawl(
            spark, fixture_to_spark(spark, web_xs), cfg, seen_kind="exact"
        )
        wc.run()
        hist = wc.budget_history
        assert hist, "adaptive run must record budget history"
        cap = 8 * base
        assert all(1 <= b <= cap for w in hist for b in w.values())
        # healthy hosts accelerate above base (×1/0.9 per ok wave)
        assert any(b > base for w in hist for b in w.values())
        # every transition obeys the control law: ÷backoff on errors,
        # ×1/0.9 (capped) on success, unchanged when idle
        for wv in range(1, len(hist)):
            for h, b in hist[wv].items():
                prev = hist[wv - 1].get(h, base)
                legal = {
                    max(1, int(prev / 2.0)),
                    min(cap, math.ceil(prev / 0.9)),
                    prev,
                }
                assert b in legal, (h, wv, prev, b)
        # the erroring-host path: some host must have been backed off
        # below base at least once (the fixture has 429/503/transient
        # pages on every host tier)
        assert any(b < base for w in hist for b in w.values())

    def test_crawl_delay_seeds_initial_budgets(self, spark, web_xs):
        """cfg.extra['respect_crawl_delay']: robots crawl_delay seeds
        the per-host budget (budget = ceil(host_budget / delay), min 1)
        so slow-delay hosts fetch fewer URLs per wave from wave 0."""
        import math as _m

        base = 6
        cfg = _wcfg(
            web_xs, host_budget=base, extra={"respect_crawl_delay": True}
        )
        wc = WaveCrawl(
            spark, fixture_to_spark(spark, web_xs), cfg, seen_kind="exact"
        )
        run = wc.run(max_waves=3)
        assert wc.budgets is not None
        got = {r.host: r.budget for r in wc.budgets.collect()}
        want = {
            r.host: max(1, _m.ceil(base / max(r.crawl_delay, 1.0)))
            for r in web_xs["robots"].itertuples()
        }
        assert got == want
        # the budget actually bounds wave selection: no wave fetches
        # more than its host budget for any host
        for m in run["metrics"]:
            assert m.selected <= sum(want.values()) * 2  # sanity bound

    def test_wave_retry_converges_to_oracle_seen_set(self, spark, web_xs):
        """Transient pages (503-then-200) are recovered by re-enqueue:
        the final seen set equals the oracle's (which retries in-line)."""
        cfg = _wcfg(web_xs)
        wc = WaveCrawl(
            spark, fixture_to_spark(spark, web_xs), cfg, seen_kind="bloom"
        )
        wc.run()
        oracle = crawl_oracle(web_xs, cfg)
        seen = {r.url for r in wc.seen.exact.select("url").collect()}
        assert seen == oracle.seen_set


# ---------------------------------------------------------------------------
# shingle-frequency skew cap (pipeline/dedup.py)
# ---------------------------------------------------------------------------

class TestJaccardSkewCap:
    def test_hot_shingle_capped_join_stays_linear(self, spark, tmp_path):
        """One shingle shared by every document would make the pair join
        quadratic; with max_doc_freq it is dropped and only genuine
        near-dup pairs survive."""
        import pandas as pd

        from snapcrawler_spark.pipeline.dedup import dedup_ngram_jaccard

        n = 200
        hot = "the of the and to a"  # every doc starts with these 6 words
        rows = []
        for i in range(n):
            rows.append((i, f"{hot} unique{i} token{i} word{i} tail{i}",
                         "en", "t", 1))
        # one genuine near-dup pair
        rows.append((n, rows[0][1], "en", "t", 1))
        pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
        ).to_parquet(tmp_path / "documents.parquet", index=False)

        out = dedup_ngram_jaccard(
            spark, str(tmp_path), threshold=0.6, max_doc_freq=50
        )
        pairs = out.collect()
        # without the cap the hot shingles link all 201 docs into ~20k
        # candidate pairs; with it only the exact twin survives
        assert [(r.doc_a, r.doc_b) for r in pairs] == [(0, n)]
