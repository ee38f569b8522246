"""Engine ≡ oracle equivalence — the correctness gate of BASELINE.json:
identical crawl ordering, URL-seen set, accepted images and rejection
reasons under the same seed list and politeness budget, across config
variations (SURVEY §5.3)."""

from __future__ import annotations

import pytest

from snapcrawler_spark.conf import CrawlConfig
from snapcrawler_spark.io import fixture_to_spark
from snapcrawler_spark.oracle import crawl_oracle
from snapcrawler_spark.plans import CrawlEngine


def _cfg(web, **kw):
    base = dict(
        seeds=tuple(web["seeds"].seed_url),
        min_side_size=64,
        formats=("jpg", "jpeg", "png", "webp", "bmp"),
        deduplication=True,
        host_budget=0,  # unlimited unless a case exercises politeness
    )
    base.update(kw)
    return CrawlConfig(**base)


_FETCH_CACHE: dict = {}
_TABLES_CACHE: dict = {}


def _run_engine(spark, web, cfg, extraction="tables"):
    key = id(web)
    if key not in _TABLES_CACHE:
        _TABLES_CACHE[key] = fixture_to_spark(spark, web)
    cache = _FETCH_CACHE.setdefault((key, cfg.thumb_min_px, extraction), {})
    eng = CrawlEngine(
        spark, _TABLES_CACHE[key], cfg, extraction=extraction, fetch_cache=cache
    )
    return eng.run()


def _assert_equivalent(run, oracle):
    got_order = [
        (r.fetch_seq, r.url, r.depth)
        for r in run["crawl_order"].orderBy("fetch_seq").collect()
    ]
    assert got_order == oracle.crawl_order, (
        f"crawl order diverges at "
        f"{next((i, a, b) for i, (a, b) in enumerate(zip(got_order, oracle.crawl_order)) if a != b)}"
    )
    assert run["seen_set"] == oracle.seen_set
    got_items = [
        (r.item_seq, r.image_url, r.source_page, r.depth)
        for r in run["items"].orderBy("item_seq").collect()
    ]
    assert got_items == oracle.image_items
    got_acc = [
        (r.item_seq, r.image_url, r.image_id, r.phash)
        for r in run["accepted"].orderBy("item_seq").collect()
    ]
    assert got_acc == oracle.accepted
    got_rej = sorted(
        (r.item_seq, r.image_url, r.reason) for r in run["rejections"].collect()
    )
    assert got_rej == sorted(oracle.rejections)


CONFIG_MATRIX = [
    dict(),
    dict(deduplication=False),
    dict(max_depth=2),
    dict(max_requests=15),
    dict(min_side_size=0, aspect_ratio_min=0.0, aspect_ratio_max=0.0),
    dict(orientation="landscape", color_mode="color", min_dpi=90),
    dict(max_images=4),
    dict(max_folder_bytes=20_000),
    dict(host_budget=3),
    dict(extra={"robots_enabled": True}),
    dict(watermark_enabled=True),
    # aspect bounds off so extreme-ratio fixture images (0.05 / 15.0)
    # reach the banner gate instead of rejecting as 'aspect' first
    dict(
        aspect_ratio_min=0.0,
        aspect_ratio_max=0.0,
        allow_logos_banners=False,
    ),
    # Scrapy-chain synonyms (pipelines.py:180,194-197)
    dict(orientation="vertical", color_mode="any"),
    # opt-in near-dup image gate (engine extension; exact-only is the
    # reference default, filtering_module.py:335-342)
    dict(extra={"near_dup_images": True}),
    # gif in the format whitelist: the /x7/ fixture GIFs decode through
    # the from-scratch LZW codec (round 6) and must be ACCEPTED here —
    # under the default whitelist the same rows reject with 'format'
    dict(formats=("jpg", "jpeg", "png", "webp", "bmp", "gif")),
]


def test_orientation_color_synonyms_normalize():
    """pipelines.py:194-197 maps vertical→portrait / horizontal→
    landscape; :180 uses 'any' where filtering_module uses 'all'."""
    c = CrawlConfig(orientation="vertical", color_mode="any")
    assert c.norm_orientation == "portrait"
    assert c.norm_color_mode == "all"
    c2 = CrawlConfig(orientation="horizontal")
    assert c2.norm_orientation == "landscape"
    c3 = CrawlConfig(orientation="square", color_mode="bw")
    assert (c3.norm_orientation, c3.norm_color_mode) == ("square", "bw")


@pytest.mark.parametrize("overrides", CONFIG_MATRIX)
def test_engine_matches_oracle_xs(spark, web_xs, overrides):
    cfg = _cfg(web_xs, **overrides)
    _assert_equivalent(_run_engine(spark, web_xs, cfg), crawl_oracle(web_xs, cfg))


def test_engine_matches_oracle_s(spark, web_s):
    cfg = _cfg(web_s)
    _assert_equivalent(_run_engine(spark, web_s, cfg), crawl_oracle(web_s, cfg))


def test_engine_matches_oracle_s_robots_with_depth_cap(spark, web_s):
    """Depth cap + robots TOGETHER (xs has no reachable disallowed URL,
    so only the s web makes this non-vacuous): the reference checks
    depth before robots, so a depth-capped disallowed URL is dropped
    silently, never counted blocked — gate order is observable."""
    cfg = _cfg(web_s, max_depth=4, extra={"robots_enabled": True})
    oracle = crawl_oracle(web_s, cfg)
    assert oracle.robots_blocked, "no blocked URLs — case is vacuous"
    _assert_equivalent(_run_engine(spark, web_s, cfg), oracle)


def test_html_extraction_backend_equivalent(spark, web_xs):
    cfg = _cfg(web_xs)
    _assert_equivalent(
        _run_engine(spark, web_xs, cfg, extraction="html"),
        crawl_oracle(web_xs, cfg),
    )


def test_bare_string_ajax_sweep_is_exercised(web_xs):
    """The fixture seeds pages whose image URL appears ONLY as an
    un-keyed JSON array element (channel 'ajax_list'); the html-backend
    equivalence test above would fail if the bare-string sweep
    (middlewares.py:245-257 analog) missed them."""
    items = web_xs["page_items"]
    sweep = items[items.channel == "ajax_list"]
    assert len(sweep) > 0
    # sweep-only coverage: at least one of these URLs appears in NO
    # other channel row (so only the sweep can harvest it)
    others = set(items[items.channel != "ajax_list"].url)
    assert any(u not in others for u in sweep.url)


def test_gif_coverage_nonvacuous(web_xs):
    """The gif matrix case must stay non-vacuous: with 'gif' in the
    whitelist the oracle ACCEPTS at least one /x7/ fixture GIF at xs
    (real decode through kernels/gif.py); under the default whitelist
    the same rows reject with 'format' — not 'decode_error' (they are
    decodable now), and the truncated gif STUBS keep rejecting as
    'decode_error'."""
    cfg_gif = _cfg(
        web_xs,
        deduplication=False,
        formats=("jpg", "jpeg", "png", "webp", "bmp", "gif"),
    )
    o = crawl_oracle(web_xs, cfg_gif)
    acc = [a for a in o.accepted if "/x7/" in a[1]]
    assert acc, "no /x7/ GIF accepted — gif matrix case is vacuous"
    cfg_def = _cfg(web_xs, deduplication=False)
    o2 = crawl_oracle(web_xs, cfg_def)
    x7_reasons = {r[2] for r in o2.rejections if "/x7/" in r[1]}
    assert x7_reasons == {"format"}
    assert any(r[2] == "decode_error" for r in o2.rejections)


def test_near_dup_twins_pinned(web_xs):
    """The images fixture carries recompressed-JPEG twin pairs
    (img_nd{p}a = q96 original, img_nd{p}b = lower-quality re-encode)
    whose pHashes differ by 1..3 bits — the deterministic search in
    fixtures/images.py must keep finding them, else the near-dup cases
    go vacuous."""
    imgs = web_xs["images"]
    ph = dict(zip(imgs.image_id, imgs.phash))
    pairs = 0
    for p in range(2):
        a, b = ph.get(f"img_nd{p}a"), ph.get(f"img_nd{p}b")
        if a is None:
            continue
        d = bin((int(a) ^ int(b)) & ((1 << 64) - 1)).count("1")
        assert 1 <= d <= 3, f"pair {p} hamming {d} out of range"
        pairs += 1
    assert pairs >= 1, "no near-dup twin pairs in the fixture"


def test_recompressed_twin_rejected_only_with_flag(spark, web_xs):
    """VERDICT r5 task 3 'done' criterion: a hamming<=3 recompressed
    twin is rejected with reason 'near_dup' ONLY when
    extra['near_dup_images'] is on; with the flag off (reference parity
    default) it is accepted."""
    cfg_off = _cfg(web_xs)
    cfg_on = _cfg(web_xs, extra={"near_dup_images": True})
    run_off = _run_engine(spark, web_xs, cfg_off)
    run_on = _run_engine(spark, web_xs, cfg_on)
    nd = {
        r.image_url
        for r in run_on["rejections"].collect()
        if r.reason == "near_dup"
    }
    assert nd, "no near_dup rejections with the flag on — vacuous"
    assert all("/x5/" in u for u in nd)
    assert not any(
        r.reason == "near_dup" for r in run_off["rejections"].collect()
    )
    acc_off = {r.image_url for r in run_off["accepted"].collect()}
    assert nd <= acc_off, "twin not accepted under the parity default"


def test_wave_count_scales_with_depth_not_pages(spark, web_s):
    """Speculative batching: number of Spark waves ≈ BFS depth, not page
    count — the property that makes strict ordering distributable."""
    cfg = _cfg(web_s)
    tables = fixture_to_spark(spark, web_s)
    eng = CrawlEngine(spark, tables, cfg)
    run = eng.run()
    n_pages = run["crawl_order"].count()
    assert n_pages > 100
    assert run["waves"] <= 16, f"{run['waves']} waves for {n_pages} pages"
