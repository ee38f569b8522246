"""Pure-Python crawl oracle — the independent reference semantics.

Replays the parallel-mode crawl loop of the reference exactly
(crawling_module.py:80-189 run loop, :191-262 crawl_page, :264-318
extract_images, :320-341 image-page cascade, :343-360 extract_links,
:362-422 is_valid_image_url) followed by the consumer filter chain
(filtering_module.py:140-182 process_image, :184-258 download gate,
:267-356 apply_filters order), over the fixture tables instead of HTTP.

Two documented deviations from live-reference behavior, both pinned as
*our* spec (SURVEY §5):

1. Per-page image order: the reference's ``list(set(images))`` order is
   PYTHONHASHSEED-dependent; the spec canonicalizes to sorted order.
2. Decode: PIL is unavailable in-sandbox; payloads undecodable by our
   codecs (gif stubs, corrupt bytes) reject with ``decode_error`` where
   PIL might have decoded them.

Engine-only capability (no reference analog): robots gating — enabled
via config.extra['robots_enabled'], pages under a disallowed prefix are
skipped before fetch and counted ``robots_blocked``.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from urllib.parse import urlparse

import numpy as np
import pandas as pd

from snapcrawler_spark.conf import (
    CAPTCHA_INDICATORS,
    MAX_RETRIES,
    RETRYABLE_STATUSES,
    CrawlConfig,
)

# classic nine + the spider's extended modern set (image_spider.py:326-337)
_IMAGE_EXTS = (
    ".jpg", ".jpeg", ".png", ".gif", ".webp", ".svg", ".bmp", ".tiff", ".ico",
    ".tif", ".avif", ".heic", ".heif", ".jxl", ".cur", ".avifs", ".webp2",
)
_EXCLUDE_PATTERNS = (".css", ".js", ".html", ".php", ".xml", ".json")
_IMAGE_PAGE_PATTERNS = (
    "/image/", "/photo/", "/picture/", "/img/", "/gallery/",
    "image_id=", "photo_id=", "picture_id=",
)
_THUMB_RE = re.compile(r"/(\d+)px-")


def is_valid_image_url(url: str, cfg: CrawlConfig) -> bool:
    """Mirror of crawling_module.py:362-422."""
    url_lower = url.lower()
    parsed = urlparse(url)
    if parsed.netloc.endswith("commons.wikimedia.org"):
        path_lower = parsed.path.lower()
        if path_lower.startswith("/wiki/file:"):
            return False
        if path_lower.startswith("/wiki/special:filepath/"):
            return True
    if parsed.netloc.endswith("upload.wikimedia.org"):
        if any(url_lower.endswith(ext) for ext in _IMAGE_EXTS):
            return True
    if "commons.wikimedia.org" in url_lower and "/thumb/" in url_lower:
        m = _THUMB_RE.search(url_lower)
        if m and int(m.group(1)) < cfg.thumb_min_px:
            return False
        return True
    if any(url_lower.endswith(ext) for ext in _IMAGE_EXTS):
        return True
    return False


def is_image_page_url(url: str, base_url: str) -> bool:
    """Mirror of crawling_module.py:320-331."""
    if "commons.wikimedia.org" in base_url:
        return "/wiki/File:" in url or "/wiki/Category:" in url
    return any(p in url.lower() for p in _IMAGE_PAGE_PATTERNS)


def url_ext(image_url: str) -> str:
    """Format-filter extension: URL path basename ext, else 'jpg'
    (download_image filename fallback, filtering_module.py:199-203)."""
    basename = os.path.basename(urlparse(image_url).path)
    if "." in basename:
        return basename.rsplit(".", 1)[1].lower()
    return "jpg"


def strip_fragment(url: str) -> str:
    return url.split("#", 1)[0]


@dataclass
class OracleResult:
    crawl_order: list = field(default_factory=list)   # (fetch_seq, url, depth)
    seen_set: set = field(default_factory=set)
    image_items: list = field(default_factory=list)   # (item_seq, image_url, source_page, depth)
    accepted: list = field(default_factory=list)      # (item_seq, image_url, image_id, phash)
    rejections: list = field(default_factory=list)    # (item_seq, image_url, reason)
    robots_blocked: list = field(default_factory=list)
    captcha_blocked: list = field(default_factory=list)
    counters: dict = field(default_factory=dict)


def crawl_oracle(web: dict, cfg: CrawlConfig) -> OracleResult:
    pages = {
        r.url: (
            int(r.status),
            r.content_md5,
            int(getattr(r, "transient_fails", 0)),
        )
        for r in web["pages"].itertuples()
    }
    # CAPTCHA challenge pages (middlewares.py:109-157): marker in body
    captcha_pages = {
        r.url
        for r in web["pages"].itertuples()
        if isinstance(getattr(r, "html", None), str)
        and any(ind in r.html.lower() for ind in CAPTCHA_INDICATORS)
    }
    links_by: dict[str, list] = {}
    for r in web["links"].itertuples():
        links_by.setdefault(r.src_url, []).append((int(r.link_idx), r.dst_url))
    for v in links_by.values():
        v.sort()
    items_by: dict[str, list] = {}
    for r in web["page_items"].itertuples():
        items_by.setdefault(r.src_url, []).append((int(r.item_idx), r.channel, r.url))
    for v in items_by.values():
        v.sort()
    fetch = {
        r.image_url: (r.image_id, int(r.status), r.content_type)
        for r in web["image_fetch"].itertuples()
    }
    # md5 of raw image bytes: a same-domain image URL reached via an <a>
    # anchor is crawled as a *page* by the reference (extract_links takes
    # every a[href], crawling_module.py:348); its "page content" is the
    # image body, which feeds the MD5 page-dedup set.
    import hashlib as _hl

    bytes_md5 = {
        r.image_id: _hl.md5(bytes(r.bytes)).hexdigest()
        for r in web["images"].itertuples()
    }
    meta = {}
    img_df = web["images"]
    pix_df = web.get("images_pixels")
    pix = (
        {r.image_id: (r.mode, r.dpi) for r in pix_df.itertuples()}
        if pix_df is not None
        else {}
    )
    for r in img_df.itertuples():
        mode, dpi = pix.get(r.image_id, ("RGB", None))
        if dpi is not None and isinstance(dpi, float) and np.isnan(dpi):
            dpi = None
        meta[r.image_id] = dict(
            w=int(r.w), h=int(r.h), fmt=r.fmt, caption=r.caption,
            phash=int(r.phash), mode=mode, dpi=dpi,
            n_bytes=len(bytes(r.bytes)),
        )

    robots_enabled = bool(cfg.extra.get("robots_enabled", False))
    disallow: dict[str, list[str]] = {}
    if robots_enabled:
        for r in web["robots"].itertuples():
            disallow[r.host] = list(r.disallow_prefixes)

    res = OracleResult()
    seeds = [r.seed_url for r in web["seeds"].sort_values("seed_idx").itertuples()]
    allowed_domains = {urlparse(s).netloc for s in seeds}

    # ---- producer loop (crawling_module.py:80-189) ----
    queue: list[tuple[str, int, int]] = []  # (url, depth, attempt)
    visited: set[str] = set()
    page_hashes: set[str] = set()
    for s in seeds:
        queue.append((s, 0, 0))
        visited.add(s)

    request_count = 0
    fetch_seq = 0
    item_seq = 0
    while queue and (cfg.max_requests == 0 or request_count < cfg.max_requests):
        url, depth, attempt = queue.pop(0)
        if cfg.max_depth > 0 and depth >= cfg.max_depth:
            continue
        if robots_enabled:
            p = urlparse(url)
            if any(p.path.startswith(pref) for pref in disallow.get(p.netloc, ())):
                res.robots_blocked.append(url)
                continue

        # crawl_page
        images: list[str] = []
        cascades: list[str] = []
        new_links: list[str] = []
        base = strip_fragment(url)
        page = pages.get(base)
        img_as_page = fetch.get(base) if page is None else None
        # transient-failure model: attempts < transient_fails return 503
        eff_status = None
        if page is not None:
            eff_status = 503 if attempt < page[2] else page[0]
        # CAPTCHA challenge → IgnoreRequest: response discarded entirely
        # (no md5, no extraction, no retry) but the request still counts
        is_captcha = page is not None and (
            eff_status == 403 or (eff_status == 200 and base in captcha_pages)
        )
        if is_captcha:
            res.captcha_blocked.append(url)
            res.crawl_order.append((fetch_seq, url, depth))
            fetch_seq += 1
            request_count += 1
            continue
        content_md5 = None
        if page is not None and eff_status == 200:
            content_md5 = page[1]
        elif img_as_page is not None and img_as_page[1] == 200:
            # image URL crawled as a page: body = image bytes, no anchors
            content_md5 = bytes_md5.get(img_as_page[0])
        if page is not None and eff_status == 200 and content_md5 not in page_hashes:
            page_hashes.add(content_md5)
            img_set: set[str] = set()
            anchor_hrefs: list[str] = []  # parent-<a> hrefs, document order
            for _idx, channel, iurl in items_by.get(base, ()):
                if channel == "parent_a_href":
                    anchor_hrefs.append(iurl)
                    if is_valid_image_url(iurl, cfg):
                        img_set.add(iurl)
                    elif is_image_page_url(iurl, url) and iurl not in visited:
                        cascades.append(iurl)
                else:
                    if is_valid_image_url(iurl, cfg):
                        img_set.add(iurl)
            images = sorted(img_set)  # canonical order (spec deviation 1)
            # extract_links iterates EVERY a[href] in document order: the
            # plain link anchors first, then parent-<a> wrappers
            all_anchor_targets = [
                dst for _idx, dst in links_by.get(base, ())
            ] + anchor_hrefs
            for dst in all_anchor_targets:
                parsed = urlparse(dst)
                if (
                    parsed.netloc in allowed_domains
                    and parsed.scheme in ("http", "https")
                    and dst not in visited
                ):
                    new_links.append(dst)
        elif content_md5 is not None:
            # image-as-page fetch succeeded: only the md5 set advances
            page_hashes.add(content_md5)

        res.crawl_order.append((fetch_seq, url, depth))
        fetch_seq += 1
        for iurl in images:
            res.image_items.append((item_seq, iurl, url, depth))
            item_seq += 1
        # cascade front-insertion reverses relative order (crawling_module.py:137-140)
        for c in cascades:
            if c not in visited:
                queue.insert(0, (c, depth, 0))
                visited.add(c)
        for link in new_links:
            if link not in visited:
                queue.append((link, depth + 1, 0))
                visited.add(link)
        request_count += 1
        # retry: transient statuses re-enter the queue tail with
        # attempt+1 <= MAX_RETRIES (settings.py:84-85 retry policy)
        if (
            eff_status in RETRYABLE_STATUSES
            and attempt + 1 <= MAX_RETRIES
        ):
            queue.append((url, depth, attempt + 1))

    res.seen_set = visited

    # watermark ground truth: shares the engine kernel (deviation: cv2
    # MSER is unavailable, so both sides pin the stable-region spec of
    # kernels/analysis.py — the kernel itself has independent unit tests)
    _wm_cache: dict[str, bool] = {}

    def _wm(image_id: str) -> bool:
        if image_id not in _wm_cache:
            from snapcrawler_spark.kernels.analysis import has_watermark
            from snapcrawler_spark.kernels.codecs import decode_image

            row = img_df[img_df.image_id == image_id].iloc[0]
            try:
                px, _, _ = decode_image(bytes(row.bytes))
                _wm_cache[image_id] = has_watermark(px)
            except Exception:
                _wm_cache[image_id] = False
        return _wm_cache[image_id]

    # ---- consumer filter chain (filtering_module.py:140-182, 267-356) ----
    downloaded = 0
    processed = 0
    folder_bytes = 0
    phash_seen: set[int] = set()
    near_dup_on = bool(cfg.extra.get("near_dup_images", False))
    near_kept: set[int] = set()
    _M64 = (1 << 64) - 1
    for item_seq_, iurl, src, depth in res.image_items:
        if cfg.max_images > 0 and processed >= cfg.max_images:
            break
        if cfg.max_folder_bytes > 0 and folder_bytes >= cfg.max_folder_bytes:
            break
        f = fetch.get(iurl)
        if f is None or f[1] != 200:
            res.rejections.append((item_seq_, iurl, "http_error"))
            continue
        image_id, _status, ctype = f
        if "image" not in ctype.lower():
            res.rejections.append((item_seq_, iurl, "non_image_content_type"))
            continue
        downloaded += 1
        ext = url_ext(iurl)
        if ext == "svg":
            res.rejections.append((item_seq_, iurl, "svg_unsupported"))
            continue
        m = meta.get(image_id)
        # undecodable payloads: unknown magic, svg (environment parity —
        # the reference also rejects svg when cairosvg/wand are absent),
        # and the truncated gif STUBS (pixel ground truth mode 'NONE').
        # Real GIFs decode since round 6 (kernels/gif.py) and flow on.
        if m is None or m["fmt"] in ("unknown", "svg") or m["mode"] == "NONE":
            res.rejections.append((item_seq_, iurl, "decode_error"))
            continue
        w, h = m["w"], m["h"]
        if cfg.min_side_size > 0 and min(w, h) < cfg.min_side_size:
            res.rejections.append((item_seq_, iurl, "size"))
            continue
        if cfg.formats and ext not in [x.lower() for x in cfg.formats]:
            res.rejections.append((item_seq_, iurl, "format"))
            continue
        if cfg.min_dpi > 0 and m["dpi"] is not None and m["dpi"] < cfg.min_dpi:
            res.rejections.append((item_seq_, iurl, "dpi"))
            continue
        if cfg.norm_color_mode != "all":
            is_gray = m["mode"] == "L"
            if (cfg.norm_color_mode == "color" and is_gray) or (
                cfg.norm_color_mode == "bw" and not is_gray
            ):
                res.rejections.append((item_seq_, iurl, "color"))
                continue
        if cfg.norm_orientation != "all":
            bad = (
                (cfg.norm_orientation == "landscape" and w < h)
                or (cfg.norm_orientation == "portrait" and h < w)
                or (cfg.norm_orientation == "square" and w != h)
            )
            if bad:
                res.rejections.append((item_seq_, iurl, "orientation"))
                continue
        ratio = w / h if h > 0 else 1.0
        if (cfg.aspect_ratio_min > 0 and ratio < cfg.aspect_ratio_min) or (
            cfg.aspect_ratio_max > 0 and ratio > cfg.aspect_ratio_max
        ):
            res.rejections.append((item_seq_, iurl, "aspect"))
            continue
        if not cfg.allow_logos_banners and (ratio > 10 or ratio < 0.1):
            # banner/logo gate (pipelines.py:240-252)
            res.rejections.append((item_seq_, iurl, "banner_logo"))
            continue
        if cfg.deduplication:
            if m["phash"] in phash_seen:
                res.rejections.append((item_seq_, iurl, "duplicate_phash"))
                continue
            phash_seen.add(m["phash"])
            # opt-in near-dup gate (engine extension; pinned spec —
            # operators/filters._near_dup_stage): within max_hamming
            # bits of any previously-KEPT phash → 'near_dup', and the
            # rejected hash joins the EXACT set (added above) but not
            # the kept set (greedy maximal independent set by order)
            if near_dup_on and any(
                bin((m["phash"] ^ k) & _M64).count("1") <= 3
                for k in near_kept
            ):
                res.rejections.append((item_seq_, iurl, "near_dup"))
                continue
            near_kept.add(m["phash"])
        if cfg.watermark_enabled and _wm(image_id):
            # after the phash insert, like filtering_module.py:336-350
            res.rejections.append((item_seq_, iurl, "watermark"))
            continue
        res.accepted.append((item_seq_, iurl, image_id, m["phash"]))
        processed += 1
        folder_bytes += m["n_bytes"]

    res.counters = dict(
        pages_crawled=fetch_seq,
        images_found=item_seq,
        downloaded=downloaded,
        processed=processed,
        filtered_out=len(res.rejections),
        robots_blocked=len(res.robots_blocked),
        captcha_blocked=len(res.captcha_blocked),
        unique_urls=len(visited),
    )
    return res


def oracle_to_frames(res: OracleResult) -> dict[str, pd.DataFrame]:
    """Golden outputs as DataFrames (FIXTURES.md §7)."""
    return {
        "golden_crawl_order": pd.DataFrame(
            res.crawl_order, columns=["fetch_seq", "url", "depth"]
        ),
        "golden_seen_set": pd.DataFrame(sorted(res.seen_set), columns=["url"]),
        "golden_items": pd.DataFrame(
            res.image_items, columns=["item_seq", "image_url", "source_page", "depth"]
        ),
        "golden_accepted": pd.DataFrame(
            res.accepted, columns=["item_seq", "image_url", "image_id", "phash"]
        ),
        "golden_rejections": pd.DataFrame(
            res.rejections, columns=["item_seq", "image_url", "reason"]
        ),
    }
