"""Deterministic synthetic web (seed=42, no network) — FIXTURES.md §2-6.

Tables returned (all pandas; the engine loads them as Spark DataFrames,
the oracle walks them in Python):

- ``pages``: url, host, status, html (nullable at scale m), content_md5
- ``links``: src_url, link_idx, href_raw, dst_url (absolute ground
  truth), anchor_text (rendered link text — ML navigation relevance)
- ``page_items``: src_url, item_idx, channel, url — raw extraction-channel
  occurrences in document order; channels mirror extract_images at
  crawling_module.py:264-318 (per-<img> src→data-src→data-lazy-src
  fallback, parent-<a> href, data-file-url, inline CSS url(), <style>
  url()) plus the spider extras (image_spider.py:199-316: picture/
  source srcset, standalone lazy attrs, relative/single-quoted JS
  sweep, extended modern extensions).
  Classification of each occurrence (direct image vs cascade image-page
  vs drop) is *engine/oracle logic*, not fixture data.
- ``image_fetch``: image_url, image_id, status, content_type — what an
  HTTP GET of each image URL would return (content-type gate coverage,
  filtering_module.py:193-197).
- ``robots``: host, disallow_prefixes, crawl_delay, sitemap_urls
- ``seeds``: seed_url, seed_idx (order matters: crawling_module.py:89-93)

The HTML column embeds exactly the tabulated links/items so the engine's
HTML-regexp extraction can be cross-checked against the table backend.
Graph shape: per-host binary trees (depth > 6) + back-edges (cycles) +
diamonds + cross-host edges + invalid schemes; 2 hot hosts hold ~60% of
pages (skew coverage); ~5% duplicate-content page pairs (MD5 dedup);
a synthetic commons.wikimedia.org host exercises the Wikimedia rules
(crawling_module.py:320-331, 362-422).
"""

from __future__ import annotations

import hashlib
from urllib.parse import urljoin

import numpy as np
import pandas as pd

SCALES = {
    # hosts (incl. commons), pages/host for hot|normal, images, html?
    "xs": dict(hosts=3, hot_pages=24, norm_pages=10, images=100, html=True),
    "s": dict(hosts=8, hot_pages=380, norm_pages=105, images=800, html=True),
    "l": dict(hosts=16, hot_pages=8000, norm_pages=1700, images=1200, html=False),
    "m": dict(hosts=16, hot_pages=42000, norm_pages=4500, images=2000, html=False),
}

_EXTS = {"png": ".png", "bmp": ".bmp", "jpg": ".jpg", "gif": ".gif",
         "svg": ".svg", "unknown": ".png"}
_CTYPE = {"png": "image/png", "bmp": "image/bmp", "jpg": "image/jpeg",
          "gif": "image/gif", "svg": "image/svg+xml", "unknown": "image/png"}


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


# anchor-text vocabulary: ~30% of anchors carry navigation-flavored text
# (ML relevance coverage, navigation_module.py:302-308 +0.4 text term);
# the rest are neutral. Chosen by a stable hash so adding this column
# perturbs no pre-existing RNG draw.
_ANCHOR_TEXTS = (
    "Gallery", "Photo archive", "More images",
    "Category index", "Old archive", "next page",
)


def _anchor_text(url: str, li: int) -> str:
    sel = _stable_hash(f"{url}#a{li}") % 20
    return _ANCHOR_TEXTS[sel] if sel < len(_ANCHOR_TEXTS) else f"l{li}"


def _stable_hash(s: str) -> int:
    """Process-independent string hash (Python's hash() is randomized)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:6], "big")


def _mk_image_url(rng, host: str, image_id: str, fmt: str) -> str:
    """Image URL variants covering is_valid_image_url branches."""
    r = rng.random()
    ext = _EXTS.get(fmt, ".png")
    if r < 0.08:
        # Wikimedia thumb (crawling_module.py:384-411); width straddles min px
        px = int(rng.choice([48, 120, 240, 360, 512, 800]))
        return (f"https://commons.wikimedia.org/w/thumb/{image_id}{ext}/"
                f"{px}px-{image_id}{ext}")
    if r < 0.12:
        # Special:FilePath — extensionless, passes via the commons rule
        return f"https://commons.wikimedia.org/wiki/Special:FilePath/{image_id}"
    if r < 0.20:
        return f"https://upload.wikimedia.org/c/{image_id}{ext}"
    if r < 0.26:
        # query-string URL: endswith() extension check fails → never extracted
        return f"https://{host}/static/{image_id}{ext}?v=2"
    if r < 0.30:
        # wrong-extension URL (.jpg serving png bytes): format filter sees jpg
        return f"https://{host}/static/{image_id}.jpg"
    return f"https://{host}/static/{image_id}{ext}"


def generate_web(seed: int = 42, scale: str = "s", images_df: pd.DataFrame | None = None):
    cfg = SCALES[scale]
    n_hosts = cfg["hosts"]
    with_html = cfg["html"]
    hosts = [f"site{k}.test" for k in range(n_hosts - 1)] + ["commons.wikimedia.org"]
    hot = set(hosts[:2])

    if images_df is None:
        from snapcrawler_spark.fixtures.images import generate_images
        images_df, _ = generate_images(seed, cfg["images"])
    # the near-dup twin rows (img_nd*, images.py round-5 block) are
    # referenced ONLY by the dedicated /x5/ coverage block below —
    # excluding them from the random-pick pool keeps every pre-existing
    # integers(0, len(image_ids)) draw byte-identical
    image_ids = [
        i for i in images_df["image_id"].tolist()
        if not i.startswith(("img_nd", "img_gif"))
    ]
    image_fmt = dict(zip(images_df["image_id"], images_df["fmt"]))
    nd_ids = sorted(
        i for i in images_df["image_id"] if i.startswith("img_nd")
    )
    gif_ids = sorted(
        i for i in images_df["image_id"] if i.startswith("img_gif")
    )

    page_rows, link_rows, item_rows = [], [], []
    fetch_map: dict[str, tuple[str, int, str]] = {}

    def page_urls_for(host: str, n: int) -> list[str]:
        rng = np.random.Generator(np.random.PCG64(seed * 7919 + _stable_hash(host) % 65536))
        urls = [f"https://{host}/"]
        for j in range(1, n):
            r = rng.random()
            if host == "commons.wikimedia.org":
                if r < 0.25:
                    urls.append(f"https://{host}/wiki/File:Img{j}.png")
                elif r < 0.35:
                    urls.append(f"https://{host}/wiki/Category:Cat{j}")
                else:
                    urls.append(f"https://{host}/wiki/Art{j}")
            elif r < 0.10:
                urls.append(f"https://{host}/image/{j}")
            elif r < 0.15:
                urls.append(f"https://{host}/gallery/{j}")
            elif r < 0.20:
                urls.append(f"https://{host}/p/private/{j}")
            else:
                urls.append(f"https://{host}/p/{j}")
        return urls

    host_pages = {
        h: page_urls_for(h, cfg["hot_pages"] if h in hot else cfg["norm_pages"])
        for h in hosts
    }

    for host in hosts:
        urls = host_pages[host]
        n = len(urls)
        for j, url in enumerate(urls):
            rng = np.random.Generator(
                np.random.PCG64(seed * 104729 + _stable_hash(url))
            )
            status = 200
            r = rng.random()
            if r < 0.04:
                status = 404
            elif r < 0.06:
                status = 429
            elif r < 0.08:
                status = 503

            # --- links: binary-tree children + diamonds/cycles/cross/invalid
            targets: list[str] = []
            for c in (2 * j + 1, 2 * j + 2):
                if c < n:
                    targets.append(urls[c])
            extra = int(rng.integers(0, 4))
            for _ in range(extra):
                rr = rng.random()
                if rr < 0.35 and j > 0:        # back-edge / diamond
                    targets.append(urls[int(rng.integers(0, j))])
                elif rr < 0.55:                 # cross-host
                    oh = hosts[int(rng.integers(0, len(hosts)))]
                    op = host_pages[oh]
                    targets.append(op[int(rng.integers(0, len(op)))])
                elif rr < 0.65:                 # unknown host (must be dropped)
                    targets.append(f"https://site-isolated.test/p/{int(rng.integers(0, 50))}")
                elif rr < 0.75:                 # invalid schemes
                    targets.append(
                        ["mailto:a@b.test", "javascript:void(0)",
                         f"ftp://{host}/f"][int(rng.integers(0, 3))]
                    )
                elif rr < 0.85:                 # fragment variant
                    targets.append(urls[int(rng.integers(0, n))] + "#frag")
                else:                           # duplicate of a child link
                    if targets:
                        targets.append(targets[0])

            html_parts = [f"<html><head><title>{url}</title></head><body>"]
            for li, dst in enumerate(targets):
                href = dst
                if dst.startswith(f"https://{host}/") and rng.random() < 0.3:
                    href = dst[len(f"https://{host}") :]  # relative form
                abs_dst = urljoin(url, href)
                atext = _anchor_text(url, li)
                link_rows.append((url, li, href, abs_dst, atext))
                html_parts.append(f'<a href="{href}">{atext}</a>')

            # --- image items per extraction channel
            n_imgs = int(rng.integers(0, 5)) if status == 200 else int(rng.integers(0, 5))
            item_idx = 0
            for _ in range(n_imgs):
                iid = image_ids[int(rng.integers(0, len(image_ids)))]
                iurl = _mk_image_url(rng, host, iid, image_fmt[iid])
                ch = ["img_src", "img_datasrc", "file_url", "css_inline",
                      "css_style", "parent_a", "srcset", "ajax",
                      "json_ld", "data_bg"][
                    int(rng.integers(0, 10))
                ]
                if iurl not in fetch_map:
                    fr = rng.random()
                    st = 404 if fr < 0.03 else 200
                    ct = "text/html" if 0.03 <= fr < 0.06 else _CTYPE[image_fmt[iid]]
                    fetch_map[iurl] = (iid, st, ct)
                if ch == "parent_a":
                    # <a href=X><img src=Y></a>: Y is an img_src item, X is
                    # either a direct image URL or an image-page URL (cascade)
                    inner = _mk_image_url(rng, host, iid, image_fmt[iid])
                    if inner not in fetch_map:
                        fetch_map[inner] = (iid, 200, _CTYPE[image_fmt[iid]])
                    if rng.random() < 0.5:
                        # href → an image page of this host (cascade coverage)
                        own = host_pages[host]
                        cand = [u for u in own if "/image/" in u or "/gallery/" in u
                                or "/wiki/File:" in u or "/wiki/Category:" in u]
                        href_target = (cand[int(rng.integers(0, len(cand)))]
                                       if cand else iurl)
                    else:
                        href_target = iurl
                    item_rows.append((url, item_idx, "img_src", inner))
                    item_idx += 1
                    item_rows.append((url, item_idx, "parent_a_href", href_target))
                    item_idx += 1
                    html_parts.append(
                        f'<a href="{href_target}"><img src="{inner}"/></a>'
                    )
                elif ch == "srcset":
                    # <picture>/srcset channel (image_spider.py:654-669):
                    # two density variants, both extracted in doc order
                    iurl2 = _mk_image_url(rng, host, iid, image_fmt[iid])
                    if iurl2 not in fetch_map:
                        fetch_map[iurl2] = (iid, 200, _CTYPE[image_fmt[iid]])
                    item_rows.append((url, item_idx, "srcset", iurl))
                    item_idx += 1
                    item_rows.append((url, item_idx, "srcset", iurl2))
                    item_idx += 1
                    html_parts.append(
                        f'<img srcset="{iurl} 1x, {iurl2} 2x"/>'
                    )
                elif ch == "ajax":
                    # embedded JSON blob (middlewares.py:160-257 ajax walk)
                    item_rows.append((url, item_idx, "ajax", iurl))
                    item_idx += 1
                    html_parts.append(
                        f'<script>var d = {{"items": {{"image": "{iurl}"}}, '
                        f'"n": {item_idx}}};</script>'
                    )
                elif ch == "json_ld":
                    # structured data (image_spider.py:211-219); the image
                    # URL sits nested under a non-image key to exercise
                    # the recursive JSON walk semantics
                    item_rows.append((url, item_idx, "json_ld", iurl))
                    item_idx += 1
                    html_parts.append(
                        '<script type="application/ld+json">'
                        f'{{"@type": "ImageObject", "content": '
                        f'{{"url": "{iurl}"}}}}</script>'
                    )
                elif ch == "data_bg":
                    # hidden-image data attribute (image_spider.py:266)
                    item_rows.append((url, item_idx, "data_bg", iurl))
                    item_idx += 1
                    html_parts.append(f'<div data-bg="{iurl}">z</div>')
                else:
                    item_rows.append((url, item_idx, ch, iurl))
                    item_idx += 1
                    if ch == "img_src":
                        html_parts.append(f'<img src="{iurl}"/>')
                    elif ch == "img_datasrc":
                        html_parts.append(f'<img data-src="{iurl}"/>')
                    elif ch == "file_url":
                        html_parts.append(f'<div data-file-url="{iurl}">x</div>')
                    elif ch == "css_inline":
                        html_parts.append(
                            f'<div style="background-image: url(\'{iurl}\')">y</div>'
                        )
                    else:
                        html_parts.append(
                            f'<style>.c{item_idx}{{background:url("{iurl}")}}</style>'
                        )
            # bare-string ajax sweep coverage (middlewares.py:245-257):
            # an image URL appearing ONLY as an un-keyed JSON array
            # element inside a <script> blob. Independent generator so
            # every pre-existing fixture draw stays byte-identical.
            arng = np.random.Generator(
                np.random.PCG64(seed * 600_011 + _stable_hash(url))
            )
            if arng.random() < 0.12:
                iid = image_ids[int(arng.integers(0, len(image_ids)))]
                aurl = _mk_image_url(arng, host, iid, image_fmt[iid])
                for _ in range(4):
                    # FilePath URLs are extensionless — the reference's
                    # is_image_url substring check would skip them, so
                    # they can't be sweep-only fixture rows
                    if "/wiki/Special:FilePath/" not in aurl:
                        break
                    aurl = _mk_image_url(arng, host, iid, image_fmt[iid])
                if "/wiki/Special:FilePath/" not in aurl:
                    if aurl not in fetch_map:
                        fetch_map[aurl] = (iid, 200, _CTYPE[image_fmt[iid]])
                    item_rows.append((url, item_idx, "ajax_list", aurl))
                    item_idx += 1
                    html_parts.append(
                        f'<script>var g = {{"gallery": ["{aurl}"], '
                        f'"page": 1}};</script>'
                    )
            # ---- round-4 parity coverage blocks. Each uses an
            # independent per-URL PCG64 stream so every pre-existing
            # fixture draw stays byte-identical. URLs live under /x4/
            # so they never collide with other channels.
            brng = np.random.Generator(
                np.random.PCG64(seed * 710_003 + _stable_hash(url))
            )

            def _x4(tag: str, ext: str = ".jpg"):
                """Fresh same-host image URL + fetch_map registration."""
                iid = image_ids[int(brng.integers(0, len(image_ids)))]
                u = f"https://{host}/x4/{tag}_{j}{ext}"
                if u not in fetch_map:
                    fetch_map[u] = (iid, 200, _CTYPE[image_fmt[iid]])
                return u

            r4 = brng.random()
            if r4 < 0.10:
                # per-<img>-tag src fallback chain
                # (crawling_module.py:271): the LOSING attribute's URL
                # must NOT be extracted even though it looks valid
                variant = int(brng.integers(0, 3))
                if variant == 0:
                    win = _x4("fbwin")
                    lose = f"https://{host}/x4/fblose_{j}.jpg"
                    item_rows.append((url, item_idx, "img_src", win))
                    item_idx += 1
                    html_parts.append(
                        f'<img src="{win}" data-src="{lose}"/>'
                    )
                elif variant == 1:
                    lazy = _x4("fblazy")
                    item_rows.append((url, item_idx, "img_lazysrc", lazy))
                    item_idx += 1
                    html_parts.append(f'<img data-lazy-src="{lazy}"/>')
                else:
                    win = _x4("fbds")
                    lose = f"https://{host}/x4/fbdl_{j}.png"
                    item_rows.append((url, item_idx, "img_datasrc", win))
                    item_idx += 1
                    html_parts.append(
                        f'<img data-src="{win}" data-lazy-src="{lose}"/>'
                    )
            elif r4 < 0.17:
                # <picture><source srcset>/<source data-srcset> + the
                # <img> fallback inside (image_spider.py:283-316)
                u1, u2 = _x4("pic1"), _x4("pic2")
                v = _x4("picd", ".png")
                w = _x4("picf")
                for pu in (u1, u2, v):
                    item_rows.append((url, item_idx, "picture_srcset", pu))
                    item_idx += 1
                item_rows.append((url, item_idx, "img_src", w))
                item_idx += 1
                html_parts.append(
                    f'<picture><source srcset="{u1} 1x, {u2} 2x"/>'
                    f'<source data-srcset="{v} 1x"/>'
                    f'<img src="{w}"/></picture>'
                )
            elif r4 < 0.24:
                # standalone lazy attrs (image_spider.py:264-272)
                attr = ("data-original", "data-lazy", "data-image",
                        "data-thumb", "data-full-src")[int(brng.integers(0, 5))]
                u = _x4("lz")
                item_rows.append((url, item_idx, "lazy_attr", u))
                item_idx += 1
                html_parts.append(f'<div {attr}="{u}">z</div>')
            elif r4 < 0.31:
                # relative / single-quoted JS image URLs
                # (image_spider.py:199-206 sweep pattern)
                rel = f"/x4/rel_{j}.png"
                absu = f"https://{host}{rel}"
                iid = image_ids[int(brng.integers(0, len(image_ids)))]
                if absu not in fetch_map:
                    fetch_map[absu] = (iid, 200, _CTYPE[image_fmt[iid]])
                item_rows.append((url, item_idx, "ajax_rel", absu))
                item_idx += 1
                html_parts.append(
                    f"<script>var p = '{rel}'; preload(p);</script>"
                )
            elif r4 < 0.36:
                # extended modern extension (image_spider.py:326-337):
                # URL predicate must pass; the format filter downstream
                # rejects by cfg.formats as usual
                ext = (".avif", ".heic", ".jxl", ".tif", ".webp2")[
                    int(brng.integers(0, 5))
                ]
                u = _x4("modern", ext)
                item_rows.append((url, item_idx, "img_src", u))
                item_idx += 1
                html_parts.append(f'<img src="{u}"/>')
            # ---- round-5 coverage blocks. Independent per-URL PCG64
            # streams (same pattern as /x4/): pre-existing draws stay
            # byte-identical; URLs live under /x5/ and /x6/.
            #
            # /x5/: near-dup JPEG twins (images.py img_nd* pairs) for
            # the opt-in near_dup_images gate — each hit page embeds
            # ONE member of one pair as a plain <img src>, so originals
            # and recompressed twins surface on different pages and
            # meet only in the consumer filter chain.
            crng = np.random.Generator(
                np.random.PCG64(seed * 930_007 + _stable_hash(url))
            )
            if nd_ids and crng.random() < 0.08:
                # half the hit pages carry BOTH members of a pair (the
                # original and its recompressed twin meet in the chain
                # whenever the page is crawled — guaranteed-non-vacuous
                # coverage); the rest carry one member, surfacing pairs
                # across pages
                pair = nd_ids[int(crng.integers(0, len(nd_ids))) & ~1]
                both = crng.random() < 0.5
                picks = (
                    [pair, nd_ids[nd_ids.index(pair) + 1]]
                    if both
                    else [nd_ids[int(crng.integers(0, len(nd_ids)))]]
                )
                for nd_id in picks:
                    u = f"https://{host}/x5/{nd_id}_{j}.jpg"
                    if u not in fetch_map:
                        fetch_map[u] = (nd_id, 200, "image/jpeg")
                    item_rows.append((url, item_idx, "img_src", u))
                    item_idx += 1
                    html_parts.append(f'<img src="{u}"/>')
            # /x7/ (round-6): REAL decodable GIFs (images.py img_gif*
            # block) as plain <img src> items — decode-parity coverage
            # for the from-scratch GIF/LZW codec. Independent per-URL
            # stream, so every pre-existing draw stays byte-identical.
            grng = np.random.Generator(
                np.random.PCG64(seed * 950_021 + _stable_hash(url))
            )
            # 0.12 (not the /x5/ 0.08): at xs the reachable-from-seeds
            # page set is small and the duplicate-content twin pass
            # drops some carriers' items — 0.12 keeps ≥1 live gif item
            # on a FETCHED xs page (non-vacuous at every scale)
            if gif_ids and grng.random() < 0.12:
                gid = gif_ids[int(grng.integers(0, len(gif_ids)))]
                u = f"https://{host}/x7/{gid}_{j}.gif"
                if u not in fetch_map:
                    fetch_map[u] = (gid, 200, "image/gif")
                item_rows.append((url, item_idx, "img_src", u))
                item_idx += 1
                html_parts.append(f'<img src="{u}"/>')
            # /x6/: MULTI-LINE <script> blocks — the common real-world
            # shape the (?s)-less body regexes silently skipped
            # (ADVICE r4). One of three variants: bare-string ajax
            # sweep, single-quoted relative JS sweep, JSON-LD.
            drng = np.random.Generator(
                np.random.PCG64(seed * 940_013 + _stable_hash(url))
            )
            if drng.random() < 0.08:
                iid = image_ids[int(drng.integers(0, len(image_ids)))]
                variant = int(drng.integers(0, 3))
                if variant == 0:
                    u = f"https://{host}/x6/ml_{j}.jpg"
                    if u not in fetch_map:
                        fetch_map[u] = (iid, 200, _CTYPE[image_fmt[iid]])
                    item_rows.append((url, item_idx, "ajax_list", u))
                    item_idx += 1
                    html_parts.append(
                        "<script>\nvar g = {\n"
                        f'  "gallery": ["{u}"],\n'
                        '  "page": 1\n};\n</script>'
                    )
                elif variant == 1:
                    rel = f"/x6/mlr_{j}.png"
                    absu = f"https://{host}{rel}"
                    if absu not in fetch_map:
                        fetch_map[absu] = (iid, 200, _CTYPE[image_fmt[iid]])
                    item_rows.append((url, item_idx, "ajax_rel", absu))
                    item_idx += 1
                    html_parts.append(
                        f"<script>\nvar p = '{rel}';\npreload(p);\n"
                        "</script>"
                    )
                else:
                    u = f"https://{host}/x6/mlj_{j}.png"
                    if u not in fetch_map:
                        fetch_map[u] = (iid, 200, _CTYPE[image_fmt[iid]])
                    item_rows.append((url, item_idx, "json_ld", u))
                    item_idx += 1
                    html_parts.append(
                        '<script type="application/ld+json">\n'
                        '{"@type": "ImageObject",\n'
                        f' "content": {{"url": "{u}"}}}}\n'
                        "</script>"
                    )
            if with_html:
                html_parts.append("</body></html>")
                html = "".join(html_parts)
                content_md5 = _md5(html)
            else:
                # html column is dropped at this scale (table-backend
                # extraction); content identity only needs uniqueness +
                # twin-copy semantics, so skip building 147k HTML strings
                html = None
                content_md5 = _md5("page:" + url)
            page_rows.append((url, host, status, html, content_md5))

    pages = pd.DataFrame(
        page_rows, columns=["url", "host", "status", "html", "content_md5"]
    )

    # transient-failure model (retry coverage, settings.py:84-85): the
    # first `transient_fails` fetch attempts of a page return 503, then
    # the listed status. Drawn from an independent per-URL generator so
    # every other fixture column is byte-identical to the pre-retry
    # fixture. ~5% of pages fail 1-3 times (recoverable within the
    # 3-retry budget), ~2% fail 4 times (exhaust it).
    def _transient_fails(url: str) -> int:
        trng = np.random.Generator(
            np.random.PCG64(seed * 271829 + _stable_hash(url))
        )
        t = trng.random()
        if t < 0.05:
            return int(trng.integers(1, 4))
        if t < 0.07:
            return 4
        return 0

    pages["transient_fails"] = [_transient_fails(u) for u in pages["url"]]
    # ~5% duplicate-content pairs: later page adopts an earlier page's html
    rng = np.random.Generator(np.random.PCG64(seed * 31337))
    n_pages = len(pages)
    dup_idx = rng.choice(n_pages, size=max(1, n_pages // 20), replace=False)
    links = pd.DataFrame(
        link_rows,
        columns=["src_url", "link_idx", "href_raw", "dst_url", "anchor_text"],
    )
    items = pd.DataFrame(item_rows, columns=["src_url", "item_idx", "channel", "url"])
    # twin must share the host: hrefs are root-relative, so same-host
    # twins resolve to identical absolute links — MD5-dedup winners are
    # then interchangeable (wave order may pick a different winner than
    # strict FIFO; extraction must not depend on it). Twins are never
    # dups themselves (no chains), which keeps this single-pass.
    dup_set = {int(x) for x in dup_idx if int(x) != 0}
    host_earlier: dict[str, list[int]] = {}
    by_host_rows: dict[str, list[int]] = {}
    for j, h in enumerate(pages["host"]):
        by_host_rows.setdefault(h, []).append(j)
    dup_pairs: list[tuple[int, int]] = []
    for di in sorted(dup_set):
        cands = [j for j in by_host_rows[pages.at[di, "host"]]
                 if j < di and j not in dup_set]
        if not cands:
            continue
        twin = cands[int(rng.integers(0, len(cands)))]
        dup_pairs.append((di, twin))
    if dup_pairs:
        drop_urls = {pages.at[di, "url"] for di, _ in dup_pairs}
        links = links[~links.src_url.isin(drop_urls)]
        items = items[~items.src_url.isin(drop_urls)]
        lk_by = {k: v for k, v in links.groupby("src_url")}
        it_by = {k: v for k, v in items.groupby("src_url")}
        new_l, new_i = [], []
        for di, twin in dup_pairs:
            di_url, twin_url = pages.at[di, "url"], pages.at[twin, "url"]
            pages.at[di, "html"] = pages.at[twin, "html"]
            pages.at[di, "content_md5"] = pages.at[twin, "content_md5"]
            tl = lk_by.get(twin_url)
            if tl is not None:
                tl = tl.copy()
                tl["src_url"] = di_url
                tl["dst_url"] = [urljoin(di_url, h) for h in tl["href_raw"]]
                new_l.append(tl)
            ti = it_by.get(twin_url)
            if ti is not None:
                ti = ti.copy()
                ti["src_url"] = di_url
                new_i.append(ti)
        links = pd.concat([links] + new_l, ignore_index=True)
        items = pd.concat([items] + new_i, ignore_index=True)

    image_fetch = pd.DataFrame(
        [(u, i, s, c) for u, (i, s, c) in fetch_map.items()],
        columns=["image_url", "image_id", "status", "content_type"],
    )
    # sitemap advertisement: every 4th host has one; every 8th host's
    # sitemap is INDEX-rooted (<sitemapindex> → child urlsets), the
    # dominant real-world layout (navigation_module.py:178-186)
    def _advertised(k: int, h: str) -> list[str]:
        if k % 8 == 0:
            return [f"https://{h}/sitemap_index.xml"]
        if k % 4 == 0:
            return [f"https://{h}/sitemap.xml"]
        return []

    robots = pd.DataFrame(
        [
            (h, ["/p/private"] if k % 2 == 0 else [],
             float(1 + (k % 3)), _advertised(k, h))
            for k, h in enumerate(hosts)
        ],
        columns=["host", "disallow_prefixes", "crawl_delay", "sitemap_urls"],
    )
    # robots.txt text bodies: the reference discovers sitemaps from
    # 'Sitemap:' lines (navigation_module.py:211-225)
    robots["robots_txt"] = [
        "User-agent: *\n"
        + "".join(f"Disallow: {p}\n" for p in dis)
        + "".join(f"Sitemap: {s}\n" for s in sms)
        for dis, sms in zip(robots["disallow_prefixes"], robots["sitemap_urls"])
    ]
    seeds_df = pd.DataFrame(
        [(f"https://{h}/", i) for i, h in enumerate(hosts)],
        columns=["seed_url", "seed_idx"],
    )
    # sitemap XML bodies for hosts that advertise one (sitemap feeder,
    # navigation_module.py:147-225): lists a sample of the host's pages.
    # Index-rooted hosts (k % 8 == 0) get a <sitemapindex> pointing to
    # TWO child urlsets (sitemap.xml + sitemap2.xml).
    def _urlset(pages_h: list[str], picks: list[int]) -> str:
        entries = "".join(
            f"<url><loc>{pages_h[j]}</loc><priority>0.{5 + j % 5}</priority>"
            f"<changefreq>daily</changefreq></url>"
            for j in picks
        )
        return f'<?xml version="1.0"?><urlset>{entries}</urlset>'

    sm_rows = []
    for k, h in enumerate(hosts):
        if k % 4 != 0:
            continue
        srng = np.random.Generator(np.random.PCG64(seed * 911 + k))
        pages_h = host_pages[h]
        picks = sorted(
            {int(x) for x in srng.integers(0, len(pages_h), size=min(10, len(pages_h)))}
        )
        sm_rows.append(
            (f"https://{h}/sitemap.xml", h, _urlset(pages_h, picks))
        )
        if k % 8 == 0:
            srng2 = np.random.Generator(np.random.PCG64(seed * 911_911 + k))
            picks2 = sorted(
                {
                    int(x)
                    for x in srng2.integers(
                        0, len(pages_h), size=min(10, len(pages_h))
                    )
                }
            )
            sm_rows.append(
                (f"https://{h}/sitemap2.xml", h, _urlset(pages_h, picks2))
            )
            children = "".join(
                f"<sitemap><loc>https://{h}/{c}</loc></sitemap>"
                for c in ("sitemap.xml", "sitemap2.xml")
            )
            sm_rows.append(
                (
                    f"https://{h}/sitemap_index.xml",
                    h,
                    f'<?xml version="1.0"?><sitemapindex>{children}'
                    "</sitemapindex>",
                )
            )
    sitemaps = pd.DataFrame(sm_rows, columns=["sitemap_url", "host", "xml"])
    links = links.sort_values(["src_url", "link_idx"]).reset_index(drop=True)
    items = items.sort_values(["src_url", "item_idx"]).reset_index(drop=True)
    return dict(pages=pages, links=links, page_items=items,
                image_fetch=image_fetch, robots=robots, seeds=seeds_df,
                sitemaps=sitemaps, images=images_df)
