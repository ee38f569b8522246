"""URL classification predicates and page extraction — Spark-native.

Column-expression mirrors of the reference predicates (so they run
inside whole-stage codegen, no Python on the hot path):

- ``valid_image_url_col``   ← crawling_module.py:362-422
- ``image_page_url_col``    ← crawling_module.py:320-331
- ``allowed_link_col``      ← crawling_module.py:343-360 (scheme + domain)
- ``url_ext_col``           ← filtering_module.py:199-203,370-376

Two extraction backends produce identical per-page arrays
(images sorted; cascade candidates and anchor targets in document
order):

- ``extract_from_tables``: joins the links/page_items fixture tables —
  the fast path (bench, scale).
- ``extract_from_html``: regexp channels over the html column +
  an Arrow-batched urljoin UDF — mirrors the reference's extraction
  union (image_spider.py:165-316 / crawling_module.py:264-318):
  per-<img>-tag src→data-src→data-lazy-src fallback, <picture>/<source>
  srcset + data-srcset, the standalone lazy-attr set, CSS url(),
  key-addressed + bare-string + relative/single-quoted JS sweeps,
  JSON-LD, data-file-url, parent-<a>.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from snapcrawler_spark.conf import CrawlConfig

# classic nine + the spider's extended modern set
# (image_spider.py:326-337: tif/avif/heic/heif/jxl/cur/avifs/webp2)
IMAGE_EXT_RE = (
    r"\.(jpg|jpeg|png|gif|webp|svg|bmp|tiff|ico"
    r"|tif|avif|heic|heif|jxl|cur|avifs|webp2)$"
)


def host_col(url: Column) -> Column:
    # try_parse_url: ANSI parse_url THROWS on strings Java's URI
    # rejects (e.g. a harvested srcset composite "…png 1x"); the
    # reference's urlparse never throws — it classifies such strings
    # invalid downstream, which NULL-host reproduces
    return F.try_parse_url(url, F.lit("HOST"))


def scheme_col(url: Column) -> Column:
    return F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)


def strip_fragment_col(url: Column) -> Column:
    return F.substring_index(url, "#", 1)


def valid_image_url_col(url: Column, cfg: CrawlConfig) -> Column:
    url_lower = F.lower(url)
    host = host_col(url)
    path_lower = F.lower(F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit("")))
    ends_img = url_lower.rlike(IMAGE_EXT_RE)
    commons = host.isNotNull() & host.endswith("commons.wikimedia.org")
    upload = host.isNotNull() & host.endswith("upload.wikimedia.org")
    thumb_zone = url_lower.contains("commons.wikimedia.org") & url_lower.contains(
        "/thumb/"
    )
    thumb_px = F.regexp_extract(url_lower, r"/(\d+)px-", 1)
    thumb_ok = F.when(
        (thumb_px != "") & (thumb_px.cast("int") < F.lit(cfg.thumb_min_px)),
        F.lit(False),
    ).otherwise(F.lit(True))
    return (
        F.when(commons & path_lower.startswith("/wiki/file:"), F.lit(False))
        .when(commons & path_lower.startswith("/wiki/special:filepath/"), F.lit(True))
        .when(upload & ends_img, F.lit(True))
        .when(thumb_zone, thumb_ok)
        .when(ends_img, F.lit(True))
        .otherwise(F.lit(False))
    )


def image_page_url_col(url: Column, base_url: Column) -> Column:
    generic = F.lower(url)
    generic_hit = (
        generic.contains("/image/")
        | generic.contains("/photo/")
        | generic.contains("/picture/")
        | generic.contains("/img/")
        | generic.contains("/gallery/")
        | generic.contains("image_id=")
        | generic.contains("photo_id=")
        | generic.contains("picture_id=")
    )
    commons_base = base_url.contains("commons.wikimedia.org")
    commons_hit = url.contains("/wiki/File:") | url.contains("/wiki/Category:")
    return F.when(commons_base, commons_hit).otherwise(generic_hit)


def allowed_link_col(url: Column, allowed_hosts: list[str]) -> Column:
    return host_col(url).isin(allowed_hosts) & scheme_col(url).isin("http", "https")


def url_ext_col(url: Column) -> Column:
    """URL-path basename extension, 'jpg' fallback (download_image naming)."""
    base = F.element_at(
        F.split(F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit("")), "/"), -1
    )
    return F.when(
        base.contains("."), F.lower(F.element_at(F.split(base, r"\."), -1))
    ).otherwise(F.lit("jpg"))


# ---------------------------------------------------------------------------
# extraction backends → per-page (url, images, cascade_cands, link_cands)
# ---------------------------------------------------------------------------

_PAGE_OUT_COLS = ("url", "images", "cascade_cands", "link_cands")


def extract_from_tables(
    wave: DataFrame,
    links: DataFrame,
    page_items: DataFrame,
    cfg: CrawlConfig,
    allowed_hosts: list[str],
) -> DataFrame:
    """wave(url, base) ⟕ links/page_items → per-page extraction arrays.

    The wave side is small relative to the corpus tables, so these joins
    broadcast the wave; at 10^10 scale they become shuffle joins on the
    page-URL key, which is exactly how a real fetch would partition.
    """
    w = wave.select("url", "base")

    # one unified occurrence relation → ONE shuffle for all three arrays
    item_rel = page_items.select(
        "src_url",
        F.col("item_idx").alias("ord"),
        "channel",
        F.col("url").alias("target"),
    )
    link_rel = links.select(
        "src_url",
        F.col("link_idx").alias("ord"),
        F.lit("link").alias("channel"),
        F.col("dst_url").alias("target"),
    )
    rel = item_rel.unionByName(link_rel)
    joined = w.join(rel, rel.src_url == w.base, "left").select(
        w.url, "ord", "channel", "target"
    )
    joined = joined.withColumn(
        "is_img", valid_image_url_col(F.col("target"), cfg)
    ).withColumn(
        "is_casc",
        (F.col("channel") == "parent_a_href")
        & ~F.col("is_img")
        & image_page_url_col(F.col("target"), F.col("url")),
    ).withColumn(
        "is_link",
        F.col("channel").isin("link", "parent_a_href")
        & allowed_link_col(F.col("target"), allowed_hosts),
    )
    occ = F.struct(
        # anchors sort plain links (document body order) before parent-<a>
        F.when(F.col("channel") == "link", F.col("ord"))
        .otherwise(F.col("ord") + F.lit(1_000_000))
        .alias("ord"),
        F.col("target").alias("target"),
        (F.col("channel") != "link").alias("is_item"),
        F.col("is_img"),
        F.col("is_casc"),
        F.col("is_link"),
    )
    agg = joined.groupBy("url").agg(F.collect_list(occ).alias("occ"))
    occs = F.sort_array(F.col("occ"))
    return agg.select(
        "url",
        F.sort_array(
            F.array_distinct(
                F.transform(
                    F.filter(occs, lambda s: s.is_item & s.is_img),
                    lambda s: s.target,
                )
            )
        ).alias("images"),
        F.transform(
            F.filter(occs, lambda s: s.is_casc), lambda s: s.target
        ).alias("cascade_cands"),
        F.transform(
            F.filter(occs, lambda s: s.is_link), lambda s: s.target
        ).alias("link_cands"),
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def _urljoin_udf(base: pd.Series, rels: pd.Series) -> pd.Series:
    from urllib.parse import urljoin

    out = []
    for b, rl in zip(base, rels):
        out.append([urljoin(b, r) for r in rl] if rl is not None else [])
    return pd.Series(out)


def extract_from_html(
    wave_pages: DataFrame, cfg: CrawlConfig, allowed_hosts: list[str]
) -> DataFrame:
    """wave_pages(url, html) → per-page extraction arrays via regexps.

    Channel regexps mirror crawling_module.py:264-318; all matching is
    JVM-side (regexp_extract_all); only urljoin is a pandas UDF.
    """
    h = F.col("html")

    # srcset values → flatten "u1 1x, u2 2x" lists, over BOTH <img> and
    # <picture><source> carriers and their data-srcset lazy twins
    # (image_spider.py:283-316 _extract_responsive_images + :654-669
    # _parse_srcset). `\s` before the attribute keeps data-srcset out of
    # the plain-srcset pattern and vice versa.
    def _srcset_flat(pattern: str):
        return F.flatten(
            F.transform(
                F.regexp_extract_all(h, F.lit(pattern), 1),
                lambda s: F.transform(
                    F.split(s, ","),
                    lambda p: F.element_at(F.split(F.trim(p), " "), 1),
                ),
            )
        )

    srcset_urls = F.concat(
        _srcset_flat(r"""<(?:img|source)\b[^>]*?\ssrcset=["']([^"']+)["']"""),
        _srcset_flat(
            r"""<(?:img|source)\b[^>]*?\sdata-srcset=["']([^"']+)["']"""
        ),
    )

    # per-<img>-tag src fallback chain (crawling_module.py:271:
    # `img.get('src') or img.get('data-src') or img.get('data-lazy-src')`)
    # — a tag carrying several of these yields exactly ONE url, the
    # first present, NOT the union of separate channels. The lookbehind
    # keeps `src=` from matching inside `data-src=`/`data-lazy-src=`.
    def _attr(tag, name: str):
        # both quote styles (BeautifulSoup parses either; the fixture
        # emits double quotes, so table≡html equivalence is unaffected)
        return F.nullif(
            F.regexp_extract(
                tag, rf'(?<![\w-]){name}=["\']([^"\']+)["\']', 1
            ),
            F.lit(""),
        )

    imgtag_urls = F.filter(
        F.transform(
            F.regexp_extract_all(h, F.lit(r"(<img\b[^>]*>)"), 1),
            lambda t: F.coalesce(
                _attr(t, "src"), _attr(t, "data-src"), _attr(t, "data-lazy-src")
            ),
        ),
        lambda u: u.isNotNull(),
    )

    raw = wave_pages.select(
        "url",
        imgtag_urls.alias("c_imgtag"),
        F.regexp_extract_all(
            h, F.lit(r"""data-file-url=["']([^"']+)["']"""), 1
        ).alias("c_file"),
        F.regexp_extract_all(
            h, F.lit(r"""url\(["']?([^"')]+)["']?\)"""), 1
        ).alias("c_css"),
        srcset_urls.alias("c_srcset"),
        # embedded-JSON image keys (ajax walk, middlewares.py:230-248);
        # the flat key-value regex is nesting-agnostic, so it equals the
        # reference's recursive dict walk for key-addressed URLs
        F.regexp_extract_all(
            h,
            F.lit(
                r'"(?:image|img|photo|picture|thumbnail|src|url)"'
                r'\s*:\s*"([^"]+)"'
            ),
            1,
        ).alias("c_ajax"),
        # bare-string sweep (middlewares.py:245-257): the recursive JSON
        # walk also harvests string VALUES that look like image URLs
        # regardless of key (un-keyed array elements like
        # {"gallery": ["https://…/a.jpg"]}); is_image_url there is a
        # substring extension check on http(s) strings, mirrored here as
        # one regexp over every <script> body. (?s): Java regex '.'
        # stops at line terminators by default, but real-world script
        # blocks span lines and the reference matches across them
        # (it regexes the full response text)
        F.flatten(
            F.transform(
                F.regexp_extract_all(
                    h, F.lit(r"(?s)<script[^>]*>(.*?)</script>"), 1
                ),
                lambda b: F.regexp_extract_all(
                    b,
                    F.lit(
                        r'"(https?://[^"]*(?i:\.(?:jpg|jpeg|png|gif'
                        r'|webp|svg|bmp))[^"]*)"'
                    ),
                    1,
                ),
            )
        ).alias("c_ajaxsweep"),
        # spider-mode JS sweep (image_spider.py:199-206): RELATIVE paths
        # and single-quoted strings too — any quoted string containing a
        # slash and ending in an image extension; absolutized below and
        # re-validated downstream like every channel. (?s) for
        # multi-line script bodies, as above
        F.flatten(
            F.transform(
                F.regexp_extract_all(
                    h, F.lit(r"(?s)<script[^>]*>(.*?)</script>"), 1
                ),
                lambda b: F.regexp_extract_all(
                    b,
                    F.lit(
                        r"""["']([^"']*/[^"']*(?i:\.(?:jpg|jpeg|png"""
                        r"""|gif|webp|svg)))["']"""
                    ),
                    1,
                ),
            )
        ).alias("c_jssweep"),
        # JSON-LD structured data (image_spider.py:211-219): the recursive
        # walk keeps exactly the string values that look like image URLs,
        # which equals a flat scan for quoted http(s) URLs inside the
        # ld+json block (validity is re-checked downstream either way)
        F.flatten(
            F.transform(
                F.regexp_extract_all(
                    h,
                    F.lit(
                        r'(?s)<script type="application/ld\+json">'
                        r"(.*?)</script>"
                    ),
                    1,
                ),
                lambda b: F.regexp_extract_all(
                    b, F.lit(r'"(https?://[^"]+)"'), 1
                ),
            )
        ).alias("c_jsonld"),
        # hidden-image / lazy data attributes — the spider's full
        # standalone lazy-attr set (image_spider.py:264-280). data-src /
        # data-lazy-src are NOT here: those are per-<img> fallback
        # members (c_imgtag above), per the parallel-mode spec. The
        # `="` terminator keeps data-lazy from matching data-lazy-src.
        F.regexp_extract_all(
            h,
            F.lit(
                r"""data-(?:background-image|full-src|original|srcset"""
                r"""|image|thumb|lazy|bg)=["']([^"']+)["']"""
            ),
            1,
        ).alias("c_databg"),
        F.regexp_extract_all(
            h, F.lit(r"""<a href=["']([^"']+)["']><img"""), 1
        ).alias("c_pa"),
        F.regexp_extract_all(
            h, F.lit(r"""<a href=["']([^"']+)["']"""), 1
        ).alias("c_a"),
    )
    # absolutize each channel against the page URL
    for c in ["c_imgtag", "c_file", "c_css", "c_srcset", "c_ajax",
              "c_ajaxsweep", "c_jssweep", "c_jsonld", "c_databg",
              "c_pa", "c_a"]:
        raw = raw.withColumn(c, _urljoin_udf(F.col("url"), F.col(c)))

    non_anchor = F.concat("c_imgtag", "c_file", "c_css", "c_srcset",
                          "c_ajax", "c_ajaxsweep", "c_jssweep",
                          "c_jsonld", "c_databg")
    img_from_any = F.array_union(
        F.filter(non_anchor, lambda u: valid_image_url_col(u, cfg)),
        F.filter(F.col("c_pa"), lambda u: valid_image_url_col(u, cfg)),
    )
    cascade = F.filter(
        F.col("c_pa"),
        lambda u: ~valid_image_url_col(u, cfg)
        & image_page_url_col(u, F.col("url")),
    )
    # document order: plain <a> anchors already include parent-<a> hrefs in
    # document order (c_a matches every anchor), mirroring extract_links
    link_cands = F.filter(
        F.col("c_a"), lambda u: allowed_link_col(u, allowed_hosts)
    )
    return raw.select(
        "url",
        F.sort_array(F.array_distinct(img_from_any)).alias("images"),
        cascade.alias("cascade_cands"),
        link_cands.alias("link_cands"),
    )
