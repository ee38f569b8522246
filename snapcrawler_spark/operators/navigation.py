"""Navigation pattern detection + capped request generation.

Relational mirror of the reference's navigation module
(core/navigation_module.py):

- ``detect_patterns``  ← PaginationDetector.detect_navigation_patterns
  (:99-145): per-page confidence per pattern family =
  0.6·(selector hits / n_selectors) + 0.4·(url-pattern hits /
  n_url_patterns), kept when confidence > 0.5, ranked by confidence
  descending. Selector checks are regex signatures over the raw HTML
  (the engine has no CSS engine; each selector maps to the substring
  it would match).
- ``navigation_requests`` ← NavigationManager.generate_navigation_requests
  (:375-404): top-2 detected patterns per page, ≤5 pagination links per
  pattern (:415), ≤10 ML-discovery links (:392), de-duplicated, ≤20
  requests total per page (:404).
- ML link relevance ← MLNavigationDiscovery._analyze_link (:289-318):
  +0.3 per link-class family matching the URL, +0.4 per family
  matching the anchor text, +0.3 once for an image-indicator hit in
  URL + ' ' + text, capped at 1.0; links with relevance > 0.5 qualify.
  The links table carries ``anchor_text`` since round 3; when the
  column is absent the text terms are simply zero (URL-only scoring).

Every window below partitions by the page URL — no global sorts; at
crawl scale the per-page group is bounded by the page's own link count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# pattern families: (pattern_type, selector regexes, url-pattern regexes)
# — regex signatures of navigation_module.py:33-96
PATTERN_FAMILIES = [
    (
        "pagination",
        [
            r'href="[^"]*page=',
            r'href="[^"]*[?&]p=',
            r'href="[^"]*/page/',
            r'class="[^"]*pagination',
            r'class="[^"]*pager',
            r'aria-label="[^"]*pagination',
            r">\s*Next\s*<",
            r">\s*&gt;\s*<",
            r'rel="next"',
        ],
        [r"page=(\d+)", r"[?&]p=(\d+)", r"/page/(\d+)", r"offset=(\d+)",
         r"start=(\d+)"],
    ),
    (
        "infinite_scroll",
        [
            r"data-infinite-scroll",
            r"data-lazy-load",
            r'class="[^"]*infinite-scroll',
            r'class="[^"]*lazy-load-container',
        ],
        [r"api/[^\"']*load[^\"']*more", r"ajax[^\"']*page",
         r"load[^\"']*next"],
    ),
    (
        "load_more",
        [
            r">\s*Load more\s*<",
            r">\s*Show more\s*<",
            r'class="[^"]*load-more',
            r"data-load-more",
        ],
        [r"load[^\"']*more", r"show[^\"']*more", r"next[^\"']*batch"],
    ),
]

# MLNavigationDiscovery.link_patterns (:232-249) — URL-class regexes
ML_LINK_CLASSES = {
    "gallery": r"gallery|photos|images|pictures",
    "category": r"category|section|topic|tag",
    "archive": r"archive|history|past|old",
    "media": r"media|multimedia|content",
}
# image_indicators (:251-255)
ML_IMAGE_INDICATORS = (
    r"jpg|jpeg|png|gif|webp|svg|photo|image|pic|picture"
)

MAX_PATTERNS_PER_PAGE = 2      # :381
MAX_PAGINATION_LINKS = 5       # :415
MAX_ML_LINKS = 10              # :392
MAX_REQUESTS_PER_PAGE = 20     # :404


def detect_patterns(pages: DataFrame) -> DataFrame:
    """pages(url, html) → (url, pattern_type, confidence_e4) for the
    top-≤2 patterns per page with confidence > 0.5.

    confidence_e4 is the floor-scaled integer confidence (hash-stable
    across engines)."""
    h = F.coalesce(F.col("html"), F.lit(""))
    per_pattern = []
    for ptype, selectors, url_pats in PATTERN_FAMILIES:
        sel_hits = sum(
            (h.rlike(s)).cast("int") for s in selectors
        )
        url_hits = sum(
            (F.lower(h).rlike(u)).cast("int") for u in url_pats
        )
        conf = (
            sel_hits / F.lit(len(selectors)) * 0.6
            + url_hits / F.lit(len(url_pats)) * 0.4
        )
        per_pattern.append(
            F.struct(
                F.lit(ptype).alias("pattern_type"),
                F.floor(
                    F.least(conf, F.lit(1.0)) * 10000
                ).cast("long").alias("confidence_e4"),
            )
        )
    exploded = pages.select(
        "url", F.explode(F.array(*per_pattern)).alias("p")
    ).select("url", "p.pattern_type", "p.confidence_e4")
    kept = exploded.where(F.col("confidence_e4") > 5000)
    w = Window.partitionBy("url").orderBy(
        F.desc("confidence_e4"), "pattern_type"
    )
    return (
        kept.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= MAX_PATTERNS_PER_PAGE)
        .drop("rk")
    )


def ml_link_relevance(dst: Column, anchor_text: Column | None = None) -> Column:
    """Relevance score (e4-scaled), mirroring _analyze_link :289-318:
    +0.3 PER link-class family matching the URL, +0.4 PER family
    matching the anchor text, +0.3 once for an image-indicator hit in
    URL + ' ' + text; min(total, 1.0)."""
    low = F.lower(dst)
    txt = F.lower(
        F.coalesce(
            anchor_text if anchor_text is not None else F.lit(""), F.lit("")
        )
    )
    rel = F.lit(0)
    for pat in ML_LINK_CLASSES.values():
        rel = rel + low.rlike(pat).cast("int") * 3000
    for pat in ML_LINK_CLASSES.values():
        rel = rel + txt.rlike(pat).cast("int") * 4000
    ind_hit = F.concat(low, F.lit(" "), txt).rlike(ML_IMAGE_INDICATORS)
    rel = rel + ind_hit.cast("int") * 3000
    return F.least(rel, F.lit(10000)).cast("long")


def navigation_requests(
    pages: DataFrame, links: DataFrame
) -> DataFrame:
    """(url, html) × (src_url, link_idx, dst_url) → capped navigation
    requests: (src_url, request_url, source, rank)."""
    detected = detect_patterns(pages)

    # pagination requests: links matching the detected family's URL
    # patterns, ≤5 per (page, pattern), document order
    url_pat_union = {
        ptype: "|".join(pats) for ptype, _sels, pats in PATTERN_FAMILIES
    }
    pat_re = F.create_map(
        *[
            F.lit(x)
            for kv in url_pat_union.items()
            for x in kv
        ]
    )
    # rlike with a per-row pattern: map the detected family to its
    # pattern alternation, then rlike(col, col) via expr
    pag = (
        links.join(
            detected.select(F.col("url").alias("src_url"), "pattern_type"),
            "src_url",
        )
        .withColumn("pat", pat_re[F.col("pattern_type")])
        .where(F.expr("rlike(lower(dst_url), pat)"))
    )
    w_pag = Window.partitionBy("src_url", "pattern_type").orderBy("link_idx")
    pag = (
        pag.withColumn("rk", F.row_number().over(w_pag))
        .where(F.col("rk") <= MAX_PAGINATION_LINKS)
        .select(
            "src_url",
            F.col("dst_url").alias("request_url"),
            F.lit("pagination").alias("source"),
            "link_idx",
        )
    )

    # ML-discovery requests: relevance > 0.5, ≤10 per page
    text_col = (
        F.col("anchor_text")
        if "anchor_text" in links.columns
        else F.lit("")
    )
    ml = links.withColumn(
        "rel_e4", ml_link_relevance(F.col("dst_url"), text_col)
    ).where(F.col("rel_e4") > 5000)
    w_ml = Window.partitionBy("src_url").orderBy("link_idx")
    ml = (
        ml.withColumn("rk", F.row_number().over(w_ml))
        .where(F.col("rk") <= MAX_ML_LINKS)
        .select(
            "src_url",
            F.col("dst_url").alias("request_url"),
            F.lit("ml").alias("source"),
            "link_idx",
        )
    )

    # union → dedup by URL per page (pagination wins) → global ≤20 cap
    both = pag.unionByName(ml)
    w_dedup = Window.partitionBy("src_url", "request_url").orderBy(
        F.when(F.col("source") == "pagination", 0).otherwise(1), "link_idx"
    )
    both = (
        both.withColumn("dk", F.row_number().over(w_dedup))
        .where(F.col("dk") == 1)
        .drop("dk")
    )
    w_cap = Window.partitionBy("src_url").orderBy(
        F.when(F.col("source") == "pagination", 0).otherwise(1), "link_idx",
        "request_url",
    )
    return (
        both.withColumn("rank", F.row_number().over(w_cap))
        .where(F.col("rank") <= MAX_REQUESTS_PER_PAGE)
        .select("src_url", "request_url", "source", "rank")
    )
