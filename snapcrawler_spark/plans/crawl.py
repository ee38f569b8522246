"""The crawl plan: Structured-Streaming-style batch waves over a URL
frontier, with exact reference ordering.

Key architectural idea (SURVEY §3.1 rebuild lifecycle): fetching is
idempotent and side-effect-free, so the engine fetches *speculatively in
bulk* — every heavy stage (fetch join, extraction, classification,
image decode, filter chain) is a distributed DataFrame computation —
while the *order-sensitive* part of the reference semantics (FIFO queue
with cascade front-insertion and enqueue-time visited marking,
crawling_module.py:80-189) is reproduced by a lightweight driver-side
replay over extracted edge metadata. One wave ≈ one BFS level, so a
depth-D crawl costs O(D) Spark jobs regardless of page count.

Replay halts at the first URL whose fetch result is unknown; everything
pending at the halt becomes the next wave's fetch set (bounded per host
by the politeness budget — per-host budget buckets replace the
reference's global request_delay sleep, crawling_module.py:180-181).

Scale note (10^10 frontier): the strict replay holds URL metadata on
the driver, which is the price of bit-exact reference ordering — the
frontier tables, seen-set bloom partitions and the whole image pipeline
remain distributed. The `wave` ordering mode (operators/politeness.py)
drops the replay for a fully relational order key when exact reference
order is not required.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snapcrawler_spark.conf import (
    CAPTCHA_INDICATORS,
    MAX_RETRIES,
    RETRYABLE_STATUSES,
    CrawlConfig,
)
from snapcrawler_spark.operators.extract import (
    extract_from_html,
    extract_from_tables,
)
from snapcrawler_spark.operators.filters import image_pipeline


@dataclass
class PageRec:
    kind: str  # 'page' | 'image' | 'missing'
    status: int | None = None
    md5: str | None = None
    images: tuple = ()
    cascades: tuple = ()
    links: tuple = ()
    transient_fails: int = 0  # attempts < this return 503 (retry model)
    is_captcha: bool = False  # body carries a CAPTCHA marker


@dataclass
class ReplayState:
    complete: bool = False
    crawl_order: list = field(default_factory=list)  # (fetch_seq, url, depth)
    image_items: list = field(default_factory=list)  # (item_seq, url, src, depth)
    visited: set = field(default_factory=set)
    robots_blocked: list = field(default_factory=list)
    captcha_blocked: list = field(default_factory=list)
    wanted: list = field(default_factory=list)  # [(base, depth)] fetch candidates


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        tables: dict[str, DataFrame],
        cfg: CrawlConfig,
        extraction: str = "tables",
        fetch_cache: dict[str, PageRec] | None = None,
    ):
        """``fetch_cache``: optional shared speculative-fetch results.
        Fetch+extract output depends only on the corpus, the seed hosts
        and cfg.thumb_min_px — callers running several configs over the
        same corpus can share one cache (fetching is idempotent)."""
        self.spark = spark
        self.t = tables
        self.cfg = cfg
        self.extraction = extraction
        self.seeds = [
            r.seed_url
            for r in tables["seeds"].orderBy("seed_idx").collect()
        ]
        self.allowed_hosts = sorted({urlparse(s).netloc for s in self.seeds})
        self.results: dict[str, PageRec] = (
            fetch_cache if fetch_cache is not None else {}
        )
        # speculative frontier: min-depth estimates for every candidate
        # URL extractable from any known page (cascade edges weight 0,
        # link edges weight 1). Fetching ahead of the replay is free —
        # fetch is idempotent — and keeps waves ≈ BFS depth even though
        # cascade front-insertion would otherwise halt the replay once
        # per cascade chain. The replay halt-set remains the exactness
        # safety net for anything the estimate skips.
        self.est_depth: dict[str, int] = {}
        self.waves = 0
        self._disallow: dict[str, list[str]] = {}
        if cfg.extra.get("robots_enabled"):
            for r in tables["robots"].collect():
                if r.disallow_prefixes:
                    self._disallow[r.host] = list(r.disallow_prefixes)

    # ------------------------------------------------------------------
    # driver-side order replay (metadata only)
    # ------------------------------------------------------------------
    def _replay(self) -> ReplayState:
        cfg = self.cfg
        st = ReplayState()
        queue: list[tuple[str, int, int]] = []  # (url, depth, attempt)
        visited: set[str] = set()
        page_hashes: set[str] = set()
        for s in self.seeds:
            queue.append((s, 0, 0))
            visited.add(s)
        request_count = 0
        fetch_seq = 0
        item_seq = 0
        halted = False
        while queue and (cfg.max_requests == 0 or request_count < cfg.max_requests):
            url, depth, attempt = queue[0]
            base = url.split("#", 1)[0]
            if cfg.max_depth > 0 and depth >= cfg.max_depth:
                queue.pop(0)
                continue
            if self._disallow:
                p = urlparse(url)
                if any(
                    p.path.startswith(pref)
                    for pref in self._disallow.get(p.netloc, ())
                ):
                    queue.pop(0)
                    st.robots_blocked.append(url)
                    continue
            rec = self.results.get(base)
            if rec is None:
                halted = True
                break
            queue.pop(0)

            # transient-failure model: attempts < transient_fails see 503
            eff_status = rec.status
            if rec.kind == "page" and attempt < rec.transient_fails:
                eff_status = 503

            # CAPTCHA → IgnoreRequest (middlewares.py:140-146): response
            # discarded, request counted, no retry
            if rec.kind == "page" and (
                eff_status == 403 or (eff_status == 200 and rec.is_captcha)
            ):
                st.captcha_blocked.append(url)
                st.crawl_order.append((fetch_seq, url, depth))
                fetch_seq += 1
                request_count += 1
                continue

            images: tuple = ()
            cascades: tuple = ()
            links: tuple = ()
            if rec.kind == "page" and eff_status == 200:
                if rec.md5 not in page_hashes:
                    page_hashes.add(rec.md5)
                    images, cascades, links = rec.images, rec.cascades, rec.links
            elif rec.kind == "image" and eff_status == 200:
                page_hashes.add(rec.md5)

            st.crawl_order.append((fetch_seq, url, depth))
            fetch_seq += 1
            for iurl in images:
                st.image_items.append((item_seq, iurl, url, depth))
                item_seq += 1
            for c in cascades:
                if c not in visited:
                    queue.insert(0, (c, depth, 0))
                    visited.add(c)
            for link in links:
                if link not in visited:
                    queue.append((link, depth + 1, 0))
                    visited.add(link)
            request_count += 1
            # retry: transient statuses re-enter the queue tail
            if (
                eff_status in RETRYABLE_STATUSES
                and attempt + 1 <= MAX_RETRIES
            ):
                queue.append((url, depth, attempt + 1))

        st.visited = visited
        if not halted:
            st.complete = True
            return st
        # fetch candidates: every queued entry with an unknown base that
        # would actually be processed (depth + robots pre-filters applied)
        seen_bases: set[str] = set()
        for u, d, _a in queue:
            if cfg.max_depth > 0 and d >= cfg.max_depth:
                continue
            if self._disallow:
                p = urlparse(u)
                if any(
                    p.path.startswith(pref)
                    for pref in self._disallow.get(p.netloc, ())
                ):
                    continue
            b = u.split("#", 1)[0]
            if b not in self.results and b not in seen_bases:
                seen_bases.add(b)
                st.wanted.append((b, d))
        return st

    # ------------------------------------------------------------------
    # distributed fetch + extraction of one wave
    # ------------------------------------------------------------------
    def _fetch_wave(self, wanted: list[tuple[str, int]]) -> None:
        cfg = self.cfg
        # politeness: per-host budget buckets in queue order
        if cfg.host_budget > 0:
            taken: dict[str, int] = {}
            batch = []
            for b, d in wanted:
                h = urlparse(b).netloc
                if taken.get(h, 0) < cfg.host_budget:
                    taken[h] = taken.get(h, 0) + 1
                    batch.append((b, d))
        else:
            batch = list(wanted)

        wave = self.spark.createDataFrame(
            [(b,) for b, _ in batch], "base string"
        ).withColumn("url", F.col("base"))

        pages = self.t["pages"]
        tf_col = (
            pages.transient_fails
            if "transient_fails" in pages.columns
            else F.lit(0).alias("transient_fails")
        )
        body = F.coalesce(F.lower(pages.html), F.lit(""))
        captcha_col = F.lit(False)
        for ind in CAPTCHA_INDICATORS:
            captcha_col = captcha_col | body.contains(ind)
        hit = wave.join(pages, wave.base == pages.url, "inner").select(
            wave.base, pages.status, pages.content_md5, pages.html, tf_col,
            captcha_col.alias("is_captcha"),
        )
        ok_pages = hit.where(F.col("status") == 200).select(
            F.col("base").alias("url"), "html"
        )
        if self.extraction == "html":
            extracted = extract_from_html(ok_pages, cfg, self.allowed_hosts)
        else:
            extracted = extract_from_tables(
                ok_pages.select("url").withColumn("base", F.col("url")),
                self.t["links"],
                self.t["page_items"],
                cfg,
                self.allowed_hosts,
            )
        page_recs = hit.select(
            "base", "status", "content_md5", "transient_fails", "is_captcha"
        ).join(
            extracted.withColumnRenamed("url", "base"), "base", "left"
        ).withColumn("kind", F.lit("page"))

        # image URLs crawled as pages: body = image bytes → md5 only
        img_fetch = self.t["image_fetch"]
        images_md5 = self.t["images"].select(
            "image_id", F.md5(F.col("bytes")).alias("bytes_md5")
        )
        miss = wave.join(pages, wave.base == pages.url, "left_anti")
        img_recs = (
            miss.join(img_fetch, miss.base == img_fetch.image_url, "inner")
            .join(images_md5, "image_id", "left")
            .select(
                "base",
                img_fetch.status,
                F.col("bytes_md5").alias("content_md5"),
                F.lit(0).alias("transient_fails"),
                F.lit(False).alias("is_captcha"),
                F.lit(None).cast("array<string>").alias("images"),
                F.lit(None).cast("array<string>").alias("cascade_cands"),
                F.lit(None).cast("array<string>").alias("link_cands"),
                F.lit("image").alias("kind"),
            )
        )

        got: set[str] = set()
        for r in page_recs.unionByName(img_recs).collect():
            got.add(r.base)
            self.results[r.base] = PageRec(
                r.kind,
                int(r.status),
                r.content_md5,
                tuple(r.images or ()),
                tuple(r.cascade_cands or ()),
                tuple(r.link_cands or ()),
                int(r.transient_fails or 0),
                bool(r.is_captcha),
            )
        for b, _ in batch:
            if b not in got:
                self.results[b] = PageRec("missing")
        self.waves += 1

    def _robots_blocked(self, url: str) -> bool:
        if not self._disallow:
            return False
        p = urlparse(url)
        return any(
            p.path.startswith(pref) for pref in self._disallow.get(p.netloc, ())
        )

    def _speculate(self) -> list[tuple[str, int]]:
        """Unknown candidate bases with min-depth estimates."""
        if not self.est_depth:
            for s in self.seeds:
                self.est_depth[s.split("#", 1)[0]] = 0
        # one propagation pass per wave over all known pages
        for base, rec in self.results.items():
            d = self.est_depth.get(base)
            if d is None or rec.kind != "page":
                continue
            for c in rec.cascades:
                cb = c.split("#", 1)[0]
                if d < self.est_depth.get(cb, 1 << 30):
                    self.est_depth[cb] = d
            for link in rec.links:
                lb = link.split("#", 1)[0]
                if d + 1 < self.est_depth.get(lb, 1 << 30):
                    self.est_depth[lb] = d + 1
        cfg = self.cfg
        out = []
        for base, d in self.est_depth.items():
            if base in self.results:
                continue
            if cfg.max_depth > 0 and d >= cfg.max_depth:
                continue
            if self._robots_blocked(base):
                continue
            out.append((base, d))
        return out

    # ------------------------------------------------------------------
    def run(self) -> dict:
        """Crawl to completion; returns DataFrames + driver metadata."""
        while True:
            st = self._replay()
            if st.complete:
                break
            wanted: dict[str, int] = dict(st.wanted)
            if not (self.cfg.max_requests > 0
                    and len(self.results) >= 2 * self.cfg.max_requests):
                for base, d in self._speculate():
                    wanted.setdefault(base, d)
            if not wanted:
                break
            self._fetch_wave(list(wanted.items()))

        spark = self.spark
        crawl_order_df = spark.createDataFrame(
            st.crawl_order or [(0, "", 0)][:0],
            "fetch_seq long, url string, depth int",
        )
        items_df = spark.createDataFrame(
            st.image_items or [],
            "item_seq long, image_url string, source_page string, depth int",
        )
        accepted, rejections = image_pipeline(
            items_df, self.t["image_fetch"], self.t["images"], self.cfg
        )
        return dict(
            crawl_order=crawl_order_df,
            items=items_df,
            accepted=accepted,
            rejections=rejections,
            seen_set=st.visited,
            robots_blocked=st.robots_blocked,
            captcha_blocked=st.captcha_blocked,
            waves=self.waves,
        )
