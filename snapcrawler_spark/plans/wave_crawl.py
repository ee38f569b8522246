"""Wave-mode crawl: the fully relational scale path.

Where strict mode (plans/crawl.py) replays exact reference FIFO order on
the driver, wave mode keeps the frontier itself distributed — this is
the configuration that runs at 10^10-URL scale and the one the bench
measures (BASELINE.json metric: URLs fetched+deduped per second).

Before wave 0 (fresh crawls), the optional sitemap feeder
(cfg.extra['sitemap_enabled'], operators/sitemap.py) resolves
robots-advertised sitemaps — including <sitemapindex> recursion — and
enqueues their page URLs as priority-0/depth-1 frontier rows through
the same seen-set probe as any other candidate.

Per wave (one Structured-Streaming-style batch iteration):

1. **select**   politeness window over the pending frontier
                (operators/politeness.py: per-host budget buckets,
                priority-before-FIFO, hot-host salting);
2. **robots**   broadcast join against the per-host robots table;
                blocked rows → lineage with reason, never fetched;
3. **fetch**    join against the pages corpus (in production: the HTTP
                fetch stage partitioned by host);
4. **dedup-page** first-wins on content MD5 within the wave (window)
                and across waves (seen-set probe on md5);
5. **extract**  posexplode of per-page link/cascade arrays; cascades
                keep their depth and get priority 0 (front-of-queue
                analog of crawling_module.py:127-145);
6. **seen**     candidate URLs dedup within wave, then a partitioned
                bloom probe-and-insert (operators/seen.py) — the
                north-rule anti-join;
7. **enqueue**  survivors become next-wave frontier rows with
                deterministic enq_seq = (wave, pid, rank-in-pid) packed
                into one BIGINT — no global sort, no
                monotonically_increasing_id (partition-dependent);
8. **images**   item rows accumulate; the filter chain + cross-wave
                phash first-wins run per wave, appending accepted/
                rejected with lineage counters;
9. **commit**   frontier/seen/metrics/accepted snapshots via the
                catalog; the wave cursor makes the crawl resumable
                (kill-and-resume ≡ uninterrupted, tested).

Ordering contract: wave mode preserves the reference's *set* semantics
(same final URL-seen set, same accepted multiset under dedup-off; same
per-phash first row under wave-major order) but relaxes exact global
FIFO to wave-major deterministic order — strict mode exists for the
bit-exact ordering gate.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import time as _time
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from snapcrawler_spark.catalog import SnapshotCatalog
from snapcrawler_spark.conf import (
    CAPTCHA_INDICATORS,
    MAX_RETRIES,
    RETRYABLE_STATUSES,
    CrawlConfig,
)
from snapcrawler_spark.operators.extract import (
    extract_from_tables,
    host_col,
)
from snapcrawler_spark.operators.filters import image_pipeline
from snapcrawler_spark.operators.order import dense_order_key
from snapcrawler_spark.operators.politeness import adapt_budgets, select_wave
from snapcrawler_spark.operators.seen import (
    BloomSeenSet,
    CuckooSeenSet,
    ExactSeenSet,
)

_SEQ_WAVE_SHIFT = 44
_SEQ_PID_SHIFT = 28


def _obs_n(obs, df) -> int:
    """Single-metric Observation value via the public ``Observation.get``
    API, with a count() fallback ONLY for the known degenerate case.

    ``Observation.get`` waits for the observed dataset's first action
    and raises on an EMPTY metrics row; the row comes back empty when
    AQE empty-relation propagation prunes the observed subtree out of
    the first completed action (e.g. a wave whose probe input is
    empty). Only in that verified case (``getRow().length() == 0``)
    fall back to counting the DataFrame directly (near-empty plan,
    trivially cheap); any other failure — or a metrics row missing the
    ``n`` key (a renamed/typo'd metric) — re-raises instead of silently
    recounting. Every observation here carries exactly one COUNT metric
    aliased ``n``; callers invoke this only after the materializing
    action completed, so ``get`` never blocks."""
    try:
        row = obs.get
    except Exception:
        # The empty-row confirmation reaches into the private Py4J
        # handle (there is no public accessor for an empty metrics
        # row); guard the introspection itself so a PySpark-internal
        # rename degrades to re-raising the ORIGINAL failure instead
        # of crashing the wave loop on an AttributeError.
        empty_row = False
        try:
            jo = getattr(obs, "_jo", None)
            empty_row = jo is not None and jo.getRow().length() == 0
        except Exception:
            empty_row = False
        if empty_row:
            return df.count()
        raise
    if "n" not in row:
        raise KeyError(
            f"observation metrics missing 'n' (got {sorted(row)})"
        )
    return int(row["n"])


# Gate for the stale-session reclaim below: a full bench-scale crawl
# leaves ~77 dead checkpoint RDDs behind; ordinary test sessions and
# fresh sessions sit far under this, so they never pay the GC.
STALE_RDD_RECLAIM_MIN = 32


def _reclaim_stale_session_state(spark: SparkSession) -> float:
    """Deterministically release a prior crawl's dead checkpoint state
    before this crawl starts. Returns seconds spent (0.0 = gate not
    tripped).

    Why (round 7, measured): every crawl leaves its per-wave
    localCheckpoint blocks behind — checkpoint blocks have no unpersist
    API, so their release path is reference-collection: the Python
    wrappers are cycle-garbage (collected only by a gen-2 pass, not
    refcounting), py4j then detaches the JVM bindings, and a JVM GC
    must run before the ContextCleaner's weak refs fire. None of that
    happens promptly on a 48 GiB heap, so a second same-session crawl
    runs against the first one's ghost state and its cleanup lands
    mid-crawl (the measured "second-crawl drag": +12-39% wall).
    Forcing ONLY a JVM GC makes it worse (the rejected
    periodicGC.interval trial — the Python cycles still pin the
    bindings, so the GC pays its pause and frees nothing). The working
    order, A/B-measured in one JVM at bench scale (105.5 s fresh /
    118.4 s dragged / 103.3 s after this exact sequence), is:
    break the Python cycles first (gc.collect), THEN collect the JVM
    (System.gc), then give the ContextCleaner a bounded drain window —
    all BETWEEN crawls, where the pause costs setup seconds instead of
    stalling wave actions.

    Safety: both collections are semantics-free — live state (a
    concurrent crawl's seen tables, a caller's cached DataFrames) is
    reachable and therefore untouched; only garbage is released. The
    gate keeps the cost off every small-session path."""
    import gc

    jsc = spark.sparkContext._jsc
    try:
        n = len(jsc.sc().getRDDStorageInfo())
    except Exception:
        return 0.0
    if n < STALE_RDD_RECLAIM_MIN:
        return 0.0
    t0 = _time.time()
    cur = n
    # TWO JVM collections are required, not one (measured): py4j queues
    # the detach commands produced by Python-side finalization and only
    # flushes them alongside the NEXT gateway command — which is the
    # System.gc() call itself — so the first collection always runs
    # before the JVM bindings are actually released and frees nothing;
    # the second collection then reclaims the whole pile (40 → 1 in the
    # sequencing probe). The drain poll after each collection gives the
    # ContextCleaner's own thread time to remove the blocks; live
    # blocks legitimately keep the count above zero, hence the
    # below-gate break rather than a zero target.
    for _ in range(3):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        deadline = _time.time() + 1.2
        while _time.time() < deadline:
            _time.sleep(0.1)
            cur = len(jsc.sc().getRDDStorageInfo())
            if cur < STALE_RDD_RECLAIM_MIN:
                break
        if cur < STALE_RDD_RECLAIM_MIN:
            break
    return _time.time() - t0


@dataclass
class WaveMetrics:
    wave: int
    selected: int
    fetched_ok: int
    robots_blocked: int
    dup_pages: int
    candidates: int
    deduped_new: int
    items: int


class WaveCrawl:
    def __init__(
        self,
        spark: SparkSession,
        tables: dict[str, DataFrame],
        cfg: CrawlConfig,
        catalog: SnapshotCatalog | None = None,
        seen_kind: str = "bloom",
        collect_metrics: bool = True,
        count_candidates: bool = False,
    ):
        """``collect_metrics=False`` drops the optional per-wave lineage
        counts (n_ok / dup_pages / items / deduped_new) — each is a
        Spark action, and the bench only needs fetched + candidates.
        ``count_candidates=True`` keeps ONLY the per-wave candidate
        count (one extra action/wave) so the bench can report the
        legacy round-1 throughput numerator alongside the pinned one."""
        self.collect_metrics = collect_metrics
        self.count_candidates = count_candidates
        self.total_candidates = 0
        self.spark = spark
        # release any prior crawl's dead checkpoint state up front (see
        # _reclaim_stale_session_state) — timed into the setup phase
        reclaim_secs = _reclaim_stale_session_state(spark)
        self.t = tables
        self.cfg = cfg
        self.catalog = catalog
        # scratch dir for wave-boundary frontier snapshots and (catalog-
        # less runs) the bucketed seen store — created before the seen
        # backend, which may need a path under it
        self._scratch = tempfile.mkdtemp(prefix="snapcrawler_waves_")
        atexit.register(shutil.rmtree, self._scratch, True)
        if seen_kind == "bloom":
            self.seen = BloomSeenSet(
                spark,
                partitions=cfg.seen_partitions,
                m_bits=1 << 17,
                n_hashes=5,
            )
        elif seen_kind == "cuckoo":
            self.seen = CuckooSeenSet(
                spark, partitions=cfg.seen_partitions
            )
        elif seen_kind == "bucketed":
            # deployment-shaped seen path: bloom probe + url-bucketed
            # on-disk exact history, so the per-wave rescue anti-join
            # scans the history in place (one exchange — the sliver)
            # instead of shuffling it. Store files live in the catalog
            # root when resumability is wanted, else under scratch.
            from snapcrawler_spark.operators.seen import BucketedExactStore

            store_root = catalog.root if catalog is not None else self._scratch
            self.seen = BloomSeenSet(
                spark,
                partitions=cfg.seen_partitions,
                m_bits=1 << 17,
                n_hashes=5,
                exact_store=BucketedExactStore(
                    spark, os.path.join(store_root, "seen_bucketed")
                ),
            )
        else:
            self.seen = ExactSeenSet(spark)
        # page-content md5 set: one key per fetched page (small) — a plain
        # exact anti-join is cheaper than a bloom probe here; the bloom
        # machinery is for the 10^10-URL frontier, not the page-md5 set
        self.md5_seen = ExactSeenSet(spark)
        seeds = tables["seeds"].orderBy("seed_idx").collect()
        self.seed_urls = [r.seed_url for r in seeds]
        from urllib.parse import urlparse

        self.allowed_hosts = sorted({urlparse(s).netloc for s in self.seed_urls})
        self.metrics: list[WaveMetrics] = []
        self.items_parts: list[DataFrame] = []
        self.total_fetched = 0
        self.wave = 0
        self._restored_frontier: DataFrame | None = None
        # adaptive politeness (middlewares_advanced.py:379-417 control law
        # in budget space): per-host budgets fed back from fetch statuses
        self.budgets: DataFrame | None = None
        self.budget_history: list[dict] = []
        # per-wave (host, status, outcome) fetch lineage
        # (filtering_module.py:53,245-247 error-tally analog)
        self.tally_parts: list[DataFrame] = []
        # plain persist() handles released during/after run() — tracked
        # so tests can assert nothing stays cached (cache-leak guard)
        self._wave_persists: list[DataFrame] = []
        # cumulative wall-seconds spent inside wave-end unpersist()
        # calls; the regression guard asserts this stays O(seconds)
        # (the round-3 CacheManager stall burned minutes per release)
        self._unpersist_secs = 0.0
        # per-phase wall-second accumulators, keyed by the blocking
        # driver call that runs each wave's jobs (laziness means each
        # phase includes everything computed since the previous action):
        # items_ckpt = politeness+fetch+md5 window+lazy md5-probe delta
        # +extraction+items (the wave's FIRST action since the round-5
        # md5 fold — the former md5_probe phase rides here); seen_probe
        # = the candidate min_by dedup + the cogroup plan's
        # creation-time intermediate stages (round 6: the cogroup STATE
        # checkpoint is lazy too, so the pandas probe itself and the
        # new-URLs delta defer to the commit — what remains here is the
        # candidate-pipeline work AQE executes at lazy-checkpoint
        # creation); frontier_commit = deferred cogroup+delta result
        # stages+verdict filter+exact-rescue anti-join+parquet
        # round-trip
        self.phase_secs: dict[str, float] = {}
        if reclaim_secs:
            self.phase_secs["stale_reclaim"] = reclaim_secs
        # NOTE on self._scratch (created at the top of __init__): it
        # holds wave-boundary frontier snapshots (the local stand-in
        # for the Iceberg snapshot store); only the latest wave's file
        # is kept. The returned frontier reads from here, so the dir
        # must outlive run() AND this instance (callers keep using the
        # returned DataFrame after the WaveCrawl is garbage-collected —
        # a GC-tied finalizer broke exactly that). Cleanup therefore
        # happens at explicit close() or interpreter exit, whichever
        # comes first; tests creating many WaveCrawl instances no
        # longer leak scratch dirs past process exit.

    def close(self) -> None:
        """Remove the scratch dir (frontier snapshots) and drop the
        bucketed seen store's session-catalog entry if one exists (the
        files persist when they live under a SnapshotCatalog root — a
        later resume re-registers them). Call only once the returned
        frontier DataFrame is no longer needed — it reads from this
        dir."""
        store = getattr(self.seen, "exact_store", None)
        if store is not None:
            store.drop()
        shutil.rmtree(self._scratch, ignore_errors=True)

    def restore(self) -> None:
        """Resume from the last committed wave: frontier + seen-set bloom
        bitmaps + exact audit table + cumulative counters (north rule:
        resumable from checkpoint with per-partition lineage)."""
        assert self.catalog is not None, "restore() needs a catalog"
        committed = self.catalog.committed_wave()
        if committed is None:
            return
        import json
        import os

        restored = self.catalog.table("frontier").read()
        if "attempt" not in restored.columns:  # pre-retry snapshots
            restored = restored.withColumn("attempt", F.lit(0))
        self._restored_frontier = restored
        self.seen.restore(self.catalog, "seen")
        self.md5_seen.restore(self.catalog, "md5_seen")
        with open(os.path.join(self.catalog.root, "wave_cursor.json")) as f:
            meta = json.load(f)
        self.total_fetched = meta.get("total_fetched", 0)
        self.wave = committed + 1

    def _seed_frontier(self) -> DataFrame:
        rows = [
            (u, i) for i, u in enumerate(self.seed_urls)
        ]
        df = self.spark.createDataFrame(rows, "url string, enq_seq long")
        return df.select(
            "url",
            host_col(F.col("url")).alias("host"),
            F.lit(0).alias("depth"),
            F.lit(1).alias("priority"),
            "enq_seq",
            F.lit(0).alias("wave"),
            F.lit(0).alias("attempt"),
        )

    def _sitemap_frontier(self) -> DataFrame | None:
        """Sitemap feeder (navigation_module.py:147-225 analog), switched
        by cfg.extra['sitemap_enabled']: sitemap roots come from robots
        (``Sitemap:`` lines, else the advertised list), index documents
        recurse one join-back pass per level, and the resulting page
        URLs enter the wave-0 frontier as priority-0 / depth-1 rows —
        subject to the same seen-set probe as any other candidate.
        enq_seq sits between the seeds and wave-1 discoveries
        (1 << 40 band), so FIFO-wise they queue right after the seeds."""
        if not self.cfg.extra.get("sitemap_enabled") or "sitemaps" not in self.t:
            return None
        from snapcrawler_spark.operators.sitemap import (
            resolve_sitemaps,
            sitemaps_from_robots,
        )

        robots = self.t["robots"]
        if "robots_txt" in robots.columns:
            roots = sitemaps_from_robots(robots)
        else:
            roots = robots.select(
                "host", F.explode("sitemap_urls").alias("sitemap_url")
            )
        entries = (
            resolve_sitemaps(roots, self.t["sitemaps"])
            .select("url")
            .where(host_col(F.col("url")).isin(self.allowed_hosts))
            .distinct()
        )
        new_rows = self.seen.probe_new(entries, assume_unique=True)
        pid = F.pmod(F.xxhash64("url"), F.lit(self.cfg.seen_partitions))
        w = Window.partitionBy(pid).orderBy("url")
        return new_rows.select(
            "url",
            host_col(F.col("url")).alias("host"),
            F.lit(1).alias("depth"),
            F.lit(0).alias("priority"),
            (
                F.lit(1 << 40).cast("long")
                + F.shiftleft(pid, _SEQ_PID_SHIFT)
                + F.row_number().over(w)
            ).alias("enq_seq"),
            F.lit(0).alias("wave"),
            F.lit(0).alias("attempt"),
        )

    def _pack_seq(self, df: DataFrame, wave: int) -> DataFrame:
        """Deterministic enq_seq without a global sort: wave-major, then
        hash-partition id, then rank within the partition ordered by the
        parent's enqueue position."""
        pid = F.pmod(F.xxhash64("url"), F.lit(self.cfg.seen_partitions))
        w = Window.partitionBy(pid).orderBy("parent_seq", "link_idx", "url")
        return df.withColumn(
            "enq_seq",
            F.lit((wave + 1) << _SEQ_WAVE_SHIFT).cast("long")
            + F.shiftleft(pid, _SEQ_PID_SHIFT)
            + F.row_number().over(w),
        )

    def stats(self) -> dict:
        """Derived crawl statistics from the per-wave lineage counters
        (parallel_manager.py:124-144 stats-fold analog): totals plus
        floor-scaled e4 rates, all integer-exact."""
        m = self.metrics
        fetched = sum(x.selected for x in m)
        ok = sum(max(x.fetched_ok, 0) for x in m)
        cands = sum(max(x.candidates, 0) for x in m)
        new = sum(max(x.deduped_new, 0) for x in m)
        items = sum(max(x.items, 0) for x in m)
        return dict(
            fetched=fetched,
            ok=ok,
            candidates=cands,
            new_urls=new,
            items=items,
            dedup_rate_e4=(cands - new) * 10000 // cands if cands else 0,
            ok_rate_e4=ok * 10000 // fetched if fetched else 0,
            items_per_ok_e4=items * 10000 // ok if ok else 0,
        )

    def run(self, max_waves: int = 64) -> dict:
        t_run0 = _time.time()
        cfg = self.cfg
        spark = self.spark
        pages = self.t["pages"]
        robots = self.t["robots"]

        if self._restored_frontier is not None:
            frontier = self._restored_frontier
        else:
            frontier = self._seed_frontier()
            self.seen.probe_new(frontier.select("url"), assume_unique=True)
            sm = self._sitemap_frontier()
            if sm is not None:
                frontier = frontier.unionByName(sm)

        # robots crawl-delay → initial per-host budget seed (opt-in):
        # the reference sleeps crawl_delay seconds between same-host
        # fetches; in logical wave time that is budget ∝ 1/delay
        # (budget = ceil(host_budget / delay), floored at 1). Adaptive
        # politeness, when on, evolves from these seeds.
        if (
            self.budgets is None
            and cfg.host_budget > 0
            and cfg.extra.get("respect_crawl_delay")
            and "crawl_delay" in robots.columns
        ):
            self.budgets = robots.select(
                "host",
                F.greatest(
                    F.lit(1),
                    F.ceil(
                        cfg.host_budget
                        / F.greatest(F.col("crawl_delay"), F.lit(1.0))
                    ),
                ).cast("int").alias("budget"),
            ).localCheckpoint()

        # per-wave counts ride on jobs that already scan the data
        # (df.observe piggybacked on the probe/checkpoint actions) —
        # at 10^10-URL scale a count() is a full extra frontier pass
        # per wave. _pending_next carries the frontier size observed
        # during the previous wave's checkpoint; the first wave (or a
        # resume) pays one count.
        pending_next: int | None = None
        end_wave = self.wave + max_waves
        self.phase_secs["setup"] = _time.time() - t_run0
        while self.wave < end_wave:
            t_wave0 = _time.time()
            pending_n = (
                pending_next if pending_next is not None else frontier.count()
            )
            if pending_n == 0:
                break
            if cfg.max_requests > 0 and self.total_fetched >= cfg.max_requests:
                break

            if cfg.host_budget > 0 or cfg.extra.get("hot_threshold", 0) > 0:
                selected = select_wave(
                    frontier,
                    budgets=self.budgets,
                    default_budget=cfg.host_budget if cfg.host_budget > 0 else 1 << 30,
                    hot_threshold=cfg.extra.get("hot_threshold", 0),
                    salt_buckets=cfg.hot_host_salt,
                ).persist()
                # tracked handle: released at wave end with the others
                # (the variable gets rebound by the depth filter below)
                self._wave_persists.append(selected)
                rest = frontier.join(selected.select("url"), "url", "left_anti")
            else:
                # unlimited budget: the whole frontier is this wave — skip
                # the politeness window and the anti-join entirely.
                # NOTE: selected aliases the parquet-backed frontier —
                # nothing to persist or release here
                selected = frontier
                rest = frontier.limit(0)

            # depth cap BEFORE the robots gate: the reference's run loop
            # checks depth and `continue`s before consulting robots
            # (crawling_module.py:186-188 → :191), so a depth-capped
            # disallowed URL is skipped, NOT counted robots-blocked —
            # gate order is observable through the blocked counter
            # (pinned by test_wave_robots_blocked_metric_matches_oracle)
            if cfg.max_depth > 0:
                selected = selected.where(F.col("depth") < cfg.max_depth)

            # robots gate (engine capability; reference analog: scrapy
            # ROBOTSTXT_OBEY, settings.py:34)
            if cfg.extra.get("robots_enabled"):
                # no broadcast hint: per-host cardinality is small at
                # fixture scale (AQE broadcasts it on its own) but a
                # 10^8-host web makes a FORCED broadcast multi-GB —
                # let AQE pick the strategy from runtime sizes
                r = robots.select(
                    "host", F.explode("disallow_prefixes").alias("pref")
                )
                blocked = (
                    selected.join(r, "host")
                    .where(
                        F.expr(
                            "startswith(try_parse_url(url, 'PATH'), pref)"
                        )
                    )
                    .select("url")
                    .distinct()
                )
                # blocked is a subtree of the fetchable anti-join, which
                # the md5-probe job scans — the count rides that job as
                # an observation instead of a dedicated action
                obs_blocked = Observation()
                blocked = blocked.observe(
                    obs_blocked, F.count(F.lit(1)).alias("n")
                )
                fetchable = selected.join(blocked, "url", "left_anti")
                n_blocked = -1
            else:
                fetchable = selected
                n_blocked = 0


            # fetch: base URL (fragment stripped) against the pages corpus.
            # persist: `hit` fans out to ok/retries/tally within the wave;
            # released at wave end (lineage back to the frontier checkpoint
            # stays recomputable for the crawl-end items union). The
            # selected count is an observation resolved by the md5-probe
            # job (the first full scan) — no dedicated count() pass.
            obs_sel = Observation()
            fetchable = fetchable.withColumn(
                "base", F.substring_index("url", "#", 1)
            ).observe(obs_sel, F.count(F.lit(1)).alias("n")).persist()
            self._wave_persists.append(fetchable)
            page_cols = [F.col("url").alias("base"), "status", "content_md5"]
            if "transient_fails" in pages.columns:
                page_cols.append(F.col("transient_fails"))
            if "html" in pages.columns:
                body = F.coalesce(F.lower(F.col("html")), F.lit(""))
                captcha_col = F.lit(False)
                for ind in CAPTCHA_INDICATORS:
                    captcha_col = captcha_col | body.contains(ind)
                page_cols.append(captcha_col.alias("page_captcha"))
            hit = fetchable.join(pages.select(*page_cols), "base", "left")
            if "transient_fails" not in hit.columns:
                hit = hit.withColumn("transient_fails", F.lit(0))
            if "page_captcha" not in hit.columns:
                hit = hit.withColumn("page_captcha", F.lit(False))
            # a fetch at attempt a < transient_fails returns 503 (the
            # transient-failure model of the fixture; production analog:
            # the HTTP stage's real status for this attempt)
            hit = hit.withColumn(
                "eff_status",
                F.when(
                    F.col("attempt") < F.coalesce("transient_fails", F.lit(0)),
                    F.lit(503),
                ).otherwise(F.col("status")),
            )
            # CAPTCHA gate (middlewares.py:109-157): 403 or a marker in
            # the body → IgnoreRequest (dropped, tallied, never retried)
            hit = hit.withColumn(
                "is_captcha",
                (F.col("eff_status") == 403)
                | (
                    (F.col("eff_status") == 200)
                    & F.coalesce("page_captcha", F.lit(False))
                ),
            )
            ok = hit.where((F.col("eff_status") == 200) & ~F.col("is_captcha"))
            obs_ok = None
            if self.collect_metrics:
                obs_ok = Observation()
                ok = ok.observe(obs_ok, F.count(F.lit(1)).alias("n"))

            # retry: transient statuses re-enter the frontier with
            # attempt+1 <= MAX_RETRIES (settings.py:84-85; queue-tail
            # re-enqueue in the reference's scheduler)
            retries = (
                hit.where(
                    F.col("eff_status").isin(list(RETRYABLE_STATUSES))
                    & (F.col("attempt") + 1 <= MAX_RETRIES)
                )
                .select(
                    "url", "host", "depth", "priority", "enq_seq",
                    (F.col("attempt") + 1).alias("attempt"),
                )
                .withColumn("wave", F.lit(self.wave + 1))
                .select(
                    "url", "host", "depth", "priority", "enq_seq",
                    "wave", "attempt",
                )
            )

            # MD5 page dedup: within-wave first-wins + cross-wave probe.
            # The probe's delta checkpoint is LAZY (eager=False): its
            # materialization rides the items-checkpoint job below — the
            # wave's first action — instead of paying a dedicated
            # politeness+fetch+window pass of its own (r4 profile:
            # md5_probe ~14 s + items_ckpt ~14 s over the SAME upstream
            # lineage; folding them computes that lineage once, one
            # fewer action per wave). The riding fetch-side observations
            # (obs_sel/obs_ok/obs_blocked) resolve on that same action,
            # so their reads sit after the items checkpoint.
            w_md5 = Window.partitionBy("content_md5").orderBy(
                "priority", "enq_seq"
            )
            ok = ok.withColumn("md5_rank", F.row_number().over(w_md5))
            firsts = ok.where(F.col("md5_rank") == 1)
            probed = self.md5_seen.probe_and_insert(
                firsts.select(F.col("content_md5").alias("url")),
                assume_unique=True,
                eager=False,
            ).withColumnRenamed("url", "content_md5")
            fresh = firsts.join(
                probed.where("was_new").select("content_md5"), "content_md5"
            )
            obs_fresh = None
            if self.collect_metrics:
                obs_fresh = Observation()
                fresh = fresh.observe(obs_fresh, F.count(F.lit(1)).alias("n"))

            # extraction over fresh pages only. Persisted: three jobs
            # consume it this wave (items checkpoint, seen cogroup via
            # cands, frontier commit via probed→new_frontier) — without
            # the cache the extraction join re-executes in each.
            extracted = extract_from_tables(
                fresh.select(F.col("url"), F.col("base")),
                self.t["links"],
                self.t["page_items"],
                cfg,
                self.allowed_hosts,
            ).join(
                fresh.select("url", "depth", "enq_seq", "priority"), "url"
            ).persist()
            self._wave_persists.append(extracted)

            items = extracted.select(
                F.col("enq_seq").alias("parent_seq"),
                F.col("url").alias("source_page"),
                "depth",
                F.posexplode("images").alias("img_idx", "image_url"),
            )
            # EAGER localCheckpoint, not a lazy persist(): a lazy cache
            # entry here keeps a many-wave union-of-join plan registered
            # with the CacheManager, and every later unpersist() walks
            # those entries computing plan-size statistics whose
            # sizeInBytes estimates compound multiplicatively into
            # astronomically large BigIntegers — tens of single-threaded
            # CPU-minutes per wave-end release (the round-3 bench
            # killer). The checkpoint truncates the plan to a LogicalRDD
            # (O(1) stats), costs the one materialization pass the
            # items count used to pay anyway, and its observation
            # resolves on that same pass.
            obs_items = None
            if self.collect_metrics:
                obs_items = Observation()
                items = items.observe(obs_items, F.count(F.lit(1)).alias("n"))
            t_ph = _time.time()
            items = items.localCheckpoint()
            self.phase_secs["items_ckpt"] = (
                self.phase_secs.get("items_ckpt", 0.0) + _time.time() - t_ph
            )
            self.items_parts.append(items)
            n_items = _obs_n(obs_items, items) if obs_items is not None else -1
            # the items checkpoint was the wave's first action: it
            # materialized the lazy md5-probe delta and scanned every
            # fetchable partition, so the fetch-side observations are
            # resolved — no count() jobs needed
            n_selected = _obs_n(obs_sel, fetchable)
            n_ok = _obs_n(obs_ok, ok) if obs_ok is not None else -1
            if n_blocked < 0:
                n_blocked = _obs_n(obs_blocked, blocked)

            link_cand = extracted.select(
                F.col("enq_seq").alias("parent_seq"),
                F.col("depth").alias("parent_depth"),
                F.posexplode("link_cands").alias("link_idx", "url"),
            ).select(
                "url",
                (F.col("parent_depth") + 1).alias("depth"),
                F.lit(1).alias("priority"),
                "parent_seq",
                "link_idx",
            )
            casc_cand = extracted.select(
                F.col("enq_seq").alias("parent_seq"),
                F.col("depth"),
                F.posexplode("cascade_cands").alias("ci", "url"),
            ).select(
                "url",
                "depth",
                F.lit(0).alias("priority"),
                "parent_seq",
                (-F.col("ci")).alias("link_idx"),  # cascade reversal analog
            )
            cands = casc_cand.unionByName(link_cand)
            # within-wave dedup: first enqueuer wins — min_by over the
            # (priority, parent_seq, link_idx) order key as a hash
            # AGGREGATE, not a rank window (round 6): the groupBy gets
            # a map-side partial combine, so duplicate candidate URLs
            # (the dominant case in a dense web: many pages link the
            # same target) collapse BEFORE the shuffle and nothing gets
            # sorted — strictly less exchange traffic than the
            # row_number window at any scale, same winner (struct
            # comparison is lexicographic; key ties are impossible —
            # parent_seq disambiguates enqueuers, link_idx positions
            # within one parent, and intra-page dedup ran upstream)
            order_key = F.struct("priority", "parent_seq", "link_idx")
            payload = F.struct("depth", "priority", "parent_seq", "link_idx")
            # persisted: the seen cogroup job and the frontier-commit
            # job (probe_and_insert joins verdict flags back onto this
            # plan) both consume it — cache instead of re-running the
            # dedup agg twice
            cands = (
                cands.groupBy("url")
                .agg(F.min_by(payload, order_key).alias("__b"))
                .select("url", "__b.*")
                .persist()
            )
            self._wave_persists.append(cands)
            want_counts = self.collect_metrics or self.catalog is not None
            obs_cands = None
            if want_counts or self.count_candidates:
                obs_cands = Observation()
                cands = cands.observe(
                    obs_cands, F.count(F.lit(1)).alias("n")
                )

            # the seen probe's eager cogroup checkpoint scans every cands
            # partition — cands/fresh observations resolve here for free.
            # For the cogroup backends the NEW-URLS delta checkpoint is
            # LAZY (eager=False): the frontier commit below consumes it
            # (probed → new_frontier), so the delta's result stage rides
            # that write instead of paying a dedicated job per wave —
            # the same fold the md5 probe does onto the items
            # checkpoint. Everything between here and the commit
            # (tally, budgets) derives from the fetch side, not the
            # delta, and the catalog snapshot that appends the delta
            # runs after the commit, so the delta is always
            # materialized before read. The EXACT backend must stay
            # eager: it has no state pass of its own, and a lazy delta's
            # creation event would latch a racy (often zero) value into
            # obs_cands — the CollectMetrics sits above the candidate
            # window, i.e. in the delta's final (unexecuted) stage
            # (tests/test_observation_safety.py pins the hazard class).
            # round 6: the cogroup STATE checkpoint is lazy too
            # (state_eager=False) — the pandas probe is the merged
            # plan's final stage, so it rides the frontier commit with
            # the delta instead of paying a dedicated per-wave job; the
            # exchanges below it (candidate window + both pid shuffles)
            # still run at creation, resolving obs_cands (attached
            # UNDER the candidate window — below the cogroup's last
            # exchange, the r5-pinned safe position).
            t_ph = _time.time()
            is_exact = isinstance(self.seen, ExactSeenSet)
            probed = self.seen.probe_and_insert(
                cands,
                assume_unique=True,
                eager=is_exact,
                state_eager=is_exact,
            )
            self.phase_secs["seen_probe"] = (
                self.phase_secs.get("seen_probe", 0.0) + _time.time() - t_ph
            )
            n_cands = (
                _obs_n(obs_cands, cands) if obs_cands is not None else -1
            )
            self.total_candidates += max(n_cands, 0)
            n_fresh = (
                _obs_n(obs_fresh, fresh) if obs_fresh is not None else -1
            )
            new_rows = probed.where("was_new").drop("was_new")
            new_frontier = self._pack_seq(new_rows, self.wave).select(
                "url",
                host_col(F.col("url")).alias("host"),
                "depth",
                "priority",
                "enq_seq",
                F.lit(self.wave + 1).alias("wave"),
                F.lit(0).alias("attempt"),
            )

            # fetch lineage: per-(host, status, outcome) tally — the
            # engine table behind the reference's error counters
            # (filtering_module.py:53,245-247) and the adaptive-politeness
            # feedback signal
            adaptive = cfg.host_budget > 0 and cfg.extra.get(
                "adaptive_politeness"
            )
            if want_counts or adaptive:
                outcome = (
                    F.when(F.col("is_captcha"), F.lit("captcha"))
                    .when(F.col("eff_status") == 200, F.lit("ok"))
                    .when(
                        F.col("eff_status").isin(list(RETRYABLE_STATUSES)),
                        F.lit("transient"),
                    )
                    .when(F.col("eff_status").isNull(), F.lit("missing"))
                    .otherwise(F.lit("http_error"))
                )
                tally = (
                    hit.groupBy(
                        "host",
                        F.col("eff_status").alias("status"),
                        outcome.alias("outcome"),
                    )
                    .agg(F.count("*").alias("n"))
                    .withColumn("wave", F.lit(self.wave))
                    .localCheckpoint()
                )
                self.tally_parts.append(tally)
            if adaptive:
                # budget recurrence consumed by the NEXT select_wave
                wave_status = tally.groupBy("host").agg(
                    F.sum(
                        F.when(F.col("outcome") == "ok", F.col("n")).otherwise(0)
                    ).cast("int").alias("n_ok"),
                    F.sum(
                        F.when(
                            F.col("outcome") == "transient", F.col("n")
                        ).otherwise(0)
                    ).cast("int").alias("n_err"),
                )
                prev = self.budgets
                if prev is None:
                    prev = spark.createDataFrame([], "host string, budget int")
                self.budgets = adapt_budgets(
                    prev,
                    wave_status,
                    base=cfg.host_budget,
                    base_max=cfg.extra.get("budget_max", 8 * cfg.host_budget),
                    backoff=cfg.extra.get("budget_backoff", 2.0),
                ).localCheckpoint()
                if self.collect_metrics:
                    self.budget_history.append(
                        {r.host: r.budget for r in self.budgets.collect()}
                    )

            obs_new = None
            if want_counts:
                obs_new = Observation()
                new_frontier = new_frontier.observe(
                    obs_new, F.count(F.lit(1)).alias("n")
                )
            # wave-boundary commit: parquet round-trip, NOT localCheckpoint.
            # Dataset.localCheckpoint eagerly computes the origin plan's
            # size-in-bytes statistics and CARRIES them onto the new
            # LogicalRDD (LogicalRDD.fromDataset → rewriteStatsAndConstraints);
            # because the size-only stats visitor takes the PRODUCT of
            # child sizes for joins/cogroups, carried stats compound
            # multiplicatively wave over wave — S_w ≈ S_{w-1}² — until a
            # single checkpoint call burns CPU-minutes multiplying
            # million-bit BigIntegers (jstack-proven; killed BENCH_r03
            # and the first round-4 attempt). The frontier is the hub of
            # that recurrence: every other per-wave plan derives from it,
            # so re-reading it from parquet (real file-size stats, O(1))
            # caps all carried stats at linear growth. This is also the
            # production-faithful design — wave state lives in the
            # snapshot store (Iceberg analog), not executor-memory
            # lineage — and the write is the action that resolves the
            # riding observations.
            obs_pending = Observation()
            fr_path = os.path.join(self._scratch, f"frontier_{self.wave}")
            t_ph = _time.time()
            # size the snapshot's file count from the pending estimate
            # (~4M rows ≈ 128 MB per file): small frontiers write ONE
            # file instead of one per upstream task — file-commit and
            # task-schedule overhead is the dominant cost of the commit
            # at micro-batch sizes, while at 10^10 pending rows this
            # yields thousands of files and full write parallelism.
            # coalesce (not repartition): no extra shuffle; upstream
            # stages keep their own parallelism past the last exchange.
            est = max(pending_n, n_cands if n_cands > 0 else 0)
            n_files = max(1, min(4096, est // 4_000_000 + 1))
            (
                rest.unionByName(new_frontier).unionByName(retries)
            ).coalesce(n_files).observe(
                obs_pending, F.count(F.lit(1)).alias("n")
            ).write.mode("overwrite").parquet(fr_path)
            # explicit schema: skips the per-wave footer-inference pass
            # (parquet fields resolve by name, so column order is free)
            frontier = spark.read.schema(frontier.schema).parquet(fr_path)
            self.phase_secs["frontier_commit"] = (
                self.phase_secs.get("frontier_commit", 0.0)
                + _time.time() - t_ph
            )
            prev = os.path.join(self._scratch, f"frontier_{self.wave - 1}")
            if os.path.isdir(prev):
                shutil.rmtree(prev, ignore_errors=True)
            pending_next = _obs_n(obs_pending, frontier)
            n_new = _obs_n(obs_new, new_frontier) if obs_new is not None else -1
            self.total_fetched += n_selected
            self.metrics.append(
                WaveMetrics(
                    self.wave, n_selected, n_ok, n_blocked,
                    n_ok - n_fresh, n_cands, n_new, n_items,
                )
            )

            if self.catalog is not None:
                self.catalog.table("frontier").overwrite(
                    frontier, wave=self.wave
                )
                self.catalog.table("fetch_tally").append(tally, wave=self.wave)
                self.seen.snapshot(self.catalog, "seen")
                self.md5_seen.snapshot(self.catalog, "md5_seen")
                items_w = items.withColumn("wave", F.lit(self.wave))
                self.catalog.table("items").append(
                    items_w,
                    counters=dict(
                        fetched=n_selected,
                        deduped=n_cands - n_new,
                        robots_blocked=n_blocked,
                        items=n_items,
                    ),
                    wave=self.wave,
                )
                self.catalog.commit_wave(
                    self.wave, {"total_fetched": self.total_fetched}
                )
            # release the wave's fetch cache now that every in-wave
            # consumer (counts, tally, items checkpoint, frontier
            # checkpoint, catalog appends) has materialized. With the
            # per-wave items eagerly checkpointed above, no registered
            # cache entry references these plans anymore, so the
            # CacheManager walk these unpersists trigger is O(live
            # entries × bounded plans) — the timer feeds the regression
            # guard pinning that property (round-3 stall: minutes here).
            t_up = _time.time()
            # release the tracked handles (the persisted plans, not any
            # wrapper rebindings) in reverse dependency order
            # (cands → extracted → fetchable → selected): each
            # unpersist's CacheManager walk then never has to rebuild a
            # still-registered entry whose plan contains the one being
            # dropped
            for df_ in reversed(self._wave_persists):
                df_.unpersist()
            self._wave_persists.clear()
            self._unpersist_secs += _time.time() - t_up
            self.phase_secs["wave_wall"] = (
                self.phase_secs.get("wave_wall", 0.0) + _time.time() - t_wave0
            )
            self.wave += 1

        # ---- image phase over all items (deterministic wave-major order)
        t_fin = _time.time()
        if self.items_parts:
            all_items = self.items_parts[0]
            for p in self.items_parts[1:]:
                all_items = all_items.unionByName(p)
            # collapse the many-wave union (of bounded LogicalRDD plans)
            # before the ranking shuffle; once this eager checkpoint
            # returns the per-wave checkpoints are unreferenced — drop
            # the handles so the ContextCleaner reclaims their blocks
            # (checkpoint blocks have no unpersist API; GC is the
            # sanctioned release path)
            all_items = all_items.localCheckpoint()
            self.items_parts.clear()
        else:
            all_items = spark.createDataFrame(
                [], "parent_seq long, source_page string, depth int, "
                "img_idx int, image_url string"
            )
        # global dense item_seq WITHOUT a single-partition window:
        # range-partitioned rank + per-partition offsets (operators/order)
        items_seq = dense_order_key(
            all_items.dropDuplicates(["parent_seq", "image_url"]),
            ["parent_seq", "image_url"],
            out_col="item_seq",
        ).select("item_seq", "image_url", "source_page", "depth")
        accepted, rejections = image_pipeline(
            items_seq, self.t["image_fetch"], self.t["images"], cfg
        )
        self.phase_secs["finalize"] = _time.time() - t_fin
        if self.tally_parts:
            fetch_tally = self.tally_parts[0]
            for p in self.tally_parts[1:]:
                fetch_tally = fetch_tally.unionByName(p)
        else:
            fetch_tally = spark.createDataFrame(
                [], "host string, status int, outcome string, n long, wave int"
            )
        return dict(
            frontier=frontier,
            accepted=accepted,
            rejections=rejections,
            items=items_seq,
            metrics=self.metrics,
            fetch_tally=fetch_tally,
            seen=self.seen,
            waves=self.wave,
            total_fetched=self.total_fetched,
            total_candidates=self.total_candidates,
        )
