"""URL-seen set — partitioned bloom filter with exact-rescue.

The reference keeps a process-local dict of every visited URL
(crawling_module.py:26,92,140,152; parallel_manager.py:51). At 10^10
URLs an exact per-candidate anti-join against the full seen table
shuffles the whole history every wave; the Spark-native replacement is:

1. candidates get ``pid = pmod(xxhash64(url), P)`` and two 64-bit
   hashes computed JVM-side (native xxhash64 — no Python hashing);
2. ``groupBy(pid).cogroup(state.groupBy(pid)).applyInPandas`` probes a
   per-partition bloom bitmap in vectorized numpy and emits updated
   bitmaps + per-URL verdicts (definitely-new vs maybe-seen);
3. only the maybe-seen sliver (true hits + false positives, ~1% at
   10 bits/key) anti-joins the exact seen table — the bloom keeps the
   expensive exact join off >99% of candidates while the exact table
   keeps the final seen-set exact and resumable (SURVEY §7.3.2).

Sizing: 10^10 keys × 10 bits ≈ 12.5 GB of bitmap; at P=4096 that is
~3 MB per partition — one Arrow batch. Here P defaults small for
local[32]; both knobs are CrawlConfig fields.

Rescue-join scale note (10^10 deployment): the maybe-seen sliver is
FPs (~1%) PLUS true duplicates, and true dups dominate in real crawls
(most extracted links point at already-seen pages), so the sliver is
NOT reliably broadcastable and the exact side can never be (Spark only
builds the broadcast hash on the right side of a LEFT ANTI join). The
sandbox plan therefore sort-merge-joins, which shuffles the exact
history per wave — fine at test scale, wrong at 10^10. The production
shape is to keep the catalog's exact table bucketed by url-hash
(Iceberg bucket transform) so the anti-join becomes a
storage-partitioned join: the exact side is SCANNED in place (no
shuffle — only the sliver moves), and parquet column bloom filters on
``url`` skip the row groups the sliver cannot touch. The append-only
delta discipline below is what makes that cheap: each wave adds one
bucketed O(new) file set, never rewriting history.

``CuckooSeenSet`` is a drop-in variant with the same interface plus
``remove()`` — deletable entries for frontier-eviction semantics a
bloom cannot express (partial-key cuckoo: 4-slot buckets, XOR
alternate addressing, bounded eviction chains with a stash).
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("pid", T.IntegerType(), False),
        T.StructField("bitmap", T.BinaryType(), False),
        T.StructField("n_keys", T.LongType(), False),
    ]
)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # 'url' | 'state'
        T.StructField("pid", T.IntegerType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("maybe_seen", T.BooleanType(), True),
        T.StructField("bitmap", T.BinaryType(), True),
        T.StructField("n_keys", T.LongType(), True),
    ]
)


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """Double-hashing bit positions: (h1 + i·h2) mod m, shape (n, k)."""
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


class BloomSeenSet:
    def __init__(
        self,
        spark: SparkSession,
        partitions: int = 64,
        m_bits: int = 1 << 17,
        n_hashes: int = 5,
        exact_store: "BucketedExactStore | None" = None,
    ):
        self.spark = spark
        self.partitions = partitions
        self.m_bits = m_bits
        self.n_hashes = n_hashes
        self.state: DataFrame = spark.createDataFrame([], _STATE_SCHEMA)
        # exact companion table for FP rescue + resumability audits.
        # Append-only: one checkpointed delta per wave — re-materializing
        # the full union every wave would rewrite the entire history
        # (O(total) checkpoint work per wave at 10^10 URLs).
        self._exact_parts: list[DataFrame] = []
        # deltas not yet appended to a catalog snapshot (kept separate
        # from the probe-side parts so compaction never loses a delta)
        self._pending_snapshot: list[DataFrame] = []
        self._compact_at = 32
        # opt-in deployment backend: the exact history lives in a
        # url-bucketed on-disk table instead of in-memory checkpoint
        # parts, so the rescue anti-join scans it in place (ONE exchange
        # — the sliver side) instead of shuffling the full history every
        # wave. Appends happen at probe time (the delta write is the
        # wave's durable exact commit, Iceberg-append style); resume
        # validity is tracked via (seq, gen) lineage — see
        # BucketedExactStore.
        self.exact_store = exact_store
        self._gen = uuid.uuid4().hex
        self._probe_seq = 0
        # per-generation committed high-water marks (gen → next seq at
        # that gen's last commit), set by restore(). A single global
        # committed bound over the whole gen chain resurrected a
        # crashed run's orphans once a LATER run committed past their
        # seq (restore reuses seq numbers) — ADVICE r6 #1; judging each
        # row by ITS OWN generation's bound closes that.
        self._gen_bounds: dict[str, int] = {}
        # live plan capture for the rescue join (tests pin the in-crawl
        # join shape); off by default — toString costs a plan walk
        self.capture_rescue_plans = False
        self.rescue_plans: list[str] = []

    @property
    def exact(self) -> DataFrame:
        """The exact seen table = union of committed deltas."""
        if self.exact_store is not None:
            return self.exact_store.valid(
                self._gen, self._gen_bounds
            ).select("url", "pid")
        if not self._exact_parts:
            return self.spark.createDataFrame([], "url string, pid int")
        out = self._exact_parts[0]
        for p in self._exact_parts[1:]:
            out = out.unionByName(p)
        return out

    def _append_exact(self, new_urls: DataFrame) -> None:
        if self.exact_store is not None:
            # bucket-preserving O(new) append; the write materializes
            # the delta (it IS the probe's durable commit)
            self.exact_store.append(
                new_urls, seq=self._probe_seq, gen=self._gen
            )
            self._probe_seq += 1
            return
        self._exact_parts.append(new_urls)
        self._pending_snapshot.append(new_urls)
        if len(self._exact_parts) >= self._compact_at:
            # bound plan width: fold accumulated deltas into one part
            # (amortized O(total / compact_at) per wave)
            self._exact_parts = [self.exact.localCheckpoint()]

    # -- column helpers ---------------------------------------------------
    def _keyed(self, df: DataFrame, url_col: str = "url") -> DataFrame:
        u = F.col(url_col)
        return df.withColumn("h1", F.xxhash64(u)).withColumn(
            "h2", F.xxhash64(u, F.lit(0x9E3779B9))
        ).withColumn("pid", F.pmod(F.xxhash64(u, F.lit(7)), F.lit(self.partitions)).cast("int"))

    # ----------------------------------------------------------------------
    def probe_new(
        self,
        candidates: DataFrame,
        url_col: str = "url",
        assume_unique: bool = False,
        eager: bool = True,
        state_eager: bool = True,
    ) -> DataFrame:
        """Probe-and-insert returning ONLY the new URLs (url, pid) —
        no join back onto the candidate rows. ``assume_unique=True``
        skips the dedup shuffle when the caller already deduped (the
        wave loop's first-enqueuer-wins window does).

        ``eager=False`` skips the delta's dedicated result job: the
        delta plan is exchange-shaped (anti-join over the checkpointed
        cogroup), so its AQE intermediate stages still run at creation,
        but the final result stage defers to the caller's next action
        (the wave loop's frontier commit consumes the delta) — one
        fewer driver-blocking job per probe.

        ``state_eager=False`` (round 6) additionally defers the cogroup
        checkpoint's RESULT stage the same way: the pandas probe itself
        is the final stage of the merged plan (the exchanges below it —
        the candidate window and both pid shuffles — still execute at
        creation, which is what resolves the caller's riding candidate
        observations; tests/test_observation_safety.py pins the
        semantics), so the per-wave bloom job folds into the caller's
        next action too. CALLER CONTRACT: an action must run before the
        next probe reads ``self.state`` (the wave loop's frontier
        commit always does), and any Observation riding the candidates
        must sit BELOW the cogroup's exchanges — true for the wave
        loop's obs_cands (attached under the candidate window)."""
        base = candidates.select(F.col(url_col).alias("url"))
        cand = self._keyed(base if assume_unique else base.distinct())
        m_bits, k = self.m_bits, self.n_hashes

        def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if len(left) == 0:
                if len(right) == 0:
                    return pd.DataFrame(columns=list(_OUT_SCHEMA.names))
                r = right.iloc[0]
                return pd.DataFrame(
                    [("state", int(r.pid), None, None, r.bitmap, int(r.n_keys))],
                    columns=list(_OUT_SCHEMA.names),
                )
            pid = int(left["pid"].iloc[0])
            if len(right):
                bitmap = np.frombuffer(bytes(right["bitmap"].iloc[0]), dtype=np.uint8).copy()
                n_keys = int(right["n_keys"].iloc[0])
            else:
                bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
                n_keys = 0
            h1 = left["h1"].to_numpy().astype(np.uint64)
            h2 = left["h2"].to_numpy().astype(np.uint64)
            pos = _positions(h1, h2, k, m_bits)
            byte_idx = pos >> 3
            masks = np.uint8(1) << (pos & 7).astype(np.uint8)
            present = (bitmap[byte_idx] & masks) == masks
            maybe = present.all(axis=1)
            # insert everything not already fully present
            new_rows = ~maybe
            if new_rows.any():
                np.bitwise_or.at(bitmap, byte_idx[new_rows].ravel(), masks[new_rows].ravel())
                n_keys += int(new_rows.sum())
            out = pd.DataFrame(
                {
                    "kind": "url",
                    "pid": pid,
                    "url": left["url"].to_numpy(),
                    "maybe_seen": maybe,
                    "bitmap": None,
                    "n_keys": None,
                }
            )
            state_row = pd.DataFrame(
                [("state", pid, None, None, bitmap.tobytes(), n_keys)],
                columns=list(_OUT_SCHEMA.names),
            )
            return pd.concat([out, state_row], ignore_index=True)

        merged = (
            cand.groupBy("pid")
            .cogroup(self.state.groupBy("pid"))
            .applyInPandas(fn, _OUT_SCHEMA)
        )
        # localCheckpoint: materializes the cogroup ONCE and truncates
        # lineage — every downstream consumer (verdicts, new state,
        # exact union) reads the checkpointed blocks. A lazy
        # persist+unpersist dance here caused cross-wave recompute
        # cascades of the pandas UDF; a lazy CHECKPOINT is different —
        # it computes once at the first action and serves blocks
        # thereafter (see state_eager in the docstring).
        merged = merged.localCheckpoint(eager=state_eager)

        new_state = merged.where(F.col("kind") == "state").select(
            "pid", "bitmap", "n_keys"
        )
        verdicts = merged.where(F.col("kind") == "url").select(
            "url", "pid", "maybe_seen"
        )
        # FP rescue: only the maybe-seen sliver touches the exact table
        # (with exact_store: an in-place bucketed scan — one exchange)
        maybe = verdicts.where(F.col("maybe_seen"))
        rescued = maybe.join(self.exact, ["url"], "left_anti").select("url", verdicts.pid)
        if self.capture_rescue_plans:
            self.rescue_plans.append(
                rescued._jdf.queryExecution().executedPlan().toString()
            )
        new_urls = (
            verdicts.where(~F.col("maybe_seen")).select("url", "pid").unionByName(rescued)
        ).localCheckpoint(eager=eager)
        self._append_exact(new_urls)  # O(new) — no re-checkpoint of history
        self.state = new_state  # reads checkpointed merged blocks
        return new_urls

    def probe_and_insert(
        self,
        candidates: DataFrame,
        url_col: str = "url",
        assume_unique: bool = False,
        eager: bool = True,
        state_eager: bool = True,
    ) -> DataFrame:
        """Returns candidates with a ``was_new`` column; inserts all new
        URLs into the set. Candidates are deduped on url first (the
        first occurrence in a batch wins, like dict insertion) unless
        ``assume_unique``."""
        new_urls = self.probe_new(
            candidates, url_col, assume_unique, eager, state_eager
        )
        flags = new_urls.select(
            F.col("url").alias("__seen_url"), F.lit(True).alias("was_new")
        )
        return candidates.join(
            flags, candidates[url_col] == flags["__seen_url"], "left"
        ).select(
            candidates["*"], F.coalesce("was_new", F.lit(False)).alias("was_new")
        )

    def contains_exact(self, urls: DataFrame, url_col: str = "url") -> DataFrame:
        return urls.join(
            self.exact.withColumnRenamed("url", url_col).select(url_col),
            url_col,
            "left_semi",
        )

    # snapshot / resume -----------------------------------------------------
    def snapshot(self, catalog, prefix: str = "seen") -> None:
        """Bitmaps are fixed-size state → overwrite; the exact table is
        append-only → commit only the deltas since the last snapshot
        (Iceberg-append semantics; O(new) write per wave). With the
        bucketed store, the exact history is already durable (written
        at probe time) — this snapshot only records the committed
        (probe_seq, generation-chain) bound the next resume filters
        with."""
        counters = None
        if self.exact_store is not None:
            counters = {
                "next_probe_seq": self._probe_seq,
                "gen_bounds": {
                    **self._gen_bounds,
                    self._gen: self._probe_seq,
                },
            }
        catalog.table(f"{prefix}_bloom").overwrite(self.state, counters=counters)
        if self.exact_store is not None:
            return
        t = catalog.table(f"{prefix}_exact")
        if self._pending_snapshot:
            delta = self._pending_snapshot[0]
            for p in self._pending_snapshot[1:]:
                delta = delta.unionByName(p)
            t.append(delta)
            self._pending_snapshot = []
        elif t.latest_version() is None:
            t.append(self.exact)  # first commit of an empty set

    def restore(self, catalog, prefix: str = "seen") -> None:
        t = catalog.table(f"{prefix}_bloom")
        self.state = t.read().persist()
        if self.exact_store is not None:
            c = t.counters()
            next_seq = int(c.get("next_probe_seq", 0))
            if "gen_bounds" in c:
                self._gen_bounds = {
                    g: int(b) for g, b in c["gen_bounds"].items()
                }
            else:
                # pre-round-7 snapshot: only the gen list and one global
                # bound exist — give every prior gen that bound (the old
                # semantics, correct for single-resume chains)
                self._gen_bounds = {
                    g: next_seq for g in c.get("gens", [])
                }
            self._probe_seq = next_seq
            # self._gen stays this run's fresh id: rows a crashed run
            # appended past ITS generation's committed bound carry an
            # old gen and a seq at/above that gen's bound — excluded by
            # valid() even after later generations commit higher seqs
            # (per-gen bounds, ADVICE r6 #1) — while this run's
            # re-appends are valid via gen equality
            return
        self._exact_parts = [catalog.table(f"{prefix}_exact").read().persist()]
        self._pending_snapshot = []


class ExactSeenSet:
    """Anti-join seen set — the test-scale reference implementation the
    bloom variant is validated against."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._parts: list[DataFrame] = []
        self._pending_snapshot: list[DataFrame] = []
        self._compact_at = 32

    @property
    def df(self) -> DataFrame:
        if not self._parts:
            return self.spark.createDataFrame([], "url string")
        out = self._parts[0]
        for p in self._parts[1:]:
            out = out.unionByName(p)
        return out

    def probe_new(
        self,
        candidates: DataFrame,
        url_col: str = "url",
        assume_unique: bool = False,
        eager: bool = True,
        state_eager: bool = True,  # no state pass here; accepted for a uniform surface
    ) -> DataFrame:
        """``eager=False`` skips the delta's dedicated result job (the
        wave loop folds the page-md5 probe into the items checkpoint
        this way). CALLER CONTRACT: lazy-checkpoint creation fires a
        success event that permanently latches ZERO into any riding
        Observation whose CollectMetrics sits in the plan's final
        (unexecuted) stage — only observations BELOW the delta's last
        exchange (AQE executes those intermediate stages at creation)
        resolve with true values. The md5 fold satisfies this (the
        fetch-side observations sit under the md5 window); the wave's
        SEEN probe must NOT use eager=False with this backend because
        obs_cands sits above the candidate window
        (tests/test_observation_safety.py pins both cases). The origin
        plan is one anti-join of the candidates against bounded
        LogicalRDD parts, so the carried plan-stats stay linear either
        way (see plans/wave_crawl.py on why that matters)."""
        base = candidates.select(F.col(url_col).alias("url"))
        cand = base if assume_unique else base.distinct()
        new = cand.join(self.df, "url", "left_anti").localCheckpoint(
            eager=eager
        )
        # append-only: one O(new) delta per probe, never an O(total)
        # re-checkpoint of the whole set
        self._parts.append(new)
        self._pending_snapshot.append(new)
        if len(self._parts) >= self._compact_at:
            self._parts = [self.df.localCheckpoint()]
        return new

    def probe_and_insert(
        self,
        candidates: DataFrame,
        url_col: str = "url",
        assume_unique: bool = False,
        eager: bool = True,
        state_eager: bool = True,
    ) -> DataFrame:
        new = self.probe_new(candidates, url_col, assume_unique, eager)
        flags = new.select(
            F.col("url").alias("__seen_url"), F.lit(True).alias("was_new")
        )
        return candidates.join(
            flags, candidates[url_col] == flags["__seen_url"], "left"
        ).select(
            candidates["*"], F.coalesce("was_new", F.lit(False)).alias("was_new")
        )

    # snapshot / resume ------------------------------------------------------
    def snapshot(self, catalog, prefix: str = "seen") -> None:
        t = catalog.table(f"{prefix}_exact")
        if self._pending_snapshot:
            delta = self._pending_snapshot[0]
            for p in self._pending_snapshot[1:]:
                delta = delta.unionByName(p)
            t.append(delta.select("url"))
            self._pending_snapshot = []
        elif t.latest_version() is None:
            t.append(self.df)

    def restore(self, catalog, prefix: str = "seen") -> None:
        self._parts = [
            catalog.table(f"{prefix}_exact").read().select("url").persist()
        ]
        self._pending_snapshot = []


class BucketedExactStore:
    """Deployment-shaped exact companion: the seen history as a
    url-BUCKETED catalog table, so the per-wave rescue anti-join SCANS
    the exact side in place instead of shuffling it (the local
    datasource-bucketing analog of the Iceberg ``bucket(url)``
    transform described in the module docstring).

    Why this exists: the maybe-seen sliver contains true duplicates —
    the dominant case in real crawls — so it is not reliably
    broadcastable, and Spark can only build the broadcast hash on the
    RIGHT side of a LEFT ANTI join, so the exact side never broadcasts
    either. A plain anti-join therefore sort-merge-shuffles the whole
    history every wave: O(total) network per wave at 10^10 URLs. With
    the history bucketed by url, the join requirement is already
    satisfied on the exact side — only the sliver moves through an
    exchange, the bucketed files are read where they lie, the ``url``
    column is pruned at the scan, and IsNotNull pushes down
    (tests pin ``Bucketed: true`` + exactly one Exchange in the plan).

    Appends are bucket-preserving and O(new): each wave adds one file
    set per bucket, never rewriting history — the same append-only
    delta discipline as the in-memory parts above (compaction at scale
    is the table format's file-rewrite action, out of scope here).

    Rows carry ``(seq, gen)`` lineage — the probe sequence number and a
    per-run generation id — so a resumed crawl can exclude ORPHAN
    appends (rows a crashed run wrote after its last committed wave)
    without rewriting history: validity is ``gen == current-run`` OR
    ``seq < committed high-water mark OF THE ROW'S OWN generation``
    (per-gen bounds — a single chain-wide bound let later commits
    shadow an earlier run's orphan seqs, ADVICE r6 #1).
    This is the sandbox stand-in for Iceberg snapshot rollback (which
    discards uncommitted file sets as pure metadata); the filter rides
    the same in-place bucketed scan, so the join shape is unchanged.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        table: str | None = None,
        buckets: int = 64,
    ):
        self.spark = spark
        # unique default name: the Spark session catalog is global, and
        # resume constructs a fresh store over the SAME files
        self.table_name = table or f"seen_bucketed_{uuid.uuid4().hex[:12]}"
        self.buckets = buckets
        self._path = path
        if not spark.catalog.tableExists(self.table_name):
            if os.path.isdir(path) and any(
                f.startswith("part-") for f in os.listdir(path)
            ):
                # resume path: re-register the existing bucketed files
                # as an external table (metadata-only; the bucket spec
                # must match the writer's or appends fail loudly)
                spark.sql(
                    f"CREATE TABLE {self.table_name} "
                    "(url STRING, pid INT, seq INT, gen STRING) "
                    "USING PARQUET CLUSTERED BY (url) SORTED BY (url) "
                    f"INTO {buckets} BUCKETS LOCATION '{path}'"
                )
            else:
                empty = spark.createDataFrame(
                    [], "url string, pid int, seq int, gen string"
                )
                self._writer(empty).saveAsTable(self.table_name)

    def _writer(self, df: DataFrame):
        return (
            df.write.mode("append")
            .bucketBy(self.buckets, "url")
            .sortBy("url")
            .option("path", self._path)
        )

    def append(self, delta: DataFrame, seq: int = 0, gen: str = "") -> None:
        """O(new) bucket-preserving append (Spark validates the bucket
        spec against the existing table, so a mismatched writer fails
        loudly instead of silently degrading the join)."""
        d = (
            delta.select("url", "pid")
            .withColumn("seq", F.lit(seq).cast("int"))
            .withColumn("gen", F.lit(gen))
        )
        self._writer(d).saveAsTable(self.table_name)

    @property
    def df(self) -> DataFrame:
        return self.spark.table(self.table_name)

    def valid(
        self,
        gen: str | None = None,
        gen_bounds: dict[str, int] | None = None,
    ) -> DataFrame:
        """The committed-valid view: everything (no bounds given), or
        current-generation rows plus prior-generation rows below THEIR
        OWN generation's committed high-water mark — orphan rows from
        crashed runs drop out and STAY out even after later generations
        commit higher seqs (per-gen bounds, ADVICE r6 #1; the old
        single global bound over the whole gen chain resurrected them).
        The predicate is per-row, so it rides the in-place bucketed
        scan — the one-Exchange rescue shape is unchanged."""
        df = self.df
        if gen is None and not gen_bounds:
            return df
        cond = F.lit(False)
        if gen is not None:
            cond = cond | (F.col("gen") == gen)
        for g, bound in (gen_bounds or {}).items():
            cond = cond | (
                (F.col("gen") == g) & (F.col("seq") < F.lit(int(bound)))
            )
        return df.where(cond)

    def rescue(
        self,
        maybe: DataFrame,
        url_col: str = "url",
        gen: str | None = None,
        gen_bounds: dict[str, int] | None = None,
    ) -> DataFrame:
        """maybe-seen sliver → rows NOT in the (valid) exact history.
        The exact side resolves the join's hash-partitioning requirement
        from its bucketing — scanned in place, no exchange; the validity
        filter is a per-row predicate above the same scan."""
        ex = self.valid(gen, gen_bounds)
        return maybe.join(
            ex.select(F.col("url").alias(url_col)), url_col, "left_anti"
        )

    def compact(self) -> None:
        """Fold the accumulated per-wave file sets into one bucketed
        file set — the sandbox analog of Iceberg's rewrite_data_files
        maintenance action (every wave's append adds one small file
        per bucket; after W waves a bucket scan opens W files). The
        logical contents — including (seq, gen) lineage — are
        unchanged. NOT crash-atomic here (a real table format commits
        the rewrite as a snapshot); run it as offline maintenance
        between crawls, the way the Iceberg action would be
        scheduled."""
        import shutil

        data = self.df.localCheckpoint()  # lift rows off the old files
        self.spark.sql(f"DROP TABLE IF EXISTS {self.table_name}")
        shutil.rmtree(self._path, ignore_errors=True)
        self._writer(data).saveAsTable(self.table_name)

    def drop(self) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.table_name}")


def _cuckoo_unpack(blob: bytes, n_buckets: int):
    """State blob layout: table bytes (n_buckets·4·2) + stash (k·8)."""
    tbl_bytes = n_buckets * 4 * 2
    table = np.frombuffer(blob[:tbl_bytes], dtype=np.uint16).reshape(
        n_buckets, 4
    ).copy()
    stash = np.frombuffer(blob[tbl_bytes:], dtype=np.uint64).copy()
    return table, stash


def _cuckoo_pack(table: np.ndarray, stash: np.ndarray) -> bytes:
    return table.tobytes() + stash.astype(np.uint64).tobytes()


def _cuckoo_fp_buckets(h1: np.ndarray, h2: np.ndarray, n_buckets: int):
    """Partial-key cuckoo addressing: fp=(h1 mod 65535)+1,
    b2 = b1 XOR fp·0x5bd1e995 (both mod n_buckets)."""
    fp = (h1 % np.uint64(65535)).astype(np.uint16) + np.uint16(1)
    b1 = (h2 % np.uint64(n_buckets)).astype(np.int64)
    alt = np.uint64(0x5BD1E995) * fp.astype(np.uint64)
    b2 = ((b1.astype(np.uint64) ^ alt) % np.uint64(n_buckets)).astype(
        np.int64
    )
    return fp, b1, b2


class CuckooSeenSet:
    """Partitioned cuckoo-filter seen set — drop-in for BloomSeenSet
    with DELETABLE entries (frontier-eviction semantics the bloom
    cannot express).

    Per partition the state is a (n_buckets × 4)-slot uint16
    fingerprint table plus a small uint64 stash for insert overflows
    (stash entries hold the full 64-bit key hash, so a stash hit is
    effectively exact). fp = (h1 mod 65535)+1 (0 = empty);
    b1 = h2 mod B, b2 = (b1 XOR fp·0x5bd1e995) mod B — the standard
    partial-key cuckoo construction, so delete-by-fingerprint works
    from either bucket. Lookups are fully vectorized; inserts walk the
    (rare) eviction chains in a bounded loop.

    Like the bloom variant, 'maybe-seen' verdicts are rescued against
    the append-only exact table; unlike a bloom, a deleted key frees
    its slot, so the filter tracks a *mutable* working set (e.g. the
    in-flight frontier) without monotone saturation.
    """

    MAX_KICKS = 500
    STASH_CAP = 128

    def __init__(
        self,
        spark: SparkSession,
        partitions: int = 64,
        n_buckets: int = 1 << 13,
    ):
        self.spark = spark
        self.partitions = partitions
        self.n_buckets = n_buckets
        self.state: DataFrame = spark.createDataFrame([], _STATE_SCHEMA)
        self._exact_parts: list[DataFrame] = []
        self._pending_snapshot: list[DataFrame] = []
        self._compact_at = 32

    @property
    def exact(self) -> DataFrame:
        if not self._exact_parts:
            return self.spark.createDataFrame([], "url string, pid int")
        out = self._exact_parts[0]
        for p in self._exact_parts[1:]:
            out = out.unionByName(p)
        return out

    def _keyed(self, df: DataFrame, url_col: str = "url") -> DataFrame:
        u = F.col(url_col)
        return df.withColumn("h1", F.xxhash64(u)).withColumn(
            "h2", F.xxhash64(u, F.lit(0x9E3779B9))
        ).withColumn(
            "pid",
            F.pmod(F.xxhash64(u, F.lit(7)), F.lit(self.partitions)).cast("int"),
        )

    def probe_new(
        self,
        candidates: DataFrame,
        url_col: str = "url",
        assume_unique: bool = False,
        eager: bool = True,
        state_eager: bool = True,
    ) -> DataFrame:
        """See BloomSeenSet.probe_new for the eager/state_eager
        contract — identical here."""
        base = candidates.select(F.col(url_col).alias("url"))
        cand = self._keyed(base if assume_unique else base.distinct())
        n_buckets, stash_cap, max_kicks = (
            self.n_buckets, self.STASH_CAP, self.MAX_KICKS,
        )

        def unpack(blob):
            return _cuckoo_unpack(blob, n_buckets)

        pack = _cuckoo_pack

        def fp_buckets(h1, h2):
            return _cuckoo_fp_buckets(h1, h2, n_buckets)

        def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if len(left) == 0:
                if len(right) == 0:
                    return pd.DataFrame(columns=list(_OUT_SCHEMA.names))
                r = right.iloc[0]
                return pd.DataFrame(
                    [("state", int(r.pid), None, None, r.bitmap, int(r.n_keys))],
                    columns=list(_OUT_SCHEMA.names),
                )
            pid = int(left["pid"].iloc[0])
            if len(right):
                table, stash = unpack(bytes(right["bitmap"].iloc[0]))
                n_keys = int(right["n_keys"].iloc[0])
            else:
                table = np.zeros((n_buckets, 4), dtype=np.uint16)
                stash = np.zeros(0, dtype=np.uint64)
                n_keys = 0
            h1 = left["h1"].to_numpy().astype(np.uint64)
            h2 = left["h2"].to_numpy().astype(np.uint64)
            fp, b1, b2 = fp_buckets(h1, h2)
            # vectorized lookup: fp present in either bucket, or h1 in stash
            in_b1 = (table[b1] == fp[:, None]).any(axis=1)
            in_b2 = (table[b2] == fp[:, None]).any(axis=1)
            in_stash = np.isin(h1, stash) if len(stash) else np.zeros(
                len(h1), dtype=bool
            )
            maybe = in_b1 | in_b2 | in_stash
            # insert the definitely-new keys (eviction chains are rare
            # and bounded; everything else above is vectorized)
            rng_state = 0x9E3779B97F4A7C15
            stash_list = list(stash)
            for i in np.flatnonzero(~maybe):
                f, c1, c2 = int(fp[i]), int(b1[i]), int(b2[i])
                placed = False
                for b in (c1, c2):
                    empty = np.flatnonzero(table[b] == 0)
                    if len(empty):
                        table[b, empty[0]] = f
                        placed = True
                        break
                if not placed:
                    b = c1
                    for _ in range(max_kicks):
                        rng_state = (rng_state * 6364136223846793005 + 1) % (1 << 64)
                        slot = rng_state % 4
                        f, table[b, slot] = int(table[b, slot]), f
                        b = int(
                            (np.uint64(b) ^ (np.uint64(0x5BD1E995) * np.uint64(f)))
                            % np.uint64(n_buckets)
                        )
                        empty = np.flatnonzero(table[b] == 0)
                        if len(empty):
                            table[b, empty[0]] = f
                            placed = True
                            break
                    if not placed:
                        if len(stash_list) >= stash_cap:
                            raise RuntimeError(
                                f"cuckoo partition {pid} overfull "
                                f"(n_keys={n_keys}); raise n_buckets"
                            )
                        stash_list.append(int(h1[i]))
                n_keys += 1
            out = pd.DataFrame(
                {
                    "kind": "url",
                    "pid": pid,
                    "url": left["url"].to_numpy(),
                    "maybe_seen": maybe,
                    "bitmap": None,
                    "n_keys": None,
                }
            )
            state_row = pd.DataFrame(
                [(
                    "state", pid, None, None,
                    pack(table, np.array(stash_list, dtype=np.uint64)),
                    n_keys,
                )],
                columns=list(_OUT_SCHEMA.names),
            )
            return pd.concat([out, state_row], ignore_index=True)

        merged = (
            cand.groupBy("pid")
            .cogroup(self.state.groupBy("pid"))
            .applyInPandas(fn, _OUT_SCHEMA)
        ).localCheckpoint(eager=state_eager)
        new_state = merged.where(F.col("kind") == "state").select(
            "pid", "bitmap", "n_keys"
        )
        verdicts = merged.where(F.col("kind") == "url").select(
            "url", "pid", "maybe_seen"
        )
        maybe = verdicts.where(F.col("maybe_seen"))
        rescued = maybe.join(self.exact, ["url"], "left_anti").select(
            "url", verdicts.pid
        )
        new_urls = (
            verdicts.where(~F.col("maybe_seen"))
            .select("url", "pid")
            .unionByName(rescued)
        ).localCheckpoint(eager=eager)
        self._exact_parts.append(new_urls)
        self._pending_snapshot.append(new_urls)
        if len(self._exact_parts) >= self._compact_at:
            self._exact_parts = [self.exact.localCheckpoint()]
        self.state = new_state
        return new_urls

    def probe_and_insert(
        self,
        candidates: DataFrame,
        url_col: str = "url",
        assume_unique: bool = False,
        eager: bool = True,
        state_eager: bool = True,
    ) -> DataFrame:
        new_urls = self.probe_new(
            candidates, url_col, assume_unique, eager, state_eager
        )
        flags = new_urls.select(
            F.col("url").alias("__seen_url"), F.lit(True).alias("was_new")
        )
        return candidates.join(
            flags, candidates[url_col] == flags["__seen_url"], "left"
        ).select(
            candidates["*"], F.coalesce("was_new", F.lit(False)).alias("was_new")
        )

    def remove(self, urls: DataFrame, url_col: str = "url") -> None:
        """Delete keys from the filter (the operation a bloom cannot do).
        Clears one matching fingerprint slot per key, or the stash entry.
        The exact audit table is history, not membership — it keeps its
        rows (SnapshotCatalog appends are immutable)."""
        cand = self._keyed(urls.select(F.col(url_col).alias("url")).distinct())
        n_buckets = self.n_buckets

        def unpack(blob):
            return _cuckoo_unpack(blob, n_buckets)

        pack = _cuckoo_pack

        def fp_buckets(h1, h2):
            return _cuckoo_fp_buckets(h1, h2, n_buckets)

        def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if len(right) == 0:
                return pd.DataFrame(columns=list(_STATE_SCHEMA.names))
            r = right.iloc[0]
            pid = int(r.pid)
            table, stash = unpack(bytes(r.bitmap))
            n_keys = int(r.n_keys)
            if len(left):
                h1 = left["h1"].to_numpy().astype(np.uint64)
                h2 = left["h2"].to_numpy().astype(np.uint64)
                fp, b1, b2 = fp_buckets(h1, h2)
                stash_list = list(stash)
                for i in range(len(h1)):
                    removed = False
                    for b in (int(b1[i]), int(b2[i])):
                        hit = np.flatnonzero(table[b] == fp[i])
                        if len(hit):
                            table[b, hit[0]] = 0
                            removed = True
                            break
                    if not removed and int(h1[i]) in stash_list:
                        stash_list.remove(int(h1[i]))
                        removed = True
                    if removed:
                        n_keys -= 1
                stash = np.array(stash_list, dtype=np.uint64)
            return pd.DataFrame(
                [(pid, pack(table, stash), n_keys)],
                columns=list(_STATE_SCHEMA.names),
            )

        self.state = (
            cand.groupBy("pid")
            .cogroup(self.state.groupBy("pid"))
            .applyInPandas(fn, _STATE_SCHEMA)
        ).localCheckpoint()

    # snapshot / resume ------------------------------------------------------
    def snapshot(self, catalog, prefix: str = "seen") -> None:
        catalog.table(f"{prefix}_bloom").overwrite(self.state)
        t = catalog.table(f"{prefix}_exact")
        if self._pending_snapshot:
            delta = self._pending_snapshot[0]
            for p in self._pending_snapshot[1:]:
                delta = delta.unionByName(p)
            t.append(delta)
            self._pending_snapshot = []
        elif t.latest_version() is None:
            t.append(self.exact)

    def restore(self, catalog, prefix: str = "seen") -> None:
        self.state = catalog.table(f"{prefix}_bloom").read().persist()
        self._exact_parts = [catalog.table(f"{prefix}_exact").read().persist()]
        self._pending_snapshot = []
