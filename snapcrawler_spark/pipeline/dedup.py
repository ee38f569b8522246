"""Deduplication operators over the documents table.

All hashing is expressed portably (md5-hex → 60-bit int) so each
operator has an exact DuckDB oracle; at 100 TB the md5 calls stay
JVM-side (F.md5 is codegen'd) and every stage is shuffle-on-key.

- exact:         hash-groupBy on full content
- ngram_jaccard: shingle explode → self-join on shingle → pair overlap
                 counts → Jaccard ≥ τ (quadratic only within shared
                 shingles; a doc-frequency cap drops stop-shingles so
                 one hot shingle can't make the self-join quadratic)
- minhash_lsh:   H=16 minhashes, b=4 bands × r=4 rows; band-bucket
                 join finds candidate pairs without the full self-join
- simhash:       60-bit sign-aggregated word-hash fingerprint; near-dup
                 when hamming distance ≤ 3 (6×10-bit segment pigeonhole)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_MINHASH = 16
LSH_BANDS = 4  # × 4 rows per band
SHINGLE_K = 3
# Drop shingles appearing in more than this many documents before the
# pair join: a shingle with doc-freq d contributes d² join rows, so one
# ubiquitous shingle ("the of the") makes the join quadratic in corpus
# size. Capped shingles carry ~no similarity signal (they're corpus-wide
# stopword patterns). At the gate scale factors no shingle reaches the
# cap, so oracle results are unchanged; the skew test exercises it.
MAX_SHINGLE_DOC_FREQ = 1000
SIMHASH_BITS = 60  # _hash60 yields 60 meaningful bits
SIMHASH_SEGS = 6   # 10-bit segments; pigeonhole sound for hamming ≤ 5


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _hash60(col):
    """Portable 60-bit hash: first 15 hex chars of md5 → bigint.
    (DuckDB: cast(('0x' || substr(md5(x),1,15)) as bigint).)"""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def shingles(df: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, shingle): distinct k-word shingles per document."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    return df.select(
        "doc_id", F.explode(F.array_distinct(sh)).alias("shingle")
    )


def docs_with_seeded_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ deterministic copies (every doc_id % 7 == 0 re-inserted
    at doc_id + 10_000_000). The synthetic corpus has no byte-identical
    texts below sf0.1, which made the exact-dedup gate vacuous; seeding
    known duplicates keeps the gate non-trivial at every scale factor."""
    d = _docs(spark, sf_dir)
    dup = d.where(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10_000_000)
    )
    return d.unionByName(dup)


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-content duplicate groups (hash-groupBy dedup) over the
    seeded-duplicate corpus."""
    d = docs_with_seeded_dups(spark, sf_dir)
    return (
        d.select("doc_id", F.md5(F.col("text")).alias("content_md5"))
        .groupBy("content_md5")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .where(F.col("n_copies") > 1)
        .orderBy("keeper_doc_id")
    )


def dedup_ngram_jaccard(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.6,
    max_doc_freq: int = MAX_SHINGLE_DOC_FREQ,
) -> DataFrame:
    """Near-duplicate pairs by 3-gram shingle Jaccard ≥ threshold.

    Shingles with document frequency > max_doc_freq are dropped before
    BOTH the size count and the pair join (standard stop-shingle
    removal), so Jaccard stays consistent and the join never explodes
    quadratically on a hot shingle."""
    d = _docs(spark, sf_dir)
    sh = shingles(d)
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    sh = (
        sh.join(dfreq.where(F.col("df") <= max_doc_freq), "shingle")
        .select("doc_id", "shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    ratio = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    jac = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(ratio >= threshold)
        .withColumn("jaccard_e4", F.floor(ratio * 10000).cast("long"))
    )
    return jac.select("doc_a", "doc_b", "n_common", "jaccard_e4").orderBy(
        "doc_a", "doc_b"
    )


def minhash_signatures_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, mh0..mh{N-1}): H portable minhash values as COLUMNS.

    Standard two-hash family: hv_i = h1 + i·(h2 mod 2^40) — two md5
    evaluations per shingle instead of H (the md5 string ops dominate;
    the arithmetic derivation is ~8× cheaper and exactly mirrored in
    the DuckDB oracle). No overflow: h1 < 2^60, i·h2' < 2^44.

    Bit-sliced aggregation: the H minimums are H ``min`` expressions in
    ONE ``groupBy(doc_id)`` — no shingles×H explode before the partial
    agg and no (doc, h) shuffle of H× the shingle rows (the same
    restructuring that fixed the simhash fingerprint)."""
    d = _docs(spark, sf_dir)
    sh = shingles(d)
    keyed = sh.select(
        "doc_id",
        _hash60(F.col("shingle")).alias("h1"),
        (_hash60(F.concat(F.col("shingle"), F.lit("#2"))) % F.lit(1 << 40)).alias(
            "h2"
        ),
    )
    aggs = [
        F.min(F.col("h1") + F.lit(i) * F.col("h2")).alias(f"mh{i}")
        for i in range(N_MINHASH)
    ]
    return keyed.groupBy("doc_id").agg(*aggs)


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, h 0..N-1, minhash): the narrow view of the wide
    signature table (one stack over N-per-doc rows — cheap; the heavy
    shingle aggregation happens wide)."""
    wide = minhash_signatures_wide(spark, sf_dir)
    pairs = ", ".join(f"{i}, mh{i}" for i in range(N_MINHASH))
    return wide.select(
        "doc_id",
        F.expr(f"stack({N_MINHASH}, {pairs}) as (h, minhash)"),
    ).select("doc_id", F.col("h").cast("int").alias("h"), "minhash")


def dedup_minhash_lsh(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5
) -> DataFrame:
    """MinHash-LSH near-dup pairs: band-bucket join → verified Jaccard.

    Candidate generation never self-joins the full corpus — only rows
    agreeing on a whole band (banding theory: P[candidate] = 1-(1-s^r)^b).
    """
    wide = minhash_signatures_wide(spark, sf_dir)
    rows_per_band = N_MINHASH // LSH_BANDS
    sig = wide.select(
        "doc_id",
        F.expr(
            f"stack({N_MINHASH}, "
            + ", ".join(f"{i}, mh{i}" for i in range(N_MINHASH))
            + ") as (h, minhash)"
        ),
    ).select("doc_id", F.col("h").cast("int").alias("h"), "minhash")
    # band bucket straight from the wide columns: md5 of the band's
    # minhashes joined in h order — byte-identical to the former
    # sorted-collect_list construction, no per-band groupBy
    band_exprs = []
    for b in range(LSH_BANDS):
        cols = [
            F.col(f"mh{b * rows_per_band + i}").cast("string")
            for i in range(rows_per_band)
        ]
        band_exprs.append(F.md5(F.concat_ws(",", *cols)).alias(f"bk{b}"))
    band_key = wide.select("doc_id", *band_exprs).select(
        "doc_id",
        F.expr(
            f"stack({LSH_BANDS}, "
            + ", ".join(f"{b}, bk{b}" for b in range(LSH_BANDS))
            + ") as (band, bucket)"
        ),
    )
    a = band_key.alias("a")
    b = band_key.alias("b")
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # verify candidates with estimated Jaccard = fraction of agreeing minhashes
    sa = sig.select(F.col("doc_id").alias("doc_a"), "h", F.col("minhash").alias("mh_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), "h", F.col("minhash").alias("mh_b"))
    est = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum((F.col("mh_a") == F.col("mh_b")).cast("long")).alias("n_agree")
        )
        .where(F.col("n_agree") >= int(threshold * N_MINHASH))
    )
    return est.select("doc_a", "doc_b", "n_agree").orderBy("doc_a", "doc_b")


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash): 60-bit sign-aggregated fingerprint (all 60
    meaningful bits of _hash60 — 32 bits saturates with random
    collisions at 10^10 docs).

    The per-bit ±1 tallies are 60 conditional SUM expressions inside ONE
    ``groupBy(doc_id)`` — bit-sliced aggregation with map-side partials.
    (The previous construction exploded every word row ×60 before the
    partial agg: 60× the map-side rows for the same 60 numbers.)"""
    d = _docs(spark, sf_dir)
    words = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    words = words.withColumn("hv", _hash60(F.col("w")))
    # s_i = Σ_words (bit_i(hv) ? +1 : -1), one column per bit
    tallies = [
        F.sum(
            F.when(F.expr(f"(hv >> {i}) & 1") == 1, F.lit(1)).otherwise(
                F.lit(-1)
            )
        ).alias(f"s{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = words.groupBy("doc_id").agg(*tallies)
    packed_expr = None
    for i in range(SIMHASH_BITS):
        term = F.when(
            F.col(f"s{i}") > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        packed_expr = term if packed_expr is None else packed_expr + term
    packed = agg.select("doc_id", packed_expr.alias("simhash"))
    return packed.orderBy("doc_id")


def dedup_simhash(
    spark: SparkSession, sf_dir: str, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs: hamming(simhash_a, simhash_b) ≤ k.

    Candidates via 6-segment pigeonhole over the 60-bit fingerprint
    (a pair within hamming ≤ 5 must agree on ≥1 of 6 disjoint 10-bit
    segments) — no full self-join."""
    sh = simhash(spark, sf_dir)
    segs = sh.select(
        "doc_id",
        "simhash",
        F.explode(F.array(*[F.lit(i) for i in range(SIMHASH_SEGS)])).alias("seg"),
    ).withColumn("seg_val", F.expr("(simhash >> (seg * 10)) & 1023"))
    a = segs.alias("a")
    b = segs.alias("b")
    cand = (
        a.join(b, ["seg", "seg_val"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = cand.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    ).where(F.col("hamming") <= max_hamming)
    return ham.select("doc_a", "doc_b", "hamming").orderBy("doc_a", "doc_b")


def _obs_changed(obs, joined: DataFrame) -> int:
    """Read the per-round convergence count from its Observation, with a
    recount fallback ONLY for the verified empty-metrics-row degenerate
    case (AQE empty-relation propagation pruning the observed subtree
    out of the checkpoint action — the same class plans.wave_crawl._obs_n
    handles). A metrics row missing the ``n`` key, or any other failure,
    re-raises: a genuine Observation breakage must crash the CC loop,
    not silently recount forever."""
    try:
        row = obs.get
    except Exception:
        empty_row = False
        try:
            jo = getattr(obs, "_jo", None)
            empty_row = jo is not None and jo.getRow().length() == 0
        except Exception:
            empty_row = False
        if empty_row:
            return joined.where(F.col("chg") == 1).count()
        raise
    if "n" not in row:
        raise KeyError(
            f"observation metrics missing 'n' (got {sorted(row)})"
        )
    # sum over an all-unchanged round is 0; over an empty round NULL
    return int(row["n"] or 0)


def connected_components(
    pairs: DataFrame, max_iters: int = 64
) -> DataFrame:
    """(doc_a, doc_b) undirected pair relation → (doc_id, label) where
    label = min vertex id of each connected component.

    Hash-min label propagation WITH pointer jumping: each round first
    takes the min label over self∪neighbors (one shuffle join + groupBy
    over O(edges) rows), then compresses paths by looking the new label
    up through itself — l(v) ← l(l(v)) — so a chain of length n
    converges in O(log n) rounds instead of O(n) (plain hash-min is
    O(diameter): a 100-link near-dup drift chain would exceed any
    sensible round bound). Fixpoint: labels constant across every edge
    and idempotent under lookup ⇒ every vertex carries its component's
    min id — the same fixpoint DuckDB's recursive-CTE reachability
    oracle computes, just reached in logarithmically many shuffles.

    Scale notes: the symmetrized edge set is checkpointed ONCE;
    per-round label checkpoints keep plans bounded (carried plan-stats
    grow linearly in rounds — see plans/wave_crawl.py on why that
    matters); the convergence count rides the checkpoint action as an
    Observation — no extra pass. Raises if max_iters is hit without
    convergence rather than returning a half-propagated labeling."""
    from pyspark.sql import Observation

    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("label"))
        .localCheckpoint()
    )
    if labels.isEmpty():
        return labels
    for _ in range(max_iters):
        neigh = edges.join(labels, edges.src == labels.doc_id).select(
            F.col("dst").alias("doc_id"), "label"
        )
        mins = (
            labels.unionByName(neigh)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
        )
        # pointer jump: l(v) ← l(l(v)). Every label value is a vertex id
        # of the same component, so the self-join lookup always hits.
        lmap = mins.select(
            F.col("doc_id").alias("ref"), F.col("label").alias("label2")
        )
        jumped = mins.join(lmap, mins.label == lmap.ref).select(
            "doc_id", F.col("label2").alias("label")
        )
        obs = Observation()
        joined = (
            jumped.join(
                labels.select("doc_id", F.col("label").alias("old")), "doc_id"
            )
            .select(
                "doc_id",
                "label",
                (F.col("label") != F.col("old")).cast("long").alias("chg"),
            )
            .observe(obs, F.sum("chg").alias("n"))
        )
        labels = joined.select("doc_id", "label").localCheckpoint()
        changed = _obs_changed(obs, joined)
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint within {max_iters} rounds"
        )
    return labels


def dedup_cluster(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.5,
    max_iters: int = 64,
) -> DataFrame:
    """Connected-components resolution of the near-dup pair relation:
    (doc_id, cluster_id, is_canonical) — the keep-one-per-cluster step a
    training-data pipeline runs after pair generation (pairs alone
    over-delete: a~b, b~c must collapse to ONE survivor, not two
    independent pair-wise drops). See ``connected_components`` for the
    algorithm and scale analysis; property tests compare it against a
    union-find oracle on adversarial graph shapes
    (tests/test_dedup_cluster.py)."""
    pairs = dedup_minhash_lsh(spark, sf_dir, threshold).select(
        "doc_a", "doc_b"
    )
    labels = connected_components(pairs, max_iters=max_iters)
    return labels.select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        (F.col("label") == F.col("doc_id")).alias("is_canonical"),
    ).orderBy("doc_id")
