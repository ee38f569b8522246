"""End-to-end training-corpus construction over the documents table.

``corpus_build`` composes the pipeline a large-scale text-corpus run
chains in practice — language filter → quality threshold → exact-dup
keep-first → near-dup cluster keep-canonical — into one relational
plan, reusing the individually-gated operators (pipeline/text.py,
pipeline/dedup.py). Every stage is shuffle-on-key; the only iterative
piece is the connected-components fixpoint inside ``dedup_cluster``.

``corpus_reasons`` is the rejections-table complement (the corpus
analog of the crawl's lineage sink, operators/filters.py): one row per
DROPPED document with the first failing reason — precedence
dropped_exact > dropped_near_dup > dropped_lang > dropped_quality,
mirroring the stage order of ``corpus_build``'s plan — plus the keeper
document responsible (exact keeper / cluster canonical; -1 sentinel
when no keeper exists, i.e. lang/quality drops). By construction
``corpus_build`` ∪ ``corpus_reasons`` partitions the corpus:
|build| + |reasons| == |documents|.

Thresholds are job parameters (``CorpusConfig``), like the crawl's
CrawlConfig — the driver gate runs the pipeline at TWO config points
(default and ``ALT_CONFIG``) against independently-parameterized DuckDB
oracles.

Output of ``corpus_build``: one row per surviving document
(doc_id, lang_pred, quality_e4), ordered by doc_id — deterministic and
hash-comparable against the composed DuckDB oracle
(__spark_entry__.oracle_sql()['corpus_build']).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snapcrawler_spark.pipeline.dedup import dedup_cluster
from snapcrawler_spark.pipeline.text import docs, lang_id, quality_score


@dataclass(frozen=True)
class CorpusConfig:
    keep_lang: str = "en"
    min_quality_e4: int = 3000
    cluster_threshold: float = 0.5  # minhash-LSH near-dup threshold
    # Gopher-style repetition gate (pipeline/text._rep_metrics_kernel):
    # drop docs whose most frequent word 2-gram takes more than this
    # fraction (×10⁴) of all 2-gram slots. None = stage off (the
    # default and ALT points predate the signal and stay bit-identical)
    max_top2gram_frac_e4: int | None = None


# second config point for the *_alt gates: keep the unidentified-
# language slice at a looser quality bar (the synthetic corpus predicts
# only en/und, so 'und' is the non-vacuous second value) — exercises
# that thresholds really are job parameters, not constants
ALT_CONFIG = CorpusConfig(keep_lang="und", min_quality_e4=2000)

# third config point (*_rep gates): the default slice with the
# repetition gate on — 500e-4 sits between the sf0.01 median (~333) and
# the tail (max ~1666), so the stage drops a non-vacuous fraction
# (~22% of raw docs) while most survive
REP_CONFIG = CorpusConfig(max_top2gram_frac_e4=500)

# backwards-compatible module constants (the default config point)
MIN_QUALITY_E4 = CorpusConfig.min_quality_e4
KEEP_LANG = CorpusConfig.keep_lang


def corpus_build(
    spark: SparkSession, sf_dir: str, cfg: CorpusConfig | None = None
) -> DataFrame:
    cfg = cfg or CorpusConfig()
    d = docs(spark, sf_dir)
    lang = lang_id(spark, sf_dir).select("doc_id", "lang_pred")
    qual = quality_score(spark, sf_dir).select("doc_id", "quality_e4")

    # exact dedup, keep-first: min doc_id per content hash. groupBy on
    # the hash then equi-join back — two shuffles on bounded keys, no
    # window over the full corpus.
    hashed = d.select("doc_id", F.md5("text").alias("k"))
    keeper = hashed.groupBy("k").agg(F.min("doc_id").alias("keep_id"))
    exact_kept = hashed.join(
        keeper,
        (hashed.k == keeper.k) & (hashed.doc_id == keeper.keep_id),
    ).select("doc_id")

    # near-dup resolution: drop non-canonical cluster members; docs not
    # in any cluster pass through (left anti against the non-canonical
    # sliver keeps the join O(cluster members), not O(corpus))
    non_canonical = dedup_cluster(
        spark, sf_dir, cfg.cluster_threshold
    ).where(~F.col("is_canonical")).select("doc_id")

    out = (
        exact_kept.join(non_canonical, "doc_id", "left_anti")
        .join(lang, "doc_id")
        .join(qual, "doc_id")
        .where(
            (F.col("lang_pred") == cfg.keep_lang)
            & (F.col("quality_e4") >= cfg.min_quality_e4)
        )
    )
    if cfg.max_top2gram_frac_e4 is not None:
        from snapcrawler_spark.pipeline.text import raw_top2gram

        rep = raw_top2gram(spark, sf_dir)
        out = out.join(rep, "doc_id").where(
            F.col("top2gram_frac_e4") <= cfg.max_top2gram_frac_e4
        )
    return out.select("doc_id", "lang_pred", "quality_e4").orderBy("doc_id")


def corpus_reasons(
    spark: SparkSession, sf_dir: str, cfg: CorpusConfig | None = None
) -> DataFrame:
    """(doc_id, reason, keeper_doc_id) for every document
    ``corpus_build`` drops — see module docstring for precedence and
    the partition invariant. keeper_doc_id is the exact keeper / the
    cluster canonical, or -1 for lang/quality drops (sentinel instead
    of NULL: keeps the column a non-nullable BIGINT on both engines —
    a NULL-bearing int column degrades to float64 in one engine's
    pandas bridge and object in the other's, breaking the driver's
    dtype-strict value hash)."""
    cfg = cfg or CorpusConfig()
    d = docs(spark, sf_dir)
    hashed = d.select("doc_id", F.md5("text").alias("k"))
    keeper = hashed.groupBy("k").agg(F.min("doc_id").alias("keep_id"))
    clusters = dedup_cluster(spark, sf_dir, cfg.cluster_threshold).select(
        "doc_id", "cluster_id", "is_canonical"
    )
    lang = lang_id(spark, sf_dir).select("doc_id", "lang_pred")
    qual = quality_score(spark, sf_dir).select("doc_id", "quality_e4")
    full = (
        hashed.join(keeper, "k")
        .join(clusters, "doc_id", "left")
        .join(lang, "doc_id")
        .join(qual, "doc_id")
    )
    is_near = F.col("cluster_id").isNotNull() & ~F.col("is_canonical")
    reason = (
        F.when(F.col("doc_id") != F.col("keep_id"), F.lit("dropped_exact"))
        .when(is_near, F.lit("dropped_near_dup"))
        .when(F.col("lang_pred") != cfg.keep_lang, F.lit("dropped_lang"))
        .when(
            F.col("quality_e4") < cfg.min_quality_e4,
            F.lit("dropped_quality"),
        )
    )
    if cfg.max_top2gram_frac_e4 is not None:
        from snapcrawler_spark.pipeline.text import raw_top2gram

        full = full.join(raw_top2gram(spark, sf_dir), "doc_id")
        # last in precedence: a doc failing an earlier stage keeps that
        # stage's reason (mirrors corpus_build's stage order)
        reason = reason.when(
            F.col("top2gram_frac_e4") > cfg.max_top2gram_frac_e4,
            F.lit("dropped_repetition"),
        )
    keeper_id = (
        F.when(F.col("doc_id") != F.col("keep_id"), F.col("keep_id"))
        .when(is_near, F.col("cluster_id"))
        .otherwise(F.lit(-1))
        .cast("long")
    )
    return (
        full.withColumn("reason", reason)
        .where(F.col("reason").isNotNull())
        .select(
            "doc_id", "reason", keeper_id.alias("keeper_doc_id")
        )
        .orderBy("doc_id")
    )


# per-language keep rates out of 10^4 — the class-rebalancing step a
# multilingual corpus run applies after filtering (downsample dominant
# languages, keep the tail)
SAMPLE_RATE_E4 = {"en": 5000, "de": 10000, "es": 10000, "fr": 10000, "zh": 10000}
SAMPLE_DEFAULT_E4 = 2500


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language stratified sampling: doc kept iff
    hash(doc_id) mod 10^4 < rate(lang). The hash is the portable
    md5-derived 60-bit int (pipeline/dedup._hash60), so the sample is
    identical across engines, runs, and cluster sizes — a seeded
    coin-flip per row, no RNG state, no driver coordination, trivially
    shuffle-free (narrow map + filter over the scan)."""
    from snapcrawler_spark.pipeline.dedup import _hash60

    d = docs(spark, sf_dir)
    bucket = _hash60(
        F.concat(F.lit("smp#"), F.col("doc_id").cast("string"))
    ) % F.lit(10000)
    rate = F.lit(SAMPLE_DEFAULT_E4)
    for lang, r in SAMPLE_RATE_E4.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return (
        d.select("doc_id", "lang", bucket.alias("bucket"))
        .where(F.col("bucket") < rate)
        .orderBy("doc_id")
    )


# tokens per training shard: the sf0.01 documents table carries ~100k
# whitespace tokens total, so this yields a dozen-plus shards — enough
# to exercise several budget boundaries in the gate
SHARD_BUDGET_TOKENS = 8192


def shard_pack(
    spark: SparkSession,
    sf_dir: str,
    budget_tokens: int = SHARD_BUDGET_TOKENS,
) -> DataFrame:
    """Deterministic token-budget shard assignment — the sharding step a
    training-data run applies after corpus construction: documents in
    doc_id order are packed into consecutive shards of
    ``budget_tokens`` whitespace tokens, ``shard_id = floor(exclusive
    prefix tokens / budget)``. The exclusive prefix sum means a shard
    boundary always falls exactly at a budget multiple and a document
    straddling the boundary belongs to the shard its FIRST token lands
    in — a total, engine-independent contract (the DuckDB oracle is the
    same window expression).

    Scale shape: the global running sum is operators/order.prefix_sum —
    range-repartition + per-partition windows + a P-row driver offset
    collect — never a single-partition window, so the pack
    distributes at any corpus size.
    """
    from snapcrawler_spark.operators.order import prefix_sum

    d = docs(spark, sf_dir).select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    packed = prefix_sum(
        d, ["doc_id"], "n_tokens", out_col="prefix_tokens", exclusive=True
    )
    return packed.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.floor(F.col("prefix_tokens") / F.lit(budget_tokens))
        .cast("long")
        .alias("shard_id"),
    ).orderBy("doc_id")


# per-language mixture weights ×100 — the deterministic analog of
# temperature-weighted source sampling: a source of weight w emits its
# r-th document at virtual time r/w, so higher-weight (tail) languages
# appear denser early in the stream. en is downweighted 3× here.
MIX_WEIGHT_E2 = {"en": 100}
MIX_DEFAULT_E2 = 300


def interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multi-source interleaving — the mixture-ordering
    step between corpus construction and shard packing: documents from
    each language stream merge into one global order by virtual time
    ``pos = r / w`` (r = 1-based rank within the language by doc_id,
    w = the language's mixture weight), ties broken by (lang, doc_id).
    ``interleave_seq`` is the resulting dense global 1-based rank.

    Scale shape: the per-language rank is a PARTITIONED window; the
    global rank over (pos, lang, doc_id) is operators/order.
    dense_order_key (range-repartition + P-row offset collect) — no
    single-partition window anywhere. Virtual time is integer-exact:
    ``pos_e6 = (r * 10^8) div weight_e2`` = floor(r/w · 10^6), the same
    integer expression the DuckDB oracle computes.
    """
    from pyspark.sql import Window

    from snapcrawler_spark.operators.order import dense_order_key

    d = docs(spark, sf_dir).select("doc_id", "lang")
    w_lang = Window.partitionBy("lang").orderBy("doc_id")
    weight = F.lit(MIX_DEFAULT_E2)
    for lg, wt in MIX_WEIGHT_E2.items():
        weight = F.when(F.col("lang") == lg, F.lit(wt)).otherwise(weight)
    ranked = d.select(
        "doc_id",
        "lang",
        F.row_number().over(w_lang).cast("long").alias("r"),
        weight.alias("__w"),
    ).select(
        "doc_id",
        "lang",
        "r",
        F.expr("(r * 100000000) div __w").alias("pos_e6"),
    )
    return (
        dense_order_key(ranked, ["pos_e6", "lang", "doc_id"], "interleave_seq")
        .select("doc_id", "lang", "r", "pos_e6", "interleave_seq")
        .orderBy("doc_id")
    )


# capstone mixture for the full pipeline: survivors interleave by
# SOURCE (corpus_build keeps a single language, so language mixing is
# vacuous there); the first five sources are upweighted 3x
PIPE_MIX_WEIGHT_E2 = {f"src{i}": 300 for i in range(5)}
PIPE_MIX_DEFAULT_E2 = 100
PIPE_SHARD_BUDGET_TOKENS = 4096


def pipeline_pack(
    spark: SparkSession,
    sf_dir: str,
    cfg: CorpusConfig | None = None,
    budget_tokens: int = PIPE_SHARD_BUDGET_TOKENS,
) -> DataFrame:
    """The complete training-data chain as ONE relational plan:
    ``corpus_build`` (lang filter → quality → exact keep-first →
    near-dup keep-canonical) → source-mixture interleave of the
    survivors (virtual time r/weight per source) → token-budget shard
    packing in INTERLEAVE order, so every shard inherits the mixture
    (each ~budget-token shard draws from sources at the configured
    rates — what a curriculum/mixture spec actually wants, and why
    packing must follow interleaving rather than doc_id order).

    Scale shape: reuses the gated pieces — corpus_build's
    shuffle-on-key stages, partitioned per-source rank windows,
    ``dense_order_key`` for the global interleave rank and
    ``prefix_sum`` for the running token total (both range-partitioned,
    P-row driver collects, no single-partition window anywhere).
    """
    from pyspark.sql import Window

    from snapcrawler_spark.operators.order import dense_order_key, prefix_sum

    built = corpus_build(spark, sf_dir, cfg).select("doc_id")
    d = (
        docs(spark, sf_dir)
        .join(built, "doc_id")
        .select(
            "doc_id",
            "source",
            F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        )
    )
    w_src = Window.partitionBy("source").orderBy("doc_id")
    weight = F.lit(PIPE_MIX_DEFAULT_E2)
    for src, wt in PIPE_MIX_WEIGHT_E2.items():
        weight = F.when(F.col("source") == src, F.lit(wt)).otherwise(weight)
    ranked = d.select(
        "doc_id",
        "source",
        "n_tokens",
        F.row_number().over(w_src).cast("long").alias("r"),
        weight.alias("__w"),
    ).select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr("(r * 100000000) div __w").alias("pos_e6"),
    )
    il = dense_order_key(
        ranked, ["pos_e6", "source", "doc_id"], "interleave_seq"
    )
    packed = prefix_sum(
        il, ["interleave_seq"], "n_tokens", out_col="__pfx", exclusive=True
    )
    return packed.select(
        "doc_id",
        "source",
        "interleave_seq",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.floor(F.col("__pfx") / F.lit(budget_tokens))
        .cast("long")
        .alias("shard_id"),
    ).orderBy("doc_id")
