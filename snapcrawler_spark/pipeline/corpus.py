"""End-to-end training-corpus construction over the documents table.

``corpus_build`` composes the pipeline a large-scale text-corpus run
chains in practice — language filter → quality threshold → exact-dup
keep-first → near-dup cluster keep-canonical — into one relational
plan, reusing the individually-gated operators (pipeline/text.py,
pipeline/dedup.py). Every stage is shuffle-on-key; the only iterative
piece is the connected-components fixpoint inside ``dedup_cluster``.

Output: one row per surviving document (doc_id, lang_pred, quality_e4),
ordered by doc_id — deterministic and hash-comparable against the
composed DuckDB oracle (__spark_entry__.oracle_sql()['corpus_build']).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snapcrawler_spark.pipeline.dedup import dedup_cluster
from snapcrawler_spark.pipeline.text import docs, lang_id, quality_score

MIN_QUALITY_E4 = 3000
KEEP_LANG = "en"


def corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    non_canonical = dedup_cluster(spark, sf_dir).where(
        ~F.col("is_canonical")
    ).select("doc_id")

    return (
        exact_kept.join(non_canonical, "doc_id", "left_anti")
        .join(lang, "doc_id")
        .join(qual, "doc_id")
        .where(
            (F.col("lang_pred") == KEEP_LANG)
            & (F.col("quality_e4") >= MIN_QUALITY_E4)
        )
        .select("doc_id", "lang_pred", "quality_e4")
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
