"""Benchmark decontamination: flag corpus documents sharing any k-word
gram (k = 13, the standard eval-overlap window) with an eval-set table.

The one training-data stage the pipeline family still lacked (VERDICT
r5 #3): before training, every document that contains a verbatim
13-gram from an evaluation benchmark must be dropped or flagged, or the
benchmark leaks into the training set. Same membership-probe shape as
the crawl's URL-seen join (SURVEY §2.3), expressed Spark-first:

- corpus side: explode distinct k-grams per document (the
  ``pipeline.dedup.shingles`` pattern with an n ≥ k guard so a short
  document emits nothing rather than a truncated pseudo-gram);
- grams are hashed to portable 60-bit ints (``pipeline.dedup._hash60``)
  before the join — an 8-byte key instead of a ~90-byte string cuts the
  probe payload an order of magnitude;
- eval side: the distinct gram-hash set is TINY next to the corpus
  (benchmarks are thousands of docs; the corpus is billions), so the
  probe is an explicitly-broadcast hash join — the corpus side never
  shuffles, the whole stage is scan → project → broadcast-probe →
  partial-agg, exactly the shape that holds at 100 TB.

The eval set is derived deterministically from the documents table
itself (no external data, mirrored in the DuckDB oracle —
__spark_entry__.oracle_sql()['corpus_decontaminate']): every
doc_id % 17 == 3 document contributes a mid-section excerpt (tokens
5..29), so its 13-grams verbatim-overlap the source document — and any
byte-identical duplicate of it — while every other document stays
clean. Accidental 13-gram collisions are impossible at fixture vocab
(~40 words) short of a verbatim copy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snapcrawler_spark.pipeline.dedup import _hash60
from snapcrawler_spark.pipeline.text import docs

DECON_K = 13
# eval excerpt: tokens 5..29 (1-based start, length 25) of every
# doc_id % 17 == 3 document
EVAL_MOD, EVAL_REM = 17, 3
EVAL_SLICE_START, EVAL_SLICE_LEN = 5, 25


def _kgram_hashes(df: DataFrame, k: int = DECON_K) -> DataFrame:
    """(doc_id, g): distinct 60-bit hashes of the k-word grams of
    ``text``. Documents shorter than k words emit nothing."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    grams = F.when(n < k, F.array()).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )
    return df.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("gram")
    ).select("doc_id", _hash60(F.col("gram")).alias("g"))


def seeded_eval_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(eval_id, text): the deterministic eval benchmark derived from
    the documents table (see module docstring)."""
    d = docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    return d.where(F.col("doc_id") % EVAL_MOD == EVAL_REM).select(
        F.col("doc_id").alias("eval_id"),
        F.concat_ws(
            " ", F.slice(toks, EVAL_SLICE_START, EVAL_SLICE_LEN)
        ).alias("text"),
    )


def decontaminate_flags(
    corpus: DataFrame, eval_set: DataFrame, k: int = DECON_K
) -> DataFrame:
    """(doc_id, n_overlap_grams) for every corpus document sharing at
    least one k-gram with the eval set. Generic over any
    (doc_id, text) corpus and (eval_id, text) eval table."""
    eval_grams = (
        _kgram_hashes(
            eval_set.select(F.col("eval_id").alias("doc_id"), "text"), k
        )
        .select("g")
        .distinct()
    )
    doc_grams = _kgram_hashes(corpus, k)
    # plain count, not count_distinct: _kgram_hashes already emits
    # DISTINCT grams per doc (array_distinct before the explode), so
    # the distinct-agg's extra (doc_id, g) exchange would be pure
    # waste — with count the aggregate partial-combines map-side and
    # the whole stage is scan → project → broadcast-probe →
    # partial-agg → ONE exchange on doc_id (plan-pinned)
    return (
        doc_grams.join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap_grams"))
        .orderBy("doc_id")
    )


def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry: contaminated documents (doc_id, n_overlap_grams)
    against the seeded eval set — DuckDB oracle is the k-gram intersect
    join on the same md5-derived gram hashes."""
    return decontaminate_flags(
        docs(spark, sf_dir).select("doc_id", "text"),
        seeded_eval_set(spark, sf_dir),
    )
