"""Text analysis operators over the documents table.

Each returns a DataFrame whose column names match the DuckDB oracle in
__spark_entry__ (the driver hash-compares by sorted column name)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# tiny per-language stopword marker sets (language-ID heuristic; the
# synthetic documents table carries a ground-truth lang column we do NOT
# peek at — the query outputs both for comparison downstream)
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "das"],
    "es": ["el", "los", "que"],
    "fr": ["le", "les", "des"],
    "zh": ["的", "是", "了"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on"]


def docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _e4(col):
    """Scaled-integer truncation: floor(x·10⁴) as BIGINT. Unlike round(),
    floor on the identical IEEE double is engine-agnostic (Spark rounds
    via decimal-string HALF_UP, DuckDB via scaled-double — they disagree
    on exact .5 boundaries)."""
    return F.floor(col * 10000).cast("long")


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + char stats (quality-scoring input)."""
    d = docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        _e4(F.length("text") / F.size(toks)).alias("avg_token_len_e4"),
    ).orderBy("doc_id")


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / stopword-ratio quality heuristic — the
    text analog of the reference's image quality score
    (advanced_formats.py:215-252): fixed-weight blend of simple ratios."""
    d = docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    n_dots = F.length("text") - F.length(F.regexp_replace("text", r"\.", ""))
    len_score = F.least(F.length("text") / F.lit(500.0), F.lit(1.0))
    stop_ratio = n_stop / n_tokens
    return d.select(
        "doc_id",
        _e4(len_score).alias("len_score_e4"),
        _e4(stop_ratio).alias("stop_ratio_e4"),
        n_dots.alias("n_sentences"),
        _e4(0.5 * len_score + 0.5 * stop_ratio).alias("quality_e4"),
    ).orderBy("doc_id")


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: argmax over per-language marker hits."""
    d = docs(spark, sf_dir)
    toks = F.split(F.lower(F.col("text")), " ")

    def _in_set(markers):
        # factory (not a default-arg lambda): a 2-param lambda would make
        # pyspark pass the array index as the second argument
        return lambda t: t.isin(markers)

    scores = [
        F.size(F.filter(toks, _in_set(markers))).alias(f"s_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]
    scored = d.select("doc_id", "lang", *scores)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"s_{x}") for x in langs])
    pred = F.lit("und")
    # deterministic tie-break: first language in fixed order wins
    for x in reversed(langs):
        pred = F.when((F.col(f"s_{x}") == best) & (best > 0), F.lit(x)).otherwise(pred)
    return scored.select(
        "doc_id", F.col("lang").alias("lang_true"), pred.alias("lang_pred")
    ).orderBy("doc_id")


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint (md5 over lowercased alpha text) —
    the document analog of the page-MD5 dedup key
    (crawling_module.py:228)."""
    d = docs(spark, sf_dir)
    norm = F.regexp_replace(F.lower(F.col("text")), r"[^a-z ]", "")
    return d.select(
        "doc_id", F.md5(norm).alias("fp"), F.substring(F.md5(norm), 1, 4).alias("fp_bucket")
    ).orderBy("doc_id")
