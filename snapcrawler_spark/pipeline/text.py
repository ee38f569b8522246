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


# BPE-ish pre-tokenization split: letter runs | digit runs | single
# non-alphanumeric — the GPT-2-style coarse split that upper-bounds
# subword token counts from raw text without a merges table. Kept to
# character classes that Java regex (Spark) and RE2 (DuckDB) treat
# identically.
BPE_SPLIT_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, BPE-ish regex flavor (the task mandate's second
    tokenizer next to the whitespace one in ``token_count``): per doc,
    the regex-split token count, the whitespace count, and their ratio
    ×10⁴ — the 'tokens per word' statistic a budget estimator uses.

    The synthetic corpus is pure lowercase words, where both tokenizers
    agree — so docs with doc_id % 3 == 0 get a deterministic
    version-string suffix (digits + punctuation) that makes the ratio
    non-vacuous at every scale factor, mirrored in the DuckDB oracle
    (same seeded-variant pattern as ``repetition``)."""
    d = docs(spark, sf_dir)
    t = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.col("text"),
            F.lit(" v"),
            F.col("doc_id").cast("string"),
            F.lit(".2-rc("),
            (F.col("doc_id") % 97).cast("string"),
            F.lit(")"),
        ),
    ).otherwise(F.col("text"))
    base = d.select("doc_id", t.alias("__t"))
    n_bpe = F.size(F.regexp_extract_all(F.col("__t"), F.lit(BPE_SPLIT_RE), F.lit(0)))
    n_ws = F.size(F.split(F.col("__t"), " "))
    return base.select(
        "doc_id",
        n_bpe.cast("int").alias("n_bpe_tokens"),
        n_ws.cast("int").alias("n_ws_tokens"),
        F.floor(n_bpe * F.lit(10000.0) / n_ws).cast("long").alias(
            "bpe_per_word_e4"
        ),
    ).orderBy("doc_id")


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / stopword-ratio quality heuristic — the
    text analog of the reference's image quality score
    (advanced_formats.py:215-252): fixed-weight blend of simple ratios.

    Round 7 (optimization, output-identical — guide §4.2): the token
    split + stopword membership filter ran as interpreted higher-order
    functions over every token (~2.7M lambda evaluations at sf1.0);
    the metrics are now computed per doc inside one mapInPandas
    kernel. Exactness: Python ``split(" ")`` matches
    java.lang.String.split for the single-space pattern (so token and
    stop counts are equal integers); ``len(text)`` and ``count('.')``
    are codepoint-exact like length()/regexp_replace; the ratio and
    blend are the same IEEE double operations (int/int true division,
    min with 1.0, 0.5·a + 0.5·b) so every floor(x·10⁴) grid value is
    unchanged. corpus_build consumes quality_e4 from here — its gates
    re-verified against the frozen oracle after this change."""
    import numpy as np
    import pandas as pd

    stop_set = frozenset(STOPWORDS)

    def _q(batches):
        for pdf in batches:
            n = len(pdf)
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            len_e4 = np.empty(n, dtype=np.int64)
            stop_e4 = np.empty(n, dtype=np.int64)
            dots = np.empty(n, dtype=np.int32)
            qual_e4 = np.empty(n, dtype=np.int64)
            for r, text in enumerate(pdf["text"]):
                toks = text.split(" ")
                n_tok = len(toks)
                n_stop = sum(t in stop_set for t in toks)
                len_score = min(len(text) / 500.0, 1.0)
                stop_ratio = n_stop / n_tok
                len_e4[r] = int(np.floor(len_score * 10000))
                stop_e4[r] = int(np.floor(stop_ratio * 10000))
                dots[r] = text.count(".")
                qual_e4[r] = int(
                    np.floor((0.5 * len_score + 0.5 * stop_ratio) * 10000)
                )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "len_score_e4": len_e4,
                    "stop_ratio_e4": stop_e4,
                    "n_sentences": dots,
                    "quality_e4": qual_e4,
                }
            )

    d = (
        docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.col("text").isNotNull())
    )
    return d.repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(
        _q,
        "doc_id long, len_score_e4 long, stop_ratio_e4 long, "
        "n_sentences int, quality_e4 long",
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


def _rep_metrics_kernel(seed_lines: bool, seed_symbols: bool):
    """mapInPandas kernel computing the Gopher-style repetition metrics
    per doc (round 7, output-identical — guide §4.2).

    Why a kernel: the native-expression form kept the 2-gram array as a
    projected column, and in larger plans (corpus_build with the
    repetition gate) Catalyst inlined that array-construction
    expression INSIDE the per-distinct-2-gram filter lambda — the
    split+transform re-evaluated once per distinct 2-gram per doc,
    turning an O(n·distinct) mode computation into O(n²·distinct)
    interpreted work (corpus_build_rep measured 373 s at sf0.1 vs
    corpus_reasons_rep 10.5 s, pure plan-shape luck). The kernel emits
    concrete metric columns; there is nothing left to inline.

    Exactness notes: words split uses the explicit Java \\s class
    [ \\t\\n\\x0B\\f\\r] (Python's \\s is Unicode-wider); lines split
    on the literal newline keeps empties like F.split's limit -1;
    counts are exact ints; every ratio reproduces the expression's IEEE
    double op order (count·10000.0 / n, (3c)/3 true division) before
    the floor."""
    import re

    import numpy as np
    import pandas as pd

    ws = re.compile("[ \t\n\x0b\f\r]+")

    def _m(batches):
        from collections import Counter

        for pdf in batches:
            n = len(pdf)
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            n_lines_a = np.empty(n, dtype=np.int32)
            dup_e4 = np.empty(n, dtype=np.int64)
            top2_e4 = np.empty(n, dtype=np.int64)
            sym_e4 = np.empty(n, dtype=np.int64)
            for r, (doc_id, text) in enumerate(
                zip(ids, pdf["text"])
            ):
                t = text
                if seed_lines and doc_id % 5 == 0:
                    t = t + "\n" + t
                if seed_symbols and doc_id % 7 == 0:
                    t = t + " # # ..."
                lines = t.split("\n")
                nl = len(lines)
                n_lines_a[r] = nl
                dup_e4[r] = int(
                    np.floor((nl - len(set(lines))) * 10000.0 / nl)
                )
                words = ws.split(t)
                nw = len(words)
                if nw < 2:
                    top2 = 0.0
                else:
                    g2_n = nw - 1
                    top = max(
                        Counter(
                            words[i] + " " + words[i + 1]
                            for i in range(g2_n)
                        ).values()
                    )
                    top2 = top * 10000.0 / g2_n
                top2_e4[r] = int(np.floor(top2))
                n_hash = t.count("#")
                n_ell = (3 * t.count("...")) / 3
                sym_e4[r] = int(
                    np.floor((n_hash + n_ell) * 10000.0 / nw)
                )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_lines": n_lines_a,
                    "dup_line_frac_e4": dup_e4,
                    "top2gram_frac_e4": top2_e4,
                    "symbol_word_ratio_e4": sym_e4,
                }
            )

    return _m


_REP_SCHEMA = (
    "doc_id long, n_lines int, dup_line_frac_e4 long, "
    "top2gram_frac_e4 long, symbol_word_ratio_e4 long"
)


def repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry for the repetition predicates. The synthetic documents
    text carries no newlines or symbols, so — exactly like
    operators/image_dedup.seeded_phash_images — deterministic seeded
    variants make every metric non-vacuous at any scale factor (and the
    DuckDB oracle applies the identical transform): docs with
    doc_id % 5 == 0 get their text duplicated across a newline (dup-line
    fraction 1/2 unless the % 7 suffix splits the pair), docs with
    doc_id % 7 == 0 get a ' # # ...' symbol suffix. top2gram is
    non-vacuous on the RAW text already (bounded vocabulary).

    Round 7: metrics come from ``_rep_metrics_kernel`` (seeding applied
    inside the kernel — identical string construction)."""
    d = (
        docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.col("text").isNotNull())
    )
    return (
        d.repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(
            _rep_metrics_kernel(seed_lines=True, seed_symbols=True),
            _REP_SCHEMA,
        )
        .orderBy("doc_id")
    )


def raw_top2gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, top2gram_frac_e4) over the RAW documents text — the
    repetition signal ``corpus_build`` consumes when its config sets
    ``max_top2gram_frac_e4`` (pipeline/corpus.py). Round 7: kernelized
    (see ``_rep_metrics_kernel``)."""
    d = (
        docs(spark, sf_dir)
        .select("doc_id", "text")
        .where(F.col("text").isNotNull())
    )
    return d.repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(
        _rep_metrics_kernel(seed_lines=False, seed_symbols=False),
        _REP_SCHEMA,
    ).select("doc_id", "top2gram_frac_e4")


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint (md5 over lowercased alpha text) —
    the document analog of the page-MD5 dedup key
    (crawling_module.py:228)."""
    d = docs(spark, sf_dir)
    norm = F.regexp_replace(F.lower(F.col("text")), r"[^a-z ]", "")
    return d.select(
        "doc_id", F.md5(norm).alias("fp"), F.substring(F.md5(norm), 1, 4).alias("fp_bucket")
    ).orderBy("doc_id")
