"""Similarity search over the embeddings table (array<float> column).

- brute-force cosine top-k: the exactness baseline — query×corpus
  cross join with the dot product in native higher-order functions
  (F.zip_with + F.aggregate, JVM-side, no Python);
- LSH-bucketed variant: random-hyperplane signs (planes = the first 8
  corpus vectors, deterministic and oracle-reproducible) shrink the
  candidate set before exact cosine — the 100 TB path where the cross
  join is infeasible.

All floats are computed in double and rounded before comparison so the
DuckDB oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TOP_K = 5
QUERY_STRIDE = 50  # vec_id % stride == 0 → query set
N_PLANES = 8


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return df.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        "label",
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def ann_brute_force(
    spark: SparkSession, sf_dir: str, k: int = TOP_K
) -> DataFrame:
    """Exact cosine top-k neighbors for every stride-th vector."""
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pairs = q.crossJoin(emb.select(F.col("vec_id").alias("nn_id"), "v")).where(
        F.col("query_id") != F.col("nn_id")
    )
    cos = _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
    scored = pairs.select(
        "query_id", "nn_id", F.floor(cos * 1_000_000).cast("long").alias("cosine_e6")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_e6"), F.asc("nn_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def _signatures(emb: DataFrame, planes: DataFrame) -> DataFrame:
    """Sign-bit signature of every vector against the shared planes."""
    joined = emb.crossJoin(F.broadcast(planes))
    bit = F.when(_dot(F.col("v"), F.col("pv")) >= 0, F.lit(1)).otherwise(F.lit(0))
    return joined.select("vec_id", "plane_id", bit.alias("bit")).groupBy(
        "vec_id"
    ).agg(
        F.sum(F.expr("shiftleft(cast(bit as bigint), plane_id)")).alias("bucket")
    )


def ann_lsh(
    spark: SparkSession, sf_dir: str, k: int = TOP_K
) -> DataFrame:
    """Hyperplane-LSH ANN: exact cosine only within matching sign
    buckets. Recall < 1 by design; the oracle mirrors the same bucketing
    so results are deterministic."""
    emb = _emb(spark, sf_dir).persist()
    planes = emb.orderBy("vec_id").limit(N_PLANES).select(
        F.row_number().over(Window.orderBy("vec_id")).alias("rn"),
        F.col("v").alias("pv"),
    ).select((F.col("rn") - 1).alias("plane_id"), "pv")
    sig = _signatures(emb, planes)
    embs = emb.join(sig, "vec_id")
    q = embs.where(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "bucket"
    )
    cand = q.join(
        embs.select(F.col("vec_id").alias("nn_id"), "v", "bucket"), "bucket"
    ).where(F.col("query_id") != F.col("nn_id"))
    cos = _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
    scored = cand.select(
        "query_id", "nn_id", F.floor(cos * 1_000_000).cast("long").alias("cosine_e6")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_e6"), F.asc("nn_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding norm statistics (sanity aggregate)."""
    emb = _emb(spark, sf_dir)
    return (
        emb.select("label", _norm(F.col("v")).alias("nrm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.floor(F.avg("nrm") * 10000).cast("long").alias("avg_norm_e4"),
            F.floor(F.max("nrm") * 10000).cast("long").alias("max_norm_e4"),
        )
        .orderBy("label")
    )
