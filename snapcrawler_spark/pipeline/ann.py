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
    """Exact cosine top-k neighbors for every stride-th vector.

    Round 7 (optimization): the per-pair cosine moved off the
    interpreted higher-order-function path (zip_with + aggregate per
    pair — 3 array folds × N/stride × N lambda evaluations dominated
    the whole query bench at sf1.0) onto vectorized NumPy inside
    mapInPandas (guide §4.2), with per-batch exact top-k so only
    N_q·k rows per Arrow batch ever reach the final window (the old
    plan's WindowGroupLimit pruned the same rows, but only AFTER
    materializing and sorting all N_q×N scored pairs).

    Bit-exactness with the frozen DuckDB oracle: the fold below adds
    products in ascending element order — per (query, corpus) cell,
    ``acc += Q[:, i] * B[:, i]`` performs exactly the IEEE
    multiply-then-add sequence (((0 + q0·b0) + q1·b1) + …) that
    F.aggregate(F.zip_with(...)) performed, so every cosine double
    (and its floor·1e6 grid value) is unchanged. Per-batch top-k under
    the total order (cosine_e6 DESC, nn_id ASC) contains every member
    of the global top-k present in the batch, so the final window
    returns identical rows for ANY partitioning of the corpus.

    The query side (vec_id % stride == 0) is collected as the
    broadcast matrix — N/stride rows. That is bounded by the same
    budget that bounds the op itself: brute force computes N²/stride
    cosines, so any corpus whose query matrix strains the driver is a
    corpus where the exact baseline is infeasible outright (LSH/IVF
    are the at-scale paths and collect nothing)."""
    import numpy as np
    import pandas as pd

    emb = _emb(spark, sf_dir)
    qp = (
        emb.where(F.col("vec_id") % QUERY_STRIDE == 0)
        .select("vec_id", "v")
        .toPandas()
    )
    out_schema = "query_id long, nn_id long, cosine_e6 long"
    q_ids = qp["vec_id"].to_numpy(dtype=np.int64)
    Q = np.stack(qp["v"].to_numpy()) if len(qp) else np.zeros((0, 1))
    nq, dim = Q.shape

    def _fold_norm(m):
        # exact left-to-right Σx² fold, vectorized across rows
        acc = np.zeros(m.shape[0])
        for i in range(m.shape[1]):
            acc += m[:, i] * m[:, i]
        return np.sqrt(acc)

    qn = _fold_norm(Q)
    # sentinel for self-pairs; min+1 so its negation is still int64
    masked = np.iinfo(np.int64).min + 1

    def topk_batches(batches):
        for pdf in batches:
            if len(pdf) == 0 or nq == 0:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            B = np.stack(pdf["v"].to_numpy())
            nb = len(ids)
            acc = np.zeros((nq, nb))
            for i in range(dim):  # exact left-to-right dot fold
                acc += Q[:, i : i + 1] * B[None, :, i]
            bn = _fold_norm(B)
            cos = acc / (qn[:, None] * bn[None, :])
            ce6 = np.floor(cos * 1_000_000.0).astype(np.int64)
            # composite in-batch total order: cosine_e6 DESC, nn_id ASC.
            # id_rank < nb ≤ 2^shift and |ce6| ≤ 1e6, so the key fits
            # int64 with room to spare.
            shift = max(int(nb).bit_length(), 1)
            order = np.argsort(ids, kind="stable")
            id_rank = np.empty(nb, dtype=np.int64)
            id_rank[order] = np.arange(nb, dtype=np.int64)
            key = (ce6 << np.int64(shift)) + (
                np.int64(nb) - 1 - id_rank[None, :]
            )
            key[ids[None, :] == q_ids[:, None]] = masked
            kk = min(k, nb)
            part = np.argpartition(-key, kk - 1, axis=1)[:, :kk]
            rows = np.repeat(np.arange(nq), kk)
            cols = part.ravel()
            keep = key[rows, cols] != masked
            yield pd.DataFrame(
                {
                    "query_id": q_ids[rows[keep]],
                    "nn_id": ids[cols[keep]],
                    "cosine_e6": ce6[rows[keep], cols[keep]],
                }
            )

    cand = (
        emb.select("vec_id", "v")
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(topk_batches, out_schema)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_e6"), F.asc("nn_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
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
    # plane numbering: the window input is bounded to N_PLANES rows by
    # the limit, so the constant partition key (single partition by
    # construction, not by accident) costs nothing at any corpus size
    planes = emb.orderBy("vec_id").limit(N_PLANES).select(
        F.row_number().over(
            Window.partitionBy(F.lit(0)).orderBy("vec_id")
        ).alias("rn"),
        F.col("v").alias("pv"),
    ).select((F.col("rn") - 1).alias("plane_id"), "pv")
    sig = _signatures(emb, planes)
    # norm computed ONCE per vector (round 7): sqrt(Σv²) is the same
    # double whether evaluated per row or per candidate pair, and the
    # cosine's divide/multiply sequence is unchanged — bit-identical,
    # but 2 of the 3 per-pair array folds disappear
    embs = emb.join(sig, "vec_id").withColumn("nrm", _norm(F.col("v")))
    q = embs.where(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        "bucket",
    )
    cand = q.join(
        embs.select(
            F.col("vec_id").alias("nn_id"), "v", "nrm", "bucket"
        ),
        "bucket",
    ).where(F.col("query_id") != F.col("nn_id"))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    scored = cand.select(
        "query_id", "nn_id", F.floor(cos * 1_000_000).cast("long").alias("cosine_e6")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_e6"), F.asc("nn_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


N_TABLES = 4


def ann_lsh_multi(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    n_tables: int = N_TABLES,
) -> DataFrame:
    """Multi-table hyperplane LSH: T independent plane sets (table t uses
    corpus vectors [t·8, t·8+8) as planes), candidates = union of
    same-bucket pairs over all tables. Recall grows 1-(1-p)^T vs the
    single-probe variant while the per-table join stays bucket-local —
    the production recall/cost knob."""
    emb = _emb(spark, sf_dir).persist()
    first = (
        emb.orderBy("vec_id")
        .limit(n_tables * N_PLANES)
        # bounded to n_tables*N_PLANES rows by the limit — the constant
        # partition key makes the single-partition window explicit
        .select(
            (F.row_number().over(
                Window.partitionBy(F.lit(0)).orderBy("vec_id")
            ) - 1).alias(
                "pid_all"
            ),
            F.col("v").alias("pv"),
        )
    )
    planes = first.select(
        F.floor(F.col("pid_all") / N_PLANES).cast("int").alias("tbl"),
        F.pmod("pid_all", F.lit(N_PLANES)).alias("plane_id"),
        "pv",
    )
    joined = emb.crossJoin(F.broadcast(planes))
    bit = F.when(_dot(F.col("v"), F.col("pv")) >= 0, F.lit(1)).otherwise(
        F.lit(0)
    )
    sig = (
        joined.select("vec_id", "tbl", "plane_id", bit.alias("bit"))
        .groupBy("vec_id", "tbl")
        .agg(
            F.sum(
                F.expr("shiftleft(cast(bit as bigint), plane_id)")
            ).alias("bucket")
        )
    )
    q = sig.where(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), "tbl", "bucket"
    )
    cand = (
        q.join(
            sig.select(F.col("vec_id").alias("nn_id"), "tbl", "bucket"),
            ["tbl", "bucket"],
        )
        .where(F.col("query_id") != F.col("nn_id"))
        .select("query_id", "nn_id")
        .distinct()
    )
    # per-vector norms (round 7) — see ann_lsh: bit-identical, 2 fewer
    # per-pair folds
    a = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        _norm(F.col("v")).alias("qn"),
    )
    b = emb.select(
        F.col("vec_id").alias("nn_id"), "v", _norm(F.col("v")).alias("nn")
    )
    pairs = cand.join(a, "query_id").join(b, "nn_id")
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nn"))
    scored = pairs.select(
        "query_id", "nn_id", F.floor(cos * 1_000_000).cast("long").alias("cosine_e6")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_e6"), F.asc("nn_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


N_CELLS = 16
N_PROBE = 4  # scans 1/4 of the corpus for ~0.68 recall@5 on random-ish
             # embeddings (clustered real embeddings fare far better)
KMEANS_ITERS = 5
KMEANS_SAMPLE_STRIDE = 1   # sample vec_id % stride == 0 for training
KMEANS_SAMPLE_CAP = 4096   # HARD bound on driver-collected training rows
KMEANS_Q = 1_000_000       # fixed-point scale for centroid coordinates


def _training_sample(
    emb: DataFrame, sample_stride: int, cap: int = KMEANS_SAMPLE_CAP
):
    """Bounded, deterministic k-means training sample as an ndarray.

    ``WHERE vec_id % stride = 0 ORDER BY vec_id LIMIT cap`` — at most
    ``cap`` rows reach the driver at ANY corpus size (the limit is the
    bound; the stride is a spread knob for production corpora where the
    first ``cap`` ids would be one shard)."""
    import numpy as np

    rows = (
        emb.where(F.col("vec_id") % sample_stride == 0)
        .orderBy("vec_id")
        .limit(cap)
        .select("v")
        .collect()
    )
    assert len(rows) <= cap, f"training sample {len(rows)} > cap {cap}"
    return np.array([r.v for r in rows], dtype=np.float64)


def _lloyd_fixed_point(pts, n_cells: int, iters: int) -> list[list[float]]:
    """Deterministic Lloyd k-means with FIXED-POINT centroid updates.

    Every centroid coordinate lives on the 1e-6 grid: init = the first
    n_cells sample vectors quantized (floor(x·1e6)), update =
    floor(Σ quantized / n) where the Σ is an exact int64 sum. Integer
    sums are order-independent, so the DuckDB oracle's unrolled-Lloyd
    SQL (which sums in whatever order its parallel aggregation picks)
    reproduces these centroids bit-for-bit — the float `mean()` of
    textbook Lloyd would differ across engines by summation order.
    Assignment distances stay in doubles (both engines compute them from
    bitwise-identical centroid and point values)."""
    import numpy as np

    q = np.floor(pts * KMEANS_Q).astype(np.int64)
    k = min(n_cells, len(q))
    cq = q[:k].copy()
    for _ in range(iters):
        c = cq.astype(np.float64) / KMEANS_Q
        d = ((pts[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # ties → lowest cell, like ORDER BY cell
        for cell in range(k):
            sel = q[assign == cell]
            if len(sel):
                s = sel.sum(axis=0)  # exact int64 — no overflow: |coord
                # quantized| ≲ 1e8, cap 4096 rows → |Σ| ≲ 4e11 « 2^63
                cq[cell] = np.floor(
                    s.astype(np.float64) / len(sel)
                ).astype(np.int64)
    return [[float(x) / KMEANS_Q for x in row] for row in cq]


def _train_centroids(
    emb: DataFrame, n_cells: int, iters: int, sample_stride: int
) -> list[list[float]]:
    """Deterministic driver-side Lloyd k-means over a bounded sample.

    Centroids are metadata (n_cells × dim floats): training collects at
    most KMEANS_SAMPLE_CAP rows (``_training_sample``) regardless of
    corpus size, and the fixed-point update rule makes the result
    engine-portable (``_lloyd_fixed_point``) — the DuckDB gate oracle
    re-derives the same centroids in SQL."""
    return _lloyd_fixed_point(
        _training_sample(emb, sample_stride), n_cells, iters
    )


def ann_ivf(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """IVF (inverted-file) ANN: corpus vectors are assigned to their
    nearest k-means cell; a query scans only its n_probe nearest cells.

    Full DuckDB oracle: the fixed-iteration, fixed-point Lloyd training
    is SQL-expressible as an unrolled CTE chain (__spark_entry__.py
    generates it), so the driver gate hash-checks this op end to end.
    The pytest properties (recall(n_probe = n_cells) == 1.0 vs brute
    force, partial-probe recall floor) remain as semantic checks."""
    emb = _emb(spark, sf_dir).persist()
    centers = _train_centroids(
        emb, n_cells, KMEANS_ITERS, KMEANS_SAMPLE_STRIDE
    )
    cent_df = F.array(
        *[
            F.struct(
                F.lit(i).alias("cell"),
                F.array(*[F.lit(x) for x in c]).alias("cv"),
            )
            for i, c in enumerate(centers)
        ]
    )

    def _sq_dist(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # nearest cell per vector: explode the (tiny) centroid array — the
    # centroid list is a literal, so this is a map-side operation
    with_cells = (
        emb.select("vec_id", "v", F.explode(cent_df).alias("c"))
        .select(
            "vec_id", "v", F.col("c.cell").alias("cell"),
            _sq_dist(F.col("v"), F.col("c.cv")).alias("d2"),
        )
    )
    w_cell = Window.partitionBy("vec_id").orderBy("d2", "cell")
    assigned = (
        with_cells.withColumn("rk", F.row_number().over(w_cell))
        .where(F.col("rk") == 1)
        .select("vec_id", "v", "cell")
    )
    probes = (
        with_cells.where(F.col("vec_id") % QUERY_STRIDE == 0)
        .withColumn("rk", F.row_number().over(w_cell))
        .where(F.col("rk") <= n_probe)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "cell")
    )
    # per-vector norms (round 7) — see ann_lsh: bit-identical, 2 fewer
    # per-pair folds
    cand = probes.withColumn("qn", _norm(F.col("qv"))).join(
        assigned.select(
            F.col("vec_id").alias("nn_id"),
            "v",
            _norm(F.col("v")).alias("nn"),
            "cell",
        ),
        "cell",
    ).where(F.col("query_id") != F.col("nn_id"))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nn"))
    scored = cand.select(
        "query_id", "nn_id",
        F.floor(cos * 1_000_000).cast("long").alias("cosine_e6"),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_e6"), F.asc("nn_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


DUP_THRESHOLD_E6 = 950_000  # cosine ≥ 0.95 → near-duplicate pair


def emb_with_seeded_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ deterministic near-duplicates: every vec_id % 10 == 0
    re-inserted at vec_id + 10_000_000 scaled by 1.25. Scaling preserves
    direction exactly (cosine(v, 1.25·v) computes to the same double in
    every engine), so the synthetic corpus — whose random vectors have
    no natural near-dups — gets known positives at every scale factor.
    Sign-hyperplane buckets are scale-invariant, so LSH recall on these
    pairs is exactly 1.0 (same signs in every table)."""
    e = _emb(spark, sf_dir)
    dup = e.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
        F.transform("v", lambda x: x * 1.25).alias("v"),
        "label",
    )
    return e.unionByName(dup)


def dedup_embedding_cosine(
    spark: SparkSession,
    sf_dir: str,
    threshold_e6: int = DUP_THRESHOLD_E6,
    n_tables: int = N_TABLES,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs over the seeded corpus:
    multi-table hyperplane-LSH candidates (ALL same-bucket pairs, no
    query stride) verified by exact cosine ≥ threshold.

    The 100 TB shape: candidate generation is bucket-local per table
    (never an all-pairs self-join); the exact-cosine verify touches only
    the candidate sliver. Completes the dedup family (exact / Jaccard /
    MinHash-LSH / SimHash / embedding-cosine)."""
    emb = emb_with_seeded_dups(spark, sf_dir).persist()
    first = (
        emb.orderBy("vec_id")
        .limit(n_tables * N_PLANES)
        # bounded to n_tables*N_PLANES rows by the limit — the constant
        # partition key makes the single-partition window explicit
        .select(
            (F.row_number().over(
                Window.partitionBy(F.lit(0)).orderBy("vec_id")
            ) - 1).alias(
                "pid_all"
            ),
            F.col("v").alias("pv"),
        )
    )
    planes = first.select(
        F.floor(F.col("pid_all") / N_PLANES).cast("int").alias("tbl"),
        F.pmod("pid_all", F.lit(N_PLANES)).alias("plane_id"),
        "pv",
    )
    joined = emb.crossJoin(F.broadcast(planes))
    bit = F.when(_dot(F.col("v"), F.col("pv")) >= 0, F.lit(1)).otherwise(
        F.lit(0)
    )
    sig = (
        joined.select("vec_id", "tbl", "plane_id", bit.alias("bit"))
        .groupBy("vec_id", "tbl")
        .agg(
            F.sum(
                F.expr("shiftleft(cast(bit as bigint), plane_id)")
            ).alias("bucket")
        )
    )
    a = sig.select(F.col("vec_id").alias("vec_a"), "tbl", "bucket")
    b = sig.select(F.col("vec_id").alias("vec_b"), "tbl", "bucket")
    cand = (
        a.join(b, ["tbl", "bucket"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    # per-vector norms (round 7) — see ann_lsh: bit-identical, 2 fewer
    # per-pair folds
    va = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("av"),
        _norm(F.col("v")).alias("an"),
    )
    vb = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("bv"),
        _norm(F.col("v")).alias("bn"),
    )
    pairs = cand.join(va, "vec_a").join(vb, "vec_b")
    cos = _dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn"))
    return (
        pairs.select(
            "vec_a",
            "vec_b",
            F.floor(cos * 1_000_000).cast("long").alias("cosine_e6"),
        )
        .where(F.col("cosine_e6") >= threshold_e6)
        .orderBy("vec_a", "vec_b")
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


def dedup_embedding_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-dedup resolution: the embedding-cosine near-dup pairs
    collapsed into connected components (vec_id, cluster_id,
    is_canonical) via the shared pointer-jumping CC operator — the
    keep-one-per-cluster step for embedding-level duplicates, exactly
    parallel to pipeline/dedup.dedup_cluster for text."""
    from snapcrawler_spark.pipeline.dedup import connected_components

    pairs = dedup_embedding_cosine(spark, sf_dir).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    labels = connected_components(pairs)
    return labels.select(
        F.col("doc_id").alias("vec_id"),
        F.col("label").alias("cluster_id"),
        (F.col("label") == F.col("doc_id")).alias("is_canonical"),
    ).orderBy("vec_id")
