"""Link-graph scoring for frontier prioritization — integer-exact
PageRank over a deterministic synthetic link graph.

A production crawler ranks its frontier by link-graph signals (the
reference's priority heuristic — crawling_module.py:320-331 — is the
degenerate version: substring match → front of queue). The Spark-first
shape is power iteration as join + partial-aggregating groupBy rounds:
every iteration is shuffle-on-key over O(edges) rows, no driver-side
state, iteration count a job parameter.

Cross-engine determinism: classic PageRank sums floating-point
contributions, and float sums are ORDER-dependent — a Spark groupBy
and a DuckDB GROUP BY would round differently. Here every quantity is
a scaled integer: scores carry 10⁶ units, per-edge contributions are
``score // outdeg`` (floor division), and the damping step is
``150000 + (850000 · Σcontrib) // 10⁶`` — exact 64-bit arithmetic,
identical on any engine and any execution order, so the gate value-
hash compares bit-for-bit against an UNROLLED DuckDB CTE chain.

The graph: every doc gets exactly ``GRAPH_OUT_DEGREE`` out-edges to
``_hash60('g{k}#'||doc_id) % n_docs`` (self-loops and duplicate
targets kept — both engines build the identical multigraph), the same
seeded-derivation pattern as operators/image_dedup.seeded_phash_images.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snapcrawler_spark.pipeline.dedup import _hash60

GRAPH_OUT_DEGREE = 3
PR_ITERS = 3
PR_CHECKPOINT_EVERY = 4  # score-lineage truncation interval (round 7)
PR_SCALE = 1_000_000
PR_BASE = 150_000      # 0.15 · scale
PR_DAMP = 850_000      # 0.85 · scale


def seeded_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst): the deterministic multigraph over doc_ids.

    Round 7: one documents scan with a k-way explode instead of a
    k-branch union of k scans (row multiset identical; every consumer
    is a join/aggregate, so order is immaterial)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("src")
    )
    n = d.count()
    dsts = [
        (
            _hash60(F.concat(F.lit(f"g{k}#"), F.col("src").cast("string")))
            % F.lit(n)
        )
        for k in range(GRAPH_OUT_DEGREE)
    ]
    return d.select("src", F.explode(F.array(*dsts)).alias("dst"))


def graph_pagerank(
    spark: SparkSession, sf_dir: str, iters: int = PR_ITERS
) -> DataFrame:
    """(doc_id, pr_e6) after ``iters`` integer-exact power iterations.

    Per round: one equi-join (scores ⋈ edges on src) + one groupBy(dst)
    SUM with map-side partial aggregation — the whole computation is
    2·iters shuffles on bounded keys, nothing ever collects to the
    driver, and the plan is identical at 10^10 edges (modulo AQE's
    physical choices).

    Round 7: the loop-invariant tables (edges, outdeg, the doc-id
    spine) are persisted — computed once on first use instead of
    re-derived from the parquet scan inside every iteration's plan
    (the old final plan re-read documents ~3× per iteration; lazy
    persist measured faster end-to-end than eager localCheckpoint,
    which pays dedicated materialization jobs) — and the score lineage
    is truncated every few rounds (VERDICT r6 what's-wrong #4: the
    uncheckpointed plan doubles per iteration — irrelevant at the
    gate's iters=3, pathological above ~8)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id")
    ).persist()
    edges = seeded_link_graph(spark, sf_dir).persist()
    outdeg = edges.groupBy("src").agg(
        F.count("*").alias("outdeg")
    ).persist()
    scores = d.select("doc_id", F.lit(PR_SCALE).cast("long").alias("pr"))
    for it in range(iters):
        contrib = (
            scores.join(outdeg, scores.doc_id == outdeg.src)
            .select(
                "src", F.expr("pr div outdeg").alias("c")
            )
            .join(edges, "src")
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        scores = d.join(
            contrib, d.doc_id == contrib.dst, "left"
        ).select(
            "doc_id",
            (
                F.lit(PR_BASE)
                + F.expr(
                    f"({PR_DAMP} * coalesce(inflow, 0)) div {PR_SCALE}"
                )
            ).cast("long").alias("pr"),
        )
        # bound lineage growth for high iteration counts; values are
        # exact integers, so truncation cannot perturb the fixpoint
        if (it + 1) % PR_CHECKPOINT_EVERY == 0 and it + 1 < iters:
            scores = scores.localCheckpoint()
    return scores.select(
        "doc_id", F.col("pr").alias("pr_e6")
    ).orderBy("doc_id")
