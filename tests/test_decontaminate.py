"""Benchmark decontamination (pipeline/decontaminate.py): a corpus doc
sharing any 13-gram with the eval set is flagged, a clean doc survives,
and sub-k documents emit no pseudo-grams."""

from __future__ import annotations

from snapcrawler_spark.pipeline.decontaminate import (
    DECON_K,
    corpus_decontaminate,
    decontaminate_flags,
    seeded_eval_set,
)


def test_overlap_flagged_clean_survives(spark):
    k = DECON_K
    w = lambda pfx, n: " ".join(f"{pfx}{i}" for i in range(n))  # noqa: E731
    corpus = spark.createDataFrame(
        [
            (1, w("w", 20)),   # contains the eval 13-gram w0..w12
            (2, w("x", 20)),   # clean — must survive
            (3, w("w", 13)),   # exactly the eval gram
            (4, "short doc"),  # < k tokens: no grams, never flagged
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, w("w", k))], "eval_id long, text string"
    )
    got = {
        r.doc_id: r.n_overlap_grams
        for r in decontaminate_flags(corpus, ev).collect()
    }
    assert set(got) == {1, 3}
    assert got[1] == 1 and got[3] == 1


def test_plan_corpus_side_never_shuffles(spark):
    """The 100 TB shape, pinned: with AQE/auto-broadcast off, the eval
    gram set moves through ONE BroadcastExchange, the corpus gram side
    reaches the join with NO shuffle, and the per-doc count partial-
    aggregates into a single hashpartitioning(doc_id) exchange (plus
    the output orderBy's range partitioning)."""
    confs = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        plan = (
            corpus_decontaminate(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("BroadcastExchange") == 1
        assert plan.count("Exchange hashpartitioning") == 2  # agg + eval distinct
        assert plan.count("Exchange rangepartitioning") == 1  # output order
        # the corpus-side matched stream partial-aggregates before its
        # only exchange (map-side combine present)
        assert "partial_count" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_seeded_gate_matches_brute_force(spark):
    """Full brute-force Python oracle at sf0.001: the flagged set and
    per-doc overlap counts equal a direct set-intersection of word
    13-grams between every document and the eval excerpts (the synthetic
    corpus seeds near-dup SPANS across docs, so flagged docs are not
    only the eval sources — the oracle catches those too)."""
    sf = "/root/testdata/sf0.001"
    got = {
        r.doc_id: r.n_overlap_grams
        for r in corpus_decontaminate(spark, sf).collect()
    }
    assert got, "gate vacuous — nothing contaminated"

    def grams(text: str, k: int = DECON_K) -> set:
        t = text.split(" ")
        if len(t) < k:
            return set()
        return {" ".join(t[i : i + k]) for i in range(len(t) - k + 1)}

    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    ev_grams = set()
    for r in seeded_eval_set(spark, sf).collect():
        ev_grams |= grams(r.text)
    expect = {
        d: len(grams(t) & ev_grams)
        for d, t in texts.items()
        if grams(t) & ev_grams
    }
    assert got == expect
    assert len(got) < len(texts)  # clean docs survive
