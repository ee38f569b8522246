"""Integer-exact PageRank (operators/graph.py): invariants vs a plain
Python reference on the same seeded multigraph."""

from __future__ import annotations

from snapcrawler_spark.operators.graph import (
    GRAPH_OUT_DEGREE,
    PR_BASE,
    PR_DAMP,
    PR_ITERS,
    PR_SCALE,
    graph_pagerank,
    seeded_link_graph,
)

SF = "/root/testdata/sf0.001"


def test_pagerank_matches_python_reference(spark):
    edges = [(r.src, r.dst) for r in seeded_link_graph(spark, SF).collect()]
    docs = sorted({s for s, _ in edges})
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    assert all(outdeg[d] == GRAPH_OUT_DEGREE for d in docs)
    pr = {d: PR_SCALE for d in docs}
    for _ in range(PR_ITERS):
        inflow: dict[int, int] = {}
        for s, t in edges:
            inflow[t] = inflow.get(t, 0) + pr[s] // outdeg[s]
        pr = {
            d: PR_BASE + (PR_DAMP * inflow.get(d, 0)) // PR_SCALE
            for d in docs
        }
    got = {r.doc_id: r.pr_e6 for r in graph_pagerank(spark, SF).collect()}
    assert got == pr
    # mass conservation up to floor losses: one PR_SCALE unit per doc
    total = sum(got.values())
    assert 0 <= len(docs) * PR_SCALE - total < len(docs) * 10
    # every score carries at least the teleport base
    assert min(got.values()) >= PR_BASE


def test_pagerank_deep_iterations_checkpointed(spark):
    """Round-7 lineage guard: iters well past PR_CHECKPOINT_EVERY still
    matches the plain Python recurrence (the periodic localCheckpoint
    truncates plans but must not perturb the exact integer values)."""
    iters = 12
    edges = [(r.src, r.dst) for r in seeded_link_graph(spark, SF).collect()]
    docs = sorted({s for s, _ in edges})
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {d: PR_SCALE for d in docs}
    for _ in range(iters):
        inflow: dict[int, int] = {}
        for s, t in edges:
            inflow[t] = inflow.get(t, 0) + pr[s] // outdeg[s]
        pr = {
            d: PR_BASE + (PR_DAMP * inflow.get(d, 0)) // PR_SCALE
            for d in docs
        }
    got = {
        r.doc_id: r.pr_e6
        for r in graph_pagerank(spark, SF, iters=iters).collect()
    }
    assert got == pr
