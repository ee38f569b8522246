"""Connected-components duplicate clustering (pipeline/dedup.dedup_cluster):
hash-min label propagation over the minhash near-dup pair graph. The
driver gate compares it bit-exactly against a DuckDB recursive-CTE
reachability oracle; these tests pin the graph-theoretic invariants.
"""

from __future__ import annotations

import pytest

from snapcrawler_spark.pipeline.dedup import dedup_cluster, dedup_minhash_lsh

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def cluster_run(spark):
    pairs = [
        (r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, SF).collect()
    ]
    labels = {
        r.doc_id: (r.cluster_id, r.is_canonical)
        for r in dedup_cluster(spark, SF).collect()
    }
    return pairs, labels


class TestDedupCluster:
    def test_every_pair_endpoint_is_labeled(self, cluster_run):
        pairs, labels = cluster_run
        assert pairs, "fixture has no near-dup pairs — test is vacuous"
        for a, b in pairs:
            assert a in labels and b in labels

    def test_pairs_share_a_cluster(self, cluster_run):
        """Direct edges must be in one cluster (transitivity is what the
        pair relation alone cannot express)."""
        pairs, labels = cluster_run
        for a, b in pairs:
            assert labels[a][0] == labels[b][0], (a, b)

    def test_cluster_id_is_min_member(self, cluster_run):
        pairs, labels = cluster_run
        members: dict[int, list[int]] = {}
        for doc, (cid, _) in labels.items():
            members.setdefault(cid, []).append(doc)
        for cid, docs in members.items():
            assert cid == min(docs)

    def test_exactly_one_canonical_per_cluster(self, cluster_run):
        _, labels = cluster_run
        canon: dict[int, int] = {}
        for doc, (cid, is_c) in labels.items():
            if is_c:
                canon[cid] = canon.get(cid, 0) + 1
                assert doc == cid
        assert set(canon) == {cid for cid, _ in labels.values()}
        assert all(n == 1 for n in canon.values())

    def test_clusters_are_edge_connected(self, cluster_run):
        """No over-merging: every cluster must be connected through the
        pair edges themselves (the oracle's reachability guarantees it;
        this pins the engine independently)."""
        pairs, labels = cluster_run
        adj: dict[int, set[int]] = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        members: dict[int, set[int]] = {}
        for doc, (cid, _) in labels.items():
            members.setdefault(cid, set()).add(doc)
        for cid, docs in members.items():
            seen = {cid}
            stack = [cid]
            while stack:
                v = stack.pop()
                for w in adj.get(v, ()):
                    if w not in seen:
                        seen.add(w)
                        stack.append(w)
            assert docs == seen, f"cluster {cid} not edge-connected"


def _uf_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find ground truth: vertex -> min id of its component."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


GRAPHS = {
    # a long chain: plain hash-min needs O(n) rounds — pointer jumping
    # must solve it within the O(log n) budget
    "chain60": [(i, i + 1) for i in range(60)],
    "star": [(0, i) for i in range(1, 20)],
    "two_components": [(1, 2), (2, 3), (10, 11), (12, 11)],
    "cycle_plus_tail": [(0, 1), (1, 2), (2, 0), (2, 7), (7, 9)],
    "dupe_edges_reversed": [(5, 3), (3, 5), (5, 3), (3, 4)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_connected_components_matches_union_find(spark, name):
    from snapcrawler_spark.pipeline.dedup import connected_components

    edges = GRAPHS[name]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r.doc_id: r.label for r in connected_components(df).collect()
    }
    assert got == _uf_oracle(edges)


def test_connected_components_random_graphs(spark):
    """Seeded random sparse graphs vs union-find — ids non-contiguous to
    catch any dense-index assumption."""
    import random

    from snapcrawler_spark.pipeline.dedup import connected_components

    rng = random.Random(7)
    ids = [rng.randrange(10**9) for _ in range(120)]
    edges = [
        (rng.choice(ids), rng.choice(ids)) for _ in range(90)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.doc_id: r.label for r in connected_components(df).collect()}
    assert got == _uf_oracle(edges)


def test_obs_changed_raises_on_genuine_failure(spark):
    """VERDICT r5 hygiene: the CC convergence read must NOT silently
    recount on a genuine Observation breakage — only the verified
    empty-metrics-row case falls back. A metrics row missing the 'n'
    key (renamed/typo'd metric) raises."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from snapcrawler_spark.pipeline.dedup import _obs_changed

    obs = Observation()
    df = spark.range(5).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("chg")
    ).observe(obs, F.sum("chg").alias("m"))  # wrong alias, not 'n'
    df.count()
    with pytest.raises(KeyError, match="missing 'n'"):
        _obs_changed(obs, df)


def test_obs_changed_reads_sum(spark):
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from snapcrawler_spark.pipeline.dedup import _obs_changed

    obs = Observation()
    df = spark.range(7).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2).cast("long").alias("chg"),
    ).observe(obs, F.sum("chg").alias("n"))
    df.count()
    assert _obs_changed(obs, df) == 3
