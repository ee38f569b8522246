"""pHash near-dup detection (operators/image_dedup.py): seeded 64-bit
hashes with controlled bit flips, compared against a brute-force
all-pairs hamming oracle and a union-find clustering oracle."""

from __future__ import annotations

import random

import pytest

from snapcrawler_spark.operators.image_dedup import (
    phash_clusters,
    phash_near_dup_pairs,
)


def _flip(h: int, bits: list[int]) -> int:
    for b in bits:
        h ^= 1 << b
    return h


def _to_i64(h: int) -> int:
    return h - (1 << 64) if h >= 1 << 63 else h


@pytest.fixture(scope="module")
def seeded_images(spark):
    """40 base hashes; each base gets 0-2 near copies (<=3 flipped bits)
    and one far decoy (8 flipped bits)."""
    rng = random.Random(99)
    rows = []
    for i in range(40):
        base = rng.getrandbits(64)
        rows.append((f"img{i:03d}_a", _to_i64(base)))
        for c in range(rng.randrange(3)):
            bits = rng.sample(range(64), rng.randrange(1, 4))
            rows.append((f"img{i:03d}_n{c}", _to_i64(_flip(base, bits))))
        far = rng.sample(range(64), 8)
        rows.append((f"img{i:03d}_far", _to_i64(_flip(base, far))))
    df = spark.createDataFrame(rows, "image_id string, phash long")
    return rows, df


def _brute_pairs(rows, h=3):
    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            (ia, pa), (ib, pb) = rows[i], rows[j]
            d = bin((pa ^ pb) & ((1 << 64) - 1)).count("1")
            if d <= h:
                out.add((min(ia, ib), max(ia, ib), d))
    return out


class TestPhashNearDup:
    def test_pairs_match_brute_force(self, seeded_images):
        rows, df = seeded_images
        want = _brute_pairs(rows)
        assert want, "seeded fixture produced no near pairs — vacuous"
        got = {
            (r.id_a, r.id_b, r.hamming)
            for r in phash_near_dup_pairs(df).collect()
        }
        assert got == want

    def test_exact_duplicates_are_distance_zero(self, spark):
        df = spark.createDataFrame(
            [("a", 12345), ("b", 12345), ("c", -9876543210)],
            "image_id string, phash long",
        )
        got = {(r.id_a, r.id_b, r.hamming)
               for r in phash_near_dup_pairs(df).collect()}
        assert got == {("a", "b", 0)}

    def test_clusters_match_union_find(self, seeded_images):
        rows, df = seeded_images
        pairs = _brute_pairs(rows)
        parent: dict[str, str] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b, _ in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {v: find(v) for v in parent}
        got = {
            r.image_id: (r.cluster_id, r.is_canonical)
            for r in phash_clusters(df).collect()
        }
        assert {k: v[0] for k, v in got.items()} == want
        for image_id, (cid, canon) in got.items():
            assert canon == (image_id == cid)
