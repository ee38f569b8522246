"""pHash near-dup detection (operators/image_dedup.py): seeded 64-bit
hashes with controlled bit flips, compared against a brute-force
all-pairs hamming oracle and a union-find clustering oracle; plus the
hot-bucket bounds (VERDICT r4 what's-wrong #1): exact-equal collapse
keeps every internal stage O(distinct hashes) under mass duplication,
and the segment frequency cap bounds residual bucket skew."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from snapcrawler_spark.operators.image_dedup import (
    _distinct_hash_pairs,
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


class TestHotBucketBounds:
    def test_mass_duplicated_phash_pair_stage_is_linear(self, spark):
        """10k copies of ONE pHash (the crawl-scale logo/tracking-pixel
        case) must produce O(distinct-hash) pair-stage rows, and
        clustering must still label every copy — the collapse-to-
        representative restructuring, not an all-member self-join."""
        hot = 0x0123456789ABCDEF
        near = hot ^ (1 << 7)          # hamming-1 neighbor of the hot hash
        far = hot ^ 0xFF00FF00         # far decoy
        rows = [(f"c{i:05d}", hot) for i in range(10_000)]
        rows += [("nearby", near), ("decoy", far)]
        df = spark.createDataFrame(rows, "image_id string, phash long")

        # pair STAGE (what the self-join sees): distinct hashes only —
        # 3 input rows, exactly one qualifying hash pair
        hashes = df.select(F.col("phash").alias("ph")).distinct()
        assert hashes.count() == 3
        stage = _distinct_hash_pairs(hashes, max_hamming=3)
        assert stage.count() == 1  # (hot, near) — NOT ~10k² member pairs

        # clusters: one component holding all 10k copies + the neighbor
        got = phash_clusters(df).collect()
        assert len(got) == 10_001
        labels = {r.cluster_id for r in got}
        assert labels == {"c00000"}  # min member id of the component
        canon = [r.image_id for r in got if r.is_canonical]
        assert canon == ["c00000"]

    def test_segment_freq_cap_drops_hot_bucket_only(self, spark):
        """Hashes engineered to share one low-segment value in bulk:
        with the cap below the bucket size the hot bucket is dropped
        (those candidate pairs vanish — documented recall trade), while
        pairs agreeing on an un-capped segment survive."""
        shared_low = 0xBEEF  # segment 0 value shared by the flood
        flood = [
            (f"f{i:04d}", (i << 16) | shared_low) for i in range(50)
        ]
        # a true near-pair agreeing on segments 1..3 (differs in seg 0
        # by 1 bit) — must survive the cap via the other segments
        a = (7 << 16) | 0x1111
        b = a ^ 1
        rows = flood + [("pa", a), ("pb", b)]
        df = spark.createDataFrame(rows, "image_id string, phash long")
        hashes = df.select(F.col("phash").alias("ph")).distinct()

        uncapped = _distinct_hash_pairs(hashes, 3, max_segment_freq=None)
        capped = _distinct_hash_pairs(hashes, 3, max_segment_freq=10)
        surv = {(r.ph_a, r.ph_b) for r in capped.collect()}
        assert (min(a, b), max(a, b)) in surv
        # flood pairs (agree ONLY on the capped segment-0 bucket) gone
        flood_pairs = {
            (r.ph_a, r.ph_b)
            for r in uncapped.collect()
            if (r.ph_a & 0xFFFF) == shared_low
            and (r.ph_b & 0xFFFF) == shared_low
        }
        assert flood_pairs and not (surv & flood_pairs)

    def test_cap_is_density_aware(self, spark):
        """ADVICE r5: a fixed absolute cap goes degenerate once the
        corpus is dense enough that AVERAGE buckets exceed it (at the
        production defaults: n_distinct ≳ 2.7e8 → every bucket dropped
        → zero pairs found). The effective cap must scale with
        n/2^seg_bits: here an adversarially tiny max_segment_freq=1
        against ~1.1k hashes (density cap ceil(1102·64/65536)=2) still
        finds a hamming-1 pair whose shared buckets hold 2 hashes —
        under the old absolute cap this returned an empty relation."""
        rng = random.Random(4242)
        rows = [
            ("r%04d" % i, _to_i64(rng.getrandbits(64))) for i in range(1100)
        ]
        base = rng.getrandbits(64)
        rows += [("pa", _to_i64(base)), ("pb", _to_i64(base ^ (1 << 37)))]
        df = spark.createDataFrame(rows, "image_id string, phash long")
        hashes = df.select(F.col("phash").alias("ph")).distinct()
        got = {
            (r.ph_a, r.ph_b)
            for r in _distinct_hash_pairs(
                hashes, 3, max_segment_freq=1
            ).collect()
        }
        a, b = _to_i64(base), _to_i64(base ^ (1 << 37))
        assert (min(a, b), max(a, b)) in got
