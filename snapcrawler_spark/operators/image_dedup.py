"""Perceptual-hash NEAR-duplicate detection over image tables.

The reference dedups images by EXACT pHash equality only
(filtering_module.py:335-342 — a dict membership probe). At crawl scale
the interesting duplicates are near-misses: recompressed/resized copies
whose 64-bit pHashes differ in a few bits. This module adds that as an
engine extension using the same machinery family as the text SimHash
operator (pipeline/dedup.py):

- candidates by segment pigeonhole: split the 64-bit pHash into
  ``64/seg_bits`` segments; two hashes within hamming distance h must
  agree on at least one segment when segments > h — so the self-join
  runs on (segment index, segment value) buckets, never all-pairs;
- verify with ``bit_count(a.phash ^ b.phash) <= h`` (JVM-side, one
  codegen'd expression);
- resolve pairs into clusters with the shared pointer-jumping
  connected-components operator (keep-one-per-cluster canonical flag).

Every stage is shuffle-on-key; a hot segment value (e.g. a constant
region many logos share) is bounded by the same doc-frequency-cap idea
as the text shingle join if it ever matters — at 4×16-bit segments the
bucket key space is 2^16 per segment, so random collisions stay tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from snapcrawler_spark.pipeline.dedup import connected_components

PHASH_BITS = 64
PHASH_SEGS = 4  # 16-bit segments; pigeonhole sound for hamming <= 3


def phash_near_dup_pairs(
    images: DataFrame,
    max_hamming: int = 3,
    id_col: str = "image_id",
    phash_col: str = "phash",
) -> DataFrame:
    """(id_a, id_b, hamming) for every pair within the hamming bound.

    Requires ``max_hamming < PHASH_SEGS`` (pigeonhole soundness: more
    segments than flipped bits forces one untouched segment).
    """
    assert max_hamming < PHASH_SEGS, "pigeonhole needs segs > max_hamming"
    seg_bits = PHASH_BITS // PHASH_SEGS
    mask = (1 << seg_bits) - 1
    base = images.select(
        F.col(id_col).alias("id"), F.col(phash_col).alias("ph")
    ).dropDuplicates(["id"])
    segs = base.select(
        "id",
        "ph",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seg"),
                        F.shiftrightunsigned("ph", s * seg_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("seg_val"),
                    )
                    for s in range(PHASH_SEGS)
                ]
            )
        ).alias("sv"),
    ).select("id", "ph", F.col("sv.seg").alias("seg"), F.col("sv.seg_val").alias("seg_val"))
    a = segs.alias("a")
    b = segs.alias("b")
    return (
        a.join(b, ["seg", "seg_val"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.ph").bitwiseXOR(F.col("b.ph"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def phash_clusters(
    images: DataFrame,
    max_hamming: int = 3,
    id_col: str = "image_id",
    phash_col: str = "phash",
) -> DataFrame:
    """(image_id, cluster_id, is_canonical): near-dup pairs resolved
    into connected components; canonical = min image id per cluster.
    Images with no near-dup partner are absent (trivially canonical)."""
    pairs = phash_near_dup_pairs(images, max_hamming, id_col, phash_col)
    labels = connected_components(
        pairs.select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
        )
    )
    return labels.select(
        F.col("doc_id").alias(id_col),
        F.col("label").alias("cluster_id"),
        (F.col("label") == F.col("doc_id")).alias("is_canonical"),
    ).orderBy(id_col)
