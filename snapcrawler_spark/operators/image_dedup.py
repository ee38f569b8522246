"""Perceptual-hash NEAR-duplicate detection over image tables.

The reference dedups images by EXACT pHash equality only
(filtering_module.py:335-342 — a dict membership probe). At crawl scale
the interesting duplicates are near-misses: recompressed/resized copies
whose 64-bit pHashes differ in a few bits. This module adds that as an
engine extension using the same machinery family as the text SimHash
operator (pipeline/dedup.py):

- **exact-equal collapse first**: images sharing one pHash value are
  trivially one cluster, so the heavy stages run over DISTINCT hash
  values only. At crawl scale this is the bound that matters — B copies
  of one logo/tracking pixel (millions at 10^10 scale) contribute ONE
  row to the segment self-join instead of B rows colliding on all four
  segments into ~4·B² pair rows;
- candidates by segment pigeonhole: split the 64-bit pHash into
  ``64/seg_bits`` segments; two hashes within hamming distance h must
  agree on at least one segment when segments > h — so the self-join
  runs on (segment index, segment value) buckets, never all-pairs;
- a DENSITY-AWARE doc-frequency cap on the (segment, value) buckets
  (the text-side guard of pipeline/dedup.py:89-130) bounds residual
  skew: the effective cap is ``max(max_segment_freq,
  DENSITY_CAP_MULT × ceil(n_distinct / 2^seg_bits))`` — a fixed
  multiple of the EXPECTED bucket occupancy under uniform hashing —
  so on any corpus size the average bucket always survives and only
  buckets ≥ DENSITY_CAP_MULT× denser than random (adversarial
  constant-segment mass) are dropped. A fixed absolute cap would
  silently drop most buckets once n_distinct ≳ cap·2^seg_bits
  (~2.7e8 at the defaults), finding zero pairs; the relative cap
  keeps the per-bucket pair join bounded at
  (DENSITY_CAP_MULT · n/2^seg_bits)² while never going degenerate;
- verify with ``bit_count(a.phash ^ b.phash) <= h`` (JVM-side, one
  codegen'd expression);
- resolve into clusters with the shared pointer-jumping
  connected-components operator over hash REPRESENTATIVES (min member
  id per hash value), then re-attach every member to its
  representative's cluster with one equi-join on the hash value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from snapcrawler_spark.pipeline.dedup import connected_components

PHASH_BITS = 64
PHASH_SEGS = 4  # 16-bit segments; pigeonhole sound for hamming <= 3
# floor on the per-(segment, value) bucket cap — below this the cap is
# absolute; above it the cap scales with corpus density (see module
# docstring). 4096² pair rows per surviving bucket is the small-corpus
# worst case.
MAX_SEGMENT_FREQ = 4096
# buckets denser than this multiple of the EXPECTED uniform occupancy
# (n_distinct / 2^seg_bits) are dropped from candidate generation
DENSITY_CAP_MULT = 64


def seeded_phash_images(spark, sf_dir: str) -> DataFrame:
    """Deterministic (image_id, phash) table derived from the documents
    table — the gate input for ``dedup_image_phash``.

    Every doc contributes a base 60-bit portable hash (same
    md5-hex→bigint construction as pipeline/dedup._hash60, so DuckDB
    reproduces it bit-for-bit); seeded duplicates make the gate
    non-vacuous at every scale factor:

    - doc_id % 4 == 0 → hamming-1 twin at image_id + 10M
    - doc_id % 10 == 0 → hamming-2 twin at image_id + 20M
    - doc_id % 9 == 0 → EXACT copy at image_id + 30M

    Random 60-bit hashes never land within hamming 3 of each other at
    gate scales, so the expected cluster structure is exactly the
    seeded one (and the DuckDB oracle is brute-force all-pairs, so any
    accidental collision would agree anyway)."""
    from snapcrawler_spark.pipeline.dedup import _hash60

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id")
    )
    # the twin offsets are fixed literals mirrored in the DuckDB oracle
    # SQL — they are only collision-free while every base doc_id is
    # below the smallest offset. Fail loudly instead of letting twin
    # ids alias base ids into nondeterministic dropDuplicates
    # divergence. Round 7 (ADVICE r6 #3): the guard is a LAZY
    # assert_true folded into the hash column — the old eager
    # agg(max).first() ran a dedicated full documents scan at plan
    # CONSTRUCTION on every seeded_phash_images/gate call; now the
    # per-row check rides the first job that scans the table (raises
    # with the same message, costs one comparison per row, adds 0 to
    # the hash when the invariant holds).
    guard = F.coalesce(
        F.assert_true(
            F.col("doc_id") < F.lit(10_000_000),
            F.concat(
                F.lit("seeded_phash_images: doc_id "),
                F.col("doc_id").cast("string"),
                F.lit(
                    " >= 1e7 twin offset — raise the offsets (and the"
                    " oracle SQL) in lockstep"
                ),
            ),
        ).cast("long"),
        F.lit(0).cast("long"),
    )
    base = d.withColumn(
        "base",
        _hash60(F.concat(F.lit("ph#"), F.col("doc_id").cast("string")))
        + guard,
    )

    def _bit(expr: str):
        return F.expr(
            f"shiftleft(cast(1 as bigint), cast(({expr}) % 60 as int))"
        )

    orig = base.select(
        F.col("doc_id").alias("image_id"), F.col("base").alias("phash")
    )
    near1 = base.where(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("image_id"),
        F.col("base").bitwiseXOR(_bit("doc_id")).alias("phash"),
    )
    near2 = base.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 20_000_000).alias("image_id"),
        F.col("base")
        .bitwiseXOR(_bit("doc_id * 7"))
        .bitwiseXOR(_bit("doc_id * 13 + 1"))
        .alias("phash"),
    )
    exact = base.where(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 30_000_000).alias("image_id"),
        F.col("base").alias("phash"),
    )
    return orig.unionByName(near1).unionByName(near2).unionByName(exact)


def dedup_image_phash(spark, sf_dir: str) -> DataFrame:
    """Gate entry: pHash near-dup clusters over the seeded image table
    (image_id, cluster_id, is_canonical) — DuckDB oracle is brute-force
    ``bit_count(xor(...))`` pairs + recursive-CTE reachability
    (__spark_entry__.oracle_sql()['dedup_image_phash'])."""
    return phash_clusters(seeded_phash_images(spark, sf_dir), max_hamming=3)


def _distinct_hash_pairs(
    hashes: DataFrame,
    max_hamming: int,
    max_segment_freq: int | None = MAX_SEGMENT_FREQ,
) -> DataFrame:
    """hashes(ph: distinct 64-bit values) → (ph_a, ph_b, hamming) for
    every pair of DISTINCT hash values within 1..max_hamming.

    Requires ``max_hamming < PHASH_SEGS`` (pigeonhole soundness: more
    segments than flipped bits forces one untouched segment)."""
    assert max_hamming < PHASH_SEGS, "pigeonhole needs segs > max_hamming"
    seg_bits = PHASH_BITS // PHASH_SEGS
    mask = (1 << seg_bits) - 1
    segs = hashes.select(
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
    ).select("ph", F.col("sv.seg").alias("seg"), F.col("sv.seg_val").alias("seg_val"))
    if max_segment_freq:
        freq = segs.groupBy("seg", "seg_val").agg(
            F.count("*").alias("seg_df")
        )
        # density-aware effective cap: never below max_segment_freq,
        # and at scale a fixed multiple of the expected uniform bucket
        # occupancy n/2^seg_bits — the 1-row total broadcast keeps the
        # whole thing lazy (no driver action inside plan construction)
        total = F.broadcast(
            hashes.agg(F.count("*").alias("n_hashes"))
        )
        eff_cap = F.greatest(
            F.lit(max_segment_freq).cast("long"),
            F.ceil(
                F.col("n_hashes") * F.lit(DENSITY_CAP_MULT) / F.lit(2**seg_bits)
            ),
        )
        segs = segs.join(
            freq.crossJoin(total)
            .where(F.col("seg_df") <= eff_cap)
            .select("seg", "seg_val"),
            ["seg", "seg_val"],
        ).select("ph", "seg", "seg_val")
    a = segs.alias("a")
    b = segs.alias("b")
    return (
        a.join(b, ["seg", "seg_val"])
        .where(F.col("a.ph") < F.col("b.ph"))
        .select(
            F.col("a.ph").alias("ph_a"),
            F.col("b.ph").alias("ph_b"),
            F.bit_count(
                F.col("a.ph").bitwiseXOR(F.col("b.ph"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _hash_groups(images: DataFrame, id_col: str, phash_col: str) -> tuple[DataFrame, DataFrame]:
    """(members(id, ph), groups(ph, rep, n_members)) — rep = min member
    id per distinct hash value."""
    members = images.select(
        F.col(id_col).alias("id"), F.col(phash_col).alias("ph")
    ).dropDuplicates(["id"])
    groups = members.groupBy("ph").agg(
        F.min("id").alias("rep"), F.count("*").alias("n_members")
    )
    return members, groups


def phash_near_dup_pairs(
    images: DataFrame,
    max_hamming: int = 3,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_segment_freq: int | None = MAX_SEGMENT_FREQ,
) -> DataFrame:
    """(id_a, id_b, hamming) for every IMAGE pair within the hamming
    bound (id_a < id_b).

    The candidate/verify stages run over distinct hash values (see
    module docstring); member pairs are recovered afterwards — so the
    OUTPUT is still quadratic in the size of an exact-duplicate group
    (inherent to the pair relation: B copies really do form B(B-1)/2
    pairs), but no internal stage is. Prefer ``phash_clusters`` at
    scale: it never expands member pairs at all."""
    members, groups = _hash_groups(images, id_col, phash_col)
    hp = _distinct_hash_pairs(
        groups.select("ph"), max_hamming, max_segment_freq
    )
    ma = members.select(F.col("id").alias("m_a"), F.col("ph").alias("ph_a"))
    mb = members.select(F.col("id").alias("m_b"), F.col("ph").alias("ph_b"))
    cross = (
        hp.join(ma, "ph_a")
        .join(mb, "ph_b")
        .select(
            F.least("m_a", "m_b").alias("id_a"),
            F.greatest("m_a", "m_b").alias("id_b"),
            "hamming",
        )
    )
    x = members.alias("x")
    y = members.alias("y")
    same = (
        x.join(y, "ph")
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.lit(0).cast("int").alias("hamming"),
        )
    )
    return cross.unionByName(same)


def phash_clusters(
    images: DataFrame,
    max_hamming: int = 3,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_segment_freq: int | None = MAX_SEGMENT_FREQ,
) -> DataFrame:
    """(image_id, cluster_id, is_canonical): near-dup relation resolved
    into connected components; cluster_id = min member id per component,
    canonical = the member equal to it. Images with no duplicate at all
    (no equal-hash twin AND no near hash) are absent (trivially
    canonical).

    Never materializes member-level pairs: connected components run
    over one representative per distinct hash value (rep = min member
    id, so the component's min rep IS the component's min member id),
    and members re-attach with one equi-join on the hash value — every
    stage is O(distinct hashes + members), bounded even when one pHash
    value has millions of copies."""
    members, groups = _hash_groups(images, id_col, phash_col)
    hp = _distinct_hash_pairs(
        groups.select("ph"), max_hamming, max_segment_freq
    )
    rep_pairs = (
        hp.join(
            groups.select(F.col("ph").alias("ph_a"), F.col("rep").alias("doc_a")),
            "ph_a",
        )
        .join(
            groups.select(F.col("ph").alias("ph_b"), F.col("rep").alias("doc_b")),
            "ph_b",
        )
        .select("doc_a", "doc_b")
    )
    labels = connected_components(rep_pairs)
    glab = (
        groups.join(
            labels.select(
                F.col("doc_id").alias("rep"), F.col("label")
            ),
            "rep",
            "left",
        )
        .where((F.col("n_members") > 1) | F.col("label").isNotNull())
        .select(
            "ph", F.coalesce("label", "rep").alias("cluster_id")
        )
    )
    return (
        members.join(glab, "ph")
        .select(
            F.col("id").alias(id_col),
            "cluster_id",
            (F.col("cluster_id") == F.col("id")).alias("is_canonical"),
        )
        .orderBy(id_col)
    )
