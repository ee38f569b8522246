"""Distributed image filter chain.

Reproduces the consumer semantics of filtering_module.py:140-182
(download gates) + :267-356 (apply_filters order) as one declarative
plan:

1. cheap gates first — pure column predicates (http status,
   content-type, URL extension) run inside whole-stage codegen;
2. decode happens ONCE PER DISTINCT image payload (the reference
   decodes every queue occurrence; dedup-before-decode is the Spark
   restructuring that keeps the UDF off most rows);
3. first-wins pHash dedup is a window over the deterministic item
   order, replacing the reference's in-memory set insertion order
   (filtering_module.py:335-342);
4. the max_images cap is an ordered prefix of the accepted stream
   (filtering_module.py:121-124) — items after the cap boundary are
   *unprocessed*, not rejected, exactly like the reference's consumer
   break.

Reject-reason vocabulary matches the oracle:
http_error, non_image_content_type, svg_unsupported, decode_error,
size, format, dpi, color, orientation, aspect, banner_logo,
duplicate_phash, near_dup (opt-in, cfg.extra['near_dup_images']),
watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from snapcrawler_spark.conf import CrawlConfig
from snapcrawler_spark.kernels.udfs import decode_meta_udf
from snapcrawler_spark.operators.extract import url_ext_col


_CAP_BUCKET = 4096  # accepted rows per cap bucket (see _cap_boundary)
_CAP_SUPER = 4096   # buckets per super-bucket (two-level prefix scan)


def _cap_boundary(df: DataFrame, cfg: CrawlConfig) -> int | None:
    """Exact item_seq at which the ordered-prefix caps (max_images /
    max_folder_bytes) hit, or None if they never do.

    Matches the sequential consumer break at filtering_module.py:121-129
    (the item reaching the cap is the last one processed). The naive
    plan — row_number + running sum over ``Window.orderBy(item_seq)`` —
    moves every accepted row to one partition; instead a TWO-LEVEL
    distributed prefix scan:

    1. partial counts/byte-sums per SUPER-bucket (2^24 item_seq values
       each; one shuffle-on-key aggregation) — the driver prefix-scans
       ≤ max_seq/2^24 rows (≤ ~600 rows even at 10^10 items) to find
       the single crossing super-bucket;
    2. partials per 4096-item bucket *within that super-bucket only*
       (≤ 4096 rows to the driver) → crossing bucket;
    3. pull only that bucket's rows (≤ 4096) and walk to the exact
       boundary.

    Driver memory is therefore O(max_seq / 2^24 + 4096 + 4096) at any
    item count — flat in practice, never O(accepted)."""
    acc = df.where(F.col("reason").isNull()).select("item_seq", "n_bytes")
    span = _CAP_BUCKET * _CAP_SUPER

    def _scan(partials, cum_n, cum_b):
        """Prefix-scan sorted (key, n, nb) rows; return (crossing key,
        cum before it) or (None, cum after all)."""
        for r in partials:
            nxt_n, nxt_b = cum_n + r.n, cum_b + (r.nb or 0)
            if (cfg.max_images > 0 and nxt_n >= cfg.max_images) or (
                cfg.max_folder_bytes > 0 and nxt_b >= cfg.max_folder_bytes
            ):
                return r.k, cum_n, cum_b
            cum_n, cum_b = nxt_n, nxt_b
        return None, cum_n, cum_b

    supers = sorted(
        acc.groupBy((F.col("item_seq") / span).cast("long").alias("k"))
        .agg(F.count("*").alias("n"), F.sum("n_bytes").alias("nb"))
        .collect(),
        key=lambda r: r.k,
    )
    s_cross, cum_n, cum_b = _scan(supers, 0, 0)
    if s_cross is None:
        return None
    buckets = sorted(
        acc.where((F.col("item_seq") / span).cast("long") == s_cross)
        .groupBy((F.col("item_seq") / _CAP_BUCKET).cast("long").alias("k"))
        .agg(F.count("*").alias("n"), F.sum("n_bytes").alias("nb"))
        .collect(),
        key=lambda r: r.k,
    )
    b_cross, cum_n, cum_b = _scan(buckets, cum_n, cum_b)
    assert b_cross is not None, "crossing super-bucket did not cross"
    rows = sorted(
        acc.where((F.col("item_seq") / _CAP_BUCKET).cast("long") == b_cross)
        .collect(),
        key=lambda r: r.item_seq,
    )
    for r in rows:
        cum_n += 1
        cum_b += r.n_bytes or 0
        if (cfg.max_images > 0 and cum_n >= cfg.max_images) or (
            cfg.max_folder_bytes > 0 and cum_b >= cfg.max_folder_bytes
        ):
            return int(r.item_seq)
    raise AssertionError("crossing bucket did not cross")  # unreachable


def _near_dup_stage(df: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Opt-in NEAR-duplicate pHash gate (engine extension; the reference
    dedups by exact equality only, filtering_module.py:335-342 — that
    stays the default, this stage runs behind
    ``cfg.extra['near_dup_images']`` with ``cfg.deduplication`` on).

    Pinned semantics (mirrored in oracle/crawl_oracle.py): walking the
    surviving items in item_seq order, an item within ``max_hamming``
    bits of any previously-KEPT phash rejects as ``near_dup`` and its
    phash is NOT added to the kept set (greedy
    maximal-independent-set-by-order); exact-phash repeats were already
    rejected ``duplicate_phash`` by the first-wins window above, and
    with this flag on the exact set advances even when the first holder
    of a phash is itself near-dup-rejected (the hash was observed).

    That greedy scan decomposes exactly by connected components of the
    near-dup graph — items farther than ``max_hamming`` from every
    member of a component never interact with it — so the engine
    resolves components distributively (operators/image_dedup
    .phash_clusters: exact-collapse + segment pigeonhole + pointer-
    jumping CC, every stage shuffle-on-key) and replays the greedy scan
    per component in an Arrow-batched applyInPandas kernel over
    component MEMBERS only. Components are near-dup chains (small in
    practice; mass-duplication collapses to one representative before
    the pair join), so the per-group quadratic is bounded; items in no
    component skip the kernel entirely."""
    import pandas as pd

    from snapcrawler_spark.operators.image_dedup import phash_clusters

    surv = df.where(F.col("reason").isNull()).select("item_seq", "phash")
    clusters = phash_clusters(
        surv, max_hamming, id_col="item_seq", phash_col="phash"
    )
    members = surv.join(
        clusters.select("item_seq", "cluster_id"), "item_seq"
    )
    mask = (1 << 64) - 1

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("item_seq")
        kept: list[int] = []
        out: list[int] = []
        for seq, ph in zip(pdf["item_seq"], pdf["phash"]):
            p = int(ph) & mask
            if any(
                bin(p ^ k).count("1") <= max_hamming for k in kept
            ):
                out.append(int(seq))
            else:
                kept.append(p)
        return pd.DataFrame({"item_seq": pd.array(out, dtype="int64")})

    rejected = members.groupBy("cluster_id").applyInPandas(
        _greedy, "item_seq long"
    ).withColumn("nd_hit", F.lit(True))
    return (
        df.join(rejected, "item_seq", "left")
        .withColumn(
            "reason",
            F.coalesce(
                F.col("reason"),
                F.when(F.col("nd_hit"), F.lit("near_dup")),
            ),
        )
        .drop("nd_hit")
    )


def image_pipeline(
    items: DataFrame,
    image_fetch: DataFrame,
    images: DataFrame,
    cfg: CrawlConfig,
) -> tuple[DataFrame, DataFrame]:
    """items(item_seq, image_url, source_page, depth) → (accepted, rejections).

    accepted: item_seq, image_url, image_id, phash, caption, w, h
    rejections: item_seq, image_url, reason
    """
    # shuffle-join on image_url: image_fetch has one row per image URL in
    # the corpus — unbounded at crawl scale, so never broadcast it (AQE
    # may still pick a broadcast at fixture scale, which is fine)
    fetched = items.join(image_fetch, "image_url", "left")
    fetched = fetched.withColumn("ext", url_ext_col(F.col("image_url")))

    pre_reason = (
        F.when(
            F.col("status").isNull() | (F.col("status") != 200), F.lit("http_error")
        )
        .when(
            ~F.lower(F.col("content_type")).contains("image"),
            F.lit("non_image_content_type"),
        )
        .when(F.col("ext") == "svg", F.lit("svg_unsupported"))
    )
    fetched = fetched.withColumn("pre_reason", pre_reason)

    # decode once per distinct payload actually reaching the decode stage
    if cfg.watermark_enabled:
        from snapcrawler_spark.kernels.analysis import watermark_udf

        wm_col = watermark_udf(F.col("bytes"))
    else:
        wm_col = F.lit(False)
    # Spread the decode stage across the cluster explicitly: AQE
    # coalesces the join's post-shuffle partitions by BYTES (advisory
    # 64 MB), but decode cost is per-row Python CPU — at fixture scale
    # the whole corpus coalesced into ONE partition and decoded on one
    # core (round-7 profile: 10 s single-threaded vs 3 s spread; the
    # dominant finalize cost). Byte size is the wrong proxy for an
    # opaque CPU-bound UDF stage; one extra pass over the payload is
    # ~10-100× cheaper than the Python decode of the same bytes.
    n_decode_parts = items.sparkSession.sparkContext.defaultParallelism
    need_decode = (
        fetched.where(F.col("pre_reason").isNull())
        .select("image_id")
        .distinct()
        .join(images.select("image_id", "bytes", "caption"), "image_id")
        .repartition(n_decode_parts)
        .withColumn("dec", decode_meta_udf(F.col("bytes")))
        .select(
            "image_id",
            "caption",
            wm_col.alias("wm"),
            F.length("bytes").alias("n_bytes"),
            F.col("dec.w").alias("w"),
            F.col("dec.h").alias("h"),
            F.col("dec.mode").alias("mode"),
            F.col("dec.dpi").alias("dpi"),
            F.col("dec.phash").alias("phash"),
            F.col("dec.ok").alias("dec_ok"),
        )
    )
    df = fetched.join(need_decode, "image_id", "left")

    ratio = F.when(F.col("h") > 0, F.col("w") / F.col("h")).otherwise(F.lit(1.0))
    meta_reason = F.when(~F.col("dec_ok"), F.lit("decode_error"))
    if cfg.min_side_size > 0:
        meta_reason = meta_reason.when(
            F.least("w", "h") < cfg.min_side_size, F.lit("size")
        )
    if cfg.formats:
        allowed = [x.lower() for x in cfg.formats]
        meta_reason = meta_reason.when(~F.col("ext").isin(allowed), F.lit("format"))
    if cfg.min_dpi > 0:
        meta_reason = meta_reason.when(
            F.col("dpi").isNotNull() & (F.col("dpi") < cfg.min_dpi), F.lit("dpi")
        )
    if cfg.norm_color_mode == "color":
        meta_reason = meta_reason.when(F.col("mode") == "L", F.lit("color"))
    elif cfg.norm_color_mode == "bw":
        meta_reason = meta_reason.when(F.col("mode") != "L", F.lit("color"))
    if cfg.norm_orientation == "landscape":
        meta_reason = meta_reason.when(F.col("w") < F.col("h"), F.lit("orientation"))
    elif cfg.norm_orientation == "portrait":
        meta_reason = meta_reason.when(F.col("h") < F.col("w"), F.lit("orientation"))
    elif cfg.norm_orientation == "square":
        meta_reason = meta_reason.when(F.col("w") != F.col("h"), F.lit("orientation"))
    if cfg.aspect_ratio_min > 0:
        meta_reason = meta_reason.when(
            ratio < cfg.aspect_ratio_min, F.lit("aspect")
        )
    if cfg.aspect_ratio_max > 0:
        meta_reason = meta_reason.when(
            ratio > cfg.aspect_ratio_max, F.lit("aspect")
        )
    if not cfg.allow_logos_banners:
        # banner/logo gate (pipelines.py:240-252): very wide (>10:1) or
        # very tall (<1:10) images are typical banners/logos
        meta_reason = meta_reason.when(
            (ratio > 10) | (ratio < 0.1), F.lit("banner_logo")
        )

    df = df.withColumn("reason", F.coalesce(F.col("pre_reason"), meta_reason))
    if cfg.deduplication or cfg.max_images > 0 or cfg.max_folder_bytes > 0:
        # truncate lineage before the window/cap stages: the dedup split
        # and the cap boundary cross-join each reference this plan again —
        # with a many-wave upstream union the duplicated logical plan makes
        # Catalyst analysis itself the bottleneck (driver stuck for minutes)
        df = df.localCheckpoint()

    if cfg.deduplication:
        # first-wins among surviving rows only (rejected rows bypass the
        # window — keeps the phash shuffle free of a giant null partition)
        survivors = df.where(F.col("reason").isNull())
        rejected = df.where(F.col("reason").isNotNull())
        w_dup = Window.partitionBy("phash").orderBy("item_seq")
        survivors = survivors.withColumn(
            "reason",
            F.when(F.row_number().over(w_dup) > 1, F.lit("duplicate_phash")),
        )
        df = survivors.unionByName(rejected)

    if cfg.deduplication and cfg.extra.get("near_dup_images"):
        df = _near_dup_stage(df, max_hamming=3)

    if cfg.watermark_enabled:
        # reference order (filtering_module.py:336-350): the phash insert
        # precedes the watermark check, so a duplicate of a watermarked
        # winner rejects as duplicate_phash, and the winner as watermark
        df = df.withColumn(
            "reason",
            F.coalesce(
                F.col("reason"), F.when(F.col("wm"), F.lit("watermark"))
            ),
        )

    if cfg.max_images > 0 or cfg.max_folder_bytes > 0:
        cap_seq = _cap_boundary(df, cfg)
        if cap_seq is not None:
            df = df.where(F.col("item_seq") <= F.lit(cap_seq))

    accepted = (
        df.where(F.col("reason").isNull())
        .select("item_seq", "image_url", "image_id", "phash", "caption", "w", "h")
    )
    rejections = df.where(F.col("reason").isNotNull()).select(
        "item_seq", "image_url", "reason"
    )
    return accepted, rejections
