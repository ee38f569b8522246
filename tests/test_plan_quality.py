"""Physical-plan audits: the optimizations we rely on at 100 TB must be
visible in `explain` output — predicate pushdown into the parquet scan,
column pruning, broadcast joins for small dims, and no Python UDFs in
the metadata filter chain (SURVEY §4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


class TestPlanQuality:
    def test_scan_filter_pushdown(self, spark):
        df = em.queries()["scan_filter"](spark, SF)
        plan = _plan(df)
        assert "PushedFilters:" in plan
        assert "l_quantity" in plan.split("PushedFilters:")[1][:300], (
            "quantity predicate did not reach the parquet scan"
        )

    def test_scan_column_pruning(self, spark):
        df = em.queries()["scan_filter"](spark, SF)
        plan = _plan(df)
        read = plan.split("ReadSchema:")[1][:400]
        # only the 4 referenced columns read, not all 11 lineitem columns
        assert "l_extendedprice" not in read
        assert "l_returnflag" not in read

    def test_small_dim_broadcasts(self, spark):
        df = em.queries()["broadcast_join_agg"](spark, SF)
        assert "BroadcastHashJoin" in _plan(df)

    def test_filter_chain_is_codegen_not_python(self, spark):
        df = em.queries()["filter_chain"](spark, SF)
        df.collect()  # AQE finalizes the physical plan on execution
        plan = _plan(df)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # whole-stage codegen shows as "*(n)" stage markers in toString()
        assert "*(1)" in plan

    def test_anti_join_shape(self, spark):
        df = em.queries()["seen_anti_join"](spark, SF)
        assert "LeftAnti" in _plan(df)

    def test_image_pipeline_no_broadcast_of_image_fetch(self, spark, web_xs):
        """image_fetch is one row per image URL in the corpus — unbounded
        at crawl scale. The pipeline must not hint a broadcast of it (AQE
        may still choose one at fixture scale; the *hint* is the bug)."""
        from snapcrawler_spark.conf import CrawlConfig
        from snapcrawler_spark.io import fixture_to_spark
        from snapcrawler_spark.operators.filters import image_pipeline

        tables = fixture_to_spark(spark, web_xs)
        items = spark.createDataFrame(
            [(1, "https://a.test/x.png", "https://a.test/", 0)],
            "item_seq long, image_url string, source_page string, depth int",
        )
        accepted, _ = image_pipeline(
            items, tables["image_fetch"], tables["images"], CrawlConfig()
        )
        opt = _optimized(accepted)
        assert "hint" not in opt.lower() or "broadcast" not in opt.lower(), (
            "broadcast hint found in image_pipeline plan"
        )

    def test_image_pipeline_caps_without_global_window(self, spark, web_xs):
        """max_images/max_folder_bytes must not appear as an unpartitioned
        window over the accepted stream (the old single-partition cap)."""
        from snapcrawler_spark.conf import CrawlConfig
        from snapcrawler_spark.io import fixture_to_spark
        from snapcrawler_spark.operators.filters import image_pipeline

        tables = fixture_to_spark(spark, web_xs)
        rows = [
            (i, f"https://a.test/x{i}.png", "https://a.test/", 0)
            for i in range(1, 20)
        ]
        items = spark.createDataFrame(
            rows,
            "item_seq long, image_url string, source_page string, depth int",
        )
        accepted, _ = image_pipeline(
            items,
            tables["image_fetch"],
            tables["images"],
            CrawlConfig(max_images=5, deduplication=False),
        )
        plan = _plan(accepted)
        assert "Window" not in plan, (
            "cap path must use bucketed partials, not a window"
        )

    def test_dense_order_key_has_no_unpartitioned_window(self, spark):
        from snapcrawler_spark.operators.order import dense_order_key

        df = spark.range(1000).select(
            F.col("id").alias("a"), (F.col("id") % 7).alias("b")
        )
        out = dense_order_key(df, ["b", "a"], out_col="seq")
        plan = _plan(out)
        # the window must be partitioned (by __pid); an unpartitioned
        # window prints 'Window [..]' with an empty partition spec
        import re

        for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
            assert m.group(1).strip() != "", "unpartitioned window in plan"
        # and it must actually equal the global dense rank
        got = [r.seq for r in out.orderBy("b", "a").collect()]
        assert got == list(range(1, 1001))

    def test_image_pipeline_decodes_distinct_only(self, spark, web_xs):
        """The decode UDF must sit above a distinct on image_id — one
        decode per payload, not per occurrence (dedup-before-decode)."""
        from snapcrawler_spark.conf import CrawlConfig
        from snapcrawler_spark.io import fixture_to_spark
        from snapcrawler_spark.operators.filters import image_pipeline

        tables = fixture_to_spark(spark, web_xs)
        items = spark.createDataFrame(
            [(1, "https://a.test/x.png", "https://a.test/", 0)],
            "item_seq long, image_url string, source_page string, depth int",
        )
        accepted, _ = image_pipeline(
            items, tables["image_fetch"], tables["images"], CrawlConfig()
        )
        opt = _optimized(accepted)
        decode_idx = opt.find("decode_meta_udf")
        agg_idx = opt.find("Aggregate")  # the distinct below the UDF
        assert decode_idx != -1
        assert agg_idx != -1 and agg_idx > decode_idx

    def test_simhash_is_kernelized_no_explode(self, spark):
        """Round-7 shape: the fingerprint is computed per doc inside ONE
        mapInPandas kernel — no word explode at all (the round-2 fix
        capped the plan at one Generate; the kernel removes even that
        one, and with it the per-word shuffle into the 60-tally
        aggregate)."""
        from snapcrawler_spark.pipeline.dedup import simhash

        plan = _optimized(simhash(spark, "/root/testdata/sf0.001"))
        assert plan.count("Generate") == 0, plan[:2000]
        assert "MapInPandas" in plan, plan[:2000]

    def test_wave_frontier_is_snapshot_backed(self, spark, web_xs):
        """Round-4 stats-compounding guard: the wave loop must commit
        each frontier through the parquet snapshot store, NOT through
        Dataset.localCheckpoint. localCheckpoint eagerly computes and
        CARRIES the origin plan's size-in-bytes stats onto the new leaf;
        with the size-only visitor multiplying child sizes for joins and
        cogroups, carried stats compound S_w ~ S_{w-1}^2 across waves
        until one checkpoint call burns CPU-minutes in million-bit
        BigInteger math (killed BENCH_r03 and the first r4 bench). A
        parquet-backed leaf carries real file-size stats instead."""
        from snapcrawler_spark.conf import CrawlConfig
        from snapcrawler_spark.io import fixture_to_spark
        from snapcrawler_spark.plans.wave_crawl import WaveCrawl

        cfg = CrawlConfig(
            seeds=tuple(web_xs["seeds"].seed_url), host_budget=0
        )
        run = WaveCrawl(
            spark, fixture_to_spark(spark, web_xs), cfg,
            seen_kind="exact", collect_metrics=False,
        ).run()
        frontier = run["frontier"]
        opt = _optimized(frontier)
        assert "parquet" in opt.lower(), opt[:500]
        assert "LogicalRDD" not in opt, opt[:500]
        # carried stats must be the file's real size — a bounded number
        size = frontier._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        assert int(str(size)) < 1 << 40, f"frontier stats blew up: {size}"

    def test_stratified_sample_is_shuffle_free(self, spark):
        """Per-language hash sampling must be a narrow map+filter over
        the scan — no Exchange anywhere except the final presentation
        sort (which the driver's comparison imposes, not the operator)."""
        from snapcrawler_spark.pipeline.corpus import sample_stratified

        df = sample_stratified(spark, SF)
        plan = _optimized(df)
        # the optimized plan is Sort <- Filter/Project <- Scan; no
        # aggregation or join anywhere
        assert "Join" not in plan and "Aggregate" not in plan, plan[:800]
