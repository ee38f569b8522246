#!/usr/bin/env python
"""spark-submit entry point for the crawl.

    zip -r engine.zip snapcrawler_spark
    spark-submit --py-files engine.zip jobs/crawl.py \
        --web /path/to/web_tables --out /path/to/catalog \
        [--mode wave|strict] [--seen bloom|cuckoo|exact] [--resume] \
        [--max-depth 5] [--max-requests 0] [--host-budget 64] \
        [--dedup] [--robots] [--adaptive] [--max-waves 64]

On a cluster the master/executor topology comes from spark-submit; the
session builder only sets SQL/AQE knobs. The crawl checkpoints every
wave into <out> (frontier + bloom/exact seen-set + items + wave cursor)
so ``--resume`` continues from the last committed wave after a kill.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--web", required=True, help="dir of fixture parquet tables")
    ap.add_argument("--out", required=True, help="snapshot catalog root")
    ap.add_argument("--mode", default="wave", choices=["wave", "strict"])
    ap.add_argument(
        "--seen", default="bloom", choices=["bloom", "cuckoo", "exact"]
    )
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--max-depth", type=int, default=5)
    ap.add_argument("--max-requests", type=int, default=0)
    ap.add_argument("--host-budget", type=int, default=64)
    ap.add_argument("--max-waves", type=int, default=64)
    ap.add_argument("--dedup", action="store_true")
    ap.add_argument("--robots", action="store_true")
    ap.add_argument(
        "--adaptive", action="store_true",
        help="per-host adaptive politeness budgets (needs --host-budget>0)",
    )
    args = ap.parse_args()

    from snapcrawler_spark.catalog import SnapshotCatalog
    from snapcrawler_spark.conf import CrawlConfig
    from snapcrawler_spark.io import read_fixture_parquet
    from snapcrawler_spark.session import get_spark

    spark = get_spark("snapcrawler-crawl")
    tables = read_fixture_parquet(spark, args.web)
    seeds = tuple(r.seed_url for r in tables["seeds"].orderBy("seed_idx").collect())
    cfg = CrawlConfig(
        seeds=seeds,
        max_depth=args.max_depth,
        max_requests=args.max_requests,
        host_budget=args.host_budget,
        deduplication=args.dedup,
        min_side_size=64,
        formats=("jpg", "jpeg", "png", "webp", "bmp"),
        extra={
            **({"robots_enabled": True} if args.robots else {}),
            **({"adaptive_politeness": True} if args.adaptive else {}),
        },
    )
    catalog = SnapshotCatalog(spark, args.out)

    if args.mode == "strict":
        from snapcrawler_spark.plans import CrawlEngine

        run = CrawlEngine(spark, tables, cfg).run()
        out = dict(
            mode="strict",
            pages=run["crawl_order"].count(),
            waves=run["waves"],
            accepted=run["accepted"].count(),
            rejected=run["rejections"].count(),
        )
        catalog.table("crawl_order").overwrite(run["crawl_order"])
        catalog.table("accepted").overwrite(run["accepted"])
        catalog.table("rejections").overwrite(run["rejections"])
    else:
        from snapcrawler_spark.plans.wave_crawl import WaveCrawl

        wc = WaveCrawl(spark, tables, cfg, catalog=catalog, seen_kind=args.seen)
        if args.resume:
            wc.restore()
        run = wc.run(max_waves=args.max_waves)
        out = dict(
            mode="wave",
            waves=run["waves"],
            total_fetched=run["total_fetched"],
            accepted=run["accepted"].count(),
            rejected=run["rejections"].count(),
            metrics=[vars(m) for m in run["metrics"]],
            stats=wc.stats(),
        )
        catalog.table("accepted").overwrite(run["accepted"])
        catalog.table("rejections").overwrite(run["rejections"])
        catalog.table("fetch_tally_final").overwrite(run["fetch_tally"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
