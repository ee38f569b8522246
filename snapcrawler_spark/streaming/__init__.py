"""Structured Streaming surface of the crawl engine.

The reference's producer/consumer loop (crawling_module.py:96 /
filtering_module.py:93-100 with a bounded multiprocessing.Queue) maps
onto Structured Streaming micro-batches: candidate URLs arrive as a
stream, are event-time deduplicated under a watermark, rate-shaped per
host, and each micro-batch runs the same relational wave logic via
foreachBatch. A custom stateful operator (applyInPandasWithState)
carries the per-host adaptive budget between batches — the streaming
twin of operators/politeness.adapt_budgets."""

from snapcrawler_spark.streaming.frontier_stream import (  # noqa: F401
    candidate_stream,
    dedup_candidates,
    host_budget_stateful,
    per_host_window_counts,
)
