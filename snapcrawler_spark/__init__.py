"""snapcrawler_spark — a from-scratch PySpark-native rebuild of the
crawl/filter dataflow of T1desLuck/SnapCrawler (reference at
/root/reference, studied for *behavior only*; no code is ported).

Layout
------
- ``session``    SparkSession factory tuned for the sandbox (local[N]) and
                 for real clusters (partitioning/AQE knobs are explicit).
- ``kernels``    numpy/Arrow image kernels: BMP/PNG codecs, DCT pHash,
                 magic-byte format sniff, quality score — all vectorized
                 pandas UDFs, zero per-row Python on the hot path.
- ``fixtures``   deterministic synthetic web + image corpus (seed=42),
                 pure functions of (seed, scale); no network, no external
                 data (FIXTURES.md).
- ``oracle``     pure-Python reference semantics of the crawl loop
                 (crawling_module.py:80-189) + filter chain
                 (filtering_module.py:267-356) producing golden outputs.
- ``operators``  Spark building blocks: URL-seen set (exact anti-join +
                 partitioned bloom via applyInPandas), politeness windows,
                 extraction, metadata filter chain, first-wins dedup.
- ``plans``      the wave-loop crawl driver (Structured-Streaming-style
                 batch iteration with snapshot/resume).
- ``pipeline``   large-scale training-data ops: exact/MinHash-LSH/SimHash
                 dedup, ANN similarity search, text quality/langid/tokens,
                 multimodal binary-column plumbing.
- ``catalog``    Iceberg-semantics snapshot store over Parquet (atomic
                 manifest commits, VERSION AS OF reads) — drop-in for a
                 real Iceberg catalog when the runtime JAR is present.
"""

__version__ = "0.1.0"
