from snapcrawler_spark.oracle.crawl_oracle import crawl_oracle  # noqa: F401
