from snapcrawler_spark.plans.crawl import CrawlEngine  # noqa: F401
