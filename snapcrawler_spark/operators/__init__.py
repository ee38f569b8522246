"""Spark building blocks for the crawl plan — all expressed as native
DataFrame/column operations so Catalyst can push, prune, and codegen
them; pandas UDFs appear only where genuinely needed (urljoin)."""
