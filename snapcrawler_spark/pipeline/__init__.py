"""Large-scale training-data pipeline operators over the documents /
embeddings tables: deduplication (exact, MinHash-LSH, SimHash, n-gram
Jaccard), similarity search (brute-force + LSH-bucketed ANN), text
analysis (language-ID, quality, tokens, fingerprints), and multimodal
binary-column plumbing. All are expressed with native pyspark.sql
functions so they scale to the 100 TB tier; every operator has a DuckDB
oracle in __spark_entry__.oracle_sql()."""
