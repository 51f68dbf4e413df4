"""anycrawl_spark — a brand-new PySpark-native crawl/analytics engine.

Re-expresses the semantics of the reference crawl service (xienanzheng/AnyCrawl,
a Node.js BullMQ/Crawlee worker-queue system) as Spark DataFrame supersteps
over snapshot tables:

- ``anycrawl_spark.crawl``      — URL frontier + fetch scheduler (BFS supersteps)
- ``anycrawl_spark.operators``  — dedup, seen-filter, politeness, robots, spans,
                                  SERP, similarity search, text analysis
- ``anycrawl_spark.functions``  — URL kernel, text metrics, credit formulas
- ``anycrawl_spark.storage``    — snapshot tables (Iceberg-style on parquet)

Design notes (scale): everything is DataFrame-declarative so Catalyst handles
pushdown/pruning/broadcast; explicit physical choices (host-hash partitioning,
bloom shard co-partitioning, salting) live in `operators/` and are documented
inline. No per-row Python in hot paths — pandas/Arrow UDFs only.
"""

__version__ = "0.1.0"
