"""graphite_clickhouse_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of go-graphite/graphite-clickhouse.

The reference (go-graphite/graphite-clickhouse, surveyed in SURVEY.md) is a
stateless Graphite query backend that compiles glob / seriesByTag targets
into ClickHouse SQL and post-processes the result (version-dedup, rollup,
gap-fill, wire encoding).  Here the same capabilities are re-expressed
Spark-first:

- storage            -> partitioned Parquet tables (points / path_index / tags_index)
- SQL generation     -> DataFrame plans built by a query compiler (plans/)
- ClickHouse engine  -> Spark SQL / Catalyst / Tungsten
- post-processing    -> native DataFrame transforms (operators/)
- ingest             -> Structured Streaming (streaming/)

Plus first-class large-scale training-data pipeline operators (pipeline/):
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity search,
text analysis, multimodal column plumbing.
"""

__version__ = "0.1.0"
