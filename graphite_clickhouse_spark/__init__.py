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

__version__ = "0.2.0"


_LAZY = {
    "Engine": ("graphite_clickhouse_spark.render.pipeline", "Engine"),
    "RenderRequest": ("graphite_clickhouse_spark.render.pipeline", "RenderRequest"),
    "DataTableRoute": ("graphite_clickhouse_spark.render.pipeline", "DataTableRoute"),
    "get_spark": ("graphite_clickhouse_spark.session", "get_spark"),
    "load_settings": ("graphite_clickhouse_spark.config", "load_settings"),
    "engine_from_settings": ("graphite_clickhouse_spark.config", "engine_from_settings"),
    "make_server": ("graphite_clickhouse_spark.server", "make_server"),
    "serve_background": ("graphite_clickhouse_spark.server", "serve_background"),
    "IngestJob": ("graphite_clickhouse_spark.streaming.ingest", "IngestJob"),
    "eval_promql": ("graphite_clickhouse_spark.plans.promql", "eval_promql"),
}

__all__ = sorted(_LAZY) + ["__version__"]


def __getattr__(name):
    """Lazy top-level API (keeps `import graphite_clickhouse_spark` free
    of a pyspark import until something is actually used; PEP 562)."""
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(list(globals()) + list(_LAZY)))
