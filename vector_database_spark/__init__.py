"""PySpark-native vector analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference `nesterovsky-bros/vector-database` (binary space-partitioning
vector index + vicinity search), re-expressed Spark-first:

- the index build is a level-synchronous DataFrame loop (one job per tree
  level, one shuffle per level for the per-dimension stats aggregate),
  switching to `applyInPandas` local subtree builds once a node's point
  set fits in a task (the same shape MLlib uses for decision trees);
- search is an iterative pruned frontier join (or a broadcast pandas
  walker for low latency), followed by an exact distance refinement the
  reference delegates to the caller's predicate;
- the index itself is a plain DataFrame/Parquet table partitioned by
  `doc_id` — introspection is a query.

Beyond reference parity, the package carries the LLM-data-pipeline
operator set (dedup families, ANN/similarity search, text analysis,
multimodal column plumbing) and a Structured Streaming ingest path.
"""

from vector_database_spark.session import get_spark


def __getattr__(name):
    # lazy: avoid importing the full operator surface at package import
    if name == "VectorDatabase":
        from vector_database_spark.api import VectorDatabase

        return VectorDatabase
    raise AttributeError(name)


__version__ = "0.1.0"

__all__ = ["get_spark", "VectorDatabase", "__version__"]
