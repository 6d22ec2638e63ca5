"""PySpark-native analytics engine with the query & data-processing
capabilities of Even521/solana-event-stream, rebuilt Spark-first.

Layout:
  session     -- tuned SparkSession factory + runtime tuning helper
  tables      -- testdata loaders (TPC-H-ish star schema + events/docs/embeddings)
  schemas     -- StructTypes for raw Solana rows and decoded events (SURVEY §1)
  registry    -- protocol/discriminator dispatch tables (SURVEY §2.7)
  operators/  -- explode, filters, dispatch, decode, merge, enrich, dedup, ...
  plans/      -- end-to-end DAGs (event pipeline, analytics queries)
  sources/    -- batch + streaming sources (parquet archive, replay, gRPC scaffold)
  streaming/  -- sinks, ordering contract, metrics listeners
"""

# single source of truth: pyproject reads this via
# [tool.setuptools.dynamic] version = { attr = ... }
__version__ = "0.8.0"
