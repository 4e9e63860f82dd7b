"""iceberg_relative_io_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference
``lightmelodies/iceberg-relative-io`` (an Apache Iceberg relative-path
catalog/FileIO plugin, see /root/reference), re-expressed Spark-first:

- ``catalog/``   — the genuinely novel layer: a relative-path table format
  (warehouse-movable metadata, versioned snapshots, atomic commits) in pure
  Python over the local/Hadoop filesystem, mirroring the semantics of
  RelativeFileIO.java / HadoopRelativeCatalog.java /
  HadoopRelativeTableOperations.java / JdbcRelativeCatalog.java.
- ``sources/``   — parquet table loaders for the driver fixtures.
- ``operators/`` — the relational operator surface (SURVEY.md §2.B) as
  DataFrame-API query builders, plus LLM-data-pipeline operators
  (SURVEY.md §2.C): dedup (exact/minhash-LSH/simhash/jaccard/embedding),
  similarity search, text analysis, multimodal plumbing.
- ``streaming/`` — Structured Streaming ingest / windowed aggregation /
  stateful dedup over the events table.

Everything is DataFrame/SQL-first so Catalyst owns optimization; Python
UDFs appear only where built-ins cannot express the semantics.
"""

__version__ = "0.1.0"

from iceberg_relative_io_spark.session import get_spark, ensure_runtime_confs  # noqa: F401
