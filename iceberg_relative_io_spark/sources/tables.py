"""Parquet loaders for the driver fixture tables (FIXTURES.md).

The reference delegates all scanning to Spark's parquet source
(SURVEY.md §2.B B1); here that is the native path: ``spark.read.parquet``
gives vectorized reads, predicate pushdown and column pruning for free.

One fixture quirk is handled centrally: ``events.ts`` is parquet
TIMESTAMP(NANOS), which Spark cannot read as a timestamp. With
``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as raw
nanoseconds; we truncate to microseconds (integer floor division — exactly
what DuckDB's TIMESTAMP_NS→TIMESTAMP cast does) and expose TimestampType.
The matching oracle-side cast is ``CAST(ts AS TIMESTAMP)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_relative_io_spark.session import ensure_runtime_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; normalizes events.ts to TimestampType (µs)."""
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # raw nanos (legacy nanosAsLong) -> µs timestamp. Integer `div`
            # keeps the division exact (a double division would lose
            # precision at 1e18); truncation matches DuckDB's
            # TIMESTAMP_NS -> TIMESTAMP cast.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Spark 4.1+ reads parquet TIMESTAMP(NANOS) natively as NTZ
            # (µs-truncated). Session tz is pinned to UTC, so casting the
            # wall time to TimestampType yields the same instants DuckDB's
            # naive-timestamp semantics produce.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def fan_out(df: DataFrame, key: str | None = None, parallelism: int | None = None) -> DataFrame:
    """Rebalance a scan whose split count is below the cluster's default
    parallelism before a CPU-heavy stage (optimization guide §2.5:
    unsplittable input — "repartition immediately after the read").

    The driver fixtures are single-file, single-row-group parquet, so a
    scan feeding an expensive featurization UDF / wide decimal
    aggregation runs its whole first stage in 1-3 tasks while the rest
    of the machine idles (measured round 11: a 6-sum decimal aggregate
    over lineitem 2.0s single-task vs 0.7s fanned out; a char-gram UDF
    over documents 1.9s vs 1.1s). A corpus at scale arrives in
    thousands of splits, so the condition makes this a structural no-op
    there — nothing is shuffled unless the scan is under-parallel.

    ``key`` should be a high-cardinality column (guide §2.5: many more
    distinct values than partitions): hash repartitioning avoids the
    local sort every keyless round-robin repartition pays
    (sortBeforeRepartition, SPARK-23207 — measured 1.1s vs 0.7s on the
    same aggregate). Apply only where the first stage does real
    per-row work; a scan feeding a plain join/exchange gains nothing."""
    spark = df.sparkSession
    want = parallelism or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= want:
        return df
    if key is not None:
        return df.repartition(want, F.col(key))
    return df.repartition(want)


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register fixture tables as temp views (for the SQL-API surface)."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
