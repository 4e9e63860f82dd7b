"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``iceberg_relative_io_spark/``; this module only
adapts it to the driver contract.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# make the package importable regardless of the driver's CWD
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the broadcast star join
    lineitem⋈orders⋈customer⋈nation⋈region with exact revenue aggregation
    (SURVEY.md §7 M0)."""
    from iceberg_relative_io_spark.operators.relational import q_star_broadcast

    return q_star_broadcast(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from iceberg_relative_io_spark.operators import merged_queries

    return merged_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins for each query (omitted => rows-only check)."""
    from iceberg_relative_io_spark.operators import merged_oracle

    return merged_oracle()
