"""Operator registry.

Each operator module exposes ``QUERIES`` (name -> callable(spark, sf_dir)
-> DataFrame) and ``ORACLE`` (name -> equivalent DuckDB SQL). The driver
contract in ``__spark_entry__.py`` merges them all.
"""

from __future__ import annotations


def merged_queries() -> dict:
    from iceberg_relative_io_spark.operators import relational, northstar, tableops_queries
    from iceberg_relative_io_spark.streaming import stream_queries

    out: dict = {}
    for mod in (relational, northstar, tableops_queries, stream_queries):
        out.update(mod.QUERIES)
    out.update(stream_queries.register_optional_queries())
    return out


def merged_oracle() -> dict:
    from iceberg_relative_io_spark.operators import relational, northstar, tableops_queries
    from iceberg_relative_io_spark.streaming import stream_queries

    out: dict = {}
    for mod in (relational, northstar, tableops_queries, stream_queries):
        out.update(mod.ORACLE)
    # keep the oracle map a subset of queries(): optional queries that the
    # runtime gates off must not leave a dangling oracle entry behind
    names = set(merged_queries())
    return {k: v for k, v in out.items() if k in names}
