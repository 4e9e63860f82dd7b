#!/usr/bin/env python3
"""Benchmark: run every driver query at $SPARK_GRAFT_SF_DIR (default
sf0.1) and print ONE JSON line with per-query and total wall seconds.

Each query is forced end-to-end with the ``noop`` sink (full computation,
no result serialization cost), matching how a warehouse would measure
operator throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None

    import __spark_entry__ as e
    from iceberg_relative_io_spark.session import get_spark

    spark = get_spark(app_name="bench")
    # JVM/codegen warmup so query 1 doesn't pay session startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    times: dict[str, float] = {}
    for name, fn in sorted(e.queries().items()):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
