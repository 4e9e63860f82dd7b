"""Hot-key stress for the CDC keep-latest upsert (round-4 verdict item
6): one viral user_id concentrates a huge version history on a single
upsert key. Compares the window plan (partitionBy(key) + row_number —
the pre-round-5 merge_latest shape: the hot key's whole history sorts
in ONE task) against the max_by hash-aggregation plan now in
RelativeTable.merge_latest (map-side partial agg reduces each task's
slice of the hot key to one candidate row before the exchange).

    python tools/upsert_skew_stress.py [n_hot] [n_background]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F


def main() -> None:
    n_hot = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_bg = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    sys.path.insert(0, ".")
    from iceberg_relative_io_spark.session import get_spark

    spark = get_spark(app_name="upsert-skew", master="local[32]",
                      shuffle_partitions=32)

    # hot user 0 with n_hot versions; n_bg background users with ~4 each
    hot = spark.range(n_hot).select(
        F.lit(0).alias("user_id"), F.lit("click").alias("event_type"),
        F.col("id").alias("event_id"), (F.col("id") % 1000).alias("ts"),
        (F.col("id") * 7 % 100).cast("double").alias("value"),
    )
    bg = spark.range(n_bg * 4).select(
        (F.col("id") % n_bg + 1).alias("user_id"),
        F.lit("click").alias("event_type"),
        (F.col("id") + 100_000_000).alias("event_id"),
        (F.col("id") % 1000).alias("ts"),
        (F.col("id") * 3 % 100).cast("double").alias("value"),
    )
    df = hot.unionByName(bg).repartition(32).persist()
    df.count()
    keys, order = ["user_id", "event_type"], ["ts", "event_id"]
    tie = ["value"]

    # -- window plan (the old merge_latest shape) -----------------------
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order], F.xxhash64(*tie).desc()
    )
    t0 = time.time()
    n_win = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .groupBy()
        .count()
        .collect()[0][0]
    )
    t_win = time.time() - t0

    # -- max_by plan (merge_latest today) -------------------------------
    rank = F.struct(*[F.col(c) for c in order], F.xxhash64(*tie))
    t0 = time.time()
    n_agg = (
        df.groupBy(*keys)
        .agg(F.max_by(F.struct(*df.columns), rank).alias("_row"))
        .select("_row.*")
        .groupBy()
        .count()
        .collect()[0][0]
    )
    t_agg = time.time() - t0

    assert n_win == n_agg == n_bg + 1, (n_win, n_agg)
    print(
        f"hot={n_hot} bg_users={n_bg}\n"
        f"window+row_number: {t_win:.2f}s (hot key = one sort task)\n"
        f"max_by hash agg:   {t_agg:.2f}s (map-side partial agg)\n"
        f"speedup: {t_win / t_agg:.2f}x on local[32]"
    )


if __name__ == "__main__":
    main()
