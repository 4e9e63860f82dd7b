"""Round-8 warehouse-consumer analytics (SURVEY.md §2.B extension).

**SCD2 interval build** (``b17_scd2_intervals``): collapse each user's
event-type sequence into type-2 slowly-changing-dimension rows —
``[valid_from, valid_to)`` intervals per state run with an
``is_current`` flag. This is the canonical dimension-build a CDC
changelog (a56/a_changelog) feeds: run detection is a null-safe
lag-compare, run ids are a running sum over the same sort, interval
ends come from lead() over the collapsed runs. (The other classic
event-consumer shapes — funnel and retention cohorts — already live in
relational.py as b13_funnel_analysis / b13_retention_cohorts.)

Scale design (100 TB): ONE shuffle on user_id — the lag window, the
running-sum window, the run group-by, and the lead window all share the
user_id partitioning (Catalyst collapses the first two into one sort,
and AQE-coalesced exchange reuse covers the rest), and the output is
O(state changes), not O(events).

No reference-file citation: the reference delegates its query surface
to Spark (SURVEY.md §0); this extends the §2.B consumer set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_relative_io_spark.sources.tables import load_table


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B17 (SCD2): collapse each user's event_type sequence into
    type-2 dimension intervals."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .withColumn(
            "chg",
            F.when(
                ~F.col("prev_type").eqNullSafe(F.col("event_type")), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "run_id",
            F.sum("chg").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    grouped = run.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("state"),  # constant within a run
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wr = Window.partitionBy("user_id").orderBy("run_id")
    return grouped.select(
        "user_id",
        "state",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros(F.lead("valid_from").over(wr)).alias("valid_to_us"),
        "n_events",
        F.lead("valid_from").over(wr).isNull().alias("is_current"),
    )


QUERIES = {
    "b17_scd2_intervals": q_scd2_intervals,
}

ORACLE = {
    "b17_scd2_intervals": """
        WITH seq AS (
            SELECT user_id, event_type, ts, event_id,
                   CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                        THEN 1 ELSE 0 END AS chg
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY ts NULLS FIRST, event_id NULLS FIRST)
        ),
        runs AS (
            SELECT user_id, event_type, ts,
                   sum(chg) OVER (PARTITION BY user_id
                                  ORDER BY ts NULLS FIRST, event_id NULLS FIRST
                                  ROWS UNBOUNDED PRECEDING) AS run_id
            FROM seq
        ),
        grouped AS (
            SELECT user_id, run_id,
                   min(event_type) AS state,
                   min(ts) AS valid_from,
                   count(*) AS n_events
            FROM runs GROUP BY user_id, run_id
        )
        SELECT user_id,
               state,
               epoch_us(CAST(valid_from AS TIMESTAMP)) AS valid_from_us,
               epoch_us(CAST(lead(valid_from) OVER wr AS TIMESTAMP)) AS valid_to_us,
               n_events,
               lead(valid_from) OVER wr IS NULL AS is_current
        FROM grouped
        WINDOW wr AS (PARTITION BY user_id ORDER BY run_id)
    """,
}
