"""Smoke + plan-shape tests for the relational operator surface.

Full value-level correctness is the DuckDB oracle gate
(tools/check_oracle.py, run by the driver); these tests assert the things
the oracle cannot see: plan shape (pushdown, broadcast, partial agg) and
basic invariants at sf0.001.
"""

from __future__ import annotations

import pytest

from iceberg_relative_io_spark.operators import relational as R


@pytest.mark.parametrize("name", sorted(R.QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = R.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_every_query_has_oracle(spark):
    missing = set(R.QUERIES) - set(R.ORACLE)
    assert not missing, f"relational queries without an oracle: {missing}"


def test_projection_prunes_columns(spark, sf_dir):
    plan = R.q_projection(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    # ReadSchema must not include unprojected columns like l_comment/l_tax
    assert "l_tax" not in plan
    assert "l_extendedprice" in plan


def test_filter_pushes_down(spark, sf_dir):
    plan = R.q_filter(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_quantity)" in plan or "GreaterThan(l_quantity" in plan


def test_star_join_broadcasts_dims(spark, sf_dir):
    plan = R.q_star_broadcast(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    # all four joins broadcast; the fact table must never sort-merge
    assert plan.count("BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in plan


def test_asof_join_single_shuffle(spark, sf_dir):
    """The union+window as-of formulation must cost exactly one exchange
    (the user_id partitioning) — no pairwise join blow-up."""
    plan = R.q_asof_join(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_agg_has_partial_aggregation(spark, sf_dir):
    plan = (
        R.q_agg_pricing_summary(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    # map-side combine before the exchange
    assert "partial" in plan.lower()


def test_topk_uses_take_ordered(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plan = (
        orders.orderBy(orders.o_totalprice.desc())
        .limit(10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_approx_distinct_within_tolerance(spark, sf_dir):
    row = R.q_approx_distinct(spark, sf_dir).collect()[0]
    assert row["approx_within_5pct"] == 1


def test_repartition_colocates_aggregation(spark, sf_dir):
    """B20/partitioning: pre-partitioning by the aggregation key means the
    groupBy reuses the distribution — exactly one shuffle in the plan."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pre = li.repartition(8, "l_orderkey").sortWithinPartitions("l_orderkey")
    agg = pre.groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, "groupBy must reuse the repartition distribution"


def test_salted_join_is_shuffle_not_broadcast(spark, sf_dir):
    # the query exists to demonstrate the salted SHUFFLE join; if Catalyst
    # silently broadcast it the demonstration would be vacuous
    plan = R.q_skew_salted_join(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan.split("ShuffledHashJoin")[0]


def test_cms_estimates_upper_bound_true_counts(spark, sf_dir):
    rows = R.q_cms_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r.cms_upper_bound_ok == 1 for r in rows)
    assert all(r.est_cnt >= r.true_cnt for r in rows)


def test_retention_distinct_pairs_before_self_join(spark, sf_dir):
    # the (user, week) distinct must collapse event volume BEFORE the
    # self-join: the plan must contain an aggregate under the join
    plan = R.q_retention_cohorts(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    # no cartesian/broadcast-nested-loop: the self-join is keyed
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cube_preaggregates_before_expand(spark, sf_dir):
    # CUBE must Expand the PRE-AGGREGATED groups, not the fact scan:
    # everything below the Expand node must include a HashAggregate, so
    # the 4x grouping-set multiplication applies to ~6 rows, not 100 TB.
    for q in (R.q_cube, R.q_rollup):
        plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "Expand" in plan
        below_expand = plan.split("Expand", 1)[1]
        assert "HashAggregate" in below_expand


def test_cms_explodes_distinct_keys_not_scan(spark, sf_dir):
    # the d-way hash explosion must run over the per-key count table
    # (below the Generate there is a HashAggregate), never the raw scan
    plan = R.q_cms_heavy_hitters(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" in plan
    below_last_generate = plan.rsplit("Generate explode", 1)[1]
    assert "HashAggregate" in below_last_generate


def test_cms_partial_aggregation(spark, sf_dir):
    # sketch construction must combine map-side (partial_count before the
    # exchange) — the property that makes CMS state fixed-size at scale
    plan = R.q_cms_heavy_hitters(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan or "partial count" in plan.lower()


def test_dynamic_partition_pruning_reaches_the_fact_scan(spark, sf_dir, tmp_path):
    """Spark's DPP: a selective dim-side filter becomes a runtime
    partition filter on the partitioned fact scan — the mechanism that
    lets a 100 TB date/tenant-partitioned fact table read only the
    partitions the dimension join can reach. Pinned here so a session
    config regression (spark.sql.optimizer.dynamicPartitionPruning)
    can't silently turn every such join into a full fact scan."""
    from pyspark.sql import functions as F

    from iceberg_relative_io_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    d = str(tmp_path / "fact_parted")
    li.withColumn("pk", (F.col("l_orderkey") % 20).cast("int")).write.partitionBy(
        "pk"
    ).mode("overwrite").parquet(d)
    fact = spark.read.parquet(d)
    dim = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select((F.col("o_orderkey") % 20).cast("int").alias("pk"))
        .distinct()
        .filter(F.col("pk") < 3)
    )
    q = fact.join(dim, ["pk"]).groupBy("pk").count()
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower()
    got = {r.pk for r in q.collect()}
    assert got <= {0, 1, 2} and got  # only reachable partitions appear


def test_aqe_splits_the_skewed_join_partition(spark, sf_dir):
    """AQE skew-join handling: a hot join key whose shuffle partition
    dwarfs the median gets SPLIT at runtime (AQEShuffleRead ... skewed)
    instead of serializing one reducer — the runtime complement of the
    explicit salting in b07_skew_salted_join. Note the join output must
    not feed a same-key aggregation (that pins the join's distribution
    and lawfully suppresses the split — which is why the salted variant
    still exists for agg-above-join pipelines)."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        big = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 8, F.lit(0))
            .otherwise(F.col("id") % 50)
            .alias("k"),
            F.concat(F.lit("x" * 100), F.col("id").cast("string")).alias("pad"),
        )
        small = spark.range(0, 50).select(
            F.col("id").alias("k"), F.lit("v").alias("v")
        )
        q = big.join(small, "k").select(F.length("pad").alias("l")).agg(
            F.sum("l").alias("s")
        )
        [row] = q.collect()
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skewed" in plan  # AQEShuffleRead split the hot partition
        # correctness unchanged by the split
        assert row.s == big.select(F.length("pad").alias("l")).agg(
            F.sum("l")
        ).collect()[0][0]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bucketed_tables_join_without_a_shuffle(spark, sf_dir):
    """Spark table bucketing: two tables bucketed AND sorted on the join
    key at the same bucket count sort-merge-join with NO exchange below
    the join — the co-located-join strategy a 100 TB warehouse uses for
    its recurring fact⋈fact keys (pay the shuffle once at write, never
    at read). The only exchange in this plan belongs to the downstream
    groupBy on a different key."""
    from pyspark.sql import functions as F

    from iceberg_relative_io_spark.sources.tables import load_table

    import shutil

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("bkt_orders", "bkt_cust"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)  # stale location
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey").mode(
        "overwrite"
    ).saveAsTable("bkt_orders")
    cust.write.bucketBy(8, "c_custkey").sortBy("c_custkey").mode(
        "overwrite"
    ).saveAsTable("bkt_cust")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("bkt_orders")
            .join(
                spark.table("bkt_cust"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # exactly one exchange — the groupBy's, not the join's
        assert plan.count("Exchange hashpartitioning") == 1
        assert "c_mktsegment" in plan.split("Exchange hashpartitioning", 1)[1][:60]
        got = {r.c_mktsegment: r.n for r in j.collect()}
        want = {
            r.c_mktsegment: r.n
            for r in orders.join(
                cust, F.col("o_custkey") == F.col("c_custkey")
            )
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_cust")


def test_scd2_intervals_semantics(spark):
    """b17_scd2_intervals: runs collapse, intervals chain exactly
    (valid_to = next valid_from), only the last run per user is
    current, and same-ts ties break on event_id."""
    from iceberg_relative_io_spark.operators.roundeight import q_scd2_intervals
    import tempfile, os

    rows = [
        # user 1: a,a,b,a  -> 3 runs (a:2 events, b:1, a:1)
        (1, 1, "a", "2024-01-01 00:00:01"),
        (2, 1, "a", "2024-01-01 00:00:02"),
        (3, 1, "b", "2024-01-01 00:00:03"),
        (4, 1, "a", "2024-01-01 00:00:04"),
        # user 2: same-ts tie -> event_id orders (b then a): 2 runs
        (6, 2, "b", "2024-01-01 00:00:05"),
        (7, 2, "a", "2024-01-01 00:00:05"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).selectExpr(
        "event_id", "user_id", "event_type", "cast(ts as timestamp) ts"
    )
    d = tempfile.mkdtemp(prefix="scd2_")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = sorted(
        (r.user_id, r.state, r.n_events, r.is_current)
        for r in q_scd2_intervals(spark, d).collect()
    )
    assert got == [
        (1, "a", 1, True),
        (1, "a", 2, False),
        (1, "b", 1, False),
        (2, "a", 1, True),
        (2, "b", 1, False),
    ]
    # intervals chain: each non-current run's valid_to equals the next
    # run's valid_from, per user
    per_user = {}
    for r in q_scd2_intervals(spark, d).collect():
        per_user.setdefault(r.user_id, []).append(r)
    for runs in per_user.values():
        runs.sort(key=lambda r: r.valid_from_us)
        for a, b in zip(runs, runs[1:]):
            assert a.valid_to_us == b.valid_from_us and not a.is_current
        assert runs[-1].is_current and runs[-1].valid_to_us is None
    # the scale claim in the docstring: lag + running sum + run groupBy
    # + lead all share the user_id partitioning — ONE shuffle total
    plan = q_scd2_intervals(spark, d)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
