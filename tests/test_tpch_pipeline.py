"""Smoke + plan-shape tests for the TPC-H suite and the round-2
pipeline extensions (value-level correctness is the DuckDB oracle gate).
"""

from __future__ import annotations

import pytest

from iceberg_relative_io_spark.operators import pipeline_ext as P
from iceberg_relative_io_spark.operators import tpch as H


@pytest.mark.parametrize("name", sorted(H.QUERIES))
def test_tpch_query_runs(spark, sf_dir, name):
    df = H.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", sorted(P.QUERIES))
def test_pipeline_query_runs(spark, sf_dir, name):
    df = P.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_every_query_has_oracle():
    assert set(H.QUERIES) == set(H.ORACLE)
    assert set(P.QUERIES) == set(P.ORACLE)


def test_q3_compiles_to_top_k(spark, sf_dir):
    plan = H.q_tpch_q3(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_q5_broadcasts_dims(spark, sf_dir):
    plan = H.q_tpch_q5(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_q6_pushes_filters_to_scan(spark, sf_dir):
    plan = H.q_tpch_q6(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_q17_aggregates_only_brand_parts(spark, sf_dir):
    """Q17's correlated per-part AVG must run AFTER the brand semi-join:
    the aggregate's input carries the semi-join, so the broadcast-back
    side is brand-sized (O(|brand parts|)), never O(|part|). In the plan
    that means every HashAggregate sits above a semi join, and no
    aggregate consumes the raw lineitem scan directly."""
    df = H.q_tpch_q17(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    # the partial agg for avg_qty appears only downstream of the semi join:
    # walking the tree bottom-up, the first lineitem scan feeds a semi join
    # before any hashpartitioning on l_partkey happens
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    first_agg = optimized.find("Aggregate")
    first_semi = optimized.find("LeftSemi")
    assert first_semi != -1 and first_agg != -1
    # in the optimized tree string, children print BELOW parents, so the
    # semi join (child of the agg) must appear after the agg header line
    assert optimized.index("LeftSemi", first_agg) > first_agg


def test_q2_min_cost_is_window_not_subquery(spark, sf_dir):
    """Q2's correlated min must be a window over the scoped join — no
    cartesian / nested-loop re-scan of partsupp per row."""
    plan = H.q_tpch_q2(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "Cartesian" not in plan
    assert "TakeOrderedAndProject" in plan  # top-100 never globally sorts


def test_q9_broadcasts_all_dims(spark, sf_dir):
    """Q9 joins lineitem to partsupp/part/supplier/nation — every
    dim-sized side must broadcast; only the orders join may shuffle."""
    plan = H.q_tpch_q9(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 4
    assert "Cartesian" not in plan


def test_q21_single_fact_shuffle_key(spark, sf_dir):
    """Q21's EXISTS/NOT-EXISTS pair is one per-order aggregate: the
    lineitem side shuffles on l_orderkey once for the aggregate and once
    for the distinct-waiters semi join — never a per-row re-scan."""
    plan = H.q_tpch_q21(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_derived_partsupp_is_deterministic(spark, sf_dir):
    """The derived partsupp must be identical across runs, key-unique on
    (partkey, suppkey), and give every part 1..=_PS_PER_PART suppliers
    within [1, |supplier|] (the dbgen spread can collide for one part at
    tiny supplier counts — collisions dedupe, never duplicate)."""
    from iceberg_relative_io_spark.sources.tables import load_table as lt

    rows1 = [tuple(r) for r in H._partsupp(spark, sf_dir).collect()]
    ps1 = set(rows1)
    ps2 = {tuple(r) for r in H._partsupp(spark, sf_dir).collect()}
    assert ps1 == ps2
    assert len(rows1) == len(ps1)  # no duplicate rows
    assert len({(r[0], r[1]) for r in rows1}) == len(rows1)  # PK unique
    n_part = lt(spark, sf_dir, "part").count()
    n_supp = lt(spark, sf_dir, "supplier").count()
    assert n_part <= len(ps1) <= n_part * H._PS_PER_PART
    assert all(1 <= r[1] <= n_supp for r in ps1)


def test_repetition_ratio_is_shuffle_free(spark, sf_dir):
    plan = P.q_repetition_ratio(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_quota_sample_single_exchange(spark, sf_dir):
    plan = P.q_source_quota_sample(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_sessionization_single_user_shuffle(spark, sf_dir):
    """Both windows and both aggregations must ride ONE hash exchange on
    user_id — the whole pipeline stays user-partitioned."""
    from iceberg_relative_io_spark.operators import relational as R

    plan = (
        R.q_sessionization(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_dedup_keep_latest_single_exchange(spark, sf_dir):
    from iceberg_relative_io_spark.operators import relational as R

    plan = (
        R.q_dedup_keep_latest(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_repetition_ratio_runs_arrow_batched(spark, sf_dir):
    plan = (
        P.q_repetition_ratio(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan  # pandas UDF, not row-at-a-time Python
