"""Round-4 operator tests: invariants the oracle can't express plus the
plan shapes that prove the 100 TB story (banded video candidates, single
exchange for the outlier rank, balanced curriculum buckets)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_relative_io_spark.operators import roundfour as R4
from iceberg_relative_io_spark.sources.tables import load_table


@pytest.mark.parametrize("name", sorted(R4.QUERIES))
def test_roundfour_query_runs(spark, sf_dir, name):
    df = R4.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_video_neardup_stats_are_symmetric_and_bounded(spark, sf_dir):
    rows = R4.q_video_neardup(spark, sf_dir).collect()
    assert rows
    by_id = {r.doc_id: r for r in rows}
    for r in rows:
        assert r.n_scenes >= 1
        assert 0.0 <= r.max_containment <= 1.0
        if r.n_neardups > 0:
            # the named first match must reciprocate (symmetrized pairs)
            assert by_id[r.first_match].n_neardups > 0
        else:
            assert r.first_match == -1 and r.max_containment == 0.0
    # independent recomputation: rebuild the pair set in plain Python
    # from the keyframe signatures and compare every per-doc stat
    from iceberg_relative_io_spark.operators.retrieval_ext import q_keyframes

    sigs: dict = {}
    for k in q_keyframes(spark, sf_dir).collect():
        sigs.setdefault(k.doc_id, {})[k.scene_idx] = k.key_lum
    want: dict = {d: [] for d in sigs}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            n_shared = sum(
                1 for idx, h in sigs[a].items() if sigs[b].get(idx) == h
            )
            if n_shared == 0:
                continue
            c = n_shared / min(len(sigs[a]), len(sigs[b]))
            if c >= R4._VN_CONTAIN:
                want[a].append((b, c))
                want[b].append((a, c))
    for r in rows:
        hits = want[r.doc_id]
        assert r.n_neardups == len(hits)
        assert r.first_match == (min(m for m, _ in hits) if hits else -1)
        if hits:
            assert r.max_containment == max(c for _, c in hits)


def test_video_neardup_plan_is_banded_not_cartesian(spark, sf_dir):
    plan = (
        R4.q_video_neardup(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_outlier_filter_flags_exact_bottom_decile_per_cell(spark, sf_dir):
    rows = R4.q_outlier_filter(spark, sf_dir).collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n_vecs
    cells: dict = {}
    for r in rows:
        cells.setdefault(r.cell, []).append(r)
    import math

    for cell, members in cells.items():
        want = math.floor((1.0 - R4._OUT_KEEP) * len(members))
        got = sum(m.is_outlier for m in members)
        assert got == want, (cell, len(members))
        # the flagged ones are exactly the lowest-cosine members
        members.sort(key=lambda m: (m.cos_to_centroid, m.vec_id))
        assert all(m.is_outlier == 1 for m in members[:want])
        assert all(m.is_outlier == 0 for m in members[want:])


def test_outlier_filter_plan_has_single_exchange(spark, sf_dir):
    """Assignment is broadcast map-only; the rank + cell-count windows
    share the cell partitioning — one shuffle total."""
    plan = (
        R4.q_outlier_filter(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1


def test_curriculum_buckets_balanced_dense_and_monotone(spark, sf_dir):
    rows = R4.q_curriculum_order(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    sizes: dict = {}
    for r in rows:
        sizes.setdefault(r.bucket, []).append(r)
    assert set(sizes) == set(range(1, R4._CUR_BUCKETS + 1))
    counts = [len(v) for _, v in sorted(sizes.items())]
    assert max(counts) - min(counts) <= 1  # ntile balance property
    # positions dense 1..n inside a bucket; difficulty non-decreasing
    # within the bucket order AND across bucket boundaries
    prev_max = -1.0
    for b in range(1, R4._CUR_BUCKETS + 1):
        members = sorted(sizes[b], key=lambda r: r.pos)
        assert [m.pos for m in members] == list(range(1, len(members) + 1))
        diffs = [m.difficulty for m in members]
        assert diffs == sorted(diffs)
        assert diffs[0] >= prev_max - 1e-15
        prev_max = diffs[-1]
