"""Skew-proof within-bucket pair generation (round-4 verdict item 1).

Every banded-LSH query (minhash bands, hyperplane buckets, image-hash
bands, video scene keys) generates candidate pairs INSIDE a bucket —
quadratic in the bucket size. The knob discipline (band width ∝ log N)
keeps the EXPECTED bucket constant, but a boilerplate-heavy crawl or a
viral re-uploaded clip lands one (band, signature) bucket with m ~ 10⁶
distinct members: m²/2 pairs inside a single join key or a single
applyInPandas group — one straggler task (and, for the dense-matrix
pandas path, an O(m²) allocation = OOM) stalling the whole 100 TB
stage. AQE's skew split cannot help: grouped-map keys are not
splittable, and a join key is indivisible.

The defense here is exact, not a recall cap:

1. count bucket occupancy FIRST — one slim aggregation (bucket columns
   only, map-side partial agg) kept only for buckets over ``cap``; in a
   healthy corpus the hot list is empty or tiny, so it broadcasts;
2. every member of a hot bucket gets a deterministic chunk id
   ``c = pmod(xxhash64(id), C)`` with ``C = ceil(m / cap)``;
3. the all-pairs work is re-keyed by (bucket, cl, cr): a pair with
   member chunks (cx <= cy) is produced by EXACTLY the task (cx, cy) —
   the left side replicates a chunk-c row into tasks (c, c..C-1), the
   right side into tasks (0..c, c), so the m² quadratic spreads over
   C(C+1)/2 independent keys of at most cap×cap work each.

Cold buckets (the overwhelmingly common case) take C = 1: chunk ids are
constant zero, the explode emits one struct per row, and the plan is
the original single-exchange plan plus one cheap slim agg + an empty
broadcast — no second shuffle of the feature-carrying rows.

Pair-uniqueness argument (why this is exact): for members x, y of one
bucket with chunks cx <= cy, task (cx, cy) sees x on the left (x's left
explode covers (cx, j) for j >= cx) and y on the right (y's right
explode covers (i, cy) for i <= cy); the reversed assignment would need
task (cy, cx) with cy <= cx, which only exists when cx == cy — and the
equal-chunk task emits each unordered pair once via the id ordering in
``pair_condition``. Cross-chunk tasks emit WITHOUT id ordering (the
chunk hash does not respect id order), so callers must canonicalize
with least()/greatest() — ``canonical_pair`` below.

The broadcastable hot-list bound: #hot buckets <= corpus / cap, and in
any non-pathological corpus it is the handful of boilerplate clusters.
A corpus where MOST buckets are hot has defeated its banding knobs and
needs wider signatures first; the chunking still bounds each task, only
the hot-list join would want a shuffle join (drop the broadcast hint).
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Default per-task member bound: a 4096² dense cosine block is ~130 MB
# of float64 scratch — well inside an executor; 4096² id-pair join rows
# are a few ms of codegen work.
DEFAULT_CAP = 4096

# Sentinel for ``sizes=``: the caller has ALREADY established (one
# driver-side isEmpty on its persisted hot list) that no bucket exceeds
# the cap. Chunk annotations are then the constants (_nchunks=1,
# _chunk=0) — identical to what the occupancy join would produce — so
# the broadcast join and the recount vanish from the per-pass plan.
NO_HOT_BUCKETS = "no-hot-buckets"


def hot_buckets(
    df: DataFrame, bucket_cols: list[str], cap: int = DEFAULT_CAP
) -> DataFrame:
    """The occupancy pre-count: buckets holding more than ``cap``
    members, as ``bucket_cols + [_m]``. One slim map-side-combined
    aggregation; in a healthy corpus the result is empty or tiny.
    Callers that run SEVERAL chunked passes over one featurization
    (the LSH family) should compute this once on the shared cache,
    persist it, and pass it to the pair builders as ``sizes=`` — the
    re-derivation of the bucket columns per pass is the avoidable
    cost, the agg itself is cheap."""
    return (
        df.select(*bucket_cols)
        .groupBy(*bucket_cols)
        .agg(F.count(F.lit(1)).alias("_m"))
        .filter(F.col("_m") > cap)
    )


def with_chunks(
    df: DataFrame,
    bucket_cols: list[str],
    id_col: str,
    cap: int = DEFAULT_CAP,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Annotate each row with ``_chunk`` (its deterministic chunk within
    its bucket) and ``_nchunks`` (the bucket's chunk count, 1 unless the
    bucket exceeds ``cap``). The occupancy count is a slim aggregation
    over the bucket columns only; the hot list joins back broadcast.
    ``sizes`` (from :func:`hot_buckets`, possibly persisted and shared
    across passes) skips the recount; :data:`NO_HOT_BUCKETS` short-
    circuits to constant annotations (no join at all)."""
    if sizes is NO_HOT_BUCKETS:
        return df.withColumn("_nchunks", F.lit(1)).withColumn(
            "_chunk", F.lit(0)
        )
    if sizes is None:
        sizes = hot_buckets(df, bucket_cols, cap)
    out = df.join(F.broadcast(sizes), bucket_cols, "left")
    nchunks = (
        F.when(F.col("_m").isNull(), F.lit(1))
        .otherwise(F.ceil(F.col("_m") / F.lit(cap)))
        .cast("int")
    )
    chunk = F.pmod(F.xxhash64(F.col(id_col)), nchunks).cast("int")
    return (
        out.withColumn("_nchunks", nchunks)
        .withColumn("_chunk", chunk)
        .drop("_m")
    )


def chunked_sides(
    df: DataFrame,
    bucket_cols: list[str],
    id_col: str,
    cap: int = DEFAULT_CAP,
    sizes: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Left/right sides for a skew-proof within-bucket self-join.

    Join the two on ``bucket_cols + ["_cl", "_cr"]`` plus
    ``pair_condition(left_id, right_id)``; every unordered member pair
    of every bucket appears exactly once (see module docstring).

    NULL bucket keys are dropped up front: the self-join's equality
    condition never matches NULL = NULL (those rows produce zero pairs
    anyway), but the grouped-map variant's groupBy would collect every
    NULL-bucket row into ONE group — and the hot-list join that sizes
    the chunks is not null-safe, so a hot NULL bucket (e.g. a million
    rows with no band signature) bypassed the chunking entirely and
    became exactly the m² straggler/OOM this module exists to prevent.
    Dropping them makes the two APIs agree AND keeps the bound."""
    for c in bucket_cols:
        df = df.filter(F.col(c).isNotNull())
    t = with_chunks(df, bucket_cols, id_col, cap, sizes=sizes)
    left = t.withColumn("_cl", F.col("_chunk")).withColumn(
        "_cr", F.explode(F.sequence(F.col("_chunk"), F.col("_nchunks") - 1))
    )
    right = t.withColumn("_cr", F.col("_chunk")).withColumn(
        "_cl", F.explode(F.sequence(F.lit(0), F.col("_chunk")))
    )
    return left.drop("_chunk", "_nchunks"), right.drop("_chunk", "_nchunks")


def pair_condition(left_id: Column, right_id: Column) -> Column:
    """The dedup/order predicate for the chunked self-join: equal-chunk
    tasks order by id (each unordered pair once); cross-chunk tasks take
    every left×right pair (the task key already makes them unique), the
    ids arriving in hash order — canonicalize output with
    ``canonical_pair``."""
    return (F.col("_l._cl") < F.col("_l._cr")) | (left_id < right_id)


def canonical_pair(left_id: Column, right_id: Column) -> tuple[Column, Column]:
    """(min, max) of the two ids — cross-chunk tasks do not preserve
    id order, so every emitted pair goes through this."""
    return F.least(left_id, right_id), F.greatest(left_id, right_id)


def chunked_self_join(
    df: DataFrame,
    bucket_cols: list[str],
    id_col: str,
    cap: int = DEFAULT_CAP,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """The full skew-proof within-bucket self-join: every unordered pair
    of distinct rows sharing ``bucket_cols`` values, each exactly once,
    with no join key ever carrying more than ``cap`` rows per side.

    Returns the joined frame with the two sides aliased ``_l`` / ``_r``;
    select payload with ``F.col("_l.x")`` / ``F.col("_r.x")`` and
    canonicalize ids with :func:`canonical_pair` (cross-chunk tasks see
    ids in hash order). Symmetric pair metrics (cosine, Hamming,
    Jaccard, shared-count) are unaffected by side order."""
    left, right = chunked_sides(df, bucket_cols, id_col, cap, sizes=sizes)
    l, r = left.alias("_l"), right.alias("_r")
    keys = [*bucket_cols, "_cl", "_cr"]
    cond = functools.reduce(
        operator.and_, [F.col(f"_l.{c}") == F.col(f"_r.{c}") for c in keys]
    ) & pair_condition(F.col(f"_l.{id_col}"), F.col(f"_r.{id_col}"))
    return l.join(r, cond)


def chunked_grouped_sides(
    df: DataFrame,
    bucket_cols: list[str],
    id_col: str,
    cap: int = DEFAULT_CAP,
    sizes: DataFrame | None = None,
) -> tuple[DataFrame, list[str]]:
    """Skew-proof input for a grouped-map (applyInPandas) all-pairs pass.

    Returns ``(tagged, group_cols)``: the union of the left/right chunk
    explosions with a ``_side`` marker (``"l"`` / ``"r"``), to be grouped
    by ``group_cols = bucket_cols + ["_cl", "_cr"]``. Inside each group
    the UDF pairs L-side rows against R-side rows, keeping
    ``id_l < id_r`` when the group's ``_cl == _cr`` (both sides are the
    same chunk — order dedups) and ALL cross pairs otherwise (the task
    key makes them unique; canonicalize ids in the output). In the
    common C = 1 case every bucket is one group holding each row twice
    (once per side) — same quadratic flops as the plain symmetric block,
    one extra slim agg, no extra shuffle of the feature rows. A group
    may be one-sided (a chunk with no members on one side when the id
    hash misses a chunk); the UDF must emit empty for those."""
    left, right = chunked_sides(df, bucket_cols, id_col, cap, sizes=sizes)
    tagged = left.withColumn("_side", F.lit("l")).unionByName(
        right.withColumn("_side", F.lit("r"))
    )
    return tagged, [*bucket_cols, "_cl", "_cr"]
