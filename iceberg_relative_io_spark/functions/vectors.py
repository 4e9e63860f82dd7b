"""Vector primitives for similarity search over embedding columns.

Dot products / cosines are built from ``zip_with`` + ``aggregate`` —
JVM-side, codegen'd, strictly left-to-right summation so the DuckDB oracle
(sequential ``list_reduce``) produces bit-identical doubles. Floats are
cast to double *before* any arithmetic in both engines.

The LSH hyperplanes are derived from an integer LCG and an exact
power-of-two division, so both engines materialize the exact same
hyperplane doubles — the ANN bucketing is fully oracle-checkable.
"""

from __future__ import annotations

import numpy as np  # module-level so pandas-UDF type hints resolve
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from iceberg_relative_io_spark import caches

_LCG = 2_654_435_761
_TWO31 = 2_147_483_648  # 2^31 — exact power-of-two divisor

DIM = 64
N_PLANES = 8


def dot(a: Column, b: Column) -> Column:
    """Sequential-sum dot product of two float arrays, in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_sql(a: str, b: str) -> str:
    # NULL guard: DuckDB's list_prepend(0.0, NULL) yields [0.0] (the
    # reduce then returns 0.0), while Spark's aggregate over a NULL
    # array is NULL — pin Spark's NULL-in/NULL-out
    return (
        f"CASE WHEN ({a}) IS NULL OR ({b}) IS NULL THEN NULL ELSE "
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"[CAST(({a})[i] AS DOUBLE) * CAST(({b})[i] AS DOUBLE) FOR i IN range(1, len({a}) + 1)]), "
        f"(acc, x) -> acc + x) END"
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)}) / (({norm_sql(a)}) * ({norm_sql(b)}))"


# ---------------------------------------------------------------------------
# random-hyperplane LSH: deterministic, engine-independent hyperplanes
# ---------------------------------------------------------------------------

def plane_component(j: int, i: int) -> float:
    """Hyperplane j, dimension i — exact in IEEE double in any engine."""
    return ((j * DIM + i) * _LCG % _TWO31) / _TWO31 - 0.5


def plane_dot(vec: Column, j: int) -> Column:
    """vec · plane_j as a sequential sum (matches dot())."""
    acc = F.lit(0.0)
    for i in range(DIM):
        acc = acc + F.element_at(vec, i + 1).cast("double") * F.lit(plane_component(j, i))
    return acc


def plane_dot_sql(vec: str, j: int) -> str:
    terms = "(CAST(0.0 AS DOUBLE))"
    for i in range(DIM):
        terms = f"({terms} + CAST(({vec})[{i + 1}] AS DOUBLE) * ({plane_component(j, i)!r}))"
    return terms


def lsh_bucket(vec: Column, n_planes: int = N_PLANES) -> Column:
    """Sign bits of n_planes hyperplane dots -> integer bucket id. The
    plane count is THE scale knob: buckets number 2^n_planes, so growing
    n_planes with log2(corpus) keeps the expected bucket size — and the
    within-bucket quadratic work — constant per corpus row."""
    acc = F.lit(0)
    for j in range(n_planes):
        acc = acc + F.when(plane_dot(vec, j) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return acc


def lsh_bucket_sql(vec: str, n_planes: int = N_PLANES) -> str:
    parts = [
        f"CASE WHEN ({plane_dot_sql(vec, j)}) > 0 THEN {1 << j} ELSE 0 END"
        for j in range(n_planes)
    ]
    return "(" + " + ".join(parts) + ")"


# ---------------------------------------------------------------------------
# bounded deterministic sampling — the centroid/seed/codebook source
# ---------------------------------------------------------------------------
#
# Every trained-structure ANN operator (IVF cells, k-medoids seeds, PQ
# sub-codebooks) needs a small centroid set on the driver. The set must be
# (a) CONSTANT-SIZE in the corpus — a corpus-proportional collect is the
# first thing that dies at 100 TB — and (b) deterministic and expressible
# in both engines so the oracle reproduces it. We take the k rows with the
# smallest multiplicative-hash key (vec_id * LCG mod 2^31): a uniform
# pseudo-random sample, stable under corpus growth only in size (k), and
# computed distributed as a per-partition top-k (TakeOrderedAndProject) —
# the driver ever sees exactly k rows.

def sample_key(vec_id: Column) -> Column:
    """Deterministic sampling key: multiplicative hash of the id.
    Operands are pre-reduced mod 2^31 so the product stays under 2^62:
    a raw ``id * LCG`` overflows int64 for ids >= ~3.47e9 (silent
    wraparound on non-ANSI Spark, a hard error on DuckDB/ANSI) — and
    ((id mod m) * (LCG mod m)) mod m equals (id * LCG) mod m, so every
    key for in-range ids is byte-identical to the old formula."""
    return (
        (vec_id.cast("long") % F.lit(_TWO31)) * F.lit(_LCG % _TWO31)
    ) % F.lit(_TWO31)


def sample_key_sql(col: str) -> str:
    return (
        f"(((CAST({col} AS BIGINT) % {_TWO31}) * {_LCG % _TWO31})"
        f" % {_TWO31})"
    )


def bounded_sample(emb, k: int):
    """The k-row hash-sample of (vec_id, embedding) — a distributed
    ORDER BY hash LIMIT k (per-partition top-k, no full sort)."""
    return (
        emb.select("vec_id", "embedding")
        # a NULL vector can never be a centroid; the oracle CTE mirrors
        # this filter (round-5 NULL-injection fuzz)
        .filter(F.col("embedding").isNotNull())
        .orderBy(sample_key(F.col("vec_id")), F.col("vec_id"))
        .limit(k)
    )


def sample_cte_sql(
    k,
    id_alias: str = "cid",
    vec_alias: str = "cvec",
    table: str = "embeddings",
) -> str:
    """DuckDB mirror of bounded_sample as a CTE body. ``k`` is either an
    int literal or a SQL expression string (DuckDB accepts a scalar
    subquery in LIMIT) — the latter is how the corpus-derived knobs
    (``derived_cells_sql`` / ``derived_sqrt_sql``) mirror the Spark-side
    derivation exactly. ``table`` must name the same source the caller's
    other CTEs scan — two_level_assign_ctes_sql threads its own table
    through so centroid sampling can never silently diverge from it."""
    limit = f"({k})" if isinstance(k, str) else str(k)
    return (
        f"SELECT vec_id AS {id_alias}, embedding AS {vec_alias} FROM {table} "
        f"WHERE embedding IS NOT NULL "
        f"ORDER BY {sample_key_sql('vec_id')}, vec_id LIMIT {limit}"
    )


# ---------------------------------------------------------------------------
# corpus-derived granularity knobs
# ---------------------------------------------------------------------------
#
# A blocked operator (IVF cells, SemDeDup cells) with a FIXED block count
# goes super-linear the moment the corpus outgrows the blocks: 10x data ->
# 10x rows per block -> 10x-100x per-row work (SCALING.md measured 18-19x
# at 10x for the old fixed-32 defaults). The fix is to derive the block
# count from the corpus size — n_cells ~ N/target (constant block size,
# for quadratic-within-block ops) or ~ sqrt(N) (the IVF balance point
# between assignment O(N*k) and probe O(nprobe*N/k)) — and mirror the
# SAME derivation in the oracle SQL so the driver-registered query is the
# scale-safe one. Both engines compute ceil on an IEEE double (exact for
# counts < 2^53), so the derived k is bit-identical.

def derived_cells(n_rows: int, target_cell: int, floor: int = 32) -> int:
    """k ∝ N/target: constant expected cell size (quadratic-in-cell ops)."""
    import math

    return max(floor, math.ceil(n_rows / float(target_cell)))


def derived_cells_sql(target_cell: int, floor: int = 32, table: str = "embeddings") -> str:
    return (
        f"GREATEST({floor}, CAST(ceil(CAST((SELECT count(*) FROM {table}) AS DOUBLE)"
        f" / {float(target_cell)!r}) AS BIGINT))"
    )


def derived_sqrt(n_rows: int, floor: int = 32) -> int:
    """k ∝ sqrt(N): the IVF nlist balance point."""
    import math

    return max(floor, math.ceil(math.sqrt(float(n_rows))))


def derived_sqrt_sql(floor: int = 32, table: str = "embeddings") -> str:
    return (
        f"GREATEST({floor}, CAST(ceil(sqrt(CAST((SELECT count(*) FROM {table})"
        f" AS DOUBLE))) AS BIGINT))"
    )


# Two-level IVF derivation. A flat quantizer balances assignment
# O(N*nlist*dim) against in-cell pairs O(N*(N/nlist)*dim) at
# nlist=sqrt(N) -> total TH(N^1.5). A two-level quantizer (assign to one
# of nsup=sqrt(nlist) super-cells, then only to that super's children)
# cuts assignment to O(N*2*sqrt(nlist)*dim), so nlist can GROW past
# sqrt(N) and shrink the pair stage. The free optimum nlist=N^(2/3)
# balances all three stages at TH(N^(4/3)) — but exponent 2/3 needs
# pow(), which IEEE does NOT require correctly rounded (the oracle could
# ceil to a different integer). sqrt and * ARE correctly rounded, so we
# use the closest 5-bit binary fraction 21/32 = 0.65625 as a
# sqrt/multiply chain — bit-identical in any IEEE-754 engine:
#   N^(21/32) = (N^(1/2) * N^(1/8)) * N^(1/32),  association fixed.
# Stages then cost N^(1+21/64)=N^1.33 (assign) and N^(2-21/32)=N^1.34
# (pairs) — vs the flat N^1.5. The cap bounds the driver-side centroid
# collect (2^20 rows x dim doubles = 512 MB broadcast at the cap — the
# named ceiling; beyond it a third quantizer level is the next cut).

def derived_two_level(n_rows: int, floor: int = 32, cap: int = 1 << 20) -> tuple[int, int]:
    """(nlist, nsup): nlist = clamp(ceil(N^(21/32))), nsup = max(8,
    ceil(sqrt(nlist))). Every step correctly rounded -> both engines
    ceil the same double."""
    import math

    x = float(n_rows)
    s1 = math.sqrt(x)        # N^(1/2)
    s3 = math.sqrt(math.sqrt(s1))          # N^(1/8)
    s5 = math.sqrt(math.sqrt(s3))          # N^(1/32)
    nlist = max(floor, min(cap, math.ceil((s1 * s3) * s5)))
    nsup = max(8, math.ceil(math.sqrt(float(nlist))))
    return nlist, nsup


def derived_two_level_sql(
    floor: int = 32, cap: int = 1 << 20, table: str = "embeddings"
) -> tuple[str, str]:
    """(nlist_sql, nsup_sql) mirroring derived_two_level bit-for-bit.
    The multiply association ((s1*s3)*s5) matches the Python chain."""
    n = f"CAST((SELECT count(*) FROM {table}) AS DOUBLE)"
    s1 = f"sqrt({n})"
    s3 = f"sqrt(sqrt({s1}))"
    s5 = f"sqrt(sqrt({s3}))"
    nlist = (
        f"GREATEST({floor}, LEAST({cap}, "
        f"CAST(ceil(({s1} * {s3}) * {s5}) AS BIGINT)))"
    )
    nsup = f"GREATEST(8, CAST(ceil(sqrt(CAST(({nlist}) AS DOUBLE))) AS BIGINT))"
    return nlist, nsup


def collect_centroids(emb, k: int):
    """Collect the bounded sample (exactly min(k, N) rows — constant in
    the corpus) and pack it id-sorted for the nearest-centroid UDF."""
    rows = sorted(bounded_sample(emb, k).collect(), key=lambda r: r.vec_id)
    return pack_centroids([(r.vec_id, r.embedding) for r in rows])


# Session-scoped cache of broadcast centroid packs (round 11, guide §5):
# every quantizer consumer — IVF/IVF-PQ cells, PQ sub-codebooks, k-means
# and k-medoids seeds, semantic-dedup and outlier-filter cells — collects
# the SAME deterministic hash-sample per (corpus, k), and each collect is
# a full corpus pass (distributed per-partition top-k). bounded_sample
# drops NULL embeddings itself, so the pack is invariant to the caller's
# projection or null-prefiltering: (session, corpus, k) fully identifies
# it. Values are the Broadcast objects, so the lifecycle registry's
# release hook unpersists them; each pack is O(k·dim) — never corpus-
# sized. The corpus count feeding the derived-k paths is cached the same
# way (one count job per corpus variant per session).
_CENTROID_BC_CACHE: dict[tuple, object] = caches.register_cache({})
_COUNT_CACHE: dict[tuple, int] = caches.register_cache({})


def centroids_broadcast(spark, corpus_key: str, emb, k: int):
    """Broadcast of ``collect_centroids(emb, k)``, session-cached per
    (session, corpus_key, k). See _CENTROID_BC_CACHE above."""
    key = (caches.session_key(spark), corpus_key, k)
    if key not in _CENTROID_BC_CACHE:
        _CENTROID_BC_CACHE[key] = spark.sparkContext.broadcast(
            collect_centroids(emb, k)
        )
    return _CENTROID_BC_CACHE[key]


def cached_count(spark, corpus_key: str, df, variant: str = "all") -> int:
    """``df.count()``, session-cached per (session, corpus_key, variant).
    ``variant`` names the frame's filter state (e.g. "all" vs "nonnull")
    so differently-filtered counts of one corpus never alias."""
    key = (caches.session_key(spark), corpus_key, variant)
    if key not in _COUNT_CACHE:
        _COUNT_CACHE[key] = df.count()
    return _COUNT_CACHE[key]


# ---------------------------------------------------------------------------
# Arrow-batched fast path for per-pair dot products
# ---------------------------------------------------------------------------


def _stack_valid(series: pd.Series):
    """(valid_mask, matrix-of-valid-rows) for a nullable embedding
    column: NULL vectors must propagate as SQL NULLs through every
    vector UDF (round-5 NULL-injection fuzz), never crash np.stack."""
    vals = series.to_numpy()
    mask = np.array([v is not None for v in vals], dtype=bool)
    if mask.any():
        M = np.stack(vals[mask]).astype(np.float64)
    else:
        M = np.zeros((0, 0), dtype=np.float64)
    return mask, M


def _scatter(mask, values) -> pd.Series:
    """Re-insert computed values at valid positions, None elsewhere."""
    out = [None] * len(mask)
    j = 0
    for i, ok in enumerate(mask):
        if ok:
            out[i] = values[j]
            j += 1
    return pd.Series(out, dtype=object)


def make_dot_udf():
    """pandas UDF computing the same sequential-sum dot product as dot():
    vectorized across rows with numpy, but accumulated dimension-by-
    dimension left-to-right (NOT np.dot, whose pairwise/SIMD summation
    would produce different low bits than the oracle's list_reduce).
    Used where millions of pairs flow through the dot — Spark evaluates
    nested higher-order array expressions interpreted, ~10× slower."""
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def dot_seq(a: pd.Series, b: pd.Series) -> pd.Series:
        av, bv = a.to_numpy(), b.to_numpy()
        # masks first, ONE stack under the combined mask: this is the
        # millions-of-pairs path, and stacking each side twice (once
        # per-side, again combined) doubled the batch conversion cost
        ma = np.array([v is not None for v in av], dtype=bool)
        mb = np.array([v is not None for v in bv], dtype=bool)
        mask = ma & mb
        if not mask.any():
            return pd.Series([None] * len(mask), dtype=object)
        A = np.stack(av[mask]).astype(np.float64)
        B = np.stack(bv[mask]).astype(np.float64)
        acc = np.zeros(len(A), dtype=np.float64)
        for i in range(A.shape[1]):
            acc = acc + A[:, i] * B[:, i]
        return _scatter(mask, [float(x) for x in acc])

    return dot_seq


def pack_centroids(rows):
    """Collected (id, embedding) rows -> (ids, matrix, norms) for a
    nearest-centroid broadcast. Rows must be sorted by id; norms use the
    same dimension-sequential accumulation as norm()/norm_sql."""
    rows = list(rows)
    if not rows:
        raise ValueError(
            "no centroids to pack: the sampled input is empty (or every "
            "embedding is NULL) — nearest-centroid stages need at least one"
        )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    C = np.array([r[1] for r in rows], dtype=np.float64)
    nc = np.zeros(len(C), dtype=np.float64)
    for i in range(C.shape[1]):
        nc = nc + C[:, i] * C[:, i]
    return ids, C, np.sqrt(nc)


def make_nearest_udf(bc):
    """pandas UDF: id of the max-cosine centroid for each vector, from a
    broadcast ``pack_centroids`` triple. Ties resolve to the smallest id
    (argmax takes the first maximum and centroids are id-sorted), matching
    the oracle's ORDER BY cos DESC, id. Per-dimension sequential
    accumulation — the same bits as cosine_sql — batched across rows."""
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def nearest(vec: pd.Series) -> pd.Series:
        ids_, C_, nc_ = bc.value
        mask, V_ = _stack_valid(vec)
        if len(V_) == 0:
            return pd.Series([None] * len(mask), dtype=object)
        S = np.zeros((len(V_), len(C_)), dtype=np.float64)
        nv = np.zeros(len(V_), dtype=np.float64)
        for i in range(V_.shape[1]):
            S = S + np.outer(V_[:, i], C_[:, i])
            nv = nv + V_[:, i] * V_[:, i]
        cos = S / np.outer(np.sqrt(nv), nc_)
        got = ids_[np.argmax(cos, axis=1)]
        if mask.all():
            return pd.Series(got)
        return _scatter(mask, [int(x) for x in got])

    return nearest


def two_level_assign_ctes_sql(floor: int = 32, table: str = "embeddings") -> str:
    """The shared two-level-quantizer CTE chain (cents, sups, cassign,
    s1, assign) as SQL text — the bit-exact oracle mirror of
    collect_two_level + make_two_level_nearest_udf, used by every
    cell-blocked operator's oracle (c03_knn_graph, c03_diversity_cap).
    Returned WITHOUT the leading WITH so callers append their own
    CTEs. ``assign`` maps every non-NULL-embedding vec_id to its cell
    (cid)."""
    nlist_sql, nsup_sql = derived_two_level_sql(floor, table=table)
    return f"""cents AS (
            {sample_cte_sql(nlist_sql, table=table)}
        ),
        sups AS (
            -- the super-centroid sample is a strict PREFIX of cents:
            -- same ORDER BY, smaller LIMIT (collect_two_level slices
            -- the one collected sample)
            {sample_cte_sql(nsup_sql, id_alias='sid', vec_alias='svec', table=table)}
        ),
        cassign AS (
            -- level 2: each centroid owned by its max-cosine super
            SELECT cid, cvec, sid FROM (
                SELECT c.cid, c.cvec, s.sid,
                       row_number() OVER (
                           PARTITION BY c.cid
                           ORDER BY {cosine_sql('c.cvec', 's.svec')} DESC, s.sid
                       ) AS rn
                FROM cents c, sups s
            ) WHERE rn = 1
        ),
        s1 AS (
            -- level 1: nearest NON-EMPTY super per vector (supers that
            -- win no child are dropped, exactly as collect_two_level
            -- filters them — a vector must never land in an empty cell).
            -- NULL-embedding rows get a NULL cell in the engine
            -- (make_two_level_nearest_udf) and the non-null-safe cell
            -- join drops them; mirror the exclusion here or the oracle
            -- would emit phantom rows for them
            SELECT vec_id, sid FROM (
                SELECT e.vec_id, s.sid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {cosine_sql('e.embedding', 's.svec')} DESC, s.sid
                       ) AS rn
                FROM {table} e,
                     (SELECT * FROM sups
                      WHERE sid IN (SELECT sid FROM cassign)) s
                WHERE e.embedding IS NOT NULL
            ) WHERE rn = 1
        ),
        assign AS (
            SELECT vec_id, cid FROM (
                SELECT s1.vec_id, ca.cid,
                       row_number() OVER (
                           PARTITION BY s1.vec_id
                           ORDER BY {cosine_sql('e.embedding', 'ca.cvec')} DESC, ca.cid
                       ) AS rn
                FROM s1
                JOIN {table} e ON e.vec_id = s1.vec_id
                JOIN cassign ca ON ca.sid = s1.sid
            ) WHERE rn = 1
        )"""


def collect_two_level(emb, nlist: int, nsup: int):
    """One bounded collect feeding both quantizer levels: the nlist
    sample rows arrive in sample-key order, so the first nsup of them
    ARE the super-centroid sample (the oracle's sups CTE is the same
    ORDER BY with a smaller LIMIT — a strict prefix). Children are
    assigned to their max-cosine super driver-side with the SAME
    dimension-sequential accumulation as cosine_sql (nlist x nsup
    flops — negligible), and supers that win no child are dropped from
    the level-1 search (a vector must never land in an empty cell);
    the oracle mirrors the drop with an IN (SELECT sid FROM cassign)
    filter. Returns (sup_ids, Sup, sup_norms, child_ids, C,
    child_norms, child_sup) — all id-sorted, child_sup[i] = the super
    id owning child i."""
    rows = bounded_sample(emb, nlist).collect()  # sample-key order
    sup_ids, Sup, sup_nc = pack_centroids(
        sorted(((r.vec_id, r.embedding) for r in rows[:nsup]))
    )
    child_ids, C, child_nc = pack_centroids(
        sorted(((r.vec_id, r.embedding) for r in rows))
    )
    S = np.zeros((len(C), len(Sup)), dtype=np.float64)
    for i in range(C.shape[1]):
        S = S + np.outer(C[:, i], Sup[:, i])
    cos = S / np.outer(child_nc, sup_nc)
    child_sup = sup_ids[np.argmax(cos, axis=1)]  # first max == smallest sid
    keep = np.isin(sup_ids, child_sup)
    return (
        sup_ids[keep],
        Sup[keep],
        sup_nc[keep],
        child_ids,
        C,
        child_nc,
        child_sup,
    )


def make_two_level_nearest_udf(bc):
    """pandas UDF: IVF cell id via the two-level quantizer — nearest
    (by cosine) non-empty super-cell first, then nearest child among
    that super's children only. Per batch of B rows the flop count is
    B*(nsup + E[children-per-super])*dim instead of the flat
    B*nlist*dim. Both argmaxes take the first maximum over id-sorted
    candidates, and every accumulation is dimension-sequential — the
    exact bits of the oracle's two windowed row_number() stages."""
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def nearest2(vec: pd.Series) -> pd.Series:
        sup_ids, Sup, sup_nc, child_ids, C, child_nc, child_sup = bc.value
        mask, V_ = _stack_valid(vec)
        if len(V_) == 0:
            return pd.Series([None] * len(mask), dtype=object)
        S = np.zeros((len(V_), len(Sup)), dtype=np.float64)
        nv = np.zeros(len(V_), dtype=np.float64)
        for i in range(V_.shape[1]):
            S = S + np.outer(V_[:, i], Sup[:, i])
            nv = nv + V_[:, i] * V_[:, i]
        rt = np.sqrt(nv)
        win = np.argmax(S / np.outer(rt, sup_nc), axis=1)
        out = np.empty(len(V_), dtype=np.int64)
        for sidx in np.unique(win):
            rows_ = np.where(win == sidx)[0]
            kids = np.where(child_sup == sup_ids[sidx])[0]  # id-sorted
            S2 = np.zeros((len(rows_), len(kids)), dtype=np.float64)
            for i in range(V_.shape[1]):
                S2 = S2 + np.outer(V_[rows_, i], C[kids, i])
            cos2 = S2 / np.outer(rt[rows_], child_nc[kids])
            out[rows_] = child_ids[kids[np.argmax(cos2, axis=1)]]
        if mask.all():
            return pd.Series(out)
        return _scatter(mask, [int(x) for x in out])

    return nearest2


def make_bucket_udf(n_planes: int = N_PLANES):
    """pandas UDF mirror of lsh_bucket(): per-plane sequential-sum dots
    (dimension-by-dimension, same bits as the Column/SQL builders), sign
    bits packed into the bucket id. The Column version unrolls to a
    512-term expression tree that Spark can't codegen efficiently; this
    is the same arithmetic, Arrow-batched."""
    from pyspark.sql.types import IntegerType

    planes = np.array(
        [[plane_component(j, i) for i in range(DIM)] for j in range(n_planes)],
        dtype=np.float64,
    )

    @F.pandas_udf(IntegerType())
    def bucket(vec: pd.Series) -> pd.Series:
        mask, V_ = _stack_valid(vec)
        if len(V_) == 0:
            # all-NULL batch: bucket 0 everywhere, like the twins
            return pd.Series(np.zeros(len(mask), dtype=np.int32))
        out = np.zeros(len(V_), dtype=np.int64)
        for j in range(n_planes):
            acc = np.zeros(len(V_), dtype=np.float64)
            for i in range(DIM):
                acc = acc + V_[:, i] * planes[j, i]
            out = out + (acc > 0).astype(np.int64) * (1 << j)
        if mask.all():
            return pd.Series(out.astype(np.int32))
        # NULL vectors bucket to 0, like the Column/SQL twins (their
        # CASE WHEN NULL > 0 falls to ELSE 0 on every plane) — the
        # three builders are documented as exact mirrors
        res = np.zeros(len(mask), dtype=np.int64)
        res[mask] = out
        return pd.Series(res.astype(np.int32))

    return bucket


def make_pq_assign_udf(bc, n_sub: int):
    """pandas UDF: product-quantization codes for each vector from a
    broadcast (ids, matrix) sub-codebook pair. Each of ``n_sub``
    subspaces is assigned to its nearest sub-codebook entry by L2, with
    the (rows × centroids) distance block accumulated dimension-
    SEQUENTIALLY so the oracle's per-centroid fold reproduces the exact
    distances; np.argmin takes the first minimum and centroids are
    id-sorted, matching ORDER BY dist, cid."""
    from pyspark.sql.types import ArrayType, LongType

    @F.pandas_udf(ArrayType(LongType()))
    def pq_assign(vec: pd.Series) -> pd.Series:
        # accepts both the (ids, matrix) pair and the full
        # pack_centroids triple (norms unused by L2 assignment), so PQ
        # sites can share the session-cached centroid broadcast
        cids_l, C_l = bc.value[0], bc.value[1]
        mask, X = _stack_valid(vec)
        if len(X) == 0:
            return pd.Series([None] * len(mask), dtype=object)
        dim_per = C_l.shape[1] // n_sub
        codes = np.empty((len(X), n_sub), dtype=np.int64)
        for s in range(n_sub):
            D = np.zeros((len(X), len(cids_l)), dtype=np.float64)
            for j in range(dim_per):
                diff = X[:, s * dim_per + j, None] - C_l[None, :, s * dim_per + j]
                D = D + diff * diff
            codes[:, s] = cids_l[np.argmin(D, axis=1)]
        if mask.all():
            return pd.Series(list(codes))
        return _scatter(mask, [list(map(int, c)) for c in codes])

    return pq_assign


def make_assign_udf(bc):
    """pandas UDF: (cluster id, winning cosine) of the max-cosine
    centroid per vector — make_nearest_udf plus the assignment QUALITY,
    for operators that score the clustering (inertia/SSE) rather than
    just label members. Same bits as the oracle: dimension-sequential
    accumulation, dot/(sqrt(nv)*nc) grouping, first-maximum tie-break
    over id-sorted centroids."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_t = StructType(
        [StructField("cluster", LongType()), StructField("cos", DoubleType())]
    )

    @F.pandas_udf(out_t)
    def assign(vec: pd.Series) -> pd.DataFrame:
        ids_, C_, nc_ = bc.value
        mask, V_ = _stack_valid(vec)
        if len(V_) == 0:
            return pd.DataFrame(
                {"cluster": [None] * len(mask), "cos": [None] * len(mask)}
            )
        S = np.zeros((len(V_), len(C_)), dtype=np.float64)
        nv = np.zeros(len(V_), dtype=np.float64)
        for i in range(V_.shape[1]):
            S = S + np.outer(V_[:, i], C_[:, i])
            nv = nv + V_[:, i] * V_[:, i]
        cos = S / np.outer(np.sqrt(nv), nc_)
        idx = np.argmax(cos, axis=1)
        if mask.all():
            return pd.DataFrame(
                {"cluster": ids_[idx], "cos": cos[np.arange(len(V_)), idx]}
            )
        return pd.DataFrame(
            {
                "cluster": _scatter(mask, [int(i) for i in ids_[idx]]),
                "cos": _scatter(
                    mask, [float(c) for c in cos[np.arange(len(V_)), idx]]
                ),
            }
        )

    return assign
