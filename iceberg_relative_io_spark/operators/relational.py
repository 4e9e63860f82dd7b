"""Relational operator surface (SURVEY.md §2.B, B1–B27 + B32).

The reference delegates this entire surface to Spark SQL + Iceberg
(reference pom.xml:17-26, README.md:14-18); here it is implemented
natively with the DataFrame API so Catalyst owns pushdown, pruning, join
selection and codegen. Every query has a DuckDB oracle twin in ``ORACLE``.

Cross-engine determinism rules used throughout (and mirrored in the SQL):

- **Sums of doubles are computed exactly.** Each term is cast to
  ``DECIMAL(28,4)`` (or wider) before SUM, so the result is independent of
  partial-aggregation order; the final value is cast back to DOUBLE, which
  is correctly rounded in both engines. A plain double SUM would differ in
  the last ulp between Spark's tree aggregation and DuckDB's sequential
  scan and break the driver's value hash.
- **Averages / ratios** are ``round(exact_sum::double / count, 6)``.
- **Window row numbering** always carries a unique tiebreak column.
- **events.ts** is nanos in parquet; loaders truncate to µs exactly like
  DuckDB's ``CAST(ts AS TIMESTAMP)`` (see sources/tables.py); timestamps
  that appear in outputs are emitted as ``unix_micros`` BIGINT when they
  came from the events table.

Scale notes (100 TB design intent) are in each query's docstring.
"""

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_relative_io_spark.sources.tables import fan_out, load_table

# exact-sum helper: decimal-typed term so SUM is order-independent
def _dec(col, scale: int = 4):
    return col.cast(f"decimal(28,{scale})")


def _dsum(col, scale: int = 4):
    """Order-independent SUM of a double expression, returned as double."""
    return F.sum(_dec(col, scale)).cast("double")


# ---------------------------------------------------------------------------
# B1/B4/B5/B6 — scan, full select, projection, filter
# ---------------------------------------------------------------------------

def q_csv_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 (source breadth): CSV with an explicit schema (never inferSchema
    in production — one extra full pass). Round-trips the nation dim
    through CSV; the oracle reads the original table."""
    import tempfile

    nation = load_table(spark, sf_dir, "nation")
    path = tempfile.mkdtemp(prefix="csv_src_")
    nation.write.mode("overwrite").option("header", True).csv(path)
    return spark.read.schema(nation.schema).option("header", True).csv(path)


def q_json_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 (source breadth): JSON-lines with an explicit schema."""
    import tempfile

    region = load_table(spark, sf_dir, "region")
    path = tempfile.mkdtemp(prefix="json_src_")
    region.write.mode("overwrite").json(path)
    return spark.read.schema(region.schema).json(path)


def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 (source breadth): ORC — Spark's other first-class columnar
    format; same pushdown/pruning machinery as parquet."""
    import tempfile

    sup = load_table(spark, sf_dir, "supplier")
    path = tempfile.mkdtemp(prefix="orc_src_")
    sup.write.mode("overwrite").orc(path)
    return spark.read.schema(sup.schema).orc(path)


def q_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: parquet scan. count(*) compiles to a metadata-only parquet scan
    (no column materialization); at 100 TB this reads only footers."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count("*").alias("n_rows"))


def q_select_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: full-table SELECT * (on the small region dim)."""
    return load_table(spark, sf_dir, "region")


def q_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: column pruning — ReadSchema in the scan node must contain only
    these three columns (verified in tests via explain)."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: predicate pushdown — both conjuncts reach the parquet reader as
    PushedFilters; at scale this prunes row groups via min/max stats."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_quantity") > F.lit(30.0))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")


# ---------------------------------------------------------------------------
# B7–B11 — joins
# ---------------------------------------------------------------------------

def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: equi inner join orders⋈customer. customer ≪ orders so Catalyst
    (with AQE) picks a broadcast hash join — no shuffle of the fact side."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "inner")
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
    )


def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 (left outer): per-customer order stats keeping order-less
    customers. Aggregate-then-join keeps the shuffle on the pre-aggregated
    (smaller) side at scale."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("cnt"), _dsum(F.col("o_totalprice")).alias("ssum")
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders"),
            F.round(F.coalesce(F.col("ssum"), F.lit(0.0)), 4).alias("total_spent"),
        )
    )


def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 (right outer): per-nation supplier stats keeping supplier-less
    nations — the right-outer mirror of q_join_left (aggregate first so
    the preserved side streams)."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    per_nation = supp.groupBy("s_nationkey").agg(
        F.count("*").alias("cnt"), _dsum(F.col("s_acctbal")).alias("bsum")
    )
    return (
        per_nation.join(nation, per_nation.s_nationkey == nation.n_nationkey, "right")
        .select(
            "n_nationkey",
            "n_name",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("n_suppliers"),
            F.round(F.coalesce(F.col("bsum"), F.lit(0.0)), 4).alias("total_bal"),
        )
    )


def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 (full outer): nations seen from the supplier side vs the customer
    side; only ~10 suppliers exist so many nation keys appear on one side
    only — genuine outer-null coverage."""
    sup = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_suppliers"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
    )
    return (
        sup.join(cust, sup.s_nationkey == cust.c_nationkey, "outer")
        .select(
            F.coalesce(F.col("s_nationkey"), F.col("c_nationkey")).alias("nationkey"),
            F.coalesce(F.col("n_suppliers"), F.lit(0)).alias("n_suppliers"),
            F.coalesce(F.col("n_customers"), F.lit(0)).alias("n_customers"),
        )
    )


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9: left-semi (EXISTS) — customers having at least one 'F' order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9: left-anti (NOT EXISTS) — customers with no orders at all."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def q_star_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10 + B13: the flagship star join. Fact lineitem joins orders then
    the small dims customer/nation/region, all explicitly broadcast: at
    100 TB the fact table never shuffles for the dim joins; only the
    final groupBy shuffles (25 nation keys, tiny)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11: theta/range join — bucket lineitem quantities into tiers via a
    non-equi predicate. The tier table is tiny, so Spark broadcasts it and
    the 'range join' is a broadcast nested-loop over 4 rows — the right
    physical plan at any scale."""
    tiers = spark.createDataFrame(
        [(0.0, 10.0, "t0_small"), (10.0, 25.0, "t1_mid"), (25.0, 40.0, "t2_large"), (40.0, 1e9, "t3_huge")],
        "lo double, hi double, tier string",
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(tiers), (li.l_quantity >= tiers.lo) & (li.l_quantity < tiers.hi))
        .groupBy("tier")
        .agg(F.count("*").alias("n_items"), _dsum(F.col("l_quantity"), 2).alias("sum_qty"))
    )


def q_bucketed_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11 (two large sides): purchases x clicks within a 1-hour lookback,
    as a *bucketized* range join — both sides bucket their timestamps
    into hour cells, the probe side explodes into the two cells its
    interval can touch, and the join is a plain equi-join on
    (user, bucket) + an exact refine filter. This is how a range join
    between two 100 TB streams stays a hash join instead of a
    nested-loop; the oracle states the naive theta join."""
    ev = load_table(spark, sf_dir, "events")
    hour_us = 3_600_000_000
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.unix_micros("ts").alias("p_us"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.unix_micros("ts").alias("c_us"),
        (F.unix_micros("ts") / hour_us).cast("long").alias("bucket"),
    )
    # a 1h-lookback interval [p-1h, p] spans at most 2 hour cells
    probe = purch.select(
        "p_id",
        "p_user",
        "p_us",
        F.explode(
            F.array(
                (F.col("p_us") / hour_us).cast("long"),
                (F.col("p_us") / hour_us).cast("long") - 1,
            )
        ).alias("bucket"),
    )
    joined = probe.join(
        clicks, (probe.p_user == clicks.c_user) & (probe.bucket == clicks.bucket)
    ).filter((F.col("c_us") <= F.col("p_us")) & (F.col("c_us") >= F.col("p_us") - hour_us))
    return joined.groupBy("p_id").agg(
        F.count("*").alias("n_recent_clicks"), F.max("c_us").alias("last_click_us")
    )


def q_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13 (exact quantiles): per-group median by rank arithmetic — picks
    the actual middle data value(s), so the result is deterministic and
    oracle-exact (the built-in percentile interpolation paths are not
    guaranteed bit-equal across engines)."""
    li = fan_out(
        load_table(spark, sf_dir, "lineitem"), "l_orderkey"
    ).select("l_returnflag", "l_quantity")
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    ranked = li.select(
        "l_returnflag",
        "l_quantity",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("l_returnflag")).alias("n"),
    )
    mid = ranked.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.ceil((F.col("n") + 1) / 2))
    )
    return mid.groupBy("l_returnflag").agg(
        F.round(F.sum(_dec(F.col("l_quantity"), 2)).cast("double") / F.count("*"), 6).alias(
            "median_qty"
        )
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12: as-of join — for every purchase event, the most recent click by
    the same user at or before the purchase time.

    Spark has no native ASOF; the scalable formulation is the union+window
    trick: tag both streams, sort within user by (ts, tag) and carry the
    last click timestamp forward with last_value(ignoreNulls). One shuffle
    on user_id, no pairwise blow-up — at 100 TB this beats any
    inequality-join formulation. Oracle uses DuckDB's native ASOF JOIN.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"),
        "ts",
        "user_id",
        F.lit(None).cast("double").alias("value"),
        F.col("ts").alias("click_ts"),
        F.lit(0).alias("tag"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "ts",
        "user_id",
        "value",
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(1).alias("tag"),
    )
    merged = clicks.unionByName(purch)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # SQL ASOF semantics: a NULL join key matches NOTHING (the window
    # partition would otherwise group all NULL users together and match
    # their clicks) — mask the carry for the NULL partition, keeping
    # the purchase row itself, exactly like DuckDB's native ASOF JOIN
    carried = F.last("click_ts", ignorenulls=True).over(w)
    last_click = F.when(
        F.col("user_id").isNull(), F.lit(None).cast("timestamp")
    ).otherwise(carried)
    return (
        merged.withColumn("last_click_ts", last_click)
        .filter(F.col("tag") == 1)
        .select(
            "event_id",
            "user_id",
            F.unix_micros(F.col("ts")).alias("purchase_ts_us"),
            F.unix_micros(F.col("last_click_ts")).alias("click_ts_us"),
            "value",
        )
    )


# ---------------------------------------------------------------------------
# B13–B16 — aggregation
# ---------------------------------------------------------------------------

def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13: hash aggregation — the TPC-H Q1 pricing summary. Partial
    (map-side) aggregation collapses 100 TB of fact rows into 6 groups
    before the shuffle; decimal terms keep the sums exact."""
    li = fan_out(load_table(spark, sf_dir, "lineitem"), "l_orderkey").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    out = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), 2).alias("sum_qty"),
            _dsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            F.sum(_dec(disc_price, 6)).cast("double").alias("sum_disc_price"),
            F.sum(_dec(charge, 8)).cast("double").alias("sum_charge"),
            F.count("*").alias("count_order"),
            F.sum(_dec(F.col("l_quantity"), 2)).alias("_sq"),
            F.sum(_dec(F.col("l_extendedprice"), 2)).alias("_sp"),
            F.sum(_dec(F.col("l_discount"), 4)).alias("_sd"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            F.round(F.col("_sq").cast("double") / F.col("count_order"), 6).alias("avg_qty"),
            F.round(F.col("_sp").cast("double") / F.col("count_order"), 6).alias("avg_price"),
            F.round(F.col("_sd").cast("double") / F.col("count_order"), 6).alias("avg_disc"),
            "count_order",
        )
    )
    return out


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13 (skew handling): two-stage salted aggregation. Each hot key is
    split across 16 salt buckets for the first (wide) aggregation, then
    the salts are merged in a second, tiny aggregation — the classic fix
    when one key owns a disproportionate share of a 100 TB table and AQE
    skew-split alone can't save the agg. Decimal sums make the two-stage
    result bit-equal to the direct aggregation, which is what the oracle
    computes."""
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn("_salt", F.pmod(F.col("l_orderkey"), F.lit(16)))
    partial = salted.groupBy("l_returnflag", "_salt").agg(
        F.count("*").alias("pc"), F.sum(_dec(F.col("l_quantity"), 2)).alias("ps")
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pc").alias("n_items"),
        F.sum("ps").cast("double").alias("sum_qty"),
    )


def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7 (skew handling, join form): salted shuffle join. The build side
    is replicated once per salt bucket and the probe side is salted with a
    deterministic hash, so a hot join key spreads over SALT reducers
    instead of melting one. This is the manual fix for skew that AQE's
    skew-join split can't reach (e.g. when the skewed key is produced by
    an upstream stage AQE can't re-split). The salt never leaves the
    plan — the oracle is the plain join+agg, so the rewrite is proved
    result-identical. At 100 TB: SALT multiplies build-side shuffle volume
    (keep the replicated side the small one) and removes the straggler
    reducer, which dominates wall-clock under skew."""
    SALT = 8
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    salts = spark.range(SALT).select(F.col("id").cast("int").alias("_salt"))
    part_rep = part.crossJoin(F.broadcast(salts))
    probe = li.select(
        "l_partkey",
        "l_quantity",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(SALT))
        .cast("int")
        .alias("_salt"),
    )
    # hint SHUFFLE_HASH so this demonstrates the salted *shuffle* join
    # (without it Catalyst would just broadcast `part` here)
    joined = probe.hint("SHUFFLE_HASH").join(
        part_rep,
        on=(probe["l_partkey"] == part_rep["p_partkey"])
        & (probe["_salt"] == part_rep["_salt"]),
        how="inner",
    )
    return (
        joined.groupBy("p_brand")
        .agg(F.count("*").alias("n_items"), _dsum(F.col("l_quantity"), 2).alias("sum_qty"))
    )


# count-min-sketch geometry: d independent affine hash rows × W buckets.
# Small W keeps the fixture's collision behavior visible; production sizing
# is W = e/eps buckets for an eps·N overcount bound.
_CMS_D = 4
_CMS_W = 512
_CMS_MOD = 2_147_483_647


def _cms_params() -> list[tuple[int, int]]:
    from iceberg_relative_io_spark.functions.text import hash_params

    return [hash_params(j) for j in range(_CMS_D)]


def q_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15 (exact sibling of the quantile sketch): per-returnflag exact
    median and p95 via full-sort percentile — the ground-truth pass a
    pipeline runs (typically on a sample) to validate its sketches. Both
    engines use linear interpolation on float64 rank neighbours, and the
    interpolation arithmetic is IEEE-exact, so the oracle matches
    bit-for-bit (verified on this fixture). At 100 TB the approx variant
    above is the production path (bounded memory); this one costs a
    per-group sort."""
    li = fan_out(load_table(spark, sf_dir, "lineitem"), "l_orderkey")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("median_price"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95_price"),
        F.count("*").alias("n_rows"),
    )


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15 (frequency sketch): count-min-sketch heavy hitters over
    lineitem.l_partkey. The sketch is a d×W integer table built by one
    hash aggregation over (row, bucket) pairs — fixed O(d·W) state
    regardless of input size, mergeable by addition, so at 100 TB the
    partial sketches combine map-side exactly like any partial agg. Each
    candidate key's estimate is min over rows of its bucket count (the
    classic CMS upper bound: est >= true, overcount bounded by collisions).
    Integer-only hashing makes the whole pipeline — sketch, estimates,
    top-10 ranking — bit-identical in DuckDB, so even this sketch query
    carries an exact oracle."""
    params = _cms_params()
    # NO fan_out here (round-11 A/B: 0.76s plain vs 1.14s fanned): the
    # key-count groupBy does its own shuffle with map-side partials, and
    # the partial stage is a cheap count — the extra orderkey-keyed
    # exchange of the projected key column is pure cost
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("key")
    )
    # Collapse the fact volume to exact per-key counts FIRST (one hash agg
    # with map-side partials), then build the sketch from the distinct-key
    # table: sketch cell = sum of counts of the keys hashing there —
    # identical to counting exploded rows, but the d-way explosion runs
    # over |distinct keys| rows instead of the full scan. At 100 TB the
    # explode-then-count plan multiplies scan volume by d; this one pays
    # one ordinary shuffle.
    key_counts = li.groupBy("key").agg(F.count("*").alias("kc"))
    key_buckets = key_counts.select(
        "key",
        "kc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        ((F.col("key") * a + b) % _CMS_MOD % _CMS_W).alias("bucket"),
                    )
                    for j, (a, b) in enumerate(params)
                ]
            )
        ).alias("h"),
    ).select("key", "kc", "h.j", "h.bucket")
    cms = key_buckets.groupBy("j", "bucket").agg(F.sum("kc").alias("cnt"))
    est = (
        key_buckets.join(cms, ["j", "bucket"])
        .groupBy("key")
        .agg(
            F.min("cnt").alias("est_cnt"),
            # each key carries its exact count on every one of its d rows
            F.min("kc").alias("true_cnt"),
        )
    )
    w = Window.orderBy(F.col("est_cnt").desc(), F.col("key"))
    return (
        est.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select(
            "rnk",
            "key",
            "est_cnt",
            "true_cnt",
            (F.col("est_cnt") >= F.col("true_cnt")).cast("int").alias("cms_upper_bound_ok"),
        )
    )


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13+B24 composite: weekly retention cohorts over the event stream —
    of the users active in week W, how many return in week W+1. The
    warehouse shape: distinct (user, week) pairs first (one hash agg
    collapses the event volume), then a self-join on user across adjacent
    weeks. At 100 TB the distinct pairs table is orders of magnitude
    smaller than the events, and the self-join shuffles only it."""
    ev = load_table(spark, sf_dir, "events")
    ua = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    nxt = ua.select(
        F.col("user_id").alias("n_user"),
        (F.col("week") - F.expr("INTERVAL 7 DAYS")).alias("prev_week"),
    )
    joined = ua.join(
        nxt,
        (ua["user_id"] == nxt["n_user"]) & (ua["week"] == nxt["prev_week"]),
        "left",
    )
    return (
        joined.groupBy(F.date_format("week", "yyyy-MM-dd").alias("week"))
        .agg(
            F.countDistinct("user_id").alias("n_active"),
            F.countDistinct("n_user").alias("n_retained"),
        )
        .withColumn(
            "retention",
            F.round(F.col("n_retained").cast("double") / F.col("n_active"), 6),
        )
    )


def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in one quarter having at least one
    deep-discount lineitem, counted per priority (the fixture lineitem is
    slimmed — no commit/receipt dates — so the EXISTS predicate is a
    discount threshold; the plan shape is identical). The EXISTS compiles
    to a left-semi join: the probe side is pre-filtered to one quarter
    before the shuffle, and only distinct orderkeys flow from lineitem."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    deep = load_table(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.08)
    return (
        orders.join(deep, orders["o_orderkey"] == deep["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per return flag, split lineitems by order-priority
    class with conditional sums — the case-sum pattern that partial
    aggregation collapses map-side (shipmode is absent from the slimmed
    fixture; returnflag plays its grouping role)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    return j.groupBy("l_returnflag").agg(
        F.sum(high).alias("high_line_count"),
        F.sum(1 - high).alias("low_line_count"),
    )


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: revenue share of one part class for one month — a
    broadcast join (part is dim-sized) and a ratio of two conditional
    decimal sums ('ECONOMY' stands in for the fixture's missing PROMO%
    types)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    rev = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    promo = F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0))
    return j.agg(
        F.sum(rev).cast("double").alias("total_revenue"),
        F.sum(promo).cast("double").alias("promo_revenue"),
        F.round(
            F.sum(promo).cast("double") * 100.0 / F.sum(rev).cast("double"), 6
        ).alias("promo_pct"),
    )


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling: per-column null rate / distinct count / min / max /
    mean for lineitem's numeric core — the one-pass table profile a
    warehouse job publishes after each load. All aggregates ride one scan
    (Spark computes them in a single hash-agg stage); at 100 TB distinct
    counts would switch to approx_count_distinct, here exact so the
    oracle is exact."""
    li = fan_out(load_table(spark, sf_dir, "lineitem"), "l_orderkey")
    cols = ("l_quantity", "l_extendedprice", "l_discount")
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}"),
            F.round(F.min(c), 4).alias(f"min_{c}"),
            F.round(F.max(c), 4).alias(f"max_{c}"),
            F.sum(_dec(F.col(c), 4)).alias(f"sum_{c}"),
        ]
    # Round-11 (guide §2.3 — shuffle fewer bytes): the plain measures
    # ride ONE scan/agg (map-side partials -> one row), but the three
    # exact countDistincts are pulled OUT of it. Fused, Catalyst plans
    # multi-column distincts via Expand: every row duplicated 4x, and
    # the first-stage hash agg keyed by (q, p, d, gid) — i.e. ~every
    # row a distinct group DRAGGING all 13 plain-agg buffers — then a
    # ~|rows|-size wide shuffle (measured 3.5s at sf0.1; this is also
    # the shape that explodes at 100 TB). Split, each distinct is a
    # column-pruned scan + per-value partial distinct, shuffling only
    # |distinct values| narrow rows; the four 1-row frames recombine by
    # broadcast cross join. Same exact values (at 100 TB the profile
    # job swaps exact distincts for approx_count_distinct entirely).
    wide = li.agg(*aggs)
    for c in cols:
        wide = wide.crossJoin(li.agg(F.countDistinct(c).alias(f"dist_{c}")))
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("n_rows").alias("n_rows"),
            F.col(f"null_{c}").alias("n_null"),
            F.col(f"dist_{c}").alias("n_distinct"),
            F.col(f"min_{c}").alias("min_val"),
            F.col(f"max_{c}").alias("max_val"),
            F.round(F.col(f"sum_{c}").cast("double") / F.col("n_rows"), 6).alias(
                "mean_val"
            ),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")


def q_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: referential integrity (lineitem→orders,
    orders→customer), duplicate-key and null-key checks — the validation
    suite a pipeline runs before publishing a snapshot. Each check is an
    anti-join or keyed aggregate; at 100 TB the anti-joins broadcast the
    key sets of the smaller side or shuffle on the key, never more."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    orphan_li = li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left_anti")
    orphan_ord = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"], "left_anti"
    )
    dup_keys = (
        orders.groupBy("o_orderkey").count().filter(F.col("count") > 1)
    )
    null_keys = orders.filter(F.col("o_custkey").isNull())
    return (
        orphan_li.agg(F.count("*").alias("orphan_lineitems"))
        .crossJoin(orphan_ord.agg(F.count("*").alias("orphan_orders")))
        .crossJoin(dup_keys.agg(F.count("*").alias("duplicate_orderkeys")))
        .crossJoin(null_keys.agg(F.count("*").alias("null_custkeys")))
    )


def q_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13+B24 composite: ordered conversion funnel view → click →
    purchase. Each stage is a per-user MIN over only the events after the
    previous stage's timestamp — three tiny per-user aggregates chained by
    joins, never a window over the raw event stream. At 100 TB each stage
    input is pre-filtered by event type (a fraction of the log) and the
    join keys are user ids, so every shuffle carries per-user rows, not
    events."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(c.agg(F.count("*").alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased_after_click")))
    )


_SEARCH_TERMS = ("scan", "filter")


def q_boolean_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 (keyword search): conjunctive boolean retrieval over an inverted
    index — posting lists per term, AND-intersected, ranked by summed term
    frequency. The index shape (term → postings) is what a 100 TB corpus
    search builds once and shares across queries; the intersection
    shuffles only the two posting lists, never documents."""
    docs = load_table(spark, sf_dir, "documents")
    postings = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term").isin(*_SEARCH_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    hits = (
        postings.groupBy("doc_id")
        .agg(
            F.countDistinct("term").alias("n_terms"),
            F.sum("tf").alias("score"),
        )
        .filter(F.col("n_terms") == len(_SEARCH_TERMS))
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        hits.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select("rnk", "doc_id", "score")
    )


def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14: exact distinct (pair of low-cardinality customer columns)."""
    return load_table(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15: HyperLogLog approx_count_distinct. Sketch values are engine-
    specific, so the oracle checks the *contract*: the exact count plus a
    flag that the sketch landed within 5% (rsd=0.01 ⇒ far tighter in
    practice). At 100 TB the sketch is the only affordable distinct."""
    li = load_table(spark, sf_dir, "lineitem")
    # computed as two separate single-row aggregates + cross join: mixing
    # a distinct agg with the HLL sketch in one agg triggers the Expand
    # rewrite (row duplication) and costs ~3× more than the two passes
    exact = li.agg(F.countDistinct("l_orderkey").alias("exact_cnt"))
    approx = li.agg(F.approx_count_distinct("l_orderkey", 0.02).alias("_approx"))
    return exact.crossJoin(approx).select(
        "exact_cnt",
        (F.abs(F.col("_approx") - F.col("exact_cnt")) <= 0.05 * F.col("exact_cnt"))
        .cast("int")
        .alias("approx_within_5pct"),
    )


def q_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15 (quantile sketch): percentile_approx (KLL-style) medians per
    return flag. Sketch outputs are engine-specific, so — like the HLL
    check above — the oracle checks the contract: the sketch's median
    must sit at the true CDF midpoint (exact rank-count validation inside
    Spark), and the emitted columns are the integer-exact group sizes
    plus the pass flag. At 100 TB the sketch aggregates in one pass with
    bounded memory; the exact rank check here is the test harness, not
    the production path."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("q50"),
        F.count("*").alias("n_rows"),
    )
    below = (
        li.join(q.select("l_returnflag", "q50"), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.sum((F.col("l_extendedprice") <= F.col("q50")).cast("long")).alias("n_le")
        )
    )
    return (
        q.join(below, "l_returnflag")
        .select(
            "l_returnflag",
            "n_rows",
            # the sketch's median must split the group 45/55 or tighter
            (
                F.abs(F.col("n_le").cast("double") / F.col("n_rows") - 0.5) <= 0.05
            ).cast("int").alias("median_within_5pct"),
        )
    )


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16: ROLLUP over (status, priority); grouping-set NULLs are coalesced
    to a sentinel so they are unambiguous in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    # Pre-aggregate on the full key so Expand (3 grouping sets) multiplies
    # ~15 pre-aggregated rows, not the fact scan — see q_cube.
    pre = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("_n"), F.sum(_dec(F.col("o_totalprice"))).alias("_s")
    )
    return (
        pre.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.sum("_n").alias("n_orders"), F.sum("_s").cast("double").alias("sum_price"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("(all)")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("(all)")).alias("priority"),
            "n_orders",
            F.round(F.col("sum_price"), 4).alias("sum_price"),
        )
    )


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16: CUBE over (returnflag, linestatus).

    Pre-aggregates on the FULL grouping key first (count/sum are
    decomposable), so Expand — which multiplies its input by the number
    of grouping sets (4x here) — runs over the ~6 pre-aggregated rows
    instead of the whole fact table. At 100 TB the naive plan quadruples
    the scan volume through Expand; this one pays a single ordinary
    partial-aggregated shuffle and the cube itself is free."""
    li = load_table(spark, sf_dir, "lineitem")
    pre = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("_n"), F.sum(_dec(F.col("l_quantity"), 2)).alias("_q")
    )
    return (
        pre.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum("_n").alias("n_items"),
            F.sum("_q").cast("double").alias("sum_qty"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("(all)")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("(all)")).alias("linestatus"),
            "n_items",
            "sum_qty",
        )
    )


# ---------------------------------------------------------------------------
# B17–B19 — window functions
# ---------------------------------------------------------------------------

def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16: explicit GROUPING SETS via the SQL surface — (status),
    (priority), and grand total, with grouping-set NULLs coalesced."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, '(all)') AS status,
               COALESCE(o_orderpriority, '(all)') AS priority,
               count(*) AS n_orders
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16 (pivot): order counts per priority pivoted by status. Pivot
    values are enumerated so the output schema is static — required for
    a deterministic plan (and for any engine at scale)."""
    orders = load_table(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    return out.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("F").alias("n_f"),
        F.col("O").alias("n_o"),
        F.col("P").alias("n_p"),
    )


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16 (unpivot/melt): wide part metrics to long (metric, value)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    ).unpivot("p_partkey", ["size", "retailprice"], "metric", "value")


def q_correlated_agg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13 (TPC-H Q17 pattern): lineitems below 20% of their part's average
    quantity. Written decorrelated (aggregate-then-join) — the plan
    Catalyst's subquery decorrelation produces anyway — and with the
    threshold computed from an exact decimal sum so both engines compare
    against the identical double."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        (0.2 * (F.sum(_dec(F.col("l_quantity"), 2)).cast("double") / F.count("*"))).alias(
            "qty_threshold"
        )
    )
    return (
        li.join(per_part, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_below"),
            _dsum(F.col("l_extendedprice"), 2).alias("sum_price"),
        )
    )


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B17: ranking — top-3 customers by balance per nation. row_number
    carries a unique tiebreak; rank/dense_rank rank on balance alone."""
    cust = load_table(spark, sf_dir, "customer")
    by_bal = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    by_bal_only = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return (
        cust.select(
            "c_nationkey",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.row_number().over(by_bal).alias("rn"),
            F.rank().over(by_bal_only).alias("rnk"),
            F.dense_rank().over(by_bal_only).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18: analytic lag/lead over each user's event timeline."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_value"),
    )


def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19: aggregate frames — running total and 3-row sliding average of
    each customer's order history. Sums go through decimal for exactness."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sliding = w.rowsBetween(-2, Window.currentRow)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum(_dec(F.col("o_totalprice"))).over(running).cast("double").alias("running_total"),
        F.round(
            F.sum(_dec(F.col("o_totalprice"))).over(sliding).cast("double")
            / F.count("*").over(sliding),
            6,
        ).alias("sliding_avg3"),
    )


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19 (RANGE frame): per-customer trailing-30-day spend — the frame
    is value-based (days), not row-based, so gaps in order history are
    handled correctly."""
    orders = load_table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days)
        .rangeBetween(-30, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        days.alias("day_no"),
        F.sum(_dec(F.col("o_totalprice"))).over(w).cast("double").alias("trailing_30d_spend"),
        F.count("*").over(w).alias("trailing_30d_orders"),
    )


def q_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13 (statistics): mean/variance/stddev/covariance/correlation per
    return flag, from explicit decimal-exact moment sums — not the
    built-in stddev/corr aggregates, whose streaming (Welford-style)
    update order differs between engines at the ulp level. Same math,
    deterministic bits."""
    # fan_out: six decimal partial sums single-task measured 2.0s vs 0.7s
    li = fan_out(load_table(spark, sf_dir, "lineitem"), "l_orderkey")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(_dec(q, 2)).cast("double").alias("sq"),
        F.sum(_dec(p, 2)).cast("double").alias("sp"),
        F.sum(_dec(q * q, 4)).cast("double").alias("sqq"),
        F.sum(_dec(p * p, 4)).cast("double").alias("spp"),
        F.sum(_dec(q * p, 4)).cast("double").alias("sqp"),
    )
    mq = F.col("sq") / F.col("n")
    mp = F.col("sp") / F.col("n")
    var_q = F.col("sqq") / F.col("n") - mq * mq
    var_p = F.col("spp") / F.col("n") - mp * mp
    cov = F.col("sqp") / F.col("n") - mq * mp
    return agg.select(
        "l_returnflag",
        "n",
        F.round(mq, 6).alias("mean_qty"),
        F.round(var_q, 6).alias("var_qty"),
        F.round(F.sqrt(var_q), 6).alias("stddev_qty"),
        F.round(cov, 4).alias("cov_qty_price"),
        F.round(cov / (F.sqrt(var_q) * F.sqrt(var_p)), 6).alias("corr_qty_price"),
    )


# ---------------------------------------------------------------------------
# B20–B22 — sort, top-k, set ops
# ---------------------------------------------------------------------------

def q_sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20: global sort. The verifiable artifact of ordering under an
    order-insensitive hash is an explicit position column. At scale a
    global row_number is a single-partition window, so we first orderBy
    (range-partitioned sort) — fine here because supplier is a dim table."""
    sup = load_table(spark, sf_dir, "supplier")
    w = Window.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return sup.select(
        "s_suppkey",
        "s_name",
        F.round("s_acctbal", 2).alias("acctbal"),
        F.row_number().over(w).alias("pos"),
    )


def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B21: top-k — 10 most expensive orders. orderBy().limit(k) compiles to
    TakeOrderedAndProject: each partition keeps a k-heap, no global sort."""
    orders = load_table(spark, sf_dir, "orders")
    top = orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")).limit(10)
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return top.select("o_orderkey", "o_totalprice").withColumn("pos", F.row_number().over(w))


def _nation_sides(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )
    return cust, sup


def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22: UNION (distinct) of customer vs supplier nation keys."""
    cust, sup = _nation_sides(spark, sf_dir)
    return cust.unionByName(sup).distinct()


def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22: INTERSECT."""
    cust, sup = _nation_sides(spark, sf_dir)
    return cust.intersect(sup)


def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22: EXCEPT (distinct set semantics, = DataFrame.subtract) — nations
    with customers but no suppliers."""
    cust, sup = _nation_sides(spark, sf_dir)
    return cust.subtract(sup)


# ---------------------------------------------------------------------------
# B23–B27 — scalar function families
# ---------------------------------------------------------------------------

def q_string_funs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23: string functions over part (all JVM built-ins, codegen'd)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.col("p_name").contains("o").cast("int").alias("has_o"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


def q_datetime_funs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B24: date/time functions over orders."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        # dates are emitted as ISO strings: Spark DATE arrives in pandas as
        # datetime.date while DuckDB DATE arrives as datetime64 — same value,
        # different physical type, which an exact value-hash would miss on
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch95"
        ),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "due_date"
        ),
    )


def q_math_funs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B25: math scalars over lineitem (sqrt is IEEE-correctly-rounded, so
    bit-identical across engines; transcendental fns are avoided)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # raw IEEE product — bit-identical in any engine, so no rounding.
        # (round(x, k) at the product's own decimal width is a tie-breaking
        # minefield: Spark rounds the shortest decimal repr, DuckDB the
        # binary value, and 2dec*4dec products land exactly on .5 ties.)
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod7"),
    )


def q_array_funs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26: array/higher-order functions over tokenized document text."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
        F.array_contains(toks, "query").cast("int").alias("has_query"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )


def q_higher_order_funs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26 (higher-order functions): transform / filter / exists /
    aggregate over token arrays — the lambda surface Catalyst offers for
    array columns."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    lens = F.transform(toks, lambda t: F.length(t))
    return d.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).alias("n_long_tokens"),
        F.exists(toks, lambda t: t == F.lit("scan")).cast("int").alias("has_scan"),
        F.aggregate(lens, F.lit(0), lambda acc, x: acc + x).alias("sum_token_len"),
        F.array_max(lens).alias("max_token_len"),
    )


def q_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 (sampling pattern): deterministic 1-in-10 systematic sample by
    key modulus — the reproducible sampling a data pipeline wants
    (df.sample's RNG is engine-specific and unverifiable)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.pmod(F.col("l_orderkey"), F.lit(10)) == 0)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


def q_map_funs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26 (map type): construct, probe and enumerate MapType columns."""
    p = load_table(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    return p.select(
        "p_partkey",
        F.element_at(m, "brand").alias("brand_val"),
        F.element_at(m, "type").alias("type_val"),
        F.size(m).alias("n_keys"),
        F.array_join(F.map_keys(m), ",").alias("keys"),
    )


def q_json_funs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B27: JSON extraction over events.props, then aggregate per type."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.sum("k").cast("double") / F.count("*"), 6).alias("avg_k"),
        )
    )


def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B33 (recursive CTE, Spark 4): a monthly calendar spine generated by
    WITH RECURSIVE, left-joined to per-month order counts so months with
    no orders appear with zero — the canonical gaps-in-time-series fill.
    The spine bounds come from a one-row driver aggregate (min/max
    orderdate), so the recursive part is a pure 80-level ladder well under
    Spark's cteRecursionLevelLimit; the oracle runs the identical ANSI
    recursion in DuckDB with the bounds computed in-query."""
    orders = load_table(spark, sf_dir, "orders")
    lo, hi = orders.select(
        F.date_trunc("month", F.min("o_orderdate")).cast("string"),
        F.date_trunc("month", F.max("o_orderdate")).cast("string"),
    ).first()
    view = "orders_rcte"
    orders.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        WITH RECURSIVE months(m) AS (
            SELECT TIMESTAMP '{lo}'
            UNION ALL
            SELECT m + INTERVAL 1 MONTH FROM months
            WHERE m < TIMESTAMP '{hi}'
        ),
        per_month AS (
            SELECT date_trunc('month', o_orderdate) AS m,
                   count(*) AS n_orders,
                   sum(CAST(o_totalprice AS DECIMAL(28,4))) AS total_price
            FROM {view}
            GROUP BY 1
        )
        SELECT unix_micros(months.m) AS month_start_us,
               COALESCE(p.n_orders, 0) AS n_orders,
               CAST(COALESCE(p.total_price, 0) AS DOUBLE) AS total_price
        FROM months LEFT JOIN per_month p ON months.m = p.m
        """
    )


def q_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B32: the Python-UDF surface, done the right way: a vectorized
    (Arrow-batched) pandas UDF, not a row-at-a-time Python UDF. Computes a
    token/char density score; the oracle reproduces it in pure SQL."""
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def token_density(text: pd.Series, n_chars: pd.Series) -> pd.Series:
        import numpy as np

        n_tokens = text.str.split(" ").str.len().astype("float64")
        chars = n_chars.astype("float64")
        # SQL division semantics on zero-length docs: undefined (NULL),
        # not inf — keeps the Arrow path and the oracle identical
        # (fuzz seed 9 regression: pandas 1/0.0 is inf, DuckDB is NULL)
        return pd.Series(
            np.where(chars == 0, np.nan, n_tokens / chars)
        ).round(6)

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", token_density("text", "n_chars").alias("token_density"))


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13 (event analytics): batch sessionization — a new session starts
    after a >30-minute gap per user; emits per-user session count, event
    count, and total session span in seconds. The classic
    lag + cumulative-sum-of-boundaries window pair: one shuffle on
    user_id, everything else stays in-partition (at 100 TB the same two
    windows run per user partition; the μs→second math is integer)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_sess = (
        F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1).otherwise(0)
    )
    sess = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_id"),
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        # floor division in both engines (DuckDB uses `//`): Spark's long
        # cast truncates while DuckDB's BIGINT cast rounds — never let a
        # fractional double reach the cast.
        F.floor((F.max("ts_us") - F.min("ts_us")) / 1_000_000).cast("long").alias("span_s"),
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.sum("span_s").alias("total_span_s"),
    )


def q_dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14 (CDC compaction): keep-latest dedup — collapse an append log
    to each user's most recent event per event type, the canonical
    upsert-compaction a merge-on-read table performs at read time.

    ``max_by`` over a lexicographic (ts, event_id) struct — a HASH
    aggregation with map-side partial combine — replaces the previous
    row_number window (round-5's merge_latest rewrite, spark_table.py:
    the same hot-key hazard applies here: one bot account with 10⁸
    events makes a window SORT that partition's single-task O(n log n),
    while the partial agg collapses every hot key to one row per map
    task before the exchange). Tiebreak (event_id desc on equal ts)
    matches the window's ordering exactly, so results are unchanged."""
    ev = load_table(spark, sf_dir, "events")
    latest = ev.groupBy("user_id", "event_type").agg(
        F.max_by(
            F.struct("event_id", "ts", "value"),
            F.struct(F.col("ts"), F.col("event_id")),
        ).alias("r")
    )
    return latest.select(
        "user_id",
        "event_type",
        F.col("r.event_id").alias("event_id"),
        F.unix_micros(F.col("r.ts")).alias("ts_us"),
        F.col("r.value").alias("value"),
    )


def q_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B32 (UDTF surface): a Python user-defined TABLE function applied
    per row via LATERAL — each document expands to its fixed-size token
    chunks (the row-multiplying shape sequence-chunking pipelines use
    when a plain explode can't carry per-row generator logic). Arrow-
    batched like every Python boundary here; the chunk math is integer,
    so the oracle is exact."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_tokens int")
    class Chunker:
        def eval(self, text: str):
            if text is None:
                return  # NULL doc: no chunks (the oracle's
                # range(0, NULL) unnests to no rows the same way)
            n = len(text.split(" "))
            for i in range(0, n, 10):
                yield i // 10, min(10, n - i)

    spark.udtf.register("doc_chunker", Chunker)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk_tokens "
        "FROM udtf_docs d, LATERAL doc_chunker(d.text) c"
    )


def q_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B32 (grouped-map surface): groupBy().applyInPandas — each language
    group arrives as one pandas DataFrame (the UDAF-style escape hatch
    for per-group logic Spark aggregates can't express). Integer
    delta-from-group-min keeps the oracle exact. One shuffle on the
    group key; group size bounds executor memory, which is why the
    grouping column at 100 TB must be a bounded domain (lang is)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def delta(pdf: pd.DataFrame) -> pd.DataFrame:
        # nullable Int64: a NULL n_chars row keeps a NULL delta (pandas
        # min already skips NaN, matching SQL MIN OVER)
        m = pdf["n_chars"].min()
        return pdf.assign(delta_chars=(pdf["n_chars"] - m).astype("Int64"))

    return docs.groupBy("lang").applyInPandas(
        delta, schema="doc_id long, lang string, n_chars long, delta_chars long"
    )


def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B27 (VARIANT surface, Spark 4): parse the events props JSON into
    the open VARIANT type and extract a typed field — the
    schema-on-read path for semi-structured columns (vs from_json's
    fixed schema in b27_json_funs). Extraction happens on the binary
    variant encoding, no re-parsing per field at scale."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_val"),
    )


QUERIES = {
    "b01_scan_count": q_scan_count,
    "b01_csv_source": q_csv_source,
    "b01_json_source": q_json_source,
    "b01_orc_roundtrip": q_orc_roundtrip,
    "b04_select_all": q_select_all,
    "b05_projection": q_projection,
    "b06_filter": q_filter,
    "b07_join_inner": q_join_inner,
    "b08_join_left": q_join_left,
    "b08_join_right": q_join_right,
    "b08_join_full": q_join_full,
    "b09_join_semi": q_join_semi,
    "b09_join_anti": q_join_anti,
    "b10_star_broadcast": q_star_broadcast,
    "b11_range_join": q_range_join,
    "b11_bucketed_interval_join": q_bucketed_interval_join,
    "b12_asof_join": q_asof_join,
    "b13_median_exact": q_median_exact,
    "b13_agg_pricing_summary": q_agg_pricing_summary,
    "b14_distinct": q_distinct,
    "b15_approx_distinct": q_approx_distinct,
    "b15_approx_quantile": q_approx_quantile,
    "b15_exact_percentiles": q_exact_percentiles,
    "b16_rollup": q_rollup,
    "b16_cube": q_cube,
    "b16_grouping_sets": q_grouping_sets,
    "b16_pivot": q_pivot,
    "b16_unpivot": q_unpivot,
    "b13_correlated_agg_filter": q_correlated_agg_filter,
    "b13_salted_agg": q_salted_agg,
    "b07_skew_salted_join": q_skew_salted_join,
    "b15_cms_heavy_hitters": q_cms_heavy_hitters,
    "b13_retention_cohorts": q_retention_cohorts,
    "b13_funnel_analysis": q_funnel_analysis,
    "c04_boolean_search": q_boolean_search,
    "b13_column_profile": q_column_profile,
    "b13_integrity_audit": q_integrity_audit,
    "b09_order_priority": q_order_priority,
    "b13_priority_classes": q_priority_classes,
    "b10_promo_revenue": q_promo_revenue,
    "b17_window_rank": q_window_rank,
    "b18_window_lag_lead": q_window_lag_lead,
    "b19_window_frames": q_window_frames,
    "b19_window_range_frame": q_window_range_frame,
    "b13_stats_exact": q_stats_exact,
    "b20_sort_global": q_sort_global,
    "b21_topk": q_topk,
    "b22_set_union": q_set_union,
    "b22_set_intersect": q_set_intersect,
    "b22_set_except": q_set_except,
    "b23_string_funs": q_string_funs,
    "b24_datetime_funs": q_datetime_funs,
    "b25_math_funs": q_math_funs,
    "b26_array_funs": q_array_funs,
    "b26_map_funs": q_map_funs,
    "b26_higher_order_funs": q_higher_order_funs,
    "b06_systematic_sample": q_systematic_sample,
    "b27_json_funs": q_json_funs,
    "b32_pandas_udf": q_pandas_udf,
    "b32_python_udtf": q_python_udtf,
    "b32_apply_in_pandas": q_apply_in_pandas,
    "b27_variant_json": q_variant_json,
    "b33_recursive_cte": q_recursive_cte,
    "b13_sessionization": q_sessionization,
    "b14_dedup_keep_latest": q_dedup_keep_latest,
}


ORACLE = {
    "b01_scan_count": "SELECT count(*) AS n_rows FROM lineitem",
    "b01_csv_source": "SELECT * FROM nation",
    "b01_json_source": "SELECT * FROM region",
    "b01_orc_roundtrip": "SELECT * FROM supplier",
    "b04_select_all": "SELECT * FROM region",
    "b05_projection": "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem",
    "b06_filter": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_quantity > 30.0
    """,
    "b07_join_inner": """
        SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    "b08_join_left": """
        SELECT c_custkey,
               COALESCE(cnt, 0) AS n_orders,
               ROUND(COALESCE(ssum, 0.0), 4) AS total_spent
        FROM customer LEFT JOIN (
            SELECT o_custkey,
                   count(*) AS cnt,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS ssum
            FROM orders GROUP BY o_custkey
        ) ON c_custkey = o_custkey
    """,
    "b08_join_full": """
        SELECT COALESCE(s.s_nationkey, c.c_nationkey) AS nationkey,
               COALESCE(n_suppliers, 0) AS n_suppliers,
               COALESCE(n_customers, 0) AS n_customers
        FROM (SELECT s_nationkey, count(*) AS n_suppliers FROM supplier GROUP BY s_nationkey) s
        FULL OUTER JOIN
             (SELECT c_nationkey, count(*) AS n_customers FROM customer GROUP BY c_nationkey) c
        ON s.s_nationkey = c.c_nationkey
    """,
    "b09_join_semi": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
    "b09_join_anti": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "b10_star_broadcast": """
        SELECT r_name, n_name,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
                   AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "b11_range_join": """
        WITH tiers(lo, hi, tier) AS (VALUES
            (0.0, 10.0, 't0_small'), (10.0, 25.0, 't1_mid'),
            (25.0, 40.0, 't2_large'), (40.0, 1e9, 't3_huge'))
        SELECT tier, count(*) AS n_items,
               CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
        FROM lineitem JOIN tiers ON l_quantity >= lo AND l_quantity < hi
        GROUP BY tier
    """,
    "b11_bucketed_interval_join": """
        SELECT p.event_id AS p_id,
               count(*) AS n_recent_clicks,
               max(epoch_us(CAST(c.ts AS TIMESTAMP))) AS last_click_us
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id
         AND epoch_us(CAST(c.ts AS TIMESTAMP)) <= epoch_us(CAST(p.ts AS TIMESTAMP))
         AND epoch_us(CAST(c.ts AS TIMESTAMP)) >= epoch_us(CAST(p.ts AS TIMESTAMP)) - 3600000000
        GROUP BY p.event_id
    """,
    "b13_median_exact": """
        WITH ranked AS (
            SELECT l_returnflag, l_quantity,
                   row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
                   count(*) OVER (PARTITION BY l_returnflag) AS n
            FROM lineitem
        )
        SELECT l_returnflag,
               ROUND(CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / count(*), 6)
                   AS median_qty
        FROM ranked
        WHERE rn = CAST(floor((n + 1) / 2) AS BIGINT)
           OR rn = CAST(ceil(CAST(n + 1 AS DOUBLE) / 2) AS BIGINT)
        GROUP BY l_returnflag
    """,
    "b12_asof_join": """
        SELECT p.event_id,
               p.user_id,
               epoch_us(CAST(p.ts AS TIMESTAMP)) AS purchase_ts_us,
               epoch_us(CAST(c.ts AS TIMESTAMP)) AS click_ts_us,
               p.value
        FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value
              FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN
             (SELECT CAST(ts AS TIMESTAMP) AS ts, user_id
              FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    "b13_agg_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
                   AS sum_disc_price,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,8))) AS DOUBLE)
                   AS sum_charge,
               ROUND(CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
               ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / count(*), 6) AS avg_price,
               ROUND(CAST(sum(CAST(l_discount AS DECIMAL(28,4))) AS DOUBLE) / count(*), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "b13_salted_agg": """
        SELECT l_returnflag, count(*) AS n_items,
               CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY l_returnflag
    """,
    "b13_retention_cohorts": """
        WITH ua AS (
            SELECT DISTINCT user_id,
                   date_trunc('week', CAST(ts AS TIMESTAMP)) AS week
            FROM events
        )
        SELECT strftime(a.week, '%Y-%m-%d') AS week,
               count(DISTINCT a.user_id) AS n_active,
               count(DISTINCT b.user_id) AS n_retained,
               ROUND(CAST(count(DISTINCT b.user_id) AS DOUBLE)
                     / count(DISTINCT a.user_id), 6) AS retention
        FROM ua a
        LEFT JOIN ua b
          ON a.user_id = b.user_id AND b.week = a.week + INTERVAL 7 DAY
        GROUP BY a.week
    """,
    "b09_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1995-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_discount > 0.08)
        GROUP BY o_orderpriority
    """,
    "b13_priority_classes": """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_returnflag
    """,
    "b10_promo_revenue": """
        SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(28,6))) AS DOUBLE) AS total_revenue,
               CAST(sum(CASE WHEN p_type = 'ECONOMY'
                             THEN CAST(l_extendedprice * (1 - l_discount)
                                       AS DECIMAL(28,6))
                             ELSE 0 END) AS DOUBLE) AS promo_revenue,
               ROUND(CAST(sum(CASE WHEN p_type = 'ECONOMY'
                                   THEN CAST(l_extendedprice * (1 - l_discount)
                                             AS DECIMAL(28,6))
                                   ELSE 0 END) AS DOUBLE) * 100.0
                     / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                     AS DECIMAL(28,6))) AS DOUBLE), 6) AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1995-09-01'
          AND l_shipdate <  TIMESTAMP '1995-10-01'
    """,
    "b13_column_profile": """
        SELECT 'l_quantity' AS column, count(*) AS n_rows,
               CAST(sum(CAST(l_quantity IS NULL AS INT)) AS BIGINT) AS n_null,
               count(DISTINCT l_quantity) AS n_distinct,
               ROUND(min(l_quantity), 4) AS min_val,
               ROUND(max(l_quantity), 4) AS max_val,
               ROUND(CAST(sum(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE)
                     / count(*), 6) AS mean_val
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', count(*),
               CAST(sum(CAST(l_extendedprice IS NULL AS INT)) AS BIGINT),
               count(DISTINCT l_extendedprice),
               ROUND(min(l_extendedprice), 4), ROUND(max(l_extendedprice), 4),
               ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE)
                     / count(*), 6)
        FROM lineitem
        UNION ALL
        SELECT 'l_discount', count(*),
               CAST(sum(CAST(l_discount IS NULL AS INT)) AS BIGINT),
               count(DISTINCT l_discount),
               ROUND(min(l_discount), 4), ROUND(max(l_discount), 4),
               ROUND(CAST(sum(CAST(l_discount AS DECIMAL(28,4))) AS DOUBLE)
                     / count(*), 6)
        FROM lineitem
    """,
    "b13_integrity_audit": """
        SELECT
            (SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey))
                AS orphan_lineitems,
            (SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey))
                AS orphan_orders,
            (SELECT count(*) FROM (
                SELECT o_orderkey FROM orders
                GROUP BY o_orderkey HAVING count(*) > 1))
                AS duplicate_orderkeys,
            (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
                AS null_custkeys
    """,
    "b13_funnel_analysis": """
        WITH v AS (
            SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t1
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t2
            GROUP BY e.user_id
        )
        SELECT (SELECT count(*) FROM v) AS n_viewed,
               (SELECT count(*) FROM c) AS n_clicked_after_view,
               (SELECT count(*) FROM p) AS n_purchased_after_click
    """,
    "c04_boolean_search": """
        WITH postings AS (
            SELECT doc_id, term, count(*) AS tf FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents
            ) WHERE term IN ('scan', 'filter')
            GROUP BY doc_id, term
        ),
        hits AS (
            SELECT doc_id, CAST(sum(tf) AS BIGINT) AS score
            FROM postings GROUP BY doc_id
            HAVING count(DISTINCT term) = 2
        )
        SELECT * FROM (
            SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
                       AS rnk,
                   doc_id, score
            FROM hits
        ) WHERE rnk <= 20
    """,
    # the salt is plan-internal; the oracle is the unsalted join+agg
    "b07_skew_salted_join": """
        SELECT p_brand, count(*) AS n_items,
               CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    "b14_distinct": "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    "b16_grouping_sets": """
        SELECT COALESCE(o_orderstatus, '(all)') AS status,
               COALESCE(o_orderpriority, '(all)') AS priority,
               count(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "b16_pivot": """
        SELECT o_orderpriority AS priority,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
               count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
               count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        FROM orders GROUP BY o_orderpriority
    """,
    "b16_unpivot": """
        SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        UNION ALL
        SELECT p_partkey, 'retailprice', p_retailprice FROM part
    """,
    "b13_correlated_agg_filter": """
        WITH per_part AS (
            SELECT l_partkey,
                   0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / count(*))
                       AS qty_threshold
            FROM lineitem GROUP BY l_partkey
        )
        SELECT l.l_partkey, count(*) AS n_below,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price
        FROM lineitem l JOIN per_part p ON l.l_partkey = p.l_partkey
        WHERE l.l_quantity < p.qty_threshold
        GROUP BY l.l_partkey
    """,
    "b15_approx_distinct": """
        SELECT count(DISTINCT l_orderkey) AS exact_cnt, 1 AS approx_within_5pct
        FROM lineitem
    """,
    "b15_approx_quantile": """
        SELECT l_returnflag, count(*) AS n_rows, 1 AS median_within_5pct
        FROM lineitem GROUP BY l_returnflag
    """,
    "b15_exact_percentiles": """
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.5) AS median_price,
               quantile_cont(l_extendedprice, 0.95) AS p95_price,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    "b16_rollup": """
        SELECT COALESCE(o_orderstatus, '(all)') AS status,
               COALESCE(o_orderpriority, '(all)') AS priority,
               count(*) AS n_orders,
               ROUND(CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE), 4) AS sum_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "b16_cube": """
        SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
               COALESCE(l_linestatus, '(all)') AS linestatus,
               count(*) AS n_items,
               CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "b17_window_rank": """
        SELECT * FROM (
            SELECT c_nationkey, c_custkey,
                   ROUND(c_acctbal, 2) AS acctbal,
                   row_number() OVER (PARTITION BY c_nationkey
                                      ORDER BY c_acctbal DESC, c_custkey) AS rn,
                   rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
                   dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk
            FROM customer
        ) WHERE rn <= 3
    """,
    "b18_window_lag_lead": """
        SELECT event_id, user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
               value,
               lag(value)   OVER w AS prev_value,
               lead(value)  OVER w AS next_value,
               first_value(value) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    """,
    "b19_window_frames": """
        SELECT o_orderkey, o_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(28,4)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                   AS running_total,
               ROUND(
                   CAST(sum(CAST(o_totalprice AS DECIMAL(28,4)))
                        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
                   / count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
                   AS sliding_avg3
        FROM orders
    """,
    "b19_window_range_frame": """
        SELECT o_orderkey, o_custkey,
               CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
                   AS day_no,
               CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) OVER w AS DOUBLE)
                   AS trailing_30d_spend,
               count(*) OVER w AS trailing_30d_orders
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY CAST(date_diff('day', DATE '1995-01-01',
                                             CAST(o_orderdate AS DATE)) AS INT)
                     RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
    """,
    "b13_stats_exact": """
        WITH m AS (
            SELECT l_returnflag,
                   count(*) AS n,
                   CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sq,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sp,
                   CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sqq,
                   CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS spp,
                   CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sqp
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               ROUND(sq / n, 6) AS mean_qty,
               ROUND(sqq / n - (sq / n) * (sq / n), 6) AS var_qty,
               ROUND(sqrt(sqq / n - (sq / n) * (sq / n)), 6) AS stddev_qty,
               ROUND(sqp / n - (sq / n) * (sp / n), 4) AS cov_qty_price,
               ROUND((sqp / n - (sq / n) * (sp / n))
                     / (sqrt(sqq / n - (sq / n) * (sq / n))
                        * sqrt(spp / n - (sp / n) * (sp / n))), 6) AS corr_qty_price
        FROM m
    """,
    "b20_sort_global": """
        SELECT s_suppkey, s_name, ROUND(s_acctbal, 2) AS acctbal,
               row_number() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS pos
        FROM supplier
    """,
    "b21_topk": """
        SELECT o_orderkey, o_totalprice,
               row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS pos
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    "b22_set_union": """
        SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
        UNION
        SELECT CAST(s_nationkey AS INT) FROM supplier
    """,
    "b22_set_intersect": """
        SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
        INTERSECT
        SELECT CAST(s_nationkey AS INT) FROM supplier
    """,
    "b22_set_except": """
        SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
        EXCEPT
        SELECT CAST(s_nationkey AS INT) FROM supplier
    """,
    "b23_string_funs": r"""
        SELECT p_partkey,
               substring(p_name, 1, 8) AS name_prefix,
               upper(p_brand) AS brand_upper,
               lower(p_type) AS type_lower,
               CAST(length(p_name) AS INT) AS name_len,
               CAST(contains(p_name, 'o') AS INT) AS has_o,
               regexp_extract(p_name, '^(\w+)', 1) AS first_word,
               concat_ws('|', p_brand, p_type) AS brand_type
        FROM part
    """,
    "b24_datetime_funs": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS yr,
               CAST(quarter(o_orderdate) AS INT) AS qtr,
               CAST(month(o_orderdate) AS INT) AS mo,
               CAST(day(o_orderdate) AS INT) AS dom,
               CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
               CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
                   AS days_since_epoch95,
               CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS due_date
        FROM orders
    """,
    "b25_math_funs": """
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS disc_price,
               abs(l_quantity - 25.0) AS qty_dev,
               CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
               CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
               ROUND(sqrt(l_extendedprice), 6) AS price_sqrt,
               l_quantity * l_quantity AS qty_sq,
               l_orderkey % 7 AS key_mod7
        FROM lineitem
    """,
    "b26_array_funs": """
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
               string_split(text, ' ')[1] AS first_token,
               string_split(text, ' ')[-1] AS last_token,
               CAST(list_contains(string_split(text, ' '), 'query') AS INT) AS has_query,
               array_to_string(string_split(text, ' ')[1:3], ' ') AS first3,
               CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_unique_tokens
        FROM documents
    """,
    "b26_higher_order_funs": """
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS INT)
                   AS n_long_tokens,
               CAST(list_contains(string_split(text, ' '), 'scan') AS INT) AS has_scan,
               -- NULL guard: list_prepend(0, NULL) is [0] in DuckDB,
               -- but Spark's aggregate over a NULL array is NULL
               CAST(CASE WHEN text IS NULL THEN NULL
                         ELSE list_reduce(
                             list_prepend(0, list_transform(string_split(text, ' '),
                                                            t -> CAST(length(t) AS INT))),
                             (acc, x) -> acc + x)
                    END AS INT) AS sum_token_len,
               CAST(list_max(list_transform(string_split(text, ' '),
                                            t -> CAST(length(t) AS INT))) AS INT)
                   AS max_token_len
        FROM documents
    """,
    "b06_systematic_sample": """
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem WHERE l_orderkey % 10 = 0
    """,
    "b26_map_funs": """
        SELECT p_partkey,
               map(['brand','type'], [p_brand, p_type])['brand'][1] AS brand_val,
               map(['brand','type'], [p_brand, p_type])['type'][1] AS type_val,
               CAST(cardinality(map(['brand','type'], [p_brand, p_type])) AS INT) AS n_keys,
               array_to_string(map_keys(map(['brand','type'], [p_brand, p_type])), ',') AS keys
        FROM part
    """,
    "b27_json_funs": """
        SELECT event_type,
               count(*) AS n,
               min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
               max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
               ROUND(CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS DOUBLE)
                     / count(*), 6) AS avg_k
        FROM events GROUP BY event_type
    """,
    "b32_pandas_udf": """
        SELECT doc_id,
               ROUND(CAST(len(string_split(text, ' ')) AS DOUBLE) / n_chars, 6)
                   AS token_density
        FROM documents
    """,
    "b32_python_udtf": """
        SELECT doc_id,
               CAST(u.i AS INT) AS chunk_idx,
               CAST(least(10, n - 10 * u.i) AS INT) AS chunk_tokens
        FROM (SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
             UNNEST(range(0, CAST(ceil(n / 10.0) AS BIGINT))) AS u(i)
    """,
    "b32_apply_in_pandas": """
        SELECT doc_id, lang, n_chars,
               n_chars - min(n_chars) OVER (PARTITION BY lang) AS delta_chars
        FROM documents
    """,
    "b27_variant_json": """
        SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k_val FROM events
    """,
    "b08_join_right": """
        SELECT n_nationkey, n_name,
               CAST(COALESCE(cnt, 0) AS BIGINT) AS n_suppliers,
               ROUND(COALESCE(bsum, 0.0), 4) AS total_bal
        FROM (SELECT s_nationkey, count(*) AS cnt,
                     CAST(SUM(CAST(s_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS bsum
              FROM supplier GROUP BY s_nationkey) s
        RIGHT JOIN nation ON s.s_nationkey = n_nationkey
    """,
    "b13_sessionization": """
        WITH e AS (
            SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
            FROM events),
        flagged AS (
            SELECT user_id, event_id, ts_us,
                   CASE WHEN lag(ts_us) OVER w IS NULL
                             OR ts_us - lag(ts_us) OVER w > 30 * 60 * 1000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        sess AS (
            SELECT user_id, event_id, ts_us,
                   SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged),
        per_session AS (
            SELECT user_id, session_id,
                   count(*) AS n_events,
                   (max(ts_us) - min(ts_us)) // 1000000 AS span_s
            FROM sess GROUP BY user_id, session_id)
        SELECT user_id,
               count(*) AS n_sessions,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               CAST(SUM(span_s) AS BIGINT) AS total_span_s
        FROM per_session GROUP BY user_id
    """,
    "b14_dedup_keep_latest": """
        SELECT user_id, event_type, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                           ORDER BY ts DESC, event_id DESC) AS rn
              FROM events)
        WHERE rn = 1
    """,
    "b33_recursive_cte": """
        WITH RECURSIVE months(m) AS (
            SELECT (SELECT date_trunc('month', min(o_orderdate)) FROM orders)
            UNION ALL
            SELECT m + INTERVAL 1 MONTH FROM months
            WHERE m < (SELECT date_trunc('month', max(o_orderdate)) FROM orders)
        ),
        per_month AS (
            SELECT date_trunc('month', o_orderdate) AS m,
                   count(*) AS n_orders,
                   sum(CAST(o_totalprice AS DECIMAL(28,4))) AS total_price
            FROM orders
            GROUP BY 1
        )
        SELECT epoch_us(CAST(months.m AS TIMESTAMP)) AS month_start_us,
               COALESCE(p.n_orders, 0) AS n_orders,
               CAST(COALESCE(p.total_price, 0) AS DOUBLE) AS total_price
        FROM months LEFT JOIN per_month p ON months.m = p.m
    """,
}

# CMS oracle: the same d×W integer sketch, built from the same affine hash
# family — generated here so the (a, b) constants can't drift from Spark's
_CMS_VALUES = ", ".join(
    f"({j}, {a}, {b})" for j, (a, b) in enumerate(_cms_params())
)
ORACLE["b15_cms_heavy_hitters"] = f"""
    WITH params(j, a, b) AS (VALUES {_CMS_VALUES}),
    pairs AS (
        SELECT l_partkey AS key, j,
               ((l_partkey * a + b) % {_CMS_MOD}) % {_CMS_W} AS bucket
        FROM lineitem CROSS JOIN params
    ),
    cms AS (SELECT j, bucket, count(*) AS cnt FROM pairs GROUP BY j, bucket),
    kb AS (SELECT key, j, bucket, count(*) AS tib
           FROM pairs GROUP BY key, j, bucket),
    est AS (
        SELECT key, min(cnt) AS est_cnt,
               CAST(sum(tib) / {_CMS_D} AS BIGINT) AS true_cnt
        FROM kb JOIN cms USING (j, bucket) GROUP BY key
    )
    SELECT * FROM (
        SELECT row_number() OVER (ORDER BY est_cnt DESC, key) AS rnk,
               key, est_cnt, true_cnt,
               CAST(est_cnt >= true_cnt AS INT) AS cms_upper_bound_ok
        FROM est
    ) WHERE rnk <= 10
"""
