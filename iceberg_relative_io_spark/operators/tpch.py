"""TPC-H query shapes over the driver fixtures (SURVEY.md §2.B).

The reference ships the whole Spark SQL surface as its query engine
(reference pom.xml:17-26, README.md:14-18), so the canonical decision-
support suite is the natural parity benchmark for the relational layer.
The fixture star schema (FIXTURES.md) is TPC-H minus ``partsupp`` and a
few columns. Sixteen shapes run directly on it (Q1 Q3 Q4 Q5 Q6 Q7 Q8
Q10 Q13 Q14 Q15 Q17 Q18 Q19 Q22, plus Q12 via derived ship-mode /
lateness columns) — all 22 are registered here as ``b34_tpch_q*`` (the
Q1/Q4/Q12/Q14 SHAPES also live in relational.py as
b13_agg_pricing_summary / b09_order_priority / b13_priority_classes /
b10_promo_revenue with different predicates; the literal forms below
close the set). Six (Q2 Q9 Q11 Q16 Q20 Q21) need
``partsupp`` / ``l_commitdate``-``l_receiptdate``, which the fixtures
lack; they run over DERIVED columns instead — a deterministic dbgen-style
``partsupp`` (4 suppliers per part via the real dbgen supplier-spread
formula, integer-hash availqty/supplycost) and integer-hash
commit/receipt offsets for Q21's lateness test — computed by the
identical integer formulas in Spark and in the DuckDB oracle, so every
join/agg/subquery SHAPE of the full 22-query suite is exercised with an
exact oracle. Adaptations (absent descriptive columns like p_mfgr /
s_address / s_comment dropped from outputs; Q21 counts late orders, not
lines) are noted per query.

Adaptations are noted per query. Cross-engine float determinism follows
the module-wide rule in relational.py: every SUM of doubles goes through
DECIMAL(28,s) so the value is independent of partial-aggregation order,
and every threshold derived from an aggregate (Q17's 0.2*avg, Q22's
positive-balance mean, Q18's HAVING) is computed with the same exact
formula on both engines.

Scale notes (100 TB design intent):

- Dimension sides (region, nation, supplier, part at dim scale) stay
  broadcastable; customer/orders/lineitem joins shuffle on their keys and
  AQE picks broadcast when a filtered side collapses below the threshold.
- Every top-k (Q3/Q10/Q18) carries a deterministic tiebreak and compiles
  to TakeOrderedAndProject — no global sort materializes.
- Q15's "max revenue" is a window over the *aggregated* per-supplier
  frame (|suppliers| rows), not over lineitem.
- Q17/Q22 correlated aggregates become one extra hash-agg + a broadcast
  of the tiny per-group thresholds, never a per-row subquery.
"""

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_relative_io_spark.operators.relational import _dec, _dsum
from iceberg_relative_io_spark.sources.tables import fan_out, load_table

_REV = "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)"

# ---------------------------------------------------------------------------
# derived partsupp: dbgen's supplier-spread formula + integer-hash attrs
# ---------------------------------------------------------------------------

_LCG = 2_654_435_761
_PS_PER_PART = 4


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ``partsupp``: each part links to 4 suppliers via the
    actual dbgen spread ``((p + j*(S/4 + (p-1)/S)) % S) + 1`` (so a
    part's suppliers scatter across the key space exactly like TPC-H),
    with integer-hash ``ps_availqty``/``ps_supplycost``. Every formula is
    pure BIGINT arithmetic + one exact double division, reproduced
    verbatim in the oracle CTE — the derived table is identical in both
    engines at any scale factor."""
    n_supp = load_table(spark, sf_dir, "supplier").count()  # dim-sized count
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("ps_partkey")
    )
    ps = part.select(
        "ps_partkey",
        F.explode(F.array(*[F.lit(j) for j in range(_PS_PER_PART)])).alias("j"),
    ).select(
        "ps_partkey",
        F.expr(
            f"((ps_partkey + j * ({n_supp} div {_PS_PER_PART} "
            f"+ (ps_partkey - 1) div {n_supp})) % {n_supp}) + 1"
        ).alias("ps_suppkey"),
    )
    # distinct: at tiny supplier counts the spread can collide for one
    # part; (ps_partkey, ps_suppkey) is the table's primary key in TPC-H
    # and a duplicate pair would double-count in every join over it
    return ps.distinct().select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * _LCG + F.col("ps_suppkey") * 31) % 9999 + 1).alias(
            "ps_availqty"
        ),
        (
            ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 7) * _LCG % 100000)
            .cast("double")
            / 100.0
            + 1.0
        ).alias("ps_supplycost"),
    )


_PARTSUPP_CTE = f"""
sc AS (SELECT count(*) AS S FROM supplier),
ps0 AS (
    SELECT DISTINCT p_partkey AS ps_partkey,
           ((p_partkey + j.j * (S // {_PS_PER_PART} + (p_partkey - 1) // S)) % S) + 1
               AS ps_suppkey
    FROM part, sc, UNNEST(range(0, {_PS_PER_PART})) AS j(j)
),
partsupp AS (
    SELECT ps_partkey, ps_suppkey,
           (ps_partkey * {_LCG} + ps_suppkey * 31) % 9999 + 1 AS ps_availqty,
           CAST((ps_partkey * 31 + ps_suppkey * 7) * {_LCG} % 100000 AS DOUBLE)
               / 100.0 + 1.0 AS ps_supplycost
    FROM ps0
)
"""


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): top unshipped orders by revenue for
    one market segment. Tiebreak on o_orderkey makes the LIMIT total-
    ordered; compiles to TakeOrderedAndProject over a partial-agg."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-07-01").cast("timestamp")
    )
    rev = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"], "left_semi")
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "revenue", "o_orderdate")
    )


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue from intra-nation
    supply chains within one region-year. nation/region broadcast; the
    c_nationkey = s_nationkey equi-condition rides the supplier join."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    j = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(supp),
            (li["l_suppkey"] == supp["s_suppkey"])
            & (cust["c_nationkey"] == supp["s_nationkey"]),
        )
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
    )
    return j.groupBy("n_name").agg(F.sum(rev).cast("double").alias("revenue"))


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): single-pass filtered scan
    + scalar aggregate; everything pushes to the parquet reader."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return li.agg(
        F.sum(_dec(F.col("l_extendedprice") * F.col("l_discount"), 6))
        .cast("double")
        .alias("revenue")
    )


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade between two nations
    by ship year. Both nation maps broadcast onto the fact join."""
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    rev = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    j = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(n1), supp["s_nationkey"] == F.col("s_nk"))
        .join(F.broadcast(n2), cust["c_nationkey"] == F.col("c_nk"))
        .filter(pair)
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(F.sum(rev).cast("double").alias("revenue"))


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one nation's share of regional
    revenue for one part type, by order year — conditional-sum ratio
    with exact decimal numerator/denominator."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    nation_r = (
        load_table(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cr_nk"))
    )
    n_supp = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    nat_rev = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0))
    j = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"], "left_semi")
        .join(orders, F.col("l_orderkey") == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation_r), cust["c_nationkey"] == F.col("cr_nk"), "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .join(F.broadcast(n_supp), supp["s_nationkey"] == F.col("s_nk"))
    )
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(nat_rev).cast("double").alias("nation_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
        .select(
            "o_year",
            "nation_revenue",
            "total_revenue",
            F.round(F.col("nation_revenue") / F.col("total_revenue"), 6).alias(
                "mkt_share"
            ),
        )
    )


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting): revenue lost to returns per
    customer for one quarter, top 20 with orderkey-free total order."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    j = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): orders-per-customer histogram
    including zero-order customers (left outer + count of non-null).
    The priority filter stands in for the original comment NOT LIKE."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): suppliers matching the max quarterly
    revenue. The max is a window over the per-supplier aggregate (|S|
    rows), and equality is safe because both engines derive the value
    from the identical decimal sum."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6))
            .cast("double")
            .alias("total_revenue")
        )
    )
    w = Window.partitionBy(F.lit(1))
    top = rev.withColumn("max_rev", F.max("total_revenue").over(w)).filter(
        F.col("total_revenue") == F.col("max_rev")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        top.join(F.broadcast(supp), top["l_suppkey"] == supp["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): lineitems under 20% of
    their part's average quantity, for one brand. The brand semi-join
    runs FIRST, so the correlated per-part AVG aggregates only the
    brand's lineitems (a part's lineitems are exactly its partkey's, so
    the average is unchanged) and the broadcast-back side is brand-sized
    — O(|brand parts|), not O(|part|), at any scale. The threshold is
    computed as exact-decimal-sum / count on both engines so the
    comparison can't flip in the last ulp."""
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    li_brand = li.join(
        F.broadcast(part), li["l_partkey"] == part["p_partkey"], "left_semi"
    )
    per_part = li_brand.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            F.sum(_dec(F.col("l_quantity"), 4)).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    j = (
        li_brand.join(F.broadcast(per_part), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    )
    return j.agg(
        F.round(
            F.sum(_dec(F.col("l_extendedprice"), 4)).cast("double") / 7.0, 6
        ).alias("avg_yearly")
    )


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): orders whose total quantity
    exceeds a threshold. HAVING runs on the exact decimal sum; top 100
    ordered by (o_totalprice desc, o_orderkey) for a total order."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy(F.col("l_orderkey").alias("t_orderkey"))
        .agg(F.sum(_dec(F.col("l_quantity"), 4)).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 250)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders["o_orderkey"] == big["t_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): disjunctive brand/size/quantity
    predicate — the classic OR-of-ANDs that must still push the part
    filter into the broadcast join build side."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1.0, 11.0)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10.0, 20.0)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20.0, 30.0)
        )
    )
    rev = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    return j.filter(cond).agg(F.sum(rev).cast("double").alias("revenue"))


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): rich-but-inactive customers
    grouped by 'country code' (last two digits of c_name stand in for
    the fixture's missing phone column). The positive-balance mean is an
    exact-decimal ratio; inactivity is a broadcast-able anti join."""
    cust = load_table(spark, sf_dir, "customer")
    avg_pos = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(_dec(F.col("c_acctbal"), 4)).cast("double") / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    rich = (
        cust.crossJoin(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
    )
    return (
        rich.withColumn("cntrycode", F.substring("c_name", 17, 2))
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec(F.col("c_acctbal"), 4)).cast("double").alias("totacctbal"),
        )
    )


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier) over the derived partsupp: for
    STANDARD parts of size 15, the cheapest EUROPE supplier per part.
    The correlated min becomes a window-min over the region-filtered
    join (|region partsupp| rows, never a per-row subquery); dims all
    broadcast. Adapted output keeps the fixture's columns (no
    p_mfgr/s_address/s_phone/s_comment)."""
    ps = _partsupp(spark, sf_dir)
    part = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    j = (
        ps.join(F.broadcast(part), ps["ps_partkey"] == part["p_partkey"], "left_semi")
        .join(F.broadcast(supp), ps["ps_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
    )
    w = Window.partitionBy("ps_partkey")
    return (
        j.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("ps_partkey")
        )
        .limit(100)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            "ps_supplycost",
        )
    )


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit) over the derived partsupp: profit
    per (nation, order-year) for red parts — amount = revenue minus
    supply cost, summed through DECIMAL(28,6) so the distributed partial
    order can't move a bit. lineitem joins partsupp on the composite
    (partkey, suppkey); everything else broadcasts."""
    ps = _partsupp(spark, sf_dir)
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = _dec(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("ps_supplycost") * F.col("l_quantity"),
        6,
    )
    j = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"], "left_semi")
        .join(
            F.broadcast(ps),
            (F.col("l_partkey") == ps["ps_partkey"])
            & (F.col("l_suppkey") == ps["ps_suppkey"]),
        )
        .join(orders, F.col("l_orderkey") == orders["o_orderkey"])
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
    )
    return (
        j.groupBy("n_name", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock) over the derived partsupp: per-part
    inventory value for one nation's suppliers, kept when above 0.5% of
    the nation total. Both the per-part values and the grand total are
    exact decimal sums; the total broadcasts as one row — the correlated
    HAVING never rescans."""
    ps = _partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    val = _dec(F.col("ps_supplycost") * F.col("ps_availqty"), 6)
    scoped = ps.join(F.broadcast(supp), ps["ps_suppkey"] == supp["s_suppkey"]).join(
        F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"], "left_semi"
    )
    by_part = scoped.groupBy("ps_partkey").agg(
        F.sum(val).cast("double").alias("value")
    )
    total = scoped.agg(
        (F.sum(val).cast("double") * F.lit(0.005)).alias("threshold")
    )
    return (
        by_part.join(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("ps_partkey", "value")
    )


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship) over the derived
    partsupp: distinct supplier count per (brand, type, size) for parts
    outside one brand/type, sizes in the spec's 8-value list. Adapted:
    the fixture has no s_comment, so the 'complaints' supplier exclusion
    is dropped (noted; the aggregate shape — distinct-count over a
    3-column group from a semi-joined partsupp — is intact)."""
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 14, 19, 25, 28)
    )
    return (
        ps.join(F.broadcast(part), ps["ps_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion) over the derived partsupp:
    NATION_3 suppliers holding more than half a year's shipped quantity
    of some small part. The correlated quantity subquery is one hash-agg
    on (partkey, suppkey); the comparison joins it back co-partitioned,
    and the supplier projection is a final semi join."""
    ps = _partsupp(spark, sf_dir)
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    half_qty = (
        li.groupBy(
            F.col("l_partkey").alias("q_partkey"), F.col("l_suppkey").alias("q_suppkey")
        )
        .agg((F.sum(_dec(F.col("l_quantity"), 4)).cast("double") * 0.5).alias("half_qty"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    picked = (
        ps.join(F.broadcast(part), ps["ps_partkey"] == part["p_partkey"], "left_semi")
        .join(
            half_qty,
            (ps["ps_partkey"] == F.col("q_partkey"))
            & (ps["ps_suppkey"] == F.col("q_suppkey")),
        )
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        supp.join(picked, supp["s_suppkey"] == picked["ps_suppkey"], "left_semi")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == nation["n_nationkey"],
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting). The fixture has no
    l_commitdate/l_receiptdate, so lateness derives from integer-hash
    commit/receipt offsets of (orderkey, linenumber) — same base date,
    so ``receipt > commit`` reduces to comparing the two BIGINT offsets,
    identically derived in the oracle. The EXISTS / NOT EXISTS pair
    becomes one per-order aggregate (distinct suppliers, distinct late
    suppliers): an order counts against a supplier iff it is finalized,
    multi-supplier, and that supplier is its ONLY late one. Adapted:
    numwait counts such orders (not lineitem rows). One shuffle on
    orderkey; supplier/nation broadcast."""
    li = fan_out(load_table(spark, sf_dir, "lineitem"), "l_orderkey").select(
        "l_orderkey",
        "l_suppkey",
        (
            (
                ((F.col("l_orderkey") * 31 + F.col("l_linenumber")) * _LCG)
                % 2_147_483_647
            )
        ).alias("h"),
    )
    li = li.select(
        "l_orderkey",
        "l_suppkey",
        F.expr("(h div 97) % 97 > h % 97").alias("late"),  # exact BIGINT div
    )
    # Round-11 (guide §2.3 — aggregate before you shuffle): the two
    # countDistincts planned an Expand (2x row duplication of the fact
    # scan, first-stage agg keyed by near-unique tuples), and the
    # waiters' pair-distinct shuffled the late lines AGAIN. One
    # (orderkey, suppkey) pre-aggregation collapses line volume to
    # distinct pairs once; both counts and the waiters set derive from
    # it (its exchange is reused), with no Expand anywhere. NULL
    # suppkeys are excluded up front — exactly countDistinct's NULL
    # semantics, and a NULL suppkey can never match the supplier join.
    pairs = (
        li.filter(F.col("l_suppkey").isNotNull())
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.coalesce(F.col("late"), F.lit(False))).alias("late"))
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum(F.col("late").cast("long")).alias("n_late"),
    )
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    waiters = (
        pairs.filter(F.col("late"))
        .select("l_orderkey", "l_suppkey")
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .join(
            per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1)),
            "l_orderkey",
            "left_semi",
        )
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    return (
        waiters.join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == nation["n_nationkey"],
            "left_semi",
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 literal (pricing summary report): the
    b13_agg_pricing_summary shape (relational.py) plus the literal
    ORDER BY — the spec's ``DATE '1998-12-01' - 90 days`` IS the
    1998-09-02 cutoff that query already applies. 6 output groups:
    partial aggregation collapses the fact scan before the shuffle and
    the sort is over 6 rows."""
    from iceberg_relative_io_spark.operators.relational import (
        q_agg_pricing_summary,
    )

    return q_agg_pricing_summary(spark, sf_dir).orderBy(
        "l_returnflag", "l_linestatus"
    )


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 literal (order priority checking): orders in 1995-Q2
    with at least one late line. The fixture has no
    l_commitdate/l_receiptdate, so lateness derives from the SAME
    integer-hash offsets Q21 uses (``receipt > commit`` reduces to
    comparing two BIGINT hash digits), identically derived in the
    oracle. The EXISTS compiles to a left-semi join on orderkey —
    one shuffle; the priority agg is 5 groups."""
    late_lines = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            (
                ((F.col("l_orderkey") * 31 + F.col("l_linenumber")) * _LCG)
                % 2_147_483_647
            ).alias("h"),
        )
        .filter(F.expr("(h div 97) % 97 > h % 97"))
        .select("l_orderkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-04-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    return (
        orders.join(
            late_lines,
            orders["o_orderkey"] == late_lines["l_orderkey"],
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


_SHIP_MODES = ["AIR", "FOB", "MAIL", "RAIL", "REG AIR", "SHIP", "TRUCK"]


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 literal (shipping modes and order priority): MAIL/SHIP
    lines received in 1996 that were committed after shipping and
    received after committing. The fixture has no
    l_shipmode/l_commitdate/l_receiptdate: ship mode derives from the
    Q21 hash (``h % 7`` into the literal 7-mode domain),
    ``commit < receipt`` is the Q21 lateness digit test, and
    ``ship < commit`` is an independent hash bit — all identically
    derived in the oracle; the receipt-year window adapts to
    l_shipdate. One orderkey shuffle joins the filtered fact to
    orders; the final agg is 2 groups."""
    h = ((F.col("l_orderkey") * 31 + F.col("l_linenumber")) * _LCG) % 2_147_483_647
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("l_orderkey", h.alias("h"))
        .withColumn(
            "l_shipmode",
            F.element_at(
                F.array(*[F.lit(m) for m in _SHIP_MODES]),
                (F.col("h") % 7 + 1).cast("int"),
            ),
        )
        .filter(
            F.col("l_shipmode").isin("MAIL", "SHIP")
            & F.expr("(h div 97) % 97 > h % 97")  # commit < receipt
            & F.expr("(h div 13) % 2 = 0")  # ship < commit
        )
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_shipmode")
    )


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 literal (promotion effect): the percentage of September
    1995 revenue from PROMO parts (the fixture p_type domain is flat
    categories, so ``LIKE 'PROMO%'`` matches exactly 'PROMO').
    Single-value output per the spec; part broadcasts, the decimal
    discipline matches b10_promo_revenue (relational.py)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("p_type").like("PROMO%"), disc).otherwise(
                        F.lit(0).cast("decimal(28,6)")
                    )
                ).cast("double")
                * 100.0
                / F.sum(disc).cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


QUERIES = {
    "b34_tpch_q1": q_tpch_q1,
    "b34_tpch_q4": q_tpch_q4,
    "b34_tpch_q12": q_tpch_q12,
    "b34_tpch_q14": q_tpch_q14,
    "b34_tpch_q2": q_tpch_q2,
    "b34_tpch_q9": q_tpch_q9,
    "b34_tpch_q11": q_tpch_q11,
    "b34_tpch_q16": q_tpch_q16,
    "b34_tpch_q20": q_tpch_q20,
    "b34_tpch_q21": q_tpch_q21,
    "b34_tpch_q3": q_tpch_q3,
    "b34_tpch_q5": q_tpch_q5,
    "b34_tpch_q6": q_tpch_q6,
    "b34_tpch_q7": q_tpch_q7,
    "b34_tpch_q8": q_tpch_q8,
    "b34_tpch_q10": q_tpch_q10,
    "b34_tpch_q13": q_tpch_q13,
    "b34_tpch_q15": q_tpch_q15,
    "b34_tpch_q17": q_tpch_q17,
    "b34_tpch_q18": q_tpch_q18,
    "b34_tpch_q19": q_tpch_q19,
    "b34_tpch_q22": q_tpch_q22,
}


ORACLE = {
    "b34_tpch_q1": """
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
        ORDER BY l_returnflag, l_linestatus
    """,
    "b34_tpch_q4": f"""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-04-01'
          AND o_orderdate <  TIMESTAMP '1995-07-01'
          AND EXISTS (
            SELECT 1 FROM (
                SELECT l_orderkey,
                       ((l_orderkey * 31 + l_linenumber) * {_LCG}) % 2147483647 AS h
                FROM lineitem) t
            WHERE t.l_orderkey = o_orderkey
              AND (h // 97) % 97 > h % 97)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "b34_tpch_q12": f"""
        WITH li AS (
            SELECT l_orderkey,
                   ((l_orderkey * 31 + l_linenumber) * {_LCG}) % 2147483647 AS h
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
        ),
        modes AS (
            SELECT l_orderkey,
                   CASE h % 7 WHEN 0 THEN 'AIR' WHEN 1 THEN 'FOB'
                              WHEN 2 THEN 'MAIL' WHEN 3 THEN 'RAIL'
                              WHEN 4 THEN 'REG AIR' WHEN 5 THEN 'SHIP'
                              ELSE 'TRUCK' END AS l_shipmode
            FROM li
            WHERE (h // 97) % 97 > h % 97
              AND (h // 13) % 2 = 0
        )
        SELECT l_shipmode,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM modes JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipmode IN ('MAIL', 'SHIP')
        GROUP BY l_shipmode
        ORDER BY l_shipmode
    """,
    "b34_tpch_q14": """
        SELECT ROUND(
            CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                          THEN CAST(l_extendedprice * (1 - l_discount)
                                    AS DECIMAL(28,6))
                          ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
            * 100.0
            / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(28,6))) AS DOUBLE), 6) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1995-09-01'
          AND l_shipdate <  TIMESTAMP '1995-10-01'
    """,
    "b34_tpch_q2": f"""
        WITH {_PARTSUPP_CTE.strip().rstrip()},
        scoped AS (
            SELECT s.s_acctbal, s.s_name, n.n_name, ps.ps_partkey, ps.ps_supplycost,
                   min(ps.ps_supplycost) OVER (PARTITION BY ps.ps_partkey) AS min_cost
            FROM partsupp ps
            JOIN part p ON p.p_partkey = ps.ps_partkey
            JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE p.p_size = 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey, ps_supplycost
        FROM scoped WHERE ps_supplycost = min_cost
        ORDER BY s_acctbal DESC, n_name, s_name, ps_partkey
        LIMIT 100
    """,
    "b34_tpch_q9": f"""
        WITH {_PARTSUPP_CTE.strip().rstrip()}
        SELECT n.n_name,
               CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             - ps.ps_supplycost * l.l_quantity
                             AS DECIMAL(28,6))) AS DOUBLE) AS sum_profit
        FROM lineitem l
        JOIN partsupp ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%red%'
        GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
    """,
    "b34_tpch_q11": f"""
        WITH {_PARTSUPP_CTE.strip().rstrip()},
        scoped AS (
            SELECT ps.ps_partkey, ps.ps_supplycost, ps.ps_availqty
            FROM partsupp ps
            JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            WHERE n.n_name = 'NATION_7'
        ),
        by_part AS (
            SELECT ps_partkey,
                   CAST(SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(28,6)))
                        AS DOUBLE) AS value
            FROM scoped GROUP BY ps_partkey
        ),
        tot AS (
            SELECT CAST(SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(28,6)))
                        AS DOUBLE) * 0.005 AS threshold
            FROM scoped
        )
        SELECT ps_partkey, value FROM by_part, tot WHERE value > threshold
    """,
    "b34_tpch_q16": f"""
        WITH {_PARTSUPP_CTE.strip().rstrip()}
        SELECT p.p_brand, p.p_type, p.p_size,
               CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
        FROM partsupp ps
        JOIN part p ON p.p_partkey = ps.ps_partkey
        WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 4, 7, 10, 14, 19, 25, 28)
        GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    "b34_tpch_q20": f"""
        WITH {_PARTSUPP_CTE.strip().rstrip()},
        half AS (
            SELECT l_partkey AS q_partkey, l_suppkey AS q_suppkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) * 0.5
                       AS half_qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_partkey, l_suppkey
        ),
        picked AS (
            SELECT DISTINCT ps.ps_suppkey
            FROM partsupp ps
            JOIN half h ON h.q_partkey = ps.ps_partkey AND h.q_suppkey = ps.ps_suppkey
            WHERE ps.ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
              AND ps.ps_availqty > h.half_qty
        )
        SELECT s.s_name, s.s_acctbal
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE s.s_suppkey IN (SELECT ps_suppkey FROM picked)
          AND n.n_name = 'NATION_3'
        ORDER BY s.s_name
    """,
    "b34_tpch_q21": f"""
        WITH li AS (
            SELECT l_orderkey, l_suppkey,
                   ((l_orderkey * 31 + l_linenumber) * {_LCG}) % 2147483647 AS h
            FROM lineitem
        ),
        lf AS (
            SELECT l_orderkey, l_suppkey, (h // 97) % 97 > h % 97 AS late FROM li
        ),
        per_order AS (
            SELECT l_orderkey,
                   count(DISTINCT l_suppkey) AS n_supp,
                   count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
            FROM lf GROUP BY l_orderkey
        ),
        waiters AS (
            SELECT DISTINCT l_orderkey, l_suppkey
            FROM lf
            WHERE late
              AND l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
              AND l_orderkey IN (SELECT l_orderkey FROM per_order
                                 WHERE n_supp >= 2 AND n_late = 1)
        )
        SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM waiters w
        JOIN supplier s ON s.s_suppkey = w.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_1'
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 100
    """,
    "b34_tpch_q3": f"""
        SELECT o_orderkey,
               {_REV} AS revenue,
               o_orderdate
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1996-07-01'
          AND l_shipdate  > TIMESTAMP '1996-07-01'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "b34_tpch_q5": f"""
        SELECT n_name, {_REV} AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "b34_tpch_q6": """
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE)
               AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24.0
    """,
    "b34_tpch_q7": f"""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
               {_REV} AS revenue
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey
          AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey
          AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "b34_tpch_q8": """
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
               CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
                             THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))
                             ELSE 0 END) AS DOUBLE) AS nation_revenue,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
                 AS total_revenue,
               ROUND(CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
                                   THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))
                                   ELSE 0 END) AS DOUBLE)
                     / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE),
                     6) AS mkt_share
        FROM part, lineitem, orders, customer, supplier, nation n1, nation n2, region
        WHERE p_partkey = l_partkey
          AND p_type = 'ECONOMY'
          AND l_orderkey = o_orderkey
          AND o_custkey = c_custkey
          AND c_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r_regionkey
          AND r_name = 'AMERICA'
          AND l_suppkey = s_suppkey
          AND s_nationkey = n1.n_nationkey
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY o_year
    """,
    "b34_tpch_q10": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name, {_REV} AS revenue
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-04-01'
          AND l_returnflag = 'R'
          AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "b34_tpch_q13": """
        SELECT c_count, count(*) AS custdist
        FROM (SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer LEFT OUTER JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
              GROUP BY c_custkey)
        GROUP BY c_count
    """,
    "b34_tpch_q15": """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
                     AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier, revenue
        WHERE s_suppkey = supplier_no
          AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    "b34_tpch_q17": """
        SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) / 7.0, 6)
               AS avg_yearly
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND p_brand = 'Brand#3'
          AND l_quantity < 0.2 * (
              SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) / count(*)
              FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    "b34_tpch_q18": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               CAST(t.sum_qty_dec AS DOUBLE) AS sum_qty
        FROM orders
        JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(28,4))) AS sum_qty_dec
              FROM lineitem GROUP BY l_orderkey
              HAVING SUM(CAST(l_quantity AS DECIMAL(28,4))) > 250) t
          ON o_orderkey = t.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    "b34_tpch_q19": """
        SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
               AS revenue
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1.0 AND 11.0)
            OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
                AND l_quantity BETWEEN 10.0 AND 20.0)
            OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
                AND l_quantity BETWEEN 20.0 AND 30.0))
    """,
    "b34_tpch_q22": """
        SELECT substr(c_name, 17, 2) AS cntrycode,
               count(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_acctbal > (
              SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) / count(*)
              FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY cntrycode
    """,
}
