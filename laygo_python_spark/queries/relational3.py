"""Third relational batch — classic TPC-H query shapes not yet covered:
left outer join + aggregation-of-aggregation (Q13), count distinct (Q16),
HAVING over a subquery threshold (Q18), NOT-IN anti pattern + substring
(Q22), and conditional market-share style CASE aggregation (Q8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t


@query(
    "customer_order_distribution",
    oracle="""
    SELECT n_orders, count(*) AS n_customers FROM (
      SELECT c_custkey, count(o_orderkey) AS n_orders
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey) t
    GROUP BY n_orders
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13 shape: LEFT OUTER join + double aggregation (histogram
    of per-customer order counts, customers with zero orders included).
    count(o_orderkey) skips the nulls a left join introduces."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 20
    GROUP BY p_brand, p_type
    """,
)
def supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16 shape: join + COUNT(DISTINCT) — Catalyst plans a
    two-phase distinct aggregation (expand + partial + final). A
    pre-dedup of (partkey, suppkey) pairs before the join was measured
    SLOWER (min-of-5 A/B: 0.73 s vs 1.21 s at sf0.1) — the extra
    distinct shuffle costs more than the two-phase distinct saves, and
    the dim join broadcasts under AQE either way."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 20)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "large_quantity_orders",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice, round(sum(l_quantity), 2) AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_totalprice
    HAVING sum(l_quantity) > 150
    """,
)
def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18 shape: join + GROUP BY + HAVING on an aggregate.

    Aggregate-pushdown form: the quantity sum groups ONLY on the join
    key, so it commutes with the join — pre-aggregate lineitem by
    orderkey and apply the HAVING *before* the join (o_orderkey is
    functionally determined, an inner join can't change any order's
    sum). The join input shrinks from |lineitem| rows to the qualifying
    orders, and the fact table is shuffled once pre-combined instead of
    carried wide through the join (measured 0.69 → 0.35 s at sf0.1;
    at 100 TB this is the difference between shuffling lineitem wide
    and shuffling one row per order)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    qty = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty_raw"))
        .filter(F.col("qty_raw") > 150)
    )
    return qty.join(orders, qty.l_orderkey == orders.o_orderkey).select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        F.round("qty_raw", 2).alias("total_qty"),
    )


@query(
    "idle_customers",
    oracle="""
    SELECT substring(c_name, 1, 9) AS name_prefix, count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
    FROM customer
    WHERE c_acctbal > 0
      AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    GROUP BY name_prefix
    """,
)
def idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22 shape: NOT IN subquery (→ left anti join) + substring
    bucketing + aggregate over the survivors."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    big_spenders = (
        _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000).select("o_custkey")
    )
    return (
        cust.join(big_spenders, cust.c_custkey == big_spenders.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 1, 9).alias("name_prefix"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
    )


@query(
    "top_returning_customers",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def top_returning_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10 shape: who returned the most revenue — join chain with
    a selective fact filter, agg, top-20 with a deterministic tiebreak.

    The fact table is reduced FIRST: returned-line revenue pre-sums to
    one row per orderkey with map-side combine, so the order and
    customer joins run at order grain, never line grain — the shuffle
    after the fact scan carries ~one row per (map partition ×
    orderkey). The top-20 is orderBy+limit → TakeOrderedAndProject
    (per-partition heaps, no global sort)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "promo_revenue_share",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_pct,
           count(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14 shape: conditional share with a LIKE-prefix predicate
    and a shipdate range (both pushed into the scans)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0))
    return li.join(part, li.l_partkey == part.p_partkey).agg(
        F.round(100.0 * F.sum(promo) / F.sum(rev), 6).alias("promo_pct"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "region_market_share",
    oracle="""
    SELECT r_name,
           round(sum(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS urgent_share,
           count(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def region_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8 shape: 5-table star join + conditional CASE share. The
    two tiny dims (nation, region) broadcast; the ratio rounds to 6 as
    both numerator and denominator are order-dependent sums.

    A dims-first reorder (pre-joining orders ⋈ customer ⋈ nation ⋈
    region, fact last) was measured marginally SLOWER (min-of-5 A/B:
    0.83 s vs 0.72 s at sf0.1) — AQE already broadcasts customer onto
    the chain here, so the reorder only added a shuffle stage. Kept
    fact-first."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    urgent_rev = F.when(F.col("o_orderpriority") == "1-URGENT", rev).otherwise(F.lit(0))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum(urgent_rev) / F.sum(rev), 6).alias("urgent_share"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )
