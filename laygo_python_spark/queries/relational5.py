"""Fifth relational batch: the remaining TPC-H plan shapes expressible
over the fixture schemas — Q6 (pure filter+agg pushdown), Q7 (two-role
dimension join), Q9 (multi-way star join + derived year), Q15 (aggregate
consumed twice), Q17 (correlated scalar subquery), Q19 (disjunctive join
predicate). The fixtures lack partsupp and the shipmode/receiptdate
columns, so Q2/Q11/Q12/Q20/Q21 have no faithful shape here; predicates
below are adapted to the synthetic vocabulary (NATION_n, Brand#n — see
FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the canonical pushdown showcase — three
    conjunctive predicates and one global aggregate, no joins, no
    shuffle beyond the single partial+final agg. All three filters reach
    the parquet scan as PushedFilters; only 4 of 11 lineitem columns are
    read (ReadSchema). At 100 TB this plan is scan-bound and emits one
    row per task."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): the same dimension table joined
    in TWO roles (supplier's nation vs customer's nation) with a
    disjunctive cross-nation predicate, yearly revenue between the pair.
    Both nation joins broadcast (25 rows); the nation filters apply
    BEFORE the fact join, so only ~2/25 of suppliers/customers survive
    into the shuffle — at 100 TB the big join's build side is pre-shrunk
    by two broadcast semi-filters."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n_pair = ["NATION_1", "NATION_2"]
    # Filter each dimension to the two nations first (broadcast joins),
    # then the disjunctive pair predicate only has to drop same-nation rows.
    supp_n = supp.join(
        F.broadcast(nation.filter(F.col("n_name").isin(n_pair))),
        supp.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust_n = cust.join(
        F.broadcast(nation.filter(F.col("n_name").isin(n_pair))),
        cust.c_nationkey == nation.n_nationkey,
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
        .join(F.broadcast(cust_n), orders.o_custkey == cust_n.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, year(l_shipdate) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity), 2) AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, l_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): star join of the fact table
    against part (filtered by a LIKE pattern), supplier, and nation,
    with a derived-expression measure and a derived group key
    (year(shipdate)). The fixtures have no partsupp, so supply cost is
    modeled as a retail-price fraction — the plan shape (selective dim
    filter → broadcast → shuffle agg on derived keys) is what Q9
    exercises. The part filter is applied before the join so the
    broadcast ships only matching parts."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(profit), 2).alias("profit"))
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR-of-ANDs predicate that spans BOTH sides of
    a join. Catalyst can't push the whole disjunction below the join,
    but it CAN push the derived single-side envelopes (brand IN (...),
    size <= 15 on part; quantity BETWEEN 1 AND 30 on lineitem) — we
    state them explicitly so the parquet scans prune before the
    broadcast join, the optimization Q19 exists to test."""
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#3") & (F.col("p_size").between(1, 15))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity").between(1, 30))
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: an aggregate (quarterly revenue per supplier)
    consumed TWICE — once as the join input, once reduced to its max for
    the filter. The max is a 1-row aggregate broadcast back as a cross
    join — NOT an unpartitioned window max, which would funnel every
    supplier's revenue row through a single task at scale. Both
    consumers sit on the same groupBy shuffle, so Spark's exchange
    reuse evaluates the revenue aggregate once. Revenue is rounded to
    cents BEFORE the equality compare — raw double sums differ across
    reduction orders, rounded money is stable."""
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01"))
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    top = rev.crossJoin(F.broadcast(mx)).filter(F.col("total_rev") == F.col("mx"))
    supp = _t(spark, sf_dir, "supplier")
    return supp.join(top, supp.s_suppkey == top.l_suppkey).select("s_suppkey", "s_name", "total_rev")


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly, count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#5'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: a CORRELATED scalar subquery (per-part average
    quantity) guarding the outer row — written as SQL so Catalyst's
    subquery de-correlation turns it into an aggregate + join rather
    than a per-row re-execution; parts_above_avg_price covers the
    uncorrelated twin."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q17")
    _t(spark, sf_dir, "part").createOrReplaceTempView("part_q17")
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly, count(*) AS n_lines
        FROM lineitem_q17 JOIN part_q17 ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#5'
          AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                            FROM lineitem_q17 l2 WHERE l2.l_partkey = p_partkey)
        """
    )
