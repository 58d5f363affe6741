"""Sixth relational batch — the remaining TPC-H plan shapes, adapted
where the fixtures lack a column (no partsupp, no l_shipmode /
l_commitdate / l_receiptdate; FIXTURES.md §B):

- Q5  local supplier volume (multi-condition join: customer and supplier
  must share a nation) — faithful.
- Q12 shipping-priority counts (CASE-count agg) — "late" adapted to
  shipdate > orderdate + 60 days, grouped by l_returnflag instead of the
  absent l_shipmode.
- Q21 suppliers who kept orders waiting (EXISTS + NOT EXISTS double
  correlation) — lateness adapted as above.
- Q2  min-cost supplier (correlated max subquery + join-back) — adapted
  to per-nation top-acctbal supplier; partsupp cost is absent.
- Q11 important stock (HAVING over a scalar-subquery fraction of a
  global total) — adapted to per-part revenue share from lineitem.
- Q20 excess availability (nested semi-join chain) — adapted to
  suppliers shipping a large volume of a name-filtered part family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue from orders where the
    supplier and the customer live in the SAME nation of one region —
    the multi-condition join (equi on suppkey PLUS equi on nationkey) is
    the shape Q5 exists to test.

    Plan: region-filtered nation (5→~5 rows) broadcasts into supplier →
    the ~20-row (suppkey, nationkey, n_name) map broadcasts into the
    fact join, so the only shuffle is lineitem⋈orders⋈customer on their
    natural keys; the orderdate range is pushed to the orders scan. At
    100 TB the nation co-membership check rides the broadcast — no extra
    exchange versus a plain 3-table join."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    nation_asia = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp_n = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation_asia), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp_n),
            (li.l_suppkey == supp_n.s_suppkey) & (cust.c_nationkey == supp_n.s_nationkey),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@query(
    "q12_late_shipment_priorities",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_returnflag
    """,
)
def q12_late_shipment_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / order priority): join + CASE
    count-split agg. The fixtures lack l_shipmode and l_receiptdate
    (reference vocabulary: FIXTURES.md §B), so the group key is
    l_returnflag and "late" is shipdate > orderdate + 60 days — a
    join-predicate the engines evaluate identically on timestamps.
    Two-stage (partial+final) agg over 3 groups; the orders side carries
    only (orderkey, priority, orderdate)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the hardest
    correlation pattern in the suite — an EXISTS (another supplier in
    the same order) AND a NOT EXISTS (no OTHER supplier was late), both
    correlated on orderkey. Lateness adapted to shipdate > orderdate +
    90 days (no receipt/commit dates in the fixtures).

    Spark-first: instead of two correlated semi/anti joins re-scanning
    lineitem (3 fact scans), fold BOTH existence facts into one
    per-order aggregation with map-side partials: ≥2 distinct suppliers
    ≡ min(suppkey) ≠ max(suppkey) ≡ the EXISTS; exactly one LATE
    supplier ≡ min(late suppkey) = max(late suppkey) ≡ the NOT EXISTS —
    and since every qualifying order has a single late supplier, his
    numwait contribution is just that order's late-line count, which
    the same aggregate carries. The shuffle moves one partial row per
    (map partition × orderkey) — not the joined lines a window pass
    would buffer whole — then a broadcast of supplier names onto the
    few thousand surviving orders. At 100 TB this is one combiner-
    compressed fact shuffle versus the textbook plan's three full
    scans."""
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    late_supp = F.when(late, F.col("l_suppkey"))
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("l_orderkey", "l_suppkey", late.alias("is_late"), late_supp.alias("ls"))
        .groupBy("l_orderkey")
        .agg(
            (F.min("l_suppkey") != F.max("l_suppkey")).alias("multi_supp"),
            F.min("ls").alias("late_lo"),
            F.max("ls").alias("late_hi"),
            F.sum(F.col("is_late").cast("long")).alias("n_late_lines"),
        )
        .filter(F.col("multi_supp") & F.col("late_lo").isNotNull() & (F.col("late_lo") == F.col("late_hi")))
    )
    return (
        per_order.join(F.broadcast(supp), F.col("late_lo") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
    )


@query(
    "q2_top_supplier_per_nation",
    oracle="""
    SELECT s_name, s_acctbal, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
                       WHERE s2.s_nationkey = supplier.s_nationkey)
    """,
)
def q2_top_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): a correlated aggregate
    subquery whose result joins back on equality — "the row whose value
    equals its group's extremum". The fixtures have no partsupp/cost, so
    the extremum is per-nation max account balance within one region.

    De-correlated as a window max over s_nationkey computed ONCE, not a
    per-row re-executed subquery (nationkey determines region, so
    filtering to the region first cannot change any nation's max). The
    region restriction rides the nation broadcast; the only shuffle is
    the window's partitionBy on nationkey."""
    nation_eur = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    w = Window.partitionBy("s_nationkey")
    return (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation_eur), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("mx", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("mx"))
        .select("s_name", "s_acctbal", "n_name")
    )


@query(
    "q11_important_part_revenue",
    oracle="""
    WITH part_rev AS (
      SELECT l_partkey, CAST(round(100 * sum(l_extendedprice * (1 - l_discount))) AS BIGINT) AS rev_cents
      FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey, rev_cents
    FROM part_rev
    WHERE rev_cents > (SELECT 0.0008 * sum(rev_cents) FROM part_rev)
    """,
)
def q11_important_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): a grouped aggregate kept only
    where it exceeds a FRACTION OF THE GLOBAL TOTAL of the same
    aggregate — the scalar-subquery-threshold pattern. Adapted to
    per-part revenue (no partsupp in the fixtures).

    Oracle-stability: per-part revenue is rounded to exact integer
    cents FIRST, so the global total is an exact BIGINT sum and the
    0.0008× threshold compare cannot flip on float reduction order.

    Scale: the threshold is attached via crossJoin(broadcast(1-row
    total)) rather than an unpartitioned window, so the |parts|-row
    filter stays fully parallel (an empty-partitionBy window would
    funnel every row through one task)."""
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.round(100 * F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cast("long")
        .alias("rev_cents")
    )
    total = rev.agg((0.0008 * F.sum("rev_cents")).alias("thresh"))
    return (
        rev.crossJoin(F.broadcast(total))
        .filter(F.col("rev_cents") > F.col("thresh"))
        .select("l_partkey", "rev_cents")
    )


@query(
    "q20_excess_shippers",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey, CAST(sum(l_quantity) AS BIGINT) AS qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'blue%'
      GROUP BY l_suppkey
      HAVING sum(l_quantity) > 1900)
    SELECT s_name, n_name, qty
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN shipped ON s_suppkey = l_suppkey
    """,
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): a nested semi-join
    chain — part-name filter → per-supplier shipped volume → HAVING
    threshold → restrict the supplier list. Adapted: volume of 'blue%'
    parts above a fixed threshold (no partsupp availqty to halve).

    Plan: the name-filtered part list broadcasts into the fact scan
    (pushed LIKE on the part side), one partial+final agg on suppkey,
    and the surviving ~dozens of suppkeys broadcast into supplier.
    l_quantity values are small integers stored as doubles, so the sum
    is exact and the BIGINT cast is deterministic on both engines."""
    blue = _t(spark, sf_dir, "part").filter(F.col("p_name").like("blue%")).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem")
    shipped = (
        li.join(F.broadcast(blue), li.l_partkey == blue.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty_raw"))
        .filter(F.col("qty_raw") > 1900)
        .select("l_suppkey", F.col("qty_raw").cast("long").alias("qty"))
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(shipped), supp.s_suppkey == shipped.l_suppkey)
        .select("s_name", "n_name", "qty")
    )
