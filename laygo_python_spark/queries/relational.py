"""Relational capability uplift — absent in the reference (SURVEY.md §2.4-2.6
document zero joins/group-bys/sorts/windows there), exposed as first-class
engine queries with DuckDB oracles.

Scale notes (100 TB posture):
- Filters/projections are plain Column exprs → parquet pushdown + pruning.
- Dimension joins broadcast the small side explicitly (nation/region);
  fact-fact joins stay sort-merge and rely on AQE for skew.
- Aggregations are expressed via groupBy().agg() so Catalyst plans
  partial (map-side) + final aggregation — no shuffle of raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t

_Q1_CUTOFF = "1998-09-02 00:00:00"


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: scan → filter (pushed to parquet) →
    partial+final agg → tiny result. The flagship query (SURVEY.md §7.5)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer
    JOIN orders    ON c_custkey = o_custkey
    JOIN lineitem  ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join chain + agg + top-k. customer filter first (selective), then
    join orders→lineitem; ordering has a deterministic l_orderkey tiebreak
    so the top-10 cut is oracle-stable."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "revenue_by_nation",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact→dim star join. nation is broadcast explicitly (it is tiny at
    every SF); lineitem⋈orders stays sort-merge/AQE. At 100 TB the orders
    side would be bucketed on o_orderkey to kill that shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@query(
    "top_k_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: Spark plans TakeOrderedAndProject — per-partition heap then
    driver merge of k×partitions rows, never a global sort."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


@query(
    "window_top3_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def window_top3_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window — one shuffle on the partition key; Spark 3.5+
    inserts a WindowGroupLimit so only 3 rows per key survive the sort."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "semi_join_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers WITH at least one urgent order — left-semi join (existence
    probe; the orders side never appears in the output)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "anti_join_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with NO orders at all — left-anti join (NOT EXISTS)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "order_priority_check",
    oracle="""
    SELECT o_orderpriority, count(*) AS n
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-style: semi-join with a non-equi residual condition + agg.

    The EXISTS over lines of the order with shipdate past orderdate is
    equivalent to ``max(l_shipdate) > o_orderdate`` — so pre-aggregate
    lineitem to one (orderkey, max shipdate) row with map-side combine
    and make the semi an equi-join + residual filter on the TINY
    aggregate. The fact table's shuffle carries one row per orderkey
    per map partition instead of every line; at 100 TB that is the
    difference between shuffling the fact table and shuffling ~1% of
    it."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    last_ship = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("max_ship"))
    return (
        orders.join(last_ship, orders.o_orderkey == last_ship.l_orderkey)
        .filter(F.col("max_ship") > F.col("o_orderdate"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "rollup_qty",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity totals at (flag, status), (flag), and grand-total levels in
    one ROLLUP pass."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "pivot_status_qty",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS qty_open,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS qty_fulfilled
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_status_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list — never let Spark scan for
    distinct pivot values at 100 TB."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .sum("l_quantity")
        .select(
            "l_returnflag",
            F.round(F.col("O"), 2).alias("qty_open"),
            F.round(F.col("F"), 2).alias("qty_fulfilled"),
        )
    )


@query(
    "events_json_k_by_type",
    oracle="""
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def events_json_k_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: get_json_object stays JVM-side."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"), F.count(F.lit(1)).alias("n")
    )


@query(
    "events_json_schema_parse",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS INT) > 80
    """,
)
def events_json_schema_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-directed JSON parsing (from_json with an explicit struct) —
    the typed alternative to path extraction: one parse, typed columns,
    predicate on the parsed value pushed through the projection."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id", F.from_json("props", "k INT").alias("p")
    ).select("event_id", F.col("p.k").alias("k"))
    return parsed.filter(F.col("k") > 80)


@query(
    "sessionize_users",
    oracle="""
    WITH g AS (
      SELECT user_id,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions
    FROM g GROUP BY user_id
    """,
)
def sessionize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag+gap (30 min). Gap math is integer
    microseconds on both sides so the oracle can't diverge on float
    truncation. One shuffle on user_id serves both the window and the agg."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    new_session = F.when(
        F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > 1_800_000_000), 1
    ).otherwise(0)
    return (
        ev.select("user_id", new_session.alias("new_session"))
        .groupBy("user_id")
        .agg(F.sum("new_session").cast("long").alias("n_sessions"))
    )


@query(
    "hourly_event_stats",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation in batch form (the streaming twin lives
    in streaming_ops). Hour is emitted as a string so Spark and DuckDB
    hash the same representation."""
    ev = _t(spark, sf_dir, "events")
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss")
    return ev.groupBy(hour.alias("hour"), "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )


@query(
    "distinct_flags",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a two-column projection (hash-dedup shuffle)."""
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "router_order_tiers",
    oracle="""
    SELECT CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 150000 THEN 'mid'
                ELSE 'low' END AS tier,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY tier
    """,
)
def router_order_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The branch-router semantics (first matching condition wins,
    laygo/pipeline.py:390-422) compiled to a single CASE — the shape that
    scales: one pass, no fan-out of the scan. Pipeline.branch offers the
    multi-output form."""
    tier = (
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("low")
    )
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(tier.alias("tier"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )
