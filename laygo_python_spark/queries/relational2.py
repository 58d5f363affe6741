"""Second relational batch: set operations, cube, window frames, scalar
subqueries, grouped applyInPandas — rounding out SURVEY.md §2.4-2.6 and
§2.12 coverage.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t
from laygo_python_spark.transformer import Transformer


@query(
    "intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (deduplicating) — nations having both customers and
    suppliers."""
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return Transformer().intersect(supp)(cust)


@query(
    "except_all_statuses",
    oracle="""
    SELECT o_orderstatus AS status FROM orders WHERE o_totalprice > 100000
    EXCEPT ALL
    SELECT o_orderstatus FROM orders WHERE o_totalprice > 400000
    """,
)
def except_all_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference, preserves multiplicity)."""
    orders = _t(spark, sf_dir, "orders")
    hi = orders.filter(F.col("o_totalprice") > 100000).select(F.col("o_orderstatus").alias("status"))
    very_hi = orders.filter(F.col("o_totalprice") > 400000).select(F.col("o_orderstatus").alias("status"))
    return Transformer().except_all(very_hi)(hi)


@query(
    "cube_order_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts/revenue across every (status, priority) combination —
    CUBE = all 2^n grouping sets in one shuffle."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@query(
    "running_sum_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS UNBOUNDED PRECEDING), 2) AS running_total,
           CAST(count(*) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS UNBOUNDED PRECEDING) AS INT) AS order_seq
    FROM orders
    """,
)
def running_sum_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window with an explicit ROWS frame — running totals per
    customer over order history. One shuffle on the partition key."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        F.count(F.lit(1)).over(w).cast("int").alias("order_seq"),
    )


@query(
    "parts_above_avg_price",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
    """,
)
def parts_above_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery comparison — Catalyst plans the aggregate once and
    broadcasts the scalar into the filter."""
    part = _t(spark, sf_dir, "part")
    part.createOrReplaceTempView("part_v")
    return spark.sql(
        "SELECT p_partkey, p_name, p_retailprice FROM part_v "
        "WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part_v)"
    )


@query(
    "grouped_zscore",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round((o_totalprice - avg(o_totalprice) OVER (PARTITION BY o_orderstatus))
                 / stddev_samp(o_totalprice) OVER (PARTITION BY o_orderstatus), 4) AS z
    FROM orders
    """,
)
def grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group arbitrary Python (applyInPandas): z-score of order value
    within its status group. The grouped escape hatch of SURVEY.md §2.12
    — pandas receives each key group whole. (Rounded to 4: pandas and
    DuckDB aggregate the mean/std in different orders, so low bits of
    the raw doubles differ legitimately.)"""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mean, std = pdf["o_totalprice"].mean(), pdf["o_totalprice"].std(ddof=1)
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_orderstatus": pdf["o_orderstatus"],
                "z": ((pdf["o_totalprice"] - mean) / std).round(4),
            }
        )

    t = Transformer().group_apply(
        ["o_orderstatus"], zscore, schema="o_orderkey long, o_orderstatus string, z double"
    )
    return t(_t(spark, sf_dir, "orders"))
