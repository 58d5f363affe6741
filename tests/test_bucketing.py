"""Bucketed co-located joins — the write-time partitioning strategy that
kills the fact-fact shuffle at 100 TB (README house rule). Verifies the
physical plan: a join of two tables bucketed on the join key runs with
ZERO Exchange operators.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from laygo_python_spark.session import read_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    read_table(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("orders_bucketed")
    read_table(spark, sf_dir, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("lineitem_bucketed")
    yield "orders_bucketed", "lineitem_bucketed"
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    orders_t, li_t = bucketed_tables
    # force the sort-merge path so the bucket layout (not a broadcast)
    # is what avoids the shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table(li_t)
        orders = spark.table(orders_t)
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.sum("l_quantity").alias("q"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the JOIN itself must not shuffle; the only exchange allowed is
        # the one feeding the final aggregation
        join_part = plan.split("HashAggregate")[-1]
        assert "Exchange" not in join_part, join_part[:2000]
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_results_match_plain_join(spark, sf_dir, bucketed_tables):
    orders_t, li_t = bucketed_tables
    li, orders = read_table(spark, sf_dir, "lineitem"), read_table(spark, sf_dir, "orders")
    plain = {
        r.o_orderstatus: round(r.q, 2)
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.sum("l_quantity").alias("q"))
        .collect()
    }
    bucketed = {
        r.o_orderstatus: round(r.q, 2)
        for r in spark.table(li_t)
        .join(spark.table(orders_t), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.sum("l_quantity").alias("q"))
        .collect()
    }
    assert bucketed == plain
