"""Physical-plan hygiene — the 100 TB posture checks. Correctness says the
answer is right; these say the PLAN is the one that survives 1000×.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from laygo_python_spark.plans import (
    count_exchanges,
    has_broadcast_join,
    has_pushed_filters,
    scan_read_schema,
)
from laygo_python_spark.session import read_table


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    df = read_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 30).select("l_orderkey")
    assert has_pushed_filters(df)


def test_column_pruning(spark, sf_dir):
    df = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    cols = scan_read_schema(df)
    assert set(cols) == {"l_orderkey", "l_quantity"}


def test_dim_join_is_broadcast(spark, sf_dir):
    from laygo_python_spark.queries.relational import revenue_by_nation

    assert has_broadcast_join(revenue_by_nation(spark, sf_dir))


def test_q1_is_two_stage_agg(spark, sf_dir):
    """Q1 should be scan → partial agg → single exchange → final agg."""
    from laygo_python_spark.queries.relational import q1_pricing_summary

    df = q1_pricing_summary(spark, sf_dir)
    assert count_exchanges(df) <= 1
    assert has_pushed_filters(df)


def test_topk_avoids_global_sort(spark, sf_dir):
    from laygo_python_spark.queries.relational import top_k_orders

    plan = top_k_orders(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
