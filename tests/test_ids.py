"""assign_sequential_ids (operators/ids.py) — the DataFrame zipWithIndex.

Pins: dense 0..n-1 ids following the requested total order, invariant to
the input's partitioning, and a plan with no single-partition funnel.
"""

from __future__ import annotations

from laygo_python_spark.operators.ids import assign_sequential_ids
from laygo_python_spark.plans import physical_plan


def test_ids_are_dense_and_ordered(spark):
    df = spark.range(0, 1000).selectExpr("id AS k", "CAST(id % 7 AS INT) AS grp")
    out = assign_sequential_ids(df, order_by=["k"], num_partitions=8)
    rows = sorted(out.collect(), key=lambda r: r["seq_id"])
    assert [r["seq_id"] for r in rows] == list(range(1000))
    # seq_id order must equal the order_by total order.
    assert [r["k"] for r in rows] == sorted(r["k"] for r in rows)


def test_ids_invariant_to_input_partitioning(spark):
    base = spark.range(0, 500).selectExpr("CAST(id AS STRING) AS s", "id AS k")
    a = assign_sequential_ids(base.repartition(3), order_by=["k"], num_partitions=4)
    b = assign_sequential_ids(base.repartition(17), order_by=["k"], num_partitions=8)
    assert sorted((r["k"], r["seq_id"]) for r in a.collect()) == sorted(
        (r["k"], r["seq_id"]) for r in b.collect()
    )


def test_ids_plan_has_no_single_partition_funnel(spark):
    df = spark.range(0, 1000).selectExpr("id AS k")
    out = assign_sequential_ids(df, order_by=["k"], num_partitions=8)
    plan = physical_plan(out)
    assert "SinglePartition" not in plan
    assert "rangepartitioning" in plan.lower() or "Scan ExistingRDD" in plan
