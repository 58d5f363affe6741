"""cogroup_apply — per-key two-table map (operators/cogroup.py).

The reference has no two-input operator (laygo/pipeline.py:94-112 is a
single chunk stream), so these tests pin the uplift semantics: every key
from EITHER side produces exactly one group call, with the absent side
arriving as an empty frame.
"""

from __future__ import annotations

import pandas as pd

from laygo_python_spark.operators.cogroup import cogroup_apply


def _make_summarize():
    # Built inside a function so cloudpickle ships it by value — the test
    # module itself is not importable on executor workers.
    def summarize(lg: pd.DataFrame, rg: pd.DataFrame) -> pd.DataFrame:
        key = lg["k"].iloc[0] if len(lg) else rg["k"].iloc[0]
        return pd.DataFrame(
            {"k": [key], "n_left": [len(lg)], "n_right": [len(rg)], "right_sum": [float(rg["v"].sum()) if len(rg) else 0.0]}
        )

    return summarize


def test_cogroup_full_outer_key_coverage(spark):
    left = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k int, s string")
    right = spark.createDataFrame([(2, 10.0), (2, 5.0), (3, 7.0)], "k int, v double")
    out = cogroup_apply(left, right, on=["k"], fn=_make_summarize(), schema="k int, n_left long, n_right long, right_sum double")
    rows = {r["k"]: r for r in out.collect()}
    # key 1: left-only (right frame empty); key 3: right-only; key 2: both.
    assert set(rows) == {1, 2, 3}
    assert (rows[1]["n_left"], rows[1]["n_right"], rows[1]["right_sum"]) == (2, 0, 0.0)
    assert (rows[2]["n_left"], rows[2]["n_right"], rows[2]["right_sum"]) == (1, 2, 15.0)
    assert (rows[3]["n_left"], rows[3]["n_right"], rows[3]["right_sum"]) == (0, 1, 7.0)


def test_cogroup_group_rows_arrive_together(spark):
    # All rows of a key land in one fn call even across input partitions.
    left = spark.range(0, 100).selectExpr("CAST(id % 5 AS INT) AS k", "CAST(id AS STRING) AS s").repartition(8)
    right = spark.range(0, 200).selectExpr("CAST(id % 5 AS INT) AS k", "CAST(id AS DOUBLE) AS v").repartition(8)
    out = cogroup_apply(left, right, on=["k"], fn=_make_summarize(), schema="k int, n_left long, n_right long, right_sum double")
    rows = out.collect()
    assert len(rows) == 5
    assert all(r["n_left"] == 20 and r["n_right"] == 40 for r in rows)


def _make_summarize_arrow():
    import pyarrow as pa

    def summarize(lg: pa.Table, rg: pa.Table) -> pa.Table:
        key = lg["k"][0].as_py() if lg.num_rows else rg["k"][0].as_py()
        rsum = 0.0
        if rg.num_rows:
            rsum = float(sum(v.as_py() for v in rg["v"]))
        return pa.table(
            {
                "k": pa.array([key], pa.int32()),
                "n_left": pa.array([lg.num_rows], pa.int64()),
                "n_right": pa.array([rg.num_rows], pa.int64()),
                "right_sum": pa.array([rsum], pa.float64()),
            }
        )

    return summarize


def test_cogroup_arrow_matches_pandas(spark):
    # The arrow transport is a drop-in for the pandas one: same shuffle
    # plan, same per-key contract, identical results.
    from laygo_python_spark.operators.cogroup import cogroup_apply_arrow

    left = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k int, s string")
    right = spark.createDataFrame([(2, 10.0), (2, 5.0), (3, 7.0)], "k int, v double")
    schema = "k int, n_left long, n_right long, right_sum double"
    via_pandas = cogroup_apply(left, right, on=["k"], fn=_make_summarize(), schema=schema)
    via_arrow = cogroup_apply_arrow(left, right, on=["k"], fn=_make_summarize_arrow(), schema=schema)
    assert sorted(map(tuple, via_pandas.collect())) == sorted(map(tuple, via_arrow.collect()))
