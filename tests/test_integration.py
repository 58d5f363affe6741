"""Integration tests — mirrors the reference's tests/test_integration.py
scenarios: ETL patterns over dict records, multi-stage pipelines with
shared-context statistics, context isolation between pipelines, and
dirty-data salvage (FIXTURES.md §A2/A5).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from laygo_python_spark import Context, Pipeline, Transformer

EMPLOYEES = [
    {"name": "Alice", "age": 34, "salary": 62000},
    {"name": "Bob", "age": 25, "salary": 48000},
    {"name": "Carol", "age": 41, "salary": 75000},
    {"name": "Dan", "age": 29, "salary": 52000},  # passes age, fails salary filter
    {"name": "Eve", "age": 38, "salary": 71000},
]


def test_etl_filter_project(spark):
    """Reference tests/test_integration.py:50-57: filter age>28 AND
    salary>55000 → project name."""
    result, _ = (
        Pipeline(EMPLOYEES, spark=spark)
        .transform(lambda t: t.filter((F.col("age") > 28) & (F.col("salary") > 55000)).select("name"))
        .to_list()
    )
    assert sorted(r["name"] for r in result) == ["Alice", "Carol", "Eve"]


def test_etl_derived_columns(spark):
    """Reference README.md:128-133: annual/monthly salary derivation."""
    result, _ = (
        Pipeline(EMPLOYEES, spark=spark)
        .transform(
            lambda t: t.map(
                annual_salary=F.col("salary"),
                monthly_salary=(F.col("salary") / 12),
            ).select("name", "annual_salary", "monthly_salary")
        )
        .to_list()
    )
    by_name = {r["name"]: r for r in result}
    assert by_name["Alice"]["annual_salary"] == 62000
    assert by_name["Alice"]["monthly_salary"] == 62000 / 12


def test_multi_stage_with_context_statistics(spark):
    """Reference tests/test_integration.py:85-99: pipeline stages update
    shared statistics while transforming."""
    ctx = Context({"run_id": "r42"}, spark=spark)
    ctx.counter("n_seen")
    ctx.counter("total_salary")

    def stats(pdf: pd.DataFrame, c) -> None:
        c["n_seen"] += len(pdf)
        c["total_salary"] += int(pdf.salary.sum())

    result, snapshot = (
        Pipeline(EMPLOYEES, spark=spark, context=ctx)
        .apply(Transformer().tap(stats).filter(F.col("age") >= 30).select("name", "salary"))
        .to_list()
    )
    assert sorted(r["name"] for r in result) == ["Alice", "Carol", "Eve"]
    assert snapshot["run_id"] == "r42"
    assert snapshot["n_seen"] == 5
    assert snapshot["total_salary"] == sum(e["salary"] for e in EMPLOYEES)


def test_context_isolation_between_pipelines(spark):
    """Reference tests/test_integration.py:145-160: two pipelines must
    not share counters unless given the same Context."""
    c1, c2 = Context(spark=spark), Context(spark=spark)
    c1.counter("n")
    c2.counter("n")

    def count(pdf, c):
        c["n"] += len(pdf)

    Pipeline([1, 2, 3], spark=spark, context=c1).apply(Transformer().tap(count)).consume()
    Pipeline([1, 2], spark=spark, context=c2).apply(Transformer().tap(count)).consume()
    assert c1.to_dict()["n"] == 3
    assert c2.to_dict()["n"] == 2


def test_dirty_data_salvage(spark):
    """Reference tests/test_integration.py:59-82 (FIXTURES.md §A5): mixed
    raw strings — numeric ones survive conversion, garbage is dropped,
    error count observed. Asserts on counts and surviving rows, not
    batch shapes (SURVEY.md §7.4.2)."""
    dirty = [
        {"raw": "1"},
        {"raw": "2"},
        {"raw": "3.0"},
        {"raw": "invalid"},
        {"raw": "5"},
        {"raw": None},
        {"raw": "7"},
    ]
    ctx = Context(spark=spark)
    ctx.counter("errors")

    def parse(pdf: pd.DataFrame) -> pd.DataFrame:
        # float() raises for 'invalid'/None — per-row salvage drops them
        return pd.DataFrame({"value": [float(x) for x in pdf["raw"]]})

    def on_error(chunk, exc, c):
        c["errors"] += len(chunk)

    result, snapshot = (
        Pipeline(dirty, spark=spark, context=ctx)
        .catch(parse, schema="value double", on_error=on_error, mode="row")
        .to_list()
    )
    assert sorted(result) == [1.0, 2.0, 3.0, 5.0, 7.0]
    assert snapshot["errors"] == 2


def test_mixed_dataframe_and_python_sources(spark):
    df = spark.createDataFrame([(10,), (20,)], ["value"])
    result, _ = Pipeline(df, [30, 40], range(50, 52), spark=spark).to_list()
    assert sorted(result) == [10, 20, 30, 40, 50, 51]
