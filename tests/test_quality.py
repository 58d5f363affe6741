"""validate / flatten_schema (operators/quality.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from laygo_python_spark.operators.quality import flatten_schema, validate


def test_validate_splits_and_names_failures(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, -5.0, "b"), (3, 100.0, None), (4, -1.0, None)],
        "id int, amount double, tag string",
    )
    clean, violations = validate(
        df,
        checks={
            "amount_nonneg": F.col("amount") >= 0,
            "tag_present": F.col("tag").isNotNull(),
        },
    )
    assert [r["id"] for r in clean.orderBy("id").collect()] == [1]
    got = {r["id"]: sorted(r["failed_checks"]) for r in violations.collect()}
    assert got == {
        2: ["amount_nonneg"],
        3: ["tag_present"],
        4: ["amount_nonneg", "tag_present"],  # one row, both names
    }
    # clean keeps the original schema exactly.
    assert clean.columns == df.columns


def test_validate_is_codegen_not_python(spark):
    from laygo_python_spark.plans import physical_plan

    df = spark.range(0, 100).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    clean, violations = validate(df, checks={"pos": F.col("v") > 10})
    for side in (clean, violations):
        assert "BatchEvalPython" not in physical_plan(side)


def test_flatten_schema_recurses_structs(spark):
    df = spark.createDataFrame(
        [(1, ("x", (2.5, True)), [1, 2])],
        "id int, s struct<name:string, inner:struct<score:double, ok:boolean>>, arr array<int>",
    )
    out = flatten_schema(df)
    assert out.columns == ["id", "s_name", "s_inner_score", "s_inner_ok", "arr"]
    row = out.collect()[0]
    assert (row["s_name"], row["s_inner_score"], row["s_inner_ok"]) == ("x", 2.5, True)
    assert row["arr"] == [1, 2]


def test_validate_null_predicate_is_a_failure(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, 5.0), (2, None), (3, -1.0)], "id int, amt double")
    clean, violations = validate(df, checks={"amt_pos": F.col("amt") > 0})
    assert [r["id"] for r in clean.collect()] == [1]
    got = {r["id"]: r["failed_checks"] for r in violations.collect()}
    assert got == {2: ["amt_pos"], 3: ["amt_pos"]}
