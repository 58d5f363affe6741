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


def test_compression_ratio_contract(spark):
    # Bounds, repetition monotonicity, determinism — the behavioral
    # contract of the rows-only compression-ratio quality signal.
    from pyspark.sql import Row

    from laygo_python_spark.operators.compress import compression_ratio

    docs = spark.createDataFrame(
        [
            Row(
                doc_id=1,
                text=" ".join(
                    f"{a}{b}{i}" for i, (a, b) in enumerate(
                        (x, y) for x in "lexical varied corpus prose sample".split()
                        for y in "alpha beta gamma delta epsilon zeta".split()
                    )
                ),
            ),
            Row(doc_id=2, text="spam " * 500),
            Row(
                doc_id=3,  # non-repeating pseudorandom junk: barely compresses
                text=" ".join(
                    __import__("hashlib").md5(str(i).encode()).hexdigest() for i in range(60)
                ),
            ),
            Row(doc_id=4, text=""),
            Row(doc_id=5, text=None),
        ]
    )
    rows = {r["doc_id"]: r for r in compression_ratio(docs).collect()}
    assert all(0 < r["ratio"] <= 1.2 for r in rows.values())
    # pure repetition compresses (much) better than varied prose
    assert rows[2]["ratio"] < rows[1]["ratio"] < rows[3]["ratio"]
    assert rows[2]["ratio"] < 0.05
    assert rows[4]["ratio"] == 1.0 and rows[4]["n_bytes"] == 0
    assert rows[5]["ratio"] == 1.0  # NULL text = empty by convention
    again = {r["doc_id"]: r for r in compression_ratio(docs).collect()}
    assert all(rows[k]["n_compressed"] == again[k]["n_compressed"] for k in rows)


def test_compression_ratio_query_registered(spark, sf_dir):
    from laygo_python_spark.queries import QUERIES, load_all

    load_all()
    out = QUERIES["compression_ratio_score"](spark, sf_dir)
    rows = out.limit(50).collect()
    assert rows and set(out.columns) == {"doc_id", "ratio_class", "keep"}
    assert all(r["ratio_class"] == ("boilerplate", "junk", "prose")[r["doc_id"] % 3] for r in rows)
