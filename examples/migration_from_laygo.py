"""Side-by-side migration of the reference's own README examples
(reference /root/reference/README.md) to laygo_python_spark. Each
section quotes the laygo original in the comment and runs the Spark-first
equivalent. Executed by tests/test_examples.py so it can never rot.

Run directly: python examples/migration_from_laygo.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from laygo_python_spark import Context, Pipeline, Transformer, get_spark


def basic_pipeline(spark):
    """reference README.md:79-90 —
    Pipeline(data).transform(lambda t: t.filter(lambda x: x % 2 == 0))
                  .transform(lambda t: t.map(lambda x: x * 2)).to_list()
    Lambdas become Column expressions: JVM-side, pushdown-eligible."""
    data = range(1, 11)
    result, _ = (
        Pipeline(data, spark=spark)
        .transform(lambda t: t.filter(F.col("value") % 2 == 0))  # keep even numbers
        .transform(lambda t: t.map(value=F.col("value") * 2))  # double them
        .to_list()
    )
    return sorted(result)  # [4, 8, 12, 16, 20]


def context_aware(spark):
    """reference README.md:95-108 — ctx-aware lambdas reading a shared
    config dict. Reads become plain closure/broadcast values; the
    2-arg form still works for Python-path functions."""
    ctx = Context({"multiplier": 3, "threshold": 10}, spark=spark)
    result, snapshot = (
        Pipeline([1, 2, 3, 4, 5], spark=spark, context=ctx)
        .transform(lambda t: t.map(value=F.col("value") * ctx["multiplier"]))
        .transform(lambda t: t.filter(F.col("value") > ctx["threshold"]))
        .to_list()
    )
    return sorted(result), snapshot  # [12, 15], {"multiplier": 3, ...}


def etl_pipeline(spark):
    """reference README.md:111-137 — employee ETL with derived columns."""
    employees = [
        {"name": "Alice", "age": 34, "salary": 62000},
        {"name": "Bob", "age": 25, "salary": 48000},
        {"name": "Carol", "age": 41, "salary": 75000},
    ]
    result, _ = (
        Pipeline(employees, spark=spark)
        .transform(lambda t: t.filter(F.col("age") > 28))  # Extract
        .transform(
            lambda t: t.map(  # Transform
                annual_salary=F.col("salary"),
                monthly_salary=F.col("salary") / 12,
            )
        )
        .transform(lambda t: t.filter(F.col("annual_salary") > 55000))  # Filter
        .to_list()
    )
    return sorted(r["name"] for r in result)  # ["Alice", "Carol"]


def reusable_transformer(spark):
    """reference README.md:143-153 — one transformer, many datasets
    (a Transformer here is an immutable value, reusable by construction)."""
    transformer = (
        Transformer()
        .filter(F.col("value") % 2 == 0)
        .map(value=F.col("value") * 2)
        .filter(F.col("value") < 22)
    )
    df1 = spark.createDataFrame([(v,) for v in [1, 2, 3, 4, 5]], ["value"])
    df2 = spark.createDataFrame([(v,) for v in range(10)], ["value"])
    r1 = sorted(r[0] for r in transformer(df1).collect())
    r2 = sorted(r[0] for r in transformer(df2).collect())
    return r1, r2  # [4, 8], [0, 4, 8, 12, 16]


def branch_router(spark):
    """reference README.md:209-230 — order routing by amount: first
    matching branch wins."""
    orders = [
        {"id": 1, "customer": "ann", "amount": 250, "product": "widget"},
        {"id": 2, "customer": "bo", "amount": 80, "product": "gizmo"},
        {"id": 3, "customer": "cy", "amount": 120, "product": "widget"},
        {"id": 4, "customer": "di", "amount": 20, "product": "gadget"},
    ]
    results, _ = Pipeline(orders, spark=spark).branch(
        {
            "high_value": (F.col("amount") > 100, Transformer().select("id", "amount")),
            "standard": (F.lit(True), Transformer().select("id", "amount")),
        },
        first_match=True,
    )
    return {
        "high_value": sorted(r["id"] for r in results["high_value"]),
        "standard": sorted(r["id"] for r in results["standard"]),
    }  # {"high_value": [1, 3], "standard": [2, 4]}


def http_worker(spark):
    """laygo:
        http_transformer, get_route = create_http_transformer(int, endpoint=...)
        http_transformer.map(lambda x: x * 2)
        path, worker = get_route()            # server half
        Pipeline(data).apply(http_transformer)  # client half

    here (Spark-first: ship DATA to a stateless service, not code to a
    worker — operators/http.py documents the mapping):
        server: http_batch_handler(fn) on any stdlib/WSGI server
        client: Transformer().map_batches_http(url)
    """
    import threading
    from http.server import ThreadingHTTPServer

    from laygo_python_spark.operators.http import http_batch_handler

    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0), http_batch_handler(lambda pdf: pdf.assign(value=pdf["value"] * 2))
    )
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/"
        df = spark.range(1, 6).selectExpr("id AS value")
        rows, _ = Pipeline(df).apply(Transformer().map_batches_http(url)).to_list()
        return sorted(rows)  # single-column to_list yields scalars: [2, 4, 6, 8, 10]
    finally:
        srv.shutdown()
        srv.server_close()


def main() -> None:
    spark = get_spark("migration_examples")
    print("basic_pipeline:", basic_pipeline(spark))
    result, snap = context_aware(spark)
    print("context_aware:", result, dict(list(snap.items())[:2]))
    print("etl_pipeline:", etl_pipeline(spark))
    print("reusable_transformer:", reusable_transformer(spark))
    print("branch_router:", branch_router(spark))
    print("http_worker:", http_worker(spark))


if __name__ == "__main__":
    main()
