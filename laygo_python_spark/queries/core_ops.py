"""Reference-parity operators (SURVEY.md §2.2-2.7) exercised through the
fluent Pipeline/Transformer facade, each with a DuckDB oracle.

These prove the facade compiles to correct Catalyst plans: the Spark side
is built with ``Pipeline(...).transform(lambda t: t.map(...).filter(...))``
exactly as a reference user would write it, and the oracle is plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laygo_python_spark.pipeline import Pipeline
from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t
from laygo_python_spark.transformer import Transformer


@query(
    "filter_map",
    # Row-level computed doubles stay UNROUNDED: Spark and DuckDB execute
    # the identical IEEE-754 ops so the raw bits match, whereas round()
    # diverges between them (Spark rounds the shortest decimal repr,
    # DuckDB the binary value — e.g. 70905.055 → .06 vs .05). Rounding is
    # reserved for aggregates, where summation order makes low bits differ.
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    WHERE l_quantity > 30
    """,
)
def filter_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map+filter — the reference's two most-used operators
    (laygo/transformers/transformer.py:229-260), here as pure Column
    exprs: the filter pushes into the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    p = Pipeline(li, spark=spark).transform(
        lambda t: t.filter(F.col("l_quantity") > 30)
        .map(revenue=F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .select("l_orderkey", "l_linenumber", "revenue")
    )
    return p.df


@query(
    "flatten_words",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents
    """,
)
def flatten_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatten/explode (laygo/transformers/transformer.py:262-280)."""
    docs = _t(spark, sf_dir, "documents")
    p = Pipeline(docs, spark=spark).transform(
        lambda t: t.map(word=F.split(F.col("text"), " ")).select("doc_id", "word").flatten("word")
    )
    return p.df


@query(
    "reduce_sum",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue,
           count(*) AS n_rows
    FROM lineitem
    """,
)
def reduce_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terminal whole-dataset fold (laygo reduce, transformer.py:462-486)
    rewritten to the scalable form: Catalyst partial+final aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    p = Pipeline(li, spark=spark).transform(
        lambda t: t.agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    return p.df


@query(
    "union_keys",
    oracle="""
    SELECT c_custkey AS key, 'customer' AS kind FROM customer
    UNION ALL
    SELECT s_suppkey AS key, 'supplier' AS kind FROM supplier
    """,
)
def union_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source concatenation (laygo/pipeline.py:108 → unionByName)."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.lit("customer").alias("kind")
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"), F.lit("supplier").alias("kind")
    )
    return Pipeline(cust, supp, spark=spark).df


@query(
    "loop_double",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber >= 10 THEN CAST(l_linenumber AS BIGINT)
                ELSE CAST(l_linenumber * power(2, ceil(log2(10.0 / l_linenumber))) AS BIGINT)
           END AS n
    FROM lineitem
    """,
)
def loop_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixpoint iteration (laygo loop, transformer.py:346-392): double n
    until every row reaches 10. Driver-side while over the whole dataset
    with lineage checkpointing; the oracle is the closed form."""
    li = _t(spark, sf_dir, "lineitem")
    body = Transformer().map(
        n=F.when(F.col("n") < 10, F.col("n") * 2).otherwise(F.col("n"))
    )
    p = Pipeline(li, spark=spark).transform(
        lambda t: t.select("l_orderkey", "l_linenumber", F.col("l_linenumber").cast("long").alias("n"))
        .loop(body, condition="n < 10", max_iterations=16)
    )
    return p.df


@query(
    "catch_rows_salvage",
    oracle="""
    SELECT l_orderkey, l_linenumber, 100.0 / (l_quantity - 25) AS inv
    FROM lineitem
    WHERE l_quantity <> 25
    """,
)
def catch_rows_salvage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row error isolation (laygo catch, transformer.py:488-535,
    row-salvage mode per SURVEY.md §7.4.2): poison rows (quantity == 25)
    raise inside the Python transform and are dropped; every other row
    survives. The oracle mirrors the drop as a WHERE."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")

    def risky(pdf):
        if (pdf["l_quantity"] == 25).any():
            raise ValueError("poison row")
        inv = 100.0 / (pdf["l_quantity"] - 25)
        return pdf.assign(inv=inv)[["l_orderkey", "l_linenumber", "inv"]]

    p = Pipeline(li, spark=spark).transform(
        lambda t: t.catch(
            risky,
            schema="l_orderkey long, l_linenumber int, inv double",
            mode="row",
        )
    )
    return p.df


@query(
    "map_batches_zscore",
    oracle="""
    SELECT o_orderkey,
           (o_totalprice - 225690.09174066666) / 129034.55704292144 AS z
    FROM orders WHERE o_orderkey < 1000
    """,
)
def map_batches_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-Python chunk transform (laygo's (list, ctx) -> list
    contract, laygo/transformers/types.py:13) via Arrow-batched
    mapInPandas. Constants are baked so the oracle stays closed-form;
    sf-specific stats would come from a prior agg in real use."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    mean, std = 225690.09174066666, 129034.55704292144

    def zscore(pdf):
        return pdf.assign(z=(pdf["o_totalprice"] - mean) / std)[["o_orderkey", "z"]]

    p = Pipeline(orders, spark=spark).transform(
        lambda t: t.map_batches(zscore, schema="o_orderkey long, z double")
    )
    return p.df
