"""Query over the custom Python DataSource (sources/python_datasource.py).

Generator parity, driver-graded: the source's rows are formula-derived
from the row id, so DuckDB reproduces the identical dataset from a
``range()`` table and the whole executor-side generation path —
partition planning, per-partition read(), Arrow return — is
oracle-checked, not just smoke-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laygo_python_spark.queries import query
from laygo_python_spark.sources.python_datasource import ROW_SQL, register

_N = 20_000


@query(
    "python_datasource_events",
    oracle=f"""
    WITH g AS (SELECT {ROW_SQL} FROM range(0, {_N}) t(i))
    SELECT event_type,
           count(*) AS n,
           count(DISTINCT user_id) AS users,
           round(sum(CAST(round(value * 10) AS BIGINT)) / 10.0, 2) AS sum_value,
           round(sum(CAST(round(value * 10) AS BIGINT)) / 10.0 / count(*), 4) AS avg_value,
           min(event_id) AS first_id,
           max(event_id) AS last_id
    FROM g GROUP BY event_type
    """,
)
def python_datasource_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate the synthetic-events Python DataSource (16 executor-side
    generator partitions; ``sf_dir`` unused — the source IS the data).
    The oracle recomputes the same formula rows in DuckDB from range(),
    so a drift anywhere in the source protocol shows up as a hash
    mismatch."""
    register(spark)
    ev = (
        spark.read.format("synthetic_events")
        .option("n", _N)
        .option("partitions", 16)
        .load()
    )
    # value×10 is an exact integer by construction — summing integers and
    # dividing once makes sum/avg independent of float-accumulation order
    # (the cross-engine determinism rule the cogroup query also uses).
    tenths = F.sum(F.round(F.col("value") * 10).cast("bigint"))
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("users"),
        F.round(tenths / 10.0, 2).alias("sum_value"),
        F.round(tenths / 10.0 / F.count(F.lit(1)), 4).alias("avg_value"),
        F.min("event_id").alias("first_id"),
        F.max("event_id").alias("last_id"),
    )
