"""Interval-join query: error events near click events (same user,
within 15 minutes either way) — the bucketized equi-join form of a range
join, oracle-checked against DuckDB's plain inequality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laygo_python_spark.operators.interval import interval_join
from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t


@query(
    "interval_join_click_errors",
    oracle="""
    SELECT c.event_id AS click_id, e.event_id AS error_id, c.user_id
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON c.user_id = e.user_id
     AND abs(epoch_us(c.ts) - epoch_us(e.ts)) <= 900000000
    """,
)
def interval_join_click_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every (click, error) pair of the same user within ±15 min. The
    oracle is the naive inequality join (fine at sf0.01); ours is the
    bucketized equi-join that scales."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", F.col("ts").alias("e_ts")
    )
    out = interval_join(clicks, errors, on=["user_id"], left_ts="c_ts", right_ts="e_ts", window_seconds=900)
    return out.select("click_id", "error_id", "user_id")
