"""Interval (range) join — pair rows whose timestamps fall within a
window of each other, without the O(n·m) nested-loop Spark would plan
for a raw inequality join.

Trick (the standard bucketize-and-filter): quantize time into buckets of
the window width; a pair within ``window`` must land in the same or an
adjacent bucket, so the LEFT side is exploded to (bucket-1, bucket,
bucket+1) — 3 rows — and the join becomes an EQUI join on
(key, bucket), with the exact inequality as a cheap residual filter.
Cost: one hash join on short keys + 3× the left side, instead of a
cartesian per key. At 100 TB both sides shuffle once on (key, bucket)
— the same shape as any equi-join, AQE-skew-splittable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``left`` and ``right`` sharing ``on`` keys with
    ``|left_ts - right_ts| <= window_seconds``. Timestamps are compared
    in integer microseconds (no float truncation). Column name
    collisions (outside ``on``) must be resolved by the caller."""
    if how != "inner":
        raise ValueError("interval_join currently supports inner joins")
    w_us = window_seconds * 1_000_000
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))

    # integer division (div), never float — bucket ids must be exact
    lb = left.withColumn("__lus", l_us).withColumn(
        "__bucket", F.explode(F.array(*[F.expr(f"__lus div {w_us}") + d for d in (-1, 0, 1)]))
    )
    rb = right.withColumn("__rus", r_us).withColumn("__bucket", F.expr(f"__rus div {w_us}"))
    residual = F.abs(F.col("__lus") - F.col("__rus")) <= w_us
    return (
        lb.join(rb, on=[*on, "__bucket"], how="inner")
        .filter(residual)
        .drop("__bucket", "__lus", "__rus")
    )
