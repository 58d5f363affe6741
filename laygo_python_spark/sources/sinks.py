"""Sink connectors — the write side (the reference only materializes to
Python lists, laygo/pipeline.py:280-295; persistent sinks are new
capability).

Scale rules encoded here: always explicit mode; partition by a
low-cardinality column users filter on (partition pruning on read);
sort within partitions for run-length/dictionary compression wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def to_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    sort_within_partitions: list[str] | None = None,
    dynamic_overwrite: bool = False,
) -> None:
    """``dynamic_overwrite=True`` replaces ONLY the partitions present in
    ``df`` (the incremental-backfill pattern: re-run one day, keep the
    other 10 years). Static overwrite — the default, and Spark's — wipes
    the whole table root first."""
    if sort_within_partitions:
        df = df.sortWithinPartitions(*sort_within_partitions)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if dynamic_overwrite:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.parquet(path)


def to_csv(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    df.write.mode(mode).options(header=True, **options).csv(path)


def to_json(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    df.write.mode(mode).options(**options).json(path)


def to_noop(df: DataFrame) -> None:
    """Full distributed materialization, zero collection — benchmarking
    and smoke-sink (Pipeline.consume uses this)."""
    df.write.format("noop").mode("overwrite").save()
