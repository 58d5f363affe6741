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


def write_training_shards(
    df: DataFrame,
    path: str,
    shard_rows: int = 100_000,
    order_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    """Write evenly-sized training shards — the dataloader-facing sink.

    Dataloaders want shards of uniform row count (work-stealing balance)
    and stable order within a shard (resumable iteration). Spark's file
    splitting is byte-based and partition-shaped, so left alone a skewed
    upstream produces 10 MB and 10 GB files side by side. Here:

    - ``repartition(ceil(n / shard_rows))`` round-robins rows into
      equal-sized partitions (one output file each);
    - ``maxRecordsPerFile`` caps any residual overflow file-side;
    - optional ``order_by`` sorts WITHIN each shard (run-length /
      dictionary compression + deterministic iteration order) without a
      global sort;
    - zstd: best published size/speed trade-off for cold training data.

    One count job + one shuffle — both unavoidable for exact row balance.
    """
    n = df.count()
    shards = max(1, -(-n // shard_rows))
    out = df.repartition(shards)
    if order_by:
        out = out.sortWithinPartitions(*order_by)
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", shard_rows)
        .option("compression", compression)
        .parquet(path)
    )
