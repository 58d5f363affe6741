"""Z-order (Morton curve) data layout — multi-dimensional data skipping.

No reference counterpart (capability uplift): the reference has no
storage layer at all (laygo materializes to Python lists,
reference laygo/pipeline.py:280-295).

Sorting a table by ONE column gives parquet min/max pruning on that
column only; queries filtering the second dimension scan everything.
Interleaving the bits of both dimensions into one Morton key and
range-partitioning on it gives every output file a narrow range in
EVERY participating column, so min/max row-group stats prune scans for
filters on any of them — the technique behind Delta/Iceberg
OPTIMIZE ZORDER, here as a plain DataFrame transform:

1. one tiny agg job per layout for the global [min, max] of each column;
2. map-side scale each column into ``bits``-bit integers and interleave
   (pure Column bit algebra — codegen'd, no Python);
3. ``repartitionByRange`` + sort on the key: one shuffle, then each
   partition (= output file) covers a compact Z-curve segment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of pre-scaled non-negative int
    columns into one long. 2 cols × 16 bits = 32-bit key."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1)).cast("long")
            z = z.bitwiseOR(F.shiftleft(bit, i * len(cols) + j))
    return z


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    num_partitions: int,
    bits: int = 16,
) -> DataFrame:
    """Re-layout ``df`` along the Z-curve of ``cols`` (numeric). Write the
    result with one file per partition to get skippable min/max stats on
    every dimension."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    bounds = df.agg(*aggs).collect()[0]
    if any(bounds[f"__lo_{c}"] is None or bounds[f"__hi_{c}"] is None for c in cols):
        # Empty input or an all-NULL dimension: there is nothing to order
        # by — degrade to a plain repartition instead of crashing (empty
        # incremental batches are a normal scheduled-job occurrence).
        return df.repartition(num_partitions)
    scaled = []
    top = (1 << bits) - 1
    for c in cols:
        lo, hi = float(bounds[f"__lo_{c}"]), float(bounds[f"__hi_{c}"])
        span = (hi - lo) or 1.0
        scaled.append(
            F.least(F.lit(top), ((F.col(c) - lo) / span * top).cast("int")).cast("int")
        )
    keyed = df.withColumn("__z", morton_key(scaled, bits=bits))
    return (
        keyed.repartitionByRange(num_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
