"""Mergeable moment statistics — per-shard (n, sum, M2) summaries merged
into exact global mean/variance.

The 100 TB shape for corpus statistics: each shard/partition/day emits a
THREE-NUMBER summary; summaries merge associatively (Chan, Golub &
LeVeque 1983 pairwise update — exact in real arithmetic), so global
moments cost one tiny aggregation over |shards| rows instead of a
re-scan. This is the same mergeability discipline as the HLL/CMS/
Misra-Gries sketches (operators/hll.py, cms.py), instantiated for
second-order statistics.

Merge identity used (all-at-once, not pairwise):
  N = Σnᵢ,  S = Σsᵢ,  mean = S/N
  M2 = ΣM2ᵢ + Σ(sᵢ²/nᵢ) − S²/N        (since Σnᵢ(mᵢ−m)² = Σsᵢ²/nᵢ − S²/N)
  var_pop = M2/N
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shard_moments(
    df: DataFrame, value_col: str | Column, shard_col: str | Column
) -> DataFrame:
    """Per-shard (shard, n, s, m2). NULL values are excluded (aggregate
    semantics in both engines); a 1-row shard has m2 = 0 (var_pop)."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    return df.filter(v.isNotNull()).groupBy(shard_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v.cast("double")).alias("s"),
        (F.var_pop(v.cast("double")) * F.count(F.lit(1))).alias("m2"),
    )


def merge_moments_by(shards: DataFrame, keys: list[str]) -> DataFrame:
    """Fold a (…keys, n, s, m2) shard table into one (…keys, n_rows,
    mean, var_pop) row per key group — the read side of the
    mergeable-summary contract. ``keys=[]`` gives the global fold."""
    agg = shards.groupBy(*keys).agg(
        F.sum("n").alias("__n"),
        F.sum("s").alias("__s"),
        (F.sum("m2") + F.sum(F.col("s") * F.col("s") / F.col("n"))).alias("__m2s"),
    )
    return agg.select(
        *keys,
        F.col("__n").cast("long").alias("n_rows"),
        (F.col("__s") / F.col("__n")).alias("mean"),
        ((F.col("__m2s") - F.col("__s") * F.col("__s") / F.col("__n")) / F.col("__n")).alias(
            "var_pop"
        ),
    )


def merge_moments(shards: DataFrame) -> DataFrame:
    """Global fold of a (n, s, m2) shard table — see merge_moments_by."""
    return merge_moments_by(shards, [])
