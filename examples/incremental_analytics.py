"""Incremental analytics from stored sketches — the pattern that
replaces rescans at 100 TB, composed from the library's own operators:

  executor-side generator source (sources/python_datasource.py)
  → per-shard count-min + HLL sketches (operators/cms.py, hll_sketch_agg)
  → sketches stored (tiny), raw rows discarded
  → merge sketches across shards → point-frequency + distinct answers

The point: every per-shard pass reads its shard ONCE, stores a few
thousand counter rows, and month-to-date answers come from merging
sketches — no raw-data rescan, bounded state however large the stream.

Executed by tests/test_examples.py so it can never rot.
Run directly: python examples/incremental_analytics.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from laygo_python_spark import get_spark
from laygo_python_spark.operators.cms import cms_build, cms_estimate, cms_merge
from laygo_python_spark.sources.python_datasource import register


def _shard(spark, lo: int, hi: int):
    """One day/shard of the event stream: an executor-side generated id
    range (stands in for `spark.read.parquet(day_path)`). The source's
    ``start`` option makes each shard produce EXACTLY its own ids —
    generating [0, hi) and filtering would be quadratic across shards."""
    return (
        spark.read.format("synthetic_events")
        .option("start", lo)
        .option("n", hi)
        .option("partitions", 8)
        .load()
    )


def incremental_heavy_users(spark, shards=((0, 40_000), (40_000, 80_000), (80_000, 120_000))):
    """Per-shard CMS + HLL sketches, merged, then answered from sketches
    alone. Returns (top_user_estimates, merged_distinct_estimate)."""
    d, w = 4, 16384
    day_cms = []
    day_hll = []
    for lo, hi in shards:
        day = _shard(spark, lo, hi)
        # In production each of these writes to a sketch table;
        # the raw day is never read again.
        day_cms.append(cms_build(day, "user_id", d=d, w=w))
        day_hll.append(day.agg(F.hll_sketch_agg("user_id").alias("sk")))

    merged_cms = cms_merge(*day_cms)
    hll_union = day_hll[0]
    for s in day_hll[1:]:
        hll_union = hll_union.unionByName(s)
    distinct_est = int(
        hll_union.agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")).first()["e"]
    )

    # Point queries against the merged sketch: the 10 busiest candidate
    # users (candidates from domain knowledge / a sample — NOT a raw scan).
    candidates = spark.range(10).select(F.col("id").alias("user_id"))
    top = (
        cms_estimate(merged_cms, candidates, "user_id")
        .orderBy(F.desc("est"), "user_id")
        .collect()
    )
    return [(r["user_id"], r["est"]) for r in top], distinct_est


def main() -> None:
    spark = get_spark("incremental_analytics_example")
    register(spark)
    top, distinct_est = incremental_heavy_users(spark)
    print("distinct users (merged HLL):", distinct_est)
    for uid, est in top[:5]:
        print(f"user {uid}: ~{est} events")


if __name__ == "__main__":
    main()
