"""Incremental analytics from stored sketches — the pattern that
replaces rescans at 100 TB, composed from the library's own operators:

  executor-side generator source (sources/python_datasource.py)
  → per-shard count-min + HLL sketches (operators/cms.py, hll_sketch_agg)
    + a per-shard bloom filter of seen keys (operators/bloom.py)
    + per-shard Misra-Gries summaries (operators/heavyhitters.py)
  → artifacts stored (tiny), raw rows discarded
  → merge artifacts across shards → point-frequency, distinct,
    membership, and guaranteed-heavy-key answers

The point: every per-shard pass reads its shard ONCE, stores a few
thousand counter/word rows, and month-to-date answers come from merging
artifacts — no raw-data rescan, bounded state however large the stream.
The bloom answers "have we EVER seen key X?" map-side (new-key routing
in a crawl/dedup pipeline); Misra-Gries names the heavy keys with a
worst-case guarantee where CMS only estimates given candidates.

Executed by tests/test_examples.py so it can never rot.
Run directly: python examples/incremental_analytics.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from laygo_python_spark import get_spark
from laygo_python_spark.operators.bloom import bloom_build, bloom_merge, bloom_might_contain
from laygo_python_spark.operators.cms import cms_build, cms_estimate, cms_merge
from laygo_python_spark.operators.drift import binned_counts, drift_from_counts
from laygo_python_spark.operators.heavyhitters import mg_merge, mg_summarize
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
    mg_k = 32
    day_cms = []
    day_hll = []
    day_bloom = []
    day_mg = []
    day_hist = []
    for lo, hi in shards:
        day = _shard(spark, lo, hi)
        # In production each of these writes to an artifact table;
        # the raw day is never read again.
        day_cms.append(cms_build(day, "user_id", d=d, w=w))
        day_hll.append(day.agg(F.hll_sketch_agg("user_id").alias("sk")))
        day_bloom.append(bloom_build(day.select("user_id"), "user_id", m=1 << 17, k=5))
        day_mg.append(mg_summarize(day, "user_id", k=mg_k))
        # Fixed-edge value histogram — the drift monitor's additive
        # artifact (operators/drift.py), same store-and-merge contract
        # as the sketches above.
        day_hist.append(binned_counts(day, "value", 0.0, 100.0, 20, []))

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

    # Membership across the whole month, from merged per-day blooms:
    # probes never touch raw data (and a member is NEVER reported absent).
    month_bloom = bloom_merge(*day_bloom)
    probes = spark.range(10_000).select((F.col("id") * 1_000_003).alias("user_id"))
    n_maybe_seen = bloom_might_contain(month_bloom, probes, "user_id").count()

    # Heavy-key certification from merged Misra-Gries summaries — no
    # candidate list needed (the summary IS the discovery). This stream
    # is uniform, so the CORRECT answer is "no heavy users": every MG
    # estimate stays at the ~uniform per-user rate (est never exceeds
    # the true count), which CERTIFIES no user exceeds
    # max(est) + n/(k+1) events — a guarantee CMS cannot give.
    all_mg = day_mg[0]
    for d_ in day_mg[1:]:
        all_mg = all_mg.unionByName(d_)
    mg_month = mg_merge(all_mg, "user_id", k=mg_k)
    mg_top = [
        (r["user_id"], r["est"])
        for r in mg_month.orderBy(F.desc("est"), "user_id").limit(5).collect()
    ]

    # Distribution-drift certificate from stored histograms alone: day 1
    # is the reference, the rest of the month merges by counter addition
    # (exactly like the CMS/bloom merges above) and the PSI/JSD fold
    # answers "did the value distribution change?" without re-reading a
    # single raw row. This stream is stationary, so the CORRECT answer
    # is ~zero drift.
    rest = day_hist[1]
    for h in day_hist[2:]:
        rest = rest.unionByName(h)
    rest = rest.groupBy("bin").agg(F.sum("cnt").alias("cnt"))
    dr = drift_from_counts(day_hist[0], rest, []).collect()[0]
    drift_cert = (dr["psi"], dr["jsd"])

    return [(r["user_id"], r["est"]) for r in top], distinct_est, n_maybe_seen, mg_top, drift_cert


def main() -> None:
    spark = get_spark("incremental_analytics_example")
    register(spark)
    top, distinct_est, n_maybe_seen, mg_top, drift_cert = incremental_heavy_users(spark)
    print("distinct users (merged HLL):", distinct_est)
    for uid, est in top[:5]:
        print(f"user {uid}: ~{est} events")
    print("probes passing merged bloom:", n_maybe_seen)
    print("MG skew certificate (uniform stream -> all ests ~ per-user rate):", mg_top)
    print("drift certificate (stationary stream -> ~0): psi, jsd =", drift_cert)


if __name__ == "__main__":
    main()
