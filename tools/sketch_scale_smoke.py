"""Bloom-filter + Misra-Gries + relational-HLL scale smoke.

Bloom: build a filter over 10^6 dimension keys (m sized for 1% fpp —
~1.2 MB of packed words), probe 10^7 fact rows of which only 10% are
members. Asserts zero false negatives (every true member survives),
measured fpp within 3x of target on the 9M non-members, and that the
probe stage's plan contains broadcast exchanges only — the map-only
pruning contract that makes the pattern worth having at 100 TB.

Misra-Gries: 10^7 rows where key -1 carries ~9% of all mass and the
rest spreads near-uniformly over 10^5 distinct keys (1000x the k=64
counter budget — the regime the bounded-state guarantee exists for).
Asserts the planted heavy key is found by mg_heavy_hitters with its
EXACT count (discovery via ≤64 counters/partition, verification via
recount), and that no key below the floor sneaks in.

HLL: 10^7 rows over 10^6 distinct keys through p=12 registers (4096
rows of state); asserts the estimate lands within 5% (≈3 sigma of the
1.04/sqrt(m) bound) and that a two-shard merge gives the SAME register
table as one build — at any scale, by the max-lattice argument.

Usage: python tools/sketch_scale_smoke.py [bloom_facts] [mg_rows] [hll_rows]
Prints one JSON line per smoke.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from laygo_python_spark.operators.bloom import bloom_build, bloom_geometry, bloom_might_contain  # noqa: E402
from laygo_python_spark.operators.heavyhitters import mg_heavy_hitters  # noqa: E402
from laygo_python_spark.operators.hll import hll_build, hll_estimate, hll_merge  # noqa: E402
from laygo_python_spark.session import get_spark  # noqa: E402


def bloom_smoke(spark, n_facts: int) -> None:
    n_dim = max(1, n_facts // 10)
    m, k = bloom_geometry(n_dim, fpp=0.01)
    dim = spark.range(n_dim).select(F.col("id").alias("key"))
    # Fact keys: 10% in [0, n_dim) (members), 90% in [n_dim, 10*n_dim).
    facts = spark.range(n_facts).select(F.pmod(F.xxhash64("id"), F.lit(10 * n_dim)).alias("key"))
    t = time.time()
    # Parquet round-trip = the artifact-reuse shape, and it keeps the
    # build's own exchange out of the probe plan asserted below.
    path = tempfile.mkdtemp(prefix="bloom_smoke_") + "/bloom.parquet"
    bloom_build(dim, "key", m=m, k=k).write.parquet(path)
    bloom = spark.read.parquet(path)
    build_s = time.time() - t

    t = time.time()
    kept = bloom_might_contain(bloom, facts, "key").persist()
    n_kept = kept.count()
    probe_s = time.time() - t
    stats = facts.agg(F.sum((F.col("key") < n_dim).cast("long")).alias("m")).first()
    n_members = stats["m"]
    kept_members = kept.filter(F.col("key") < n_dim).count()
    kept.unpersist()
    # Zero false negatives; fpp within 3x of target on non-members.
    assert kept_members == n_members, (kept_members, n_members)
    fpp = (n_kept - n_members) / max(1, n_facts - n_members)
    assert fpp <= 0.03, fpp
    # Probe plan: broadcast exchanges only on the fact side.
    plan = bloom_might_contain(bloom, facts, "key")._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        assert not ("Exchange" in line and "Broadcast" not in line), line
    print(
        json.dumps(
            {
                "smoke": "bloom",
                "facts": n_facts,
                "dim_keys": n_dim,
                "m_bits": m,
                "k": k,
                "kept": n_kept,
                "fpp_measured": round(fpp, 5),
                "build_sec": round(build_s, 2),
                "probe_sec": round(probe_s, 2),
            }
        )
    )


def mg_smoke(spark, n_rows: int) -> None:
    n_universe = 100_000
    # Every (id % 11 == 0) row remaps to planted key -1 (~9% of mass);
    # the rest hash near-uniformly over 10^5 keys — each ≈ 0.001%.
    df = spark.range(n_rows).select(
        F.when(F.col("id") % 11 == 0, F.lit(-1))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_universe)))
        .alias("key")
    )
    floor = 0.05
    t = time.time()
    got = {r["key"]: r["cnt"] for r in mg_heavy_hitters(df, "key", min_freq=floor).collect()}
    dt = time.time() - t
    exact_heavy = n_rows // 11 + (1 if n_rows % 11 else 0)
    assert got == {-1: exact_heavy}, (got, exact_heavy)
    print(
        json.dumps(
            {
                "smoke": "misra_gries",
                "rows": n_rows,
                "distinct_keys": n_universe + 1,
                "k_counters": int(2.0 / floor),
                "heavy_exact": exact_heavy,
                "sec": round(dt, 2),
            }
        )
    )


def hll_smoke(spark, n_rows: int) -> None:
    n_distinct = max(1, n_rows // 10)
    df = spark.range(n_rows).select(F.pmod(F.xxhash64("id"), F.lit(n_distinct)).alias("key"))
    # pmod leaves a few keys unhit; the truth is the exact count.
    exact = df.select("key").distinct().count()
    t = time.time()
    est = hll_estimate(hll_build(df, "key", p=12))
    dt = time.time() - t
    rel = abs(est - exact) / exact
    assert rel < 0.05, (est, exact, rel)
    a = df.filter(F.col("key") % 2 == 0)
    b = df.filter(F.col("key") % 2 != 0)
    merged = hll_merge(hll_build(a, "key", p=12), hll_build(b, "key", p=12))
    whole = hll_build(df, "key", p=12)
    ms = {(r["idx"], r["rho"]) for r in merged.collect()}
    ws = {(r["idx"], r["rho"]) for r in whole.collect()}
    assert ms == ws
    print(
        json.dumps(
            {
                "smoke": "hll",
                "rows": n_rows,
                "exact_distinct": exact,
                "estimate": round(est),
                "rel_err": round(rel, 4),
                "sec": round(dt, 2),
            }
        )
    )


def main() -> None:
    bloom_facts = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    mg_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    hll_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000_000
    spark = get_spark("sketch_scale_smoke")
    bloom_smoke(spark, bloom_facts)
    mg_smoke(spark, mg_rows)
    hll_smoke(spark, hll_rows)


if __name__ == "__main__":
    main()
