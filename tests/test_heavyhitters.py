"""Misra-Gries summary (operators/heavyhitters.py) — the worst-case
guarantees that make a bounded-state sketch trustworthy: containment of
everything above n/(k+1), the two-sided estimate bound, exactness below
k distinct keys, and recount-exactness of the heavy-hitters query shape
under adversarial partitioning.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from laygo_python_spark.operators.heavyhitters import mg_heavy_hitters, mg_merge, mg_summarize


def _zipfish(spark, parts):
    # key i appears ~1000/i times for i in 1..40 (n ≈ 4279) — a few
    # genuinely heavy keys and a long-ish tail, spread over `parts`
    # partitions in id order so heavy keys straddle partitions.
    rows = [(f"k{i}",) for i in range(1, 41) for _ in range(1000 // i)]
    return spark.createDataFrame(rows, "key string").repartition(parts)


def test_containment_and_bound(spark):
    df = _zipfish(spark, 7)
    n = df.count()
    k = 10
    merged = mg_merge(mg_summarize(df, "key", k=k), "key", k=k)
    est = {r["key"]: r["est"] for r in merged.collect()}
    exact = {r["key"]: r["cnt"] for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    bound = n / (k + 1)
    # Every key above n/(k+1) MUST be present...
    for key, cnt in exact.items():
        if cnt > bound:
            assert key in est, f"{key} ({cnt} > {bound}) missing"
    # ...and every estimate obeys true ≥ est ≥ true − n/(k+1).
    for key, e in est.items():
        assert exact[key] >= e >= exact[key] - bound, (key, e, exact[key])


@pytest.mark.parametrize("parts", [1, 3, 13])
def test_guarantee_holds_under_any_partitioning(spark, parts):
    # The summary VALUES legitimately vary with partitioning; the
    # containment guarantee may not.
    df = _zipfish(spark, parts)
    n = df.count()
    k = 8
    merged = mg_merge(mg_summarize(df, "key", k=k), "key", k=k)
    got = {r["key"] for r in merged.collect()}
    exact = {r["key"]: r["cnt"] for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert {k_ for k_, c in exact.items() if c > n / (k + 1)} <= got


def test_exact_when_few_distinct(spark):
    # ≤ k distinct keys → no reduction ever fires → merged summary IS
    # the exact count table.
    df = spark.createDataFrame([(f"x{i % 5}",) for i in range(500)], "key string").repartition(4)
    merged = mg_merge(mg_summarize(df, "key", k=16), "key", k=16)
    assert {(r["key"], r["est"]) for r in merged.collect()} == {(f"x{i}", 100) for i in range(5)}


def test_heavy_hitters_exact_vs_groupby(spark):
    df = _zipfish(spark, 11)
    n = df.count()
    got = {(r["key"], r["cnt"]) for r in mg_heavy_hitters(df, "key", min_freq=0.05).collect()}
    want = {
        (r["key"], r["cnt"])
        for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt")).collect()
        if r["cnt"] >= n * 0.05
    }
    assert got == want and len(want) >= 3


def test_int_keys(spark):
    df = spark.createDataFrame([(i % 3,) for i in range(300)], "key int").repartition(5)
    got = {(r["key"], r["cnt"]) for r in mg_heavy_hitters(df, "key", min_freq=0.2).collect()}
    assert got == {(0, 100), (1, 100), (2, 100)}


def test_validation(spark):
    df = spark.createDataFrame([("a",)], "key string")
    with pytest.raises(ValueError, match="k must be"):
        mg_summarize(df, "key", k=0)
    with pytest.raises(ValueError, match="min_freq"):
        mg_heavy_hitters(df, "key", min_freq=1.5)
    with pytest.raises(ValueError, match="cannot guarantee"):
        mg_heavy_hitters(df, "key", min_freq=0.01, k=10)
