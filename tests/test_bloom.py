"""Bloom filter (operators/bloom.py) — the properties that make the
join-pruning pattern safe at scale: zero false negatives, bounded false
positives, merge = build-on-union, loud geometry failure, and a
shuffle-free probe plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from laygo_python_spark.operators.bloom import (
    bloom_build,
    bloom_contains_col,
    bloom_geometry,
    bloom_merge,
    bloom_might_contain,
)


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(F.concat(F.lit("key"), F.col("id")).alias("k"))


def test_no_false_negatives(spark):
    # The load factor here is brutal (500 keys through 1024 bits, fpp
    # near 1) — even then, every inserted key MUST pass. This is the
    # guarantee the exact-join-after-prune pattern rests on.
    members = _keys(spark, 0, 500)
    bloom = bloom_build(members, "k", m=1024, k=3)
    kept = bloom_might_contain(bloom, members, "k")
    assert kept.count() == 500


def test_false_positive_rate_in_range(spark):
    # Sized for 1% fpp at n=1000; probe 5000 disjoint non-members and
    # expect roughly that rate (generous 3x bound — the hash family is
    # fixed/seeded, so this is deterministic, not flaky).
    m, k = bloom_geometry(1000, fpp=0.01)
    bloom = bloom_build(_keys(spark, 0, 1000), "k", m=m, k=k)
    fp = bloom_might_contain(bloom, _keys(spark, 1_000_000, 1_005_000), "k").count()
    assert fp <= 0.03 * 5000, fp
    assert fp >= 0  # documented expectation: some false positives are normal


def test_merge_equals_build_on_union(spark):
    # Bit-lattice property: OR of shard filters is bit-identical to the
    # filter of the unioned key sets — what lets per-day filters roll up.
    a, b = _keys(spark, 0, 300), _keys(spark, 200, 600)
    merged = bloom_merge(bloom_build(a, "k", m=4096, k=4), bloom_build(b, "k", m=4096, k=4))
    whole = bloom_build(a.unionByName(b), "k", m=4096, k=4)
    as_set = lambda df: {(r["word"], r["bits"]) for r in df.collect()}  # noqa: E731
    assert as_set(merged) == as_set(whole)


def test_geometry_mismatch_raises(spark):
    a = bloom_build(_keys(spark, 0, 10), "k", m=1024, k=3)
    b = bloom_build(_keys(spark, 0, 10), "k", m=2048, k=3)
    with pytest.raises(ValueError, match="mixed bloom geometries"):
        bloom_merge(a, b)


def test_bad_m_raises(spark):
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(_keys(spark, 0, 10), "k", m=100, k=3)


def test_geometry_sizing():
    m, k = bloom_geometry(10_000, fpp=0.01)
    assert m % 64 == 0
    assert 9 * 10_000 <= m <= 11 * 10_000  # ~9.6 bits/key at 1%
    assert k in (6, 7)
    with pytest.raises(ValueError):
        bloom_geometry(0, 0.01)
    with pytest.raises(ValueError):
        bloom_geometry(10, 1.5)


def test_null_keys_never_match(spark):
    bloom = bloom_build(_keys(spark, 0, 100), "k", m=4096, k=4)
    probe = spark.createDataFrame([("key1",), (None,)], "k string")
    kept = [r["k"] for r in bloom_might_contain(bloom, probe, "k").collect()]
    assert kept == ["key1"]


def test_null_keys_never_match_even_when_built_with_nulls(spark):
    """The hard case behind the NULL contract: Spark's xxhash64(NULL, i)
    is NOT NULL — it skips the null argument and returns a seed-derived
    value, so an unfiltered build-side NULL would set k real sentinel
    bits and a NULL probe would then answer maybe=True. The contract
    must hold BY CONSTRUCTION (build filters NULLs, probe predicate
    carries isNotNull), not by lucky bit geometry."""
    with_nulls = spark.createDataFrame(
        [("key0",), (None,), ("key1",), (None,)], "k string"
    )
    bloom = bloom_build(with_nulls, "k", m=4096, k=4)
    probe = spark.createDataFrame([("key1",), (None,), ("absent",)], "k string")
    flagged = {r["k"]: r["maybe_in"] for r in bloom_contains_col(bloom, probe, "k").collect()}
    assert flagged["key1"] is True
    assert flagged[None] is False  # NULL deterministically absent
    # build-side NULLs set no bits: the word table only reflects 2 keys
    assert bloom_might_contain(bloom, probe, "k").filter("k IS NULL").count() == 0


def test_parquet_round_trip(spark, tmp_path):
    # The artifact story: persist today's filter, reuse it tomorrow.
    bloom = bloom_build(_keys(spark, 0, 400), "k", m=8192, k=5)
    path = str(tmp_path / "bloom.parquet")
    bloom.write.parquet(path)
    reloaded = spark.read.parquet(path)
    assert bloom_might_contain(reloaded, _keys(spark, 0, 400), "k").count() == 400


def test_probe_plan_is_shuffle_free(spark, tmp_path):
    # The operator's whole reason to exist: membership over the big side
    # must be a map-only stage. With the filter read from parquet (the
    # reuse shape), the probe plan must contain broadcast exchanges ONLY
    # — any hash-partitioned shuffle of the probe side is a regression.
    bloom = bloom_build(_keys(spark, 0, 400), "k", m=8192, k=5)
    path = str(tmp_path / "bloom_plan.parquet")
    bloom.write.parquet(path)
    reloaded = spark.read.parquet(path)
    pruned = bloom_might_contain(reloaded, _keys(spark, 0, 10_000), "k")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    for line in plan.splitlines():
        if "Exchange" in line and "Broadcast" not in line:
            raise AssertionError(f"probe side shuffles: {line}")


def test_empty_bloom_rejects_everything(spark):
    # A bloom over zero keys (no matching dim rows in this shard) is the
    # empty set — membership keeps nothing, and merge with a real bloom
    # is the real bloom.
    none = bloom_build(_keys(spark, 0, 0), "k", m=1024, k=3)
    assert bloom_might_contain(none, _keys(spark, 0, 50), "k").count() == 0
    some = bloom_build(_keys(spark, 0, 20), "k", m=1024, k=3)
    merged = bloom_merge(none, some)
    assert bloom_might_contain(merged, _keys(spark, 0, 20), "k").count() == 20


def test_contains_col_flag_partition(spark):
    # Flag form: members always True (no false negatives); the flag
    # partitions the frame (filtering form == flag==True subset).
    bloom = bloom_build(_keys(spark, 0, 300), "k", m=8192, k=5)
    probe = _keys(spark, 0, 600)
    from laygo_python_spark.operators.bloom import bloom_contains_col

    flagged = bloom_contains_col(bloom, probe, "k", flag="maybe")
    rows = {r["k"]: r["maybe"] for r in flagged.collect()}
    assert len(rows) == 600
    assert all(rows[f"key{i}"] for i in range(300))  # members: certainly True
    filtered = {r["k"] for r in bloom_might_contain(bloom, probe, "k").collect()}
    assert filtered == {k for k, v in rows.items() if v}
