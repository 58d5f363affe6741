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


def test_stream_multi_batch_equals_batch(spark, tmp_path):
    """A bounded stream of MG summary partials, merged at read time and
    recounted, equals the one-shot batch heavy hitters — under a FORCED
    4-file multi-batch split (maxFilesPerTrigger=1), so the mergeable-
    summaries guarantee is exercised across real micro-batch boundaries."""
    from laygo_python_spark.streaming import mg_summary_processor

    df = _zipfish(spark, 4)
    src = tmp_path / "src"
    # 4 parquet files -> 4 micro-batches
    df.repartition(4).write.parquet(str(src))
    n_files = len([p for p in src.glob("*.parquet")])
    assert n_files >= 4

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    summaries = tmp_path / "summaries"
    process = mg_summary_processor("key", k=40, summary_path=str(summaries))
    q = stream.writeStream.foreachBatch(process).trigger(availableNow=True).start()
    try:
        q.awaitTermination()
    finally:
        q.stop()
    # one partial per micro-batch landed
    batch_dirs = {p.name for p in summaries.glob("batch_id=*")}
    assert len(batch_dirs) == n_files

    min_freq = 0.05
    partials = spark.read.parquet(str(summaries)).select("key", "cnt")
    candidates = mg_merge(partials, "key", k=40).select("key")
    n_tot = df.count()
    got = {
        (r["key"], r["cnt"])
        for r in df.join(F.broadcast(candidates), "key", "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= n_tot * min_freq)
        .collect()
    }
    want = {
        (r["key"], r["cnt"])
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= n_tot * min_freq)
        .collect()
    }
    assert got == want and len(want) > 0


def test_stream_replayed_batch_overwrites_partition(spark, tmp_path):
    """Exactly-once under foreachBatch replay: re-running a batch id
    lands in the SAME partition (overwrite), so the merged candidate
    set is unchanged by replays."""
    from laygo_python_spark.streaming import mg_summary_processor

    df = _zipfish(spark, 2)
    summaries = tmp_path / "s"
    process = mg_summary_processor("key", k=40, summary_path=str(summaries))
    process(df, 0)
    once = sorted(map(tuple, spark.read.parquet(str(summaries)).collect()))
    process(df, 0)  # replay
    twice = sorted(map(tuple, spark.read.parquet(str(summaries)).collect()))
    assert once == twice
