"""Quantile sketch (operators/qsketch.py): relative-error bound vs exact
percentiles, merge linearity, bounded footprint, geometry guard.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from laygo_python_spark.operators.qsketch import (
    qsketch_build,
    qsketch_merge,
    qsketch_quantiles,
)


def test_quantiles_within_relative_error(spark):
    gamma = 1.02
    df = spark.range(1, 100_001).select((F.col("id") / 10.0).alias("v"))
    sk = qsketch_build(df, "v", gamma=gamma)
    got = {r["q"]: r["est"] for r in qsketch_quantiles(sk, [0.1, 0.5, 0.9, 0.99]).collect()}
    exact = df.agg(
        *[F.percentile("v", F.lit(q)).alias(str(q)) for q in (0.1, 0.5, 0.9, 0.99)]
    ).first()
    for q in (0.1, 0.5, 0.9, 0.99):
        rel = abs(got[q] - exact[str(q)]) / exact[str(q)]
        assert rel <= (gamma - 1) * 1.5, (q, got[q], exact[str(q)], rel)


def test_merge_equals_whole(spark):
    a = spark.range(0, 5000).select((F.col("id") % 977).cast("double").alias("v"))
    b = spark.range(0, 3000).select((F.col("id") % 37).cast("double").alias("v"))
    merged = qsketch_merge(qsketch_build(a, "v"), qsketch_build(b, "v"))
    whole = qsketch_build(a.unionByName(b), "v")
    as_set = lambda df: {(r["bucket"], r["cnt"]) for r in df.collect()}  # noqa: E731
    assert as_set(merged) == as_set(whole)


def test_footprint_bounded(spark):
    # 1M rows spanning 6 orders of magnitude → a few hundred buckets.
    df = spark.range(1, 1_000_001).select(F.col("id").cast("double").alias("v"))
    sk = qsketch_build(df, "v", gamma=1.02)
    assert sk.count() < 800


def test_gamma_mismatch_raises(spark):
    df = spark.range(100).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match="mixed sketch gammas"):
        qsketch_merge(qsketch_build(df, "v", gamma=1.02), qsketch_build(df, "v", gamma=1.05))


def test_qsketch_parquet_roundtrip(spark, tmp_path):
    df = spark.range(1, 20_001).select((F.col("id") / 7.0).alias("v"))
    sk = qsketch_build(df, "v", gamma=1.02)
    path = str(tmp_path / "qsketch")
    sk.write.parquet(path)
    back = spark.read.parquet(path)
    a = sorted(map(tuple, qsketch_quantiles(sk, [0.5, 0.9]).collect()))
    b = sorted(map(tuple, qsketch_quantiles(back, [0.5, 0.9]).collect()))
    assert a == b


def test_null_and_negative_values_fail_loudly(spark):
    """Null/negative inputs must error, not silently land in a null
    bucket that sorts first and skews every quantile (r2 ADVICE)."""
    nulls = spark.createDataFrame([(1.0,), (None,), (2.0,)], "v double")
    with pytest.raises(Exception, match="null or negative"):
        qsketch_build(nulls, "v").collect()
    negs = spark.createDataFrame([(1.0,), (-3.0,)], "v double")
    with pytest.raises(Exception, match="null or negative"):
        qsketch_build(negs, "v").collect()
