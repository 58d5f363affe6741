"""operators/budget.py (distributed prefix sums / greedy budget select),
operators/moments.py (mergeable moments), and
operators/governance.dp_laplace_counts (deterministic Laplace release).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from laygo_python_spark.operators.budget import greedy_budget_select, running_total
from laygo_python_spark.operators.moments import merge_moments, shard_moments


def test_running_total_matches_sequential(spark):
    rows = [(i, (i * 37) % 11 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, w long")
    out = {
        r["id"]: r["cum_weight"]
        for r in running_total(df, [F.col("id").asc()], "w").collect()
    }
    acc = 0
    for i, w in rows:
        acc += w
        assert out[i] == acc, i


def test_running_total_descending_order_and_float(spark):
    rows = [(i, float(i % 7) + 0.5) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = {
        r["id"]: r["cum_weight"]
        for r in running_total(df, [F.col("id").desc()], "w").collect()
    }
    acc = 0.0
    for i in sorted(range(100), reverse=True):
        acc += float(i % 7) + 0.5
        assert got[i] == pytest.approx(acc, rel=1e-12)


def test_greedy_budget_select_prefix_property(spark):
    rows = [(i, 10) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, w long")
    kept = sorted(
        r["id"] for r in greedy_budget_select(df, [F.col("id").asc()], "w", budget=255).collect()
    )
    # 25 rows of weight 10 fit in 255 (cum of row 25 = 250; row 26 = 260)
    assert kept == list(range(25))


def test_greedy_budget_never_splits_nor_reorders(spark):
    # weights vary; the kept set must be exactly the maximal prefix
    rows = [(i, (i % 3) * 5 + 1) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, w long")
    out = greedy_budget_select(df, [F.col("id").asc()], "w", budget=40).collect()
    ids = sorted(r["id"] for r in out)
    assert ids == list(range(len(ids)))  # a prefix, no holes
    assert sum((i % 3) * 5 + 1 for i in ids) <= 40
    nxt = len(ids)
    assert sum((i % 3) * 5 + 1 for i in ids) + ((nxt % 3) * 5 + 1) > 40


def test_moments_merge_equals_direct(spark):
    rows = [(i % 5, float((i * 31) % 97)) for i in range(2000)]
    df = spark.createDataFrame(rows, "shard int, x double")
    got = merge_moments(shard_moments(df, "x", "shard")).collect()[0]
    xs = [x for _, x in rows]
    n = len(xs)
    mean = sum(xs) / n
    var = sum((x - mean) ** 2 for x in xs) / n
    assert got["n_rows"] == n
    assert got["mean"] == pytest.approx(mean, rel=1e-12)
    assert got["var_pop"] == pytest.approx(var, rel=1e-9)


def test_moments_single_row_shard(spark):
    df = spark.createDataFrame([(0, 1.0), (1, 5.0), (1, 7.0)], "shard int, x double")
    got = merge_moments(shard_moments(df, "x", "shard")).collect()[0]
    xs = [1.0, 5.0, 7.0]
    mean = sum(xs) / 3
    var = sum((x - mean) ** 2 for x in xs) / 3
    assert got["mean"] == pytest.approx(mean) and got["var_pop"] == pytest.approx(var)


def test_dp_laplace_counts_noise_calibration(spark):
    """Noise is Laplace(1/eps)-shaped and deterministic: same input ->
    identical release; eps doubling halves the noise magnitude."""
    from laygo_python_spark.operators.governance import dp_laplace_counts

    rows = [(f"k{i % 20}",) for i in range(400)]
    df = spark.createDataFrame(rows, "k string")
    r1 = {r["k"]: r["noisy_count"] for r in dp_laplace_counts(df, ["k"], epsilon=1.0).collect()}
    r1b = {r["k"]: r["noisy_count"] for r in dp_laplace_counts(df, ["k"], epsilon=1.0).collect()}
    assert r1 == r1b  # replayable
    r2 = {r["k"]: r["noisy_count"] for r in dp_laplace_counts(df, ["k"], epsilon=2.0).collect()}
    for k in r1:
        n1, n2 = r1[k] - 20, r2[k] - 20  # true count is 20 everywhere
        if abs(n1) > 1e-9:
            assert n2 == pytest.approx(n1 / 2, rel=1e-4)  # eps x2 -> noise /2
    # different salt -> different noise (not keyed to the count)
    r3 = {r["k"]: r["noisy_count"] for r in dp_laplace_counts(df, ["k"], salt="other").collect()}
    assert any(abs(r3[k] - r1[k]) > 1e-9 for k in r1)


def test_dp_laplace_counts_suppression_and_validation(spark):
    from laygo_python_spark.operators.governance import dp_laplace_counts

    df = spark.createDataFrame([("a",)] * 50 + [("b",)] * 2, "k string")
    out = dp_laplace_counts(df, ["k"], epsilon=1.0, suppress_below=10.0)
    keys = {r["k"] for r in out.collect()}
    assert "a" in keys and "b" not in keys
    with pytest.raises(ValueError, match="epsilon"):
        dp_laplace_counts(df, ["k"], epsilon=0.0)


def test_stream_moments_multibatch_equals_batch(spark, tmp_path):
    """The streaming partials-then-merge answer must be IDENTICAL under
    any batch split: land the same rows as 4 files (4 micro-batches)
    and as 1 file, and compare the merged moments."""
    import pyspark.sql.functions as F

    from laygo_python_spark.operators.moments import merge_moments_by
    from laygo_python_spark.streaming import moments_summary_processor

    rows = [(i, f"t{i % 3}", float((i * 17) % 23)) for i in range(400)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    results = {}
    for tag, nfiles in (("multi", 4), ("single", 1)):
        src = str(tmp_path / f"src_{tag}")
        df.repartition(nfiles).write.mode("overwrite").parquet(src)
        summaries = str(tmp_path / f"sum_{tag}")
        stream = (
            spark.readStream.schema("event_id long, event_type string, value double")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(
                moments_summary_processor("value", ["event_type"], summaries)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        merged = merge_moments_by(
            spark.read.parquet(summaries).select("event_type", "n", "s", "m2"),
            ["event_type"],
        )
        results[tag] = {
            r["event_type"]: (r["n_rows"], round(r["mean"], 9), round(r["var_pop"], 7))
            for r in merged.collect()
        }
    assert results["multi"] == results["single"]
    # and both equal the direct batch aggregate
    direct = {
        r["event_type"]: (r["n"], round(r["m"], 9), round(r["v"], 7))
        for r in df.groupBy("event_type")
        .agg(F.count("value").alias("n"), F.avg("value").alias("m"), F.var_pop("value").alias("v"))
        .collect()
    }
    assert results["single"] == direct


def test_running_total_rejects_null_weights_and_widens_ints(spark):
    from laygo_python_spark.operators.budget import running_total

    # NULL weight -> loud error, not NaN poisoning
    df = spark.createDataFrame([(0, 1), (1, None), (2, 3)], "id long, w int")
    with pytest.raises(Exception, match="NULL in weight column"):
        running_total(df, [F.col("id").asc()], "w").collect()
    # int weights widen to long: cumulative totals past 2^31 must not
    # fail the Arrow safe cast
    big = spark.createDataFrame([(i, 2**30) for i in range(8)], "id long, w int")
    out = running_total(big, [F.col("id").asc()], "w")
    assert dict(out.dtypes)["cum_weight"] == "bigint"
    assert max(r["cum_weight"] for r in out.collect()) == 8 * 2**30


def test_dp_release_on_merged_counts_equals_counts_form(spark):
    """dp_laplace_release over a pre-aggregated counts table must equal
    dp_laplace_counts over the raw rows — the refactor contract that
    lets streaming partials fold before ONE release-time draw."""
    from laygo_python_spark.operators.governance import (
        dp_laplace_counts,
        dp_laplace_release,
    )

    rows = [(f"k{i % 7}",) for i in range(300)]
    df = spark.createDataFrame(rows, "k string")
    direct = {r["k"]: r["noisy_count"] for r in dp_laplace_counts(df, ["k"]).collect()}
    counts = df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    via_release = {
        r["k"]: r["noisy_count"] for r in dp_laplace_release(counts, ["k"], "n").collect()
    }
    assert direct == via_release


def test_running_total_int32_within_partition_overflow(spark):
    """r10 advice (budget.py): the per-partition cumsum must accumulate
    in the WIDENED dtype. int32 weights whose LOCAL cumulative total
    passes 2^31 in a single partition would wrap silently inside
    pandas cumsum before the offset add — the widening test above only
    exercised cross-partition offsets (1 row per partition)."""
    n = 5
    big = spark.createDataFrame([(i, 2**30) for i in range(n)], "id long, w int")
    out = running_total(big, [F.col("id").asc()], "w", num_partitions=1)
    vals = sorted(r["cum_weight"] for r in out.collect())
    assert vals == [(i + 1) * 2**30 for i in range(n)]
    assert all(v > 0 for v in vals[2:])  # a wrap would go negative


@pytest.mark.parametrize("offset", [1e6, 1e9])
def test_moments_merge_stable_at_mean_much_greater_than_std(spark, offset):
    """r10 verdict ask #5: the one-pass merge identity ΣM2ᵢ + Σsᵢ²/nᵢ −
    S²/N cancels catastrophically at mean ≫ std and can go NEGATIVE;
    the centered two-pass merge must recover var_pop to full float64
    accuracy (and never below ΣM2ᵢ ≥ 0) even at a 1e9 offset with
    unit-scale spread."""
    rows = [(i % 16, offset + (i % 7) - 3.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "shard int, x double")
    got = merge_moments(shard_moments(df, "x", "shard")).collect()[0]
    direct = df.agg(
        F.count("x").alias("n"), F.avg("x").alias("m"), F.var_pop("x").alias("v")
    ).collect()[0]
    assert got["n_rows"] == direct["n"]
    assert got["mean"] == pytest.approx(direct["m"], rel=1e-12)
    assert got["var_pop"] >= 0.0
    # rel 1e-6, not 1e-12: the residual error is the (n, s, M2) summary
    # FORMAT's — s = Σx carries the mean at ~1e-16·offset absolute, so
    # mᵢ−m̄ is only good to ~1e-7 at offset 1e9. The centered merge adds
    # nothing on top (the old one-pass form was off by ~1e17 RELATIVE
    # here — negative variance).
    assert got["var_pop"] == pytest.approx(direct["v"], rel=1e-6)


def test_moments_merge_ignores_empty_shards(spark):
    """r10 advice (moments.py): merge_moments_by is the read side for
    user-supplied/stored partials tables, where an n=0 row previously
    divided by zero. An empty shard must contribute nothing."""
    from laygo_python_spark.operators.moments import merge_moments_by

    sh = spark.createDataFrame(
        [("a", 3, 30.0, 2.0), ("a", 0, 0.0, 0.0), ("b", 2, 10.0, 8.0)],
        "k string, n long, s double, m2 double",
    )
    got = {r["k"]: r for r in merge_moments_by(sh, ["k"]).collect()}
    assert got["a"]["n_rows"] == 3
    assert got["a"]["mean"] == pytest.approx(10.0)
    assert got["a"]["var_pop"] == pytest.approx(2.0 / 3)
    assert got["b"]["var_pop"] == pytest.approx(4.0)


def test_dp_release_null_keys_get_distinct_noise(spark):
    """r10 advice (governance.py): concat_ws drops NULL components, so
    ('a', NULL) and (NULL, 'a') previously hashed identically and drew
    the SAME noise. With the NULL sentinel they must differ, and NULL
    keys must flow through (not collapse or error)."""
    from laygo_python_spark.operators.governance import dp_laplace_release

    counts = spark.createDataFrame(
        [("a", None, 100), (None, "a", 100), ("a", "a", 100)],
        "k1 string, k2 string, n int",
    )
    out = dp_laplace_release(counts, ["k1", "k2"], "n").collect()
    assert len(out) == 3
    noises = [r["noisy_count"] - 100 for r in out]
    assert len({round(x, 6) for x in noises}) == 3


def test_moments_merge_preserves_null_key_group(spark):
    """r11 review: pass 2's rejoin must be NULL-SAFE — a plain equi-join
    never matches a NULL key, silently dropping that group's moments
    (the old one-pass groupBy emitted it)."""
    from laygo_python_spark.operators.moments import merge_moments_by

    sh = spark.createDataFrame(
        [("a", 3, 30.0, 2.0), (None, 2, 10.0, 8.0), (None, 2, 6.0, 2.0)],
        "k string, n long, s double, m2 double",
    )
    got = {r["k"]: r for r in merge_moments_by(sh, ["k"]).collect()}
    assert set(got) == {"a", None}
    assert got[None]["n_rows"] == 4
    assert got[None]["mean"] == pytest.approx(4.0)
    # centered merge: M2 = (8+2) + 2*(5-4)^2 + 2*(3-4)^2 = 14; var = 3.5
    assert got[None]["var_pop"] == pytest.approx(3.5)
