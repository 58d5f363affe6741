"""Distribution-drift monitors (operators/drift.py) vs in-test numpy —
known-value PSI/JSD, zero-drift identity, disjoint-support bound, and
the additive-histogram mergeability contract."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from laygo_python_spark.operators.drift import EPS, binned_counts, distribution_drift


def _expected(pc, qc, eps=EPS):
    n_p, n_q = sum(pc), sum(qc)
    psi = jsd = 0.0
    for cr, cc in zip(pc, qc):
        if cr == 0 and cc == 0:
            continue
        p = max(cr / n_p, eps)
        q = max(cc / n_q, eps)
        m = (p + q) / 2
        psi += (q - p) * math.log(q / p)
        jsd += 0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)
    return round(psi, 6), round(jsd, 6)


def _df(spark, counts, lo=0.0, w=10.0):
    rows = []
    for b, c in enumerate(counts):
        rows += [(lo + b * w + 0.5,)] * c
    return spark.createDataFrame(rows, "value double")


def test_known_value_psi_jsd(spark):
    ref_counts = [10, 30, 40, 20]
    cur_counts = [25, 25, 25, 25]
    out = distribution_drift(
        _df(spark, ref_counts), _df(spark, cur_counts), "value", 0.0, 40.0, 4
    ).collect()[0]
    psi, jsd = _expected(ref_counts, cur_counts)
    assert out["psi"] == psi and out["jsd"] == jsd
    assert out["n_ref"] == 100 and out["n_cur"] == 100


def test_identical_distributions_zero_drift(spark):
    counts = [5, 10, 15]
    out = distribution_drift(
        _df(spark, counts), _df(spark, counts), "value", 0.0, 30.0, 3
    ).collect()[0]
    assert out["psi"] == 0.0 and out["jsd"] == 0.0


def test_disjoint_support_jsd_near_ln2(spark):
    # All reference mass in bin 0, all current mass in bin 3: JSD must
    # approach ln 2 (the bound), PSI explodes (floored by EPS).
    out = distribution_drift(
        _df(spark, [50, 0, 0, 0]), _df(spark, [0, 0, 0, 50]), "value", 0.0, 40.0, 4
    ).collect()[0]
    assert abs(out["jsd"] - math.log(2)) < 1e-4
    assert out["psi"] > 5


def test_out_of_range_values_clamp_to_edge_bins(spark):
    df = spark.createDataFrame([(-100.0,), (999.0,)], "value double")
    got = {r["bin"]: r["cnt"] for r in binned_counts(df, "value", 0.0, 40.0, 4, []).collect()}
    assert got == {0: 1, 3: 1}


def test_binned_counts_are_additive_partials(spark):
    # The mergeability contract: histogram(batch1) + histogram(batch2)
    # == histogram(union) — what lets the reference histogram live as a
    # stored artifact that new batches fold into.
    a = _df(spark, [3, 1, 4])
    b = _df(spark, [1, 5, 9])
    whole = {
        r["bin"]: r["cnt"]
        for r in binned_counts(a.unionAll(b), "value", 0.0, 30.0, 3, []).collect()
    }
    merged = {
        r["bin"]: r["cnt"]
        for r in binned_counts(a, "value", 0.0, 30.0, 3, [])
        .unionByName(binned_counts(b, "value", 0.0, 30.0, 3, []))
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert whole == merged


def test_keyed_drift_per_group(spark):
    ref = spark.createDataFrame([("a", 5.0)] * 10 + [("b", 5.0)] * 10, "k string, value double")
    cur = spark.createDataFrame([("a", 5.0)] * 10 + [("b", 35.0)] * 10, "k string, value double")
    out = {
        r["k"]: (r["psi"], r["jsd"])
        for r in distribution_drift(ref, cur, "value", 0.0, 40.0, 4, keys=["k"]).collect()
    }
    assert out["a"] == (0.0, 0.0)
    assert out["b"][0] > 5 and abs(out["b"][1] - math.log(2)) < 1e-4


def test_categorical_drift(spark):
    # Source-mix drift: reference is 50/50 a|b, current is 90/10 —
    # PSI/JSD must match the numpy fold over category bins; a category
    # appearing on only one side gets the EPS floor, not an error.
    ref = spark.createDataFrame([("a",)] * 50 + [("b",)] * 50, "src string")
    cur = spark.createDataFrame([("a",)] * 90 + [("c",)] * 10, "src string")
    out = distribution_drift(ref, cur, "src", categorical=True).collect()[0]
    # bins: a (50, 90), b (50, 0), c (0, 10)
    psi, jsd = _expected([50, 50, 0], [90, 0, 10])
    assert out["psi"] == psi and out["jsd"] == jsd
    assert out["n_ref"] == 100 and out["n_cur"] == 100


def test_numeric_mode_requires_edges(spark):
    import pytest

    df = spark.createDataFrame([(1.0,)], "value double")
    with pytest.raises(ValueError, match="lo and hi"):
        distribution_drift(df, df, "value")


def test_stream_multi_batch_equals_batch(spark, sf_dir, tmp_path):
    # Force a REAL multi-batch run (4 files, one per trigger): the
    # merged per-batch histogram partials folded against the reference
    # must equal the single-pass batch drift — histogram additivity is
    # what makes the streaming gate exactly-once under any batch split.
    import glob

    from laygo_python_spark.operators.drift import binned_counts, drift_from_counts
    from laygo_python_spark.session import read_table
    from laygo_python_spark.streaming import drift_histogram_processor

    ev = read_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    ref_hist = binned_counts(ev.filter(F.col("ts") < cut), "value", 0.0, 500.0, 10, ["event_type"])
    batch = {
        r["event_type"]: (r["psi"], r["jsd"], r["n_ref"], r["n_cur"])
        for r in drift_from_counts(
            ref_hist,
            binned_counts(ev.filter(F.col("ts") >= cut), "value", 0.0, 500.0, 10, ["event_type"]),
            ["event_type"],
        ).collect()
    }

    src = tmp_path / "evsrc"
    ev.repartition(4).write.parquet(str(src))
    n_files = len(glob.glob(f"{src}/part-*.parquet"))
    assert n_files == 4
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    process = drift_histogram_processor(
        "value", 0.0, 500.0, 10, ["event_type"],
        hist_path=str(tmp_path / "hist"),
        batch_filter=F.col("ts") >= cut,
    )
    q = stream.writeStream.foreachBatch(process).trigger(availableNow=True).start()
    try:
        q.awaitTermination()
    finally:
        q.stop()
    assert len(glob.glob(f"{tmp_path}/hist/batch_id=*")) == n_files
    cur_hist = (
        spark.read.parquet(str(tmp_path / "hist"))
        .groupBy("event_type", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    streamed = {
        r["event_type"]: (r["psi"], r["jsd"], r["n_ref"], r["n_cur"])
        for r in drift_from_counts(ref_hist, cur_hist, ["event_type"]).collect()
    }
    assert streamed == batch


def test_null_values_excluded_from_numeric_histogram(spark):
    # r8 review: NULL measurements must not masquerade as bin-0 mass.
    df = spark.createDataFrame([(1.0,), (None,), (None,)], "value double")
    got = {r["bin"]: r["cnt"] for r in binned_counts(df, "value", 0.0, 40.0, 4, []).collect()}
    assert got == {0: 1}


def test_null_category_is_a_real_category(spark):
    # r8 review: identical distributions containing NULL categories must
    # report ZERO drift (a NULL bin used to fall out of the join and
    # fire a spurious alarm), and a null-share shift must register.
    from laygo_python_spark.operators.drift import NULL_CATEGORY

    same = spark.createDataFrame([("a",)] * 5 + [(None,)] * 5, "src string")
    out = distribution_drift(same, same, "src", categorical=True).collect()[0]
    assert out["psi"] == 0.0 and out["jsd"] == 0.0 and out["n_ref"] == 10
    shifted = spark.createDataFrame([("a",)] * 9 + [(None,)] * 1, "src string")
    moved = distribution_drift(same, shifted, "src", categorical=True).collect()[0]
    psi, jsd = _expected([5, 5], [9, 1])
    assert (moved["psi"], moved["jsd"]) == (psi, jsd)
    from laygo_python_spark.operators.drift import categorical_counts

    cats = {r["bin"] for r in categorical_counts(same, "src", []).collect()}
    assert NULL_CATEGORY in cats


def test_one_sided_group_key_alarms_instead_of_crashing(spark):
    # r8 review: a brand-new group in the current window used to raise
    # DIVIDE_BY_ZERO under Spark's default ANSI mode — exactly the event
    # a drift monitor exists to catch. It must report maximal drift.
    ref = spark.createDataFrame([("a", 5.0)] * 10, "k string, value double")
    cur = spark.createDataFrame([("a", 5.0)] * 10 + [("b", 5.0)] * 10, "k string, value double")
    out = {r["k"]: r for r in distribution_drift(ref, cur, "value", 0.0, 40.0, 4, keys=["k"]).collect()}
    assert out["a"]["psi"] == 0.0
    assert out["b"]["psi"] > 5 and out["b"]["n_ref"] == 0 and out["b"]["n_cur"] == 10


def test_bin_col_rejects_degenerate_edges(spark):
    import pytest

    from laygo_python_spark.operators.drift import bin_col

    with pytest.raises(ValueError, match="hi > lo"):
        bin_col(F.lit(1.0), 5.0, 5.0, 4)


def test_sentinel_valued_reals_do_not_merge_with_nulls(spark):
    # r9 advice: a feed that sentinel-encodes its NULLs upstream (real
    # "__null__" strings) must count separately from actual NULLs —
    # escape-doubling keeps the mapping injective.
    from laygo_python_spark.operators.drift import NULL_CATEGORY, categorical_counts

    df = spark.createDataFrame(
        [(None,)] * 3 + [(NULL_CATEGORY,)] * 2 + [(NULL_CATEGORY * 2,)] + [("a",)],
        "src string",
    )
    got = {r["bin"]: r["cnt"] for r in categorical_counts(df, "src", []).collect()}
    assert got == {
        NULL_CATEGORY: 3,          # actual NULLs
        NULL_CATEGORY * 2: 2,      # real sentinel strings, escaped once
        NULL_CATEGORY * 3: 1,      # real double-sentinel, escaped once more
        "a": 1,
    }
