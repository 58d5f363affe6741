"""Warehouse operators (operators/warehouse.py): MERGE upsert semantics,
SCD2 collapse, gap-fill — value semantics plus the 100 TB plan shape.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from laygo_python_spark.operators.warehouse import gapfill, merge_upsert, scd2_collapse
from laygo_python_spark.plans import has_broadcast_join, physical_plan


def _dim(spark):
    return spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0)], "k int, name string, bal double"
    )


def _changes(spark):
    return spark.createDataFrame([(2, 5.0), (3, 7.0)], "k int, delta double")


def _merge(target, source, broadcast_source):
    return merge_upsert(
        target,
        source,
        on=["k"],
        update_set={
            "name": target["name"],
            "bal": target["bal"] + F.coalesce(source["delta"], F.lit(0.0)),
        },
        insert_set={"name": F.lit("(new)"), "bal": source["delta"]},
        broadcast_source=broadcast_source,
    )


def test_merge_upsert_semantics_both_paths(spark):
    for broadcast_source in (False, True):
        out = {r["k"]: r for r in _merge(_dim(spark), _changes(spark), broadcast_source).collect()}
        # 1: target-only (unchanged), 2: matched (updated), 3: source-only (inserted)
        assert set(out) == {1, 2, 3}
        assert (out[1]["name"], out[1]["bal"]) == ("alice", 10.0)
        assert (out[2]["name"], out[2]["bal"]) == ("bob", 25.0)
        assert (out[3]["name"], out[3]["bal"]) == ("(new)", 7.0)


def test_merge_upsert_broadcast_path_never_shuffles_target(spark):
    out = _merge(_dim(spark), _changes(spark), broadcast_source=True)
    assert has_broadcast_join(out)
    # The update arm must be a broadcast join: no Exchange may sit between
    # the target scan and the BroadcastHashJoin that applies the changeset.
    plan = physical_plan(out)
    update_arm = plan.split("BroadcastHashJoin")[0]
    assert "Exchange hashpartitioning" not in update_arm


def test_scd2_collapse_versions_and_ranges(spark):
    log = spark.createDataFrame(
        [
            (1, "A", 1),
            (1, "A", 2),
            (1, "B", 3),
            (1, "A", 4),
            (2, "C", 1),
        ],
        "k int, attr string, ts int",
    )
    rows = sorted(
        scd2_collapse(log, key=["k"], attr="attr", ts="ts").collect(),
        key=lambda r: (r["k"], r["valid_from"]),
    )
    assert [(r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"]) for r in rows] == [
        (1, "A", 1, 3, False),
        (1, "B", 3, 4, False),
        (1, "A", 4, None, True),  # same value as v1 but non-consecutive → new version
        (2, "C", 1, None, True),
    ]


def test_gapfill_densifies_and_forward_fills(spark):
    t0 = datetime.datetime(2024, 1, 1, 0)
    sparse = spark.createDataFrame(
        [
            ("a", t0, 1.0),
            ("a", t0 + datetime.timedelta(hours=3), 4.0),
            ("b", t0 + datetime.timedelta(hours=1), 9.0),
        ],
        "s string, h timestamp, v double",
    )
    out = gapfill(sparse, series=["s"], ts="h", step="1 hour", fill_cols=["v"])
    rows = {(r["s"], r["h"].hour): r for r in out.collect()}
    # Grid spans global [0h, 3h] for BOTH series → 8 rows.
    assert len(rows) == 8
    assert rows[("a", 1)]["v"] == 1.0 and rows[("a", 1)]["filled"] is True
    assert rows[("a", 3)]["v"] == 4.0 and rows[("a", 3)]["filled"] is False
    # Series b has no row at h0: nothing to fill from yet.
    assert rows[("b", 0)]["v"] is None
    assert rows[("b", 3)]["v"] == 9.0


def test_snapshot_diff_classifies_changes(spark):
    from laygo_python_spark.operators.warehouse import snapshot_diff

    old = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "k int, s string, v double")
    new = spark.createDataFrame([(2, "b", 2.0), (3, "c", 99.0), (4, "d", 4.0)], "k int, s string, v double")
    out = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, on=["k"]).collect()}
    # 1 removed, 2 unchanged (absent), 3 changed, 4 added.
    assert out == {1: "removed", 3: "changed", 4: "added"}


def test_snapshot_diff_shuffles_hashes_not_rows(spark):
    from laygo_python_spark.operators.warehouse import snapshot_diff

    old = spark.range(0, 100).selectExpr("id AS k", "CAST(id AS STRING) AS payload")
    new = spark.range(50, 150).selectExpr("id AS k", "CAST(id + 1 AS STRING) AS payload")
    plan = physical_plan(snapshot_diff(old, new, on=["k"]))
    # The payload column must be hashed away BEFORE the join: no plan node
    # above the join may carry it.
    join_and_above = plan.split("Join")[0]
    assert "payload" not in join_and_above


def test_merge_upsert_mismatched_sets_raise(spark):
    import pytest

    t, s = _dim(spark), _changes(spark)
    with pytest.raises(ValueError, match="same output columns"):
        merge_upsert(t, s, on=["k"], update_set={"bal": t["bal"]}, insert_set={"name": F.lit("x")})


def test_scd2_empty_input(spark):
    log = spark.createDataFrame([], "k int, attr string, ts int")
    assert scd2_collapse(log, key=["k"], attr="attr", ts="ts").count() == 0


def test_gapfill_without_fill_cols_keeps_nulls(spark):
    import datetime

    t0 = datetime.datetime(2024, 1, 1, 0)
    sparse = spark.createDataFrame(
        [("a", t0, 1.0), ("a", t0 + datetime.timedelta(hours=2), 3.0)], "s string, h timestamp, v double"
    )
    out = gapfill(sparse, series=["s"], ts="h", step="1 hour")
    rows = {r["h"].hour: r for r in out.collect()}
    assert rows[1]["v"] is None and rows[1]["filled"] is True


def test_scd2_null_attr_transitions(spark):
    # A->NULL->A must yield THREE versions (the NULL period is real
    # history), and a leading NULL attr opens a version.
    log = spark.createDataFrame(
        [(1, "A", 1), (1, None, 2), (1, "A", 3), (2, None, 1), (2, "B", 2)],
        "k int, attr string, ts int",
    )
    rows = sorted(
        (
            (r["k"], r["attr"], r["valid_from"], r["valid_to"])
            for r in scd2_collapse(log, key=["k"], attr="attr", ts="ts").collect()
        ),
        key=lambda t: (t[0], t[2]),
    )
    assert rows == [
        (1, "A", 1, 2),
        (1, None, 2, 3),
        (1, "A", 3, None),
        (2, None, 1, 2),
        (2, "B", 2, None),
    ]


def test_gapfill_filled_flag_distinguishes_null_observation(spark):
    import datetime

    t0 = datetime.datetime(2024, 1, 1, 0)
    # Hour 0: real observation with NULL value; hour 1: genuinely missing.
    sparse = spark.createDataFrame(
        [("a", t0, None), ("a", t0 + datetime.timedelta(hours=2), 3.0)],
        "s string, h timestamp, v double",
    )
    out = {r["h"].hour: r for r in gapfill(sparse, series=["s"], ts="h", step="1 hour").collect()}
    assert out[0]["filled"] is False  # present row, NULL value — NOT synthesized
    assert out[1]["filled"] is True


def test_compact_parquet_reduces_files(spark, sf_dir, tmp_path):
    from laygo_python_spark.operators.warehouse import compact_parquet
    from laygo_python_spark.session import read_table

    src = str(tmp_path / "frag")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    li.repartition(40).write.parquet(src)  # the small-files disease
    dest = str(tmp_path / "compact")
    stats = compact_parquet(spark, src, dest, target_bytes=1 << 30)
    assert stats["files_before"] == 40
    assert stats["files_after"] <= 4  # everything fits one target file (+AQE splits)
    # Content identical (multiset) after the rewrite.
    before = li.groupBy("l_orderkey").count()
    after = spark.read.parquet(dest).groupBy("l_orderkey").count()
    assert before.exceptAll(after).count() == 0 and after.exceptAll(before).count() == 0
    assert stats["rows"] == li.count()


def test_compact_parquet_ordered_keeps_stats_narrow(spark, sf_dir, tmp_path):
    from laygo_python_spark.operators.warehouse import compact_parquet
    from laygo_python_spark.session import read_table

    src = str(tmp_path / "frag2")
    read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity").repartition(
        16
    ).write.parquet(src)
    dest = str(tmp_path / "compact2")
    stats = compact_parquet(spark, src, dest, target_bytes=16 << 10, order_by=["l_orderkey"])
    assert stats["files_after"] >= 2  # small target → several range files
    # Range layout: per-file key ranges must not overlap (narrow min/max
    # stats = the scan-pruning payoff).
    import pyarrow.parquet as pq
    import glob
    ranges = []
    for f in sorted(glob.glob(dest + "/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["l_orderkey"]
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            los.append(st.min); his.append(st.max)
        ranges.append((min(los), max(his)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (ranges,)


def test_compact_parquet_empty_dir_raises(spark, tmp_path):
    import pytest as _pytest
    from laygo_python_spark.operators.warehouse import compact_parquet

    empty = tmp_path / "empty"
    empty.mkdir()
    with _pytest.raises(ValueError, match="no parquet files"):
        compact_parquet(spark, str(empty), str(tmp_path / "out"))


def test_dynamic_partition_overwrite(spark, sf_dir, tmp_path):
    """The incremental-write contract: with partitionOverwriteMode=
    dynamic, an overwrite replaces ONLY the partitions present in the
    incoming frame — yesterday's untouched partitions survive. (Static
    mode — the default — would wipe the whole table first; this pins
    the difference.)"""
    from laygo_python_spark.session import read_table

    out = str(tmp_path / "by_status")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderstatus")
    orders.write.partitionBy("o_orderstatus").parquet(out)
    statuses = {r["o_orderstatus"] for r in orders.select("o_orderstatus").distinct().collect()}
    assert len(statuses) >= 2
    target = sorted(statuses)[0]
    patch = (
        orders.filter(F.col("o_orderstatus") == target)
        .limit(10)
        .withColumn("o_totalprice", F.lit(0.0))
    )
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patch.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    back = spark.read.parquet(out)
    # untouched partitions intact...
    for s in statuses - {target}:
        want = orders.filter(F.col("o_orderstatus") == s).count()
        assert back.filter(F.col("o_orderstatus") == s).count() == want
    # ...only the written partition was replaced (10 zeroed rows now)
    got = back.filter(F.col("o_orderstatus") == target)
    assert got.count() == 10
    assert got.agg(F.sum("o_totalprice")).first()[0] == 0.0
