"""Z-order layout (operators/zorder.py): the point is SKIPPABILITY — after
the re-layout, every output file must cover a narrow range of EVERY
participating dimension, where a linear sort narrows only its own column.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from laygo_python_spark.operators.zorder import morton_key, zorder_layout


def test_morton_key_orders_locally(spark):
    # Adjacent cells in (x, y) space must map to nearby Z values: the key
    # of (0,0),(1,0),(0,1),(1,1) is exactly 0,1,2,3.
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (1, 1)], "x int, y int")
    got = [r["z"] for r in df.select(morton_key([F.col("x"), F.col("y")], bits=2).alias("z")).collect()]
    assert got == [0, 1, 2, 3]


def _avg_file_span(files: list[str], col: str) -> float:
    spans = []
    for f in files:
        md = pq.read_metadata(f)
        idx = md.schema.names.index(col)
        stats = [md.row_group(i).column(idx).statistics for i in range(md.num_row_groups)]
        spans.append(max(s.max for s in stats) - min(s.min for s in stats))
    return sum(spans) / len(spans)


def test_zorder_files_narrow_on_both_dims(spark, tmp_path):
    n, files_n = 100_000, 16
    # Two INDEPENDENT uniform dims — the adversarial case for linear sort.
    df = spark.range(0, n).select(
        (F.xxhash64("id").bitwiseAND(F.lit(0x7FFFFFFF)) % 10_000).alias("x"),
        (F.xxhash64("id", F.lit(1)).bitwiseAND(F.lit(0x7FFFFFFF)) % 10_000).alias("y"),
    )

    z_path, lin_path = str(tmp_path / "z"), str(tmp_path / "lin")
    zorder_layout(df, ["x", "y"], num_partitions=files_n).write.mode("overwrite").parquet(z_path)
    df.repartitionByRange(files_n, "x").sortWithinPartitions("x").write.mode("overwrite").parquet(lin_path)

    zf, lf = sorted(glob.glob(f"{z_path}/part-*")), sorted(glob.glob(f"{lin_path}/part-*"))
    full = 10_000
    # Linear layout: x is narrow but y spans ~everything per file.
    assert _avg_file_span(lf, "x") < 0.2 * full
    assert _avg_file_span(lf, "y") > 0.8 * full
    # Z-order: BOTH dims narrow per file (16 files ≈ 4x4 grid → ~1/4 span
    # per dim; allow generous slack for curve boundaries).
    assert _avg_file_span(zf, "x") < 0.5 * full
    assert _avg_file_span(zf, "y") < 0.5 * full


def test_zorder_empty_and_allnull_inputs_degrade_gracefully(spark):
    empty = spark.createDataFrame([], "x int, y int")
    assert zorder_layout(empty, ["x", "y"], num_partitions=4).count() == 0
    nulls = spark.createDataFrame([(None, 1), (None, 2)], "x int, y int")
    assert zorder_layout(nulls, ["x", "y"], num_partitions=2).count() == 2
