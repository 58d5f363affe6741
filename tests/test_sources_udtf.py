"""Binary/text source connectors and the Python-UDTF escape hatch."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from laygo_python_spark.sources import from_binary_files, from_text


def test_binary_file_source_roundtrip(spark, tmp_path):
    payloads = {"a.bin": b"\x89PNG\r\nfake", "b.bin": b"RIFFfakewav", "skip.txt": b"nope"}
    for name, blob in payloads.items():
        (tmp_path / name).write_bytes(blob)

    df = from_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = {os.path.basename(r["path"]): r for r in df.collect()}
    assert set(rows) == {"a.bin", "b.bin"}
    assert bytes(rows["a.bin"]["content"]) == payloads["a.bin"]
    assert rows["b.bin"]["length"] == len(payloads["b.bin"])


def test_text_source_lines_and_whole(spark, tmp_path):
    (tmp_path / "doc.txt").write_text("line one\nline two\n")
    lines = from_text(spark, str(tmp_path))
    assert sorted(r["value"] for r in lines.collect()) == ["line one", "line two"]
    whole = from_text(spark, str(tmp_path), whole=True)
    assert whole.count() == 1
    assert "line one\nline two" in whole.collect()[0]["value"]


def test_chunk_text_udtf_matches_column_algebra(spark, sf_dir):
    """The UDTF chunker and the codegen'd slice+explode chunker must
    agree — differential test between the slow and fast paths."""
    from laygo_python_spark.functions.udtfs import register_udtfs
    from laygo_python_spark.queries.text_ops import doc_chunks
    from laygo_python_spark.session import read_table

    register_udtfs(spark)
    read_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf")
    via_udtf = spark.sql(
        "SELECT doc_id, chunk_idx, chunk_text FROM docs_udtf, LATERAL chunk_text(text, 20, 10)"
    )
    via_columns = doc_chunks(spark, sf_dir)
    assert sorted(map(tuple, via_udtf.collect())) == sorted(map(tuple, via_columns.collect()))


def test_explode_key_values_udtf(spark):
    from laygo_python_spark.functions.udtfs import ExplodeKeyValues

    df = ExplodeKeyValues(F.lit("a=1;b=2;;c;d = 4 "))
    rows = {r["key"]: r["value"] for r in df.collect()}
    assert rows == {"a": "1", "b": "2", "c": None, "d": "4"}


def test_dynamic_partition_overwrite_backfill(spark, tmp_path):
    """Re-writing one partition with dynamic_overwrite must leave the
    other partitions untouched (incremental backfill); static overwrite
    would wipe them."""
    from laygo_python_spark.sources.sinks import to_parquet

    out = str(tmp_path / "t")
    full = spark.createDataFrame([("a", 1), ("a", 2), ("b", 10)], ["k", "v"])
    to_parquet(full, out, partition_by=["k"])

    patch = spark.createDataFrame([("a", 99)], ["k", "v"])
    to_parquet(patch, out, partition_by=["k"], dynamic_overwrite=True)

    back = {(r.k, r.v) for r in spark.read.parquet(out).collect()}
    assert back == {("a", 99), ("b", 10)}
