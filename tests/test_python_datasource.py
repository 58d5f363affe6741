"""Custom Python DataSource (sources/python_datasource.py): the
generator-source parity surface. Batch and stream must produce the SAME
rows (formula-derived), generation must actually be partitioned, and
the stream must drain at the cap.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from laygo_python_spark.sources.python_datasource import (
    SyntheticEventsDataSource,
    _BatchReader,
    _StreamReader,
    register,
)


def _batch_df(spark, n=3000, partitions=6):
    register(spark)
    return (
        spark.read.format("synthetic_events")
        .option("n", n)
        .option("partitions", partitions)
        .load()
    )


def test_batch_rows_and_planning(spark):
    df = _batch_df(spark)
    assert df.count() == 3000
    # Executor-side planning: 6 id-range partitions, disjoint and complete.
    reader = _BatchReader({"n": "3000", "partitions": "6"})
    parts = reader.partitions()
    assert len(parts) == 6
    covered = sorted((p.start, p.end) for p in parts)
    assert covered[0][0] == 0 and covered[-1][1] == 3000
    assert all(a[1] == b[0] for a, b in zip(covered, covered[1:]))


def test_batch_formula_values(spark):
    row = _batch_df(spark).filter(F.col("event_id") == 7).first()
    assert (row["user_id"], row["event_type"], row["value"]) == (7, "error", 0.7)


def test_stream_equals_batch(spark):
    register(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("n", 2500)
        .option("batch", 700)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pysource_stream_eq")
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp())
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(map(tuple, spark.sql("SELECT * FROM pysource_stream_eq").collect()))
    want = sorted(map(tuple, _batch_df(spark, n=2500).collect()))
    assert got == want  # unbounded path ≡ bounded path, row for row


def test_stream_reader_protocol():
    # Unit-level: offsets advance by `batch` to the cap, then hold with
    # empty reads (how processAllAvailable knows the stream is drained);
    # readBetweenOffsets replays identically (recovery path).
    r = _StreamReader({"n": "10", "batch": "4"})
    assert r.initialOffset() == {"i": 0}
    rows1, o1 = r.read({"i": 0})
    assert len(list(rows1)) == 4 and o1 == {"i": 4}
    rows3, o3 = r.read({"i": 8})
    assert len(list(rows3)) == 2 and o3 == {"i": 10}
    empty, o4 = r.read({"i": 10})
    assert list(empty) == [] and o4 == {"i": 10}
    replay = list(r.readBetweenOffsets({"i": 4}, {"i": 8}))
    direct, _ = r.read({"i": 4})
    assert replay == list(direct)


def test_source_name_and_schema():
    assert SyntheticEventsDataSource.name() == "synthetic_events"
    s = SyntheticEventsDataSource({}).schema()
    assert "event_id" in s and "value double" in s


def test_partitioned_stream_reader_protocol():
    # Unit-level for the DEFAULT (executor-side) stream reader: offsets
    # advance by `batch` to the cap then hold; each micro-batch splits
    # into `partitions` contiguous ranges that exactly tile [lo, hi).
    from laygo_python_spark.sources.python_datasource import _PartitionedStreamReader

    r = _PartitionedStreamReader({"n": "10", "batch": "4", "partitions": "3"})
    assert r.initialOffset() == {"i": 0}
    assert r.latestOffset() == {"i": 4}
    assert r.latestOffset() == {"i": 8}
    assert r.latestOffset() == {"i": 10}
    assert r.latestOffset() == {"i": 10}  # cap reached: offset holds
    parts = r.partitions({"i": 0}, {"i": 4})
    ranges = [(p.start, p.end) for p in parts]
    assert ranges[0][0] == 0 and ranges[-1][1] == 4
    assert all(a[1] == b[0] for a, b in zip(ranges, ranges[1:]))
    rows = [row for p in parts for row in r.read(p)]
    assert [row[0] for row in rows] == [0, 1, 2, 3]
    empty = r.partitions({"i": 10}, {"i": 10})
    assert [list(r.read(p)) for p in empty] == [[]]


def test_simple_mode_stream_equals_batch(spark):
    # stream_mode=simple falls back to the driver-side Simple reader via
    # the engine's PySparkNotImplementedError contract — same rows.
    register(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("n", 1500)
        .option("batch", 400)
        .option("stream_mode", "simple")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pysource_stream_simple")
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp())
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(map(tuple, spark.sql("SELECT * FROM pysource_stream_simple").collect()))
    want = sorted(map(tuple, _batch_df(spark, n=1500).collect()))
    assert got == want
