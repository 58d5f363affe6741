"""Custom Python DataSource — the generator-source parity surface.

The reference feeds pipelines from arbitrary Python generators
(reference laygo/pipeline.py:94-112 accepts any iterable; the profiler
uses unbounded generators, reference profiler/basic.py:5-11). The naive
Spark translation — materialize the generator on the driver and
``createDataFrame`` — is exactly the driver bottleneck this engine
exists to avoid. Spark 4's Python DataSource API is the idiomatic form:
the BATCH surface's generator logic runs ON EXECUTORS, partitioned,
with each partition producing its own deterministic id range. The
stream surface defaults to the PARTITIONED reader (executor-side
``read(partition)``, same scale posture as batch); pass
``stream_mode=simple`` to exercise the driver-side Simple reader — kept
for the replay/recovery surface its offset contract demonstrates.

Two surfaces on one source class:

- batch  (``spark.read.format("synthetic_events")``): n rows split over
  ``partitions`` input partitions — the bounded-generator case;
- stream (``spark.readStream.format("synthetic_events")``): micro-batches
  of ``batch`` rows until the ``n`` cap, then empty batches (offset
  stops advancing) so ``processAllAvailable`` terminates — the
  unbounded-generator case with a test-friendly bound.

Rows are formula-generated from the row id (no RNG), so the SAME rows
can be reproduced by any engine from a range table — which is what makes
the registered query DuckDB-oracle-able (``FROM range(...)``) and the
stream provably equal to the batch.

100 TB posture: generation is embarrassingly parallel and executor-side;
the driver only plans id ranges. This is also the template for wrapping
a real external feed (paginated API, message log): partition by shard /
offset range, yield tuples, let Spark own retries per task.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

EVENT_TYPES = ("click", "view", "error", "purchase", "scroll")


def _row(i: int) -> tuple[int, int, str, float]:
    """One deterministic event per id — integer-derived doubles only, so
    every engine computes bit-identical values."""
    return (i, i % 1000, EVENT_TYPES[i % 5], (i % 997) / 10.0)


# The same derivation as ANSI SQL, for oracles: DuckDB/Spark both
# evaluate it identically over a range table.
ROW_SQL = (
    "i AS event_id, i % 1000 AS user_id, "
    "CASE i % 5 WHEN 0 THEN 'click' WHEN 1 THEN 'view' WHEN 2 THEN 'error' "
    "WHEN 3 THEN 'purchase' ELSE 'scroll' END AS event_type, "
    "(i % 997) / 10.0 AS value"
)


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start, self.end = start, end


class _BatchReader(DataSourceReader):
    """Generates ids [start, n) — ``start`` exists so shard-style callers
    (examples/incremental_analytics.py) produce exactly their own range
    instead of regenerating-and-filtering every earlier id."""

    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 10_000))
        self.start = int(options.get("start", 0))
        self.parts = max(1, int(options.get("partitions", 8)))

    def partitions(self) -> list[_IdRange]:
        total = max(0, self.n - self.start)
        step = -(-total // self.parts) if total else 1
        return [
            _IdRange(s, min(s + step, self.n)) for s in range(self.start, self.n, step)
        ] or [_IdRange(0, 0)]

    def read(self, partition: _IdRange):
        for i in range(partition.start, partition.end):
            yield _row(i)


class _StreamReader(SimpleDataSourceStreamReader):
    """Driver-side Simple reader (``stream_mode=simple``): offset = next
    unread id. Past the ``n`` cap it returns empty batches with an
    unmoved offset, which is how a bounded test stream signals drain
    without a real unbounded source's blocking semantics.

    ``SimpleDataSourceStreamReader.read()`` runs DRIVER-side (the simple
    API trades scale for simplicity); the default production path is
    ``_PartitionedStreamReader`` below — this class stays as the replay
    (``readBetweenOffsets``) reference."""

    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 10_000))
        self.batch = int(options.get("batch", 1_000))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        lo = start["i"]
        hi = min(lo + self.batch, self.n)
        return iter([_row(i) for i in range(lo, hi)]), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # Replay for recovery: same formula, same rows.
        return iter([_row(i) for i in range(start["i"], end["i"])])


class _PartitionedStreamReader(DataSourceStreamReader):
    """Executor-side micro-batched generator — the scale-correct stream
    surface: the driver only advances the offset (one int) and plans id
    ranges; every ``read(partition)`` runs ON EXECUTORS like the batch
    reader, so a micro-batch fans out over ``partitions`` tasks instead
    of funneling through the driver. Past the ``n`` cap ``latestOffset``
    stops advancing → empty micro-batches → ``processAllAvailable``
    drains. This is the template for a real sharded feed (Kafka-like
    log, paginated API): offsets on the driver, records on executors."""

    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 10_000))
        self.batch = int(options.get("batch", 1_000))
        self.parts = max(1, int(options.get("partitions", 4)))
        self._latest = 0

    def initialOffset(self) -> dict:
        return {"i": 0}

    def latestOffset(self) -> dict:
        self._latest = min(self._latest + self.batch, self.n)
        return {"i": self._latest}

    def partitions(self, start: dict, end: dict) -> list[_IdRange]:
        lo, hi = start["i"], end["i"]
        total = hi - lo
        if total <= 0:
            return [_IdRange(lo, lo)]
        step = -(-total // self.parts)
        return [_IdRange(s, min(s + step, hi)) for s in range(lo, hi, step)]

    def read(self, partition: _IdRange):
        for i in range(partition.start, partition.end):
            yield _row(i)

    def commit(self, end: dict) -> None:
        pass


class SyntheticEventsDataSource(DataSource):
    """``spark.dataSource.register(SyntheticEventsDataSource)`` then read
    format ``synthetic_events`` with options n / partitions / batch."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double"

    def reader(self, schema) -> _BatchReader:
        return _BatchReader(self.options)

    def streamReader(self, schema) -> _PartitionedStreamReader:
        if self.options.get("stream_mode", "partitioned") == "simple":
            # Engine contract (pyspark datasource_internal._streamReader):
            # raising PySparkNotImplementedError falls back to
            # simpleStreamReader below.
            from pyspark.errors import PySparkNotImplementedError

            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED", messageParameters={"feature": "streamReader"}
            )
        return _PartitionedStreamReader(self.options)

    def simpleStreamReader(self, schema) -> _StreamReader:
        return _StreamReader(self.options)


import weakref

_REGISTERED: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def register(spark: SparkSession) -> None:
    """Idempotent per-session registration — re-registering pickles and
    ships the DataSource class to the JVM again on every call (the
    bench re-invokes the query body per timed run; r7 flagged the
    query's driver-bench drift). WeakSet keying: a restarted session is
    a new object and registers afresh; a dead session's entry can't
    alias a new one the way a bare id() memo could."""
    if spark in _REGISTERED:
        return
    spark.dataSource.register(SyntheticEventsDataSource)
    _REGISTERED.add(spark)
