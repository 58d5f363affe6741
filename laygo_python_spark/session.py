"""SparkSession bootstrap + table helpers.

Scale posture: these configs are tuned so the same code runs on
``local[32]`` for tests and on a 1000-executor cluster unchanged —
AQE owns runtime re-planning (partition coalescing, skew-join splitting,
broadcast demotion), shuffle partitions default to the cluster
parallelism, and Arrow is on for every Python<->JVM hop.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "laygo_python_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a tuned SparkSession.

    On a real cluster the ``master`` is supplied by spark-submit; the
    ``local[n]`` default only applies when nothing else set one.
    """
    n = cpus or _cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        # Partition parallelism: ~cores locally. On a cluster AQE
        # coalesces post-shuffle partitions down from a higher initial
        # number, so over-provisioning is safe; under-provisioning is not.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        # AQE: runtime re-plan — coalesce small shuffle partitions,
        # convert sort-merge joins to broadcast when a side turns out
        # small, split skewed partitions. Essential at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Respect the advisory partition size instead of maximizing
        # parallelism when coalescing (the Spark-docs-recommended
        # setting): tiny shuffles collapse to few tasks (kills the
        # 32-empty-task floor on small inputs) while big shuffles still
        # split by bytes — size-proportional either way.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        # Prefer shuffled-hash over sort-merge when a side is small
        # enough to hash per-partition: measured 29.5s -> 4.0s on a
        # 60M x 6M fact-dim join (the sorts were the entire cost).
        # Safe under AQE (skew still splits; Spark >= 3.3 SHJ spills);
        # the planner still falls back to SMJ when neither side fits.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # Deterministic timestamps for the DuckDB oracle (UTC-naive).
        .config("spark.sql.session.timeZone", "UTC")
        # Naive parquet timestamps (no isAdjustedToUTC flag) read as
        # TIMESTAMP (ltz), not TIMESTAMP_NTZ. With the UTC session zone
        # the wall values are identical, and ltz keeps the whole
        # timestamp function library (unix_micros, window, watermarks)
        # applicable. DuckDB's epoch_us on the same naive column agrees.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # Arrow for pandas_udf / mapInPandas / toPandas — the "chunk"
        # transport. 10k rows/batch ≈ the reference's chunk_size scaled
        # for columnar amortization (reference default 1000,
        # laygo/transformers/transformer.py:28).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        # FAIR scheduling: Pipeline.branch submits one action per branch
        # from driver threads — FAIR interleaves them instead of FIFO
        # head-of-line blocking.
        .config("spark.scheduler.mode", "FAIR")
        # ContextCleaner housekeeping: out-of-scope broadcasts, shuffle
        # files and localCheckpoint blocks are only reclaimed after a
        # JVM GC surfaces their weak refs, and Spark's fallback periodic
        # GC defaults to 30min — longer than a whole bench/test session,
        # so hundreds of per-query broadcasts and checkpoint blocks
        # accumulated as storage/GC pressure (measured r6: back-to-back
        # suite runs drifted +9% vs isolated). 2min bounds the drift
        # without measurable GC cost (one full GC on this heap ~0.2 s).
        .config("spark.cleaner.periodicGC.interval", "2min")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
    )
    if SparkSession.getActiveSession() is None:
        builder = builder.master(f"local[{n}]")
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# Tables whose parquet MAY store TIMESTAMP(NANOS) columns (one fixture
# vintage did), which Spark 4 refuses natively. We read them as long
# nanos and truncate to micros — integer division, never float (1.7e18
# ns does not fit a double's 53-bit mantissa). DuckDB truncates ns→us
# the same way, so the oracle sees identical timestamps. Later fixture
# vintages store naive micros; those read straight through (as ltz,
# see inferTimestampNTZ above).
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def ensure_session_defaults(spark: SparkSession) -> None:
    """Runtime-settable confs the engine's correctness depends on, applied
    defensively — the DRIVER may call queries() with its own
    SparkSession built without these. UTC keeps timestamp formatting
    identical to the (UTC-naive) DuckDB oracle; Arrow keeps the
    mapInPandas paths on the fast transport."""
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:  # noqa: BLE001 — a locked-down conf is non-fatal
        pass


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Tiny literal DataFrame as a JVM LocalRelation (via Arrow).

    A plain list-backed ``createDataFrame`` executes through the
    Python-RDD path: EVERY job that evaluates the frame — a write, a
    join — spins up Python workers, measured ~4.5 s for a ONE-ROW
    parquet write at r5 (it dominated the stored-index append wall).
    The pandas/Arrow route lands the same rows as a JVM LocalRelation
    (~0.2 s) and downstream execution stays whole-stage-codegen. Use
    for params rows, batch markers, probe/lag tables; NOT for
    ``Pipeline(*data)`` ingestion, whose mixed-type inference the
    pandas path does not reproduce."""
    import pandas as pd
    from pyspark.sql.types import _parse_datatype_string

    st = _parse_datatype_string(schema) if isinstance(schema, str) else schema
    pdf = pd.DataFrame(list(rows), columns=st.fieldNames())
    return spark.createDataFrame(pdf, schema=st)


_TABLE_CACHE: dict[tuple[str, str, str], tuple[object, DataFrame]] = {}


def clear_table_cache() -> None:
    """Drop every cached table resolution — the escape hatch for a
    caller that mutates a table directory mid-session through a channel
    the mtime probe can't see (remote FS, symlink farm)."""
    _TABLE_CACHE.clear()


def _dir_fingerprint(path: str):
    """Cheap staleness probe for LOCAL table paths: one os.stat — a
    directory's (mtime, size) changes when files are added, removed, or
    replaced, which is the daily-ingest mutation shape. Non-local
    schemes and missing paths return None (no probe): those cached
    entries behave as a per-session snapshot, which is also Spark's own
    semantics for a DataFrame whose underlying files change (stale
    listings / FileNotFound) — callers mutating remote dirs should
    ``clear_table_cache()``."""
    if "://" in path:
        return None
    try:
        st = os.stat(path)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return None


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan — Catalyst pushes filters/projections into it.

    Cached per (session, dir, table): a fixture table is immutable
    within a session, and an uncached call pays file listing + parquet
    footer schema resolution + two plan analyses every time (~0.27 s at
    sf0.1, measured — it was a third of ``dedup_minhash_lsh``'s benched
    wall). A production catalog resolves a table once per session too;
    per-query re-resolution was pure overhead. The cache re-validates a
    local path's directory mtime on every hit (one stat), so a table
    dir that gains files mid-session is re-resolved instead of serving
    the pinned first listing; see ``clear_table_cache`` for mutation
    channels the probe can't see. The returned DataFrame is lazy and
    immutable, so sharing the object is safe."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    fp = _dir_fingerprint(f"{sf_dir}/{name}.parquet")
    hit = _TABLE_CACHE.get(key)
    if hit is not None and hit[0] == fp:
        return hit[1]
    ensure_session_defaults(spark)
    nanos_cols = _NANOS_TS_COLS.get(name, ())
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in nanos_cols:
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    # Belt-and-braces for sessions where inferTimestampNTZ couldn't be
    # flipped (a locked-down driver session): NTZ -> ltz is a wall-value
    # no-op under the UTC session zone, and it keeps unix_micros/window/
    # watermark operators valid on every fixture vintage.
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    _TABLE_CACHE[key] = (fp, df)
    return df


def read_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register the fixture tables as temp views so raw ``spark.sql``
    works next to the fluent API (migrating users keep their SQL; the
    nanos-timestamp handling of read_table rides along)."""
    for name in names:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
