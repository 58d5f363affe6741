"""Warehouse-maintenance queries over operators/warehouse.py: MERGE
upsert, SCD2 dimension history, and time-series gap-fill — each with a
full ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laygo_python_spark.operators.warehouse import (
    gapfill,
    merge_upsert,
    scd2_collapse,
    snapshot_diff,
)
from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


@query(
    "merge_upsert_customer_balance",
    oracle="""
    WITH t AS (SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal >= 0),
         s AS (SELECT o_custkey, round(sum(o_totalprice), 2) AS delta, count(*) AS n_orders
               FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
               GROUP BY o_custkey)
    SELECT COALESCE(t.c_custkey, s.o_custkey) AS c_custkey,
           CASE WHEN t.c_custkey IS NOT NULL THEN t.c_name ELSE '(new)' END AS c_name,
           CASE WHEN t.c_custkey IS NOT NULL
                THEN round(t.c_acctbal + COALESCE(s.delta, 0), 2)
                ELSE round(COALESCE(s.delta, 0), 2) END AS c_acctbal,
           CAST(COALESCE(s.n_orders, 0) AS BIGINT) AS n_orders
    FROM t FULL OUTER JOIN s ON t.c_custkey = s.o_custkey
    """,
)
def merge_upsert_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE the 1997+ order revenue into the customer dim: existing
    customers get their balance bumped, customers missing from the dim
    (negative-balance rows excluded upstream) are inserted with a
    placeholder name — the nightly-dim-refresh pattern, one full-outer
    shuffle, changeset broadcast-able."""
    target = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") >= 0)
        .select("c_custkey", "c_name", "c_acctbal")
    )
    source = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("delta"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    return merge_upsert(
        target,
        source,
        on=["c_custkey"],
        update_set={
            "c_name": target["c_name"],
            "c_acctbal": F.round(target["c_acctbal"] + F.coalesce(source["delta"], F.lit(0.0)), 2),
            "n_orders": F.coalesce(source["n_orders"], F.lit(0)).cast("long"),
        },
        insert_set={
            "c_name": F.lit("(new)"),
            "c_acctbal": F.round(F.coalesce(source["delta"], F.lit(0.0)), 2),
            "n_orders": F.coalesce(source["n_orders"], F.lit(0)).cast("long"),
        },
        broadcast_source=True,
    )


@query(
    "scd2_priority_history",
    oracle=f"""
    WITH log AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             lag(o_orderpriority) OVER w AS prev
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
    versions AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
      FROM log WHERE prev IS NULL OR o_orderpriority <> prev)
    SELECT o_custkey, o_orderpriority,
           strftime(o_orderdate, '{_TS_FMT_DUCK}') AS valid_from,
           strftime(lead(o_orderdate) OVER w2, '{_TS_FMT_DUCK}') AS valid_to,
           lead(o_orderdate) OVER w2 IS NULL AS is_current
    FROM versions
    WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the SCD2 history of each customer's order priority from the
    orders change log: consecutive same-priority orders collapse into one
    validity range. One window shuffle; timestamps emitted as strings per
    the oracle-matching convention.

    Note the deterministic change-log order (o_orderdate, o_orderkey):
    SCD2 is only well-defined over a total order, so ties must be broken
    explicitly."""
    log = (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderpriority",
            # Encode the (date, key) total order into one sortable struct so
            # the operator's single-ts contract stays intact.
            F.struct("o_orderdate", "o_orderkey").alias("__ord"),
        )
    )
    out = scd2_collapse(log, key=["o_custkey"], attr="o_orderpriority", ts="__ord")
    return out.select(
        "o_custkey",
        "o_orderpriority",
        F.date_format(F.col("valid_from.o_orderdate"), _TS_FMT_SPARK).alias("valid_from"),
        F.date_format(F.col("valid_to.o_orderdate"), _TS_FMT_SPARK).alias("valid_to"),
        "is_current",
    )


@query(
    "gapfill_hourly_purchases",
    oracle=f"""
    WITH sparse AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             round(sum(value), 2) AS hour_value, count(*) AS n_events
      FROM events GROUP BY event_type, date_trunc('hour', ts)),
    bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi FROM events),
    grid AS (
      SELECT t.event_type, g.h
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds) g),
    dense AS (
      SELECT grid.event_type, grid.h,
             sparse.hour_value, COALESCE(sparse.n_events, 0) AS n_events,
             sparse.hour_value IS NULL AS filled
      FROM grid LEFT JOIN sparse ON grid.event_type = sparse.event_type AND grid.h = sparse.h)
    SELECT event_type, strftime(h, '{_TS_FMT_DUCK}') AS hour,
           last_value(hour_value IGNORE NULLS)
             OVER (PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hour_value,
           CAST(n_events AS BIGINT) AS n_events, filled
    FROM dense
    """,
)
def gapfill_hourly_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densify per-type hourly event aggregates onto the full hour grid
    and forward-fill empty hours — the hypertable/time_bucket_gapfill
    pattern. The grid is generated executor-side (sequence + explode), so
    no driver loop; at 100 TB the grid is tiny relative to the data and
    the single shuffle is the per-series window."""
    events = _t(spark, sf_dir, "events")
    sparse = (
        events.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.round(F.sum("value"), 2).alias("hour_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    dense = gapfill(sparse, series=["event_type"], ts="h", step="1 hour", fill_cols=["hour_value"])
    return dense.select(
        "event_type",
        F.date_format("h", _TS_FMT_SPARK).alias("hour"),
        "hour_value",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        "filled",
    )


@query(
    "snapshot_diff_orders",
    oracle="""
    WITH old AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
                 WHERE o_orderdate < TIMESTAMP '1997-01-01'),
         new AS (SELECT o_orderkey, o_orderstatus, round(o_totalprice, -2) AS o_totalprice
                 FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-07-01'
                   AND o_orderdate < TIMESTAMP '1997-07-01')
    SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
           CASE WHEN old.o_orderkey IS NULL THEN 'added'
                WHEN new.o_orderkey IS NULL THEN 'removed'
                WHEN old.o_orderstatus IS DISTINCT FROM new.o_orderstatus
                     OR old.o_totalprice IS DISTINCT FROM new.o_totalprice THEN 'changed'
           END AS change_type
    FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    WHERE CASE WHEN old.o_orderkey IS NULL THEN 'added'
               WHEN new.o_orderkey IS NULL THEN 'removed'
               WHEN old.o_orderstatus IS DISTINCT FROM new.o_orderstatus
                    OR old.o_totalprice IS DISTINCT FROM new.o_totalprice THEN 'changed'
          END IS NOT NULL
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC diff between two simulated snapshots of the orders table
    (overlapping date windows; the newer snapshot's totals rounded to
    hundreds so the overlap contains both changed and unchanged rows).
    The operator ships key + xxhash64 row-hash through the shuffle; the
    oracle compares raw values — identical output modulo 2^-64 collision
    odds."""
    orders = _t(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_orderstatus", F.round("o_totalprice", -2).alias("o_totalprice"))
    )
    return snapshot_diff(old, new, on=["o_orderkey"])


def _morton_sql(bits: int = 8) -> str:
    """Unrolled bit-interleave of (a, b) as plain integer arithmetic —
    the same expression tree the Spark side builds, term by term, so
    the oracle pins the exact bit layout of operators/zorder.morton_key
    (dimension j lands at output bit i*2 + j)."""
    terms = []
    for i in range(bits):
        terms.append(f"(((a >> {i}) & 1) << {i * 2})")
        terms.append(f"(((b >> {i}) & 1) << {i * 2 + 1})")
    return " + ".join(terms)


@query(
    "zorder_morton_keys",
    oracle=f"""
    WITH d AS (SELECT l_orderkey, l_linenumber,
                      l_partkey % 256 AS a, l_suppkey % 256 AS b
               FROM lineitem)
    SELECT l_orderkey, l_linenumber, CAST({_morton_sql(8)} AS BIGINT) AS zkey
    FROM d
    """,
)
def zorder_morton_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Morton (Z-curve) key behind zorder_layout, oracle-pinned bit
    for bit: interleave 8 bits of two scaled dimensions into one long.
    zorder_layout itself is a physical re-layout (verified by
    tests/test_zorder.py min/max-pruning assertions); this query gates
    the key derivation that makes the layout skippable in EVERY
    participating dimension — pure Column bit algebra, map-only,
    codegen'd."""
    from laygo_python_spark.operators.zorder import morton_key

    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        morton_key(
            [(F.col("l_partkey") % 256).cast("int"), (F.col("l_suppkey") % 256).cast("int")],
            bits=8,
        ).alias("zkey"),
    )
