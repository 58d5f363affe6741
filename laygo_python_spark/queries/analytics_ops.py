"""Product-analytics batch over the events table: ordered funnel and
cohort retention — the two standard event-sequence analyses alongside
sessionize_users / hourly_event_stats.

Time arithmetic follows the integer-microsecond rule (see
tools/verify_oracle.py docstring): week indexes are
``unix_micros(ts) div week_us`` ≡ DuckDB ``epoch_us(ts) // week_us`` —
never float seconds, never engine-specific date_trunc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t

_WEEK_US = 7 * 86400 * 1_000_000


@query(
    "funnel_stages",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t
          FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t
          WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t
          FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_view_click,
           (SELECT count(*) FROM p) AS n_view_click_purchase
    """,
)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: a user counts
    at stage k only if a stage-k event happened strictly AFTER an event
    that qualified at stage k-1.

    The funnel is a subsequence match, so it needs ONE scan and ONE
    per-user window shuffle — not a join per stage (an earlier version
    scanned events five times). Cumulative RANGE frames over event-time
    micros give the strictly-earlier semantics: a click qualifies if any
    view precedes it; a purchase qualifies if any QUALIFYING click
    precedes it (same window, second pass, no extra shuffle). 'After the
    first qualifying stage-(k-1) event' ≡ 'after ANY qualifying one'."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("tu"), "event_type"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tu")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    is_view = (F.col("event_type") == "view").cast("int")
    seen_view = F.coalesce(F.max(is_view).over(w), F.lit(0))
    q_click = ((F.col("event_type") == "click") & (seen_view == 1)).cast("int")
    seen_qclick = F.coalesce(F.max(q_click).over(w), F.lit(0))
    q_purchase = ((F.col("event_type") == "purchase") & (seen_qclick == 1)).cast("int")
    marked = ev.select("user_id", is_view.alias("v"), q_click.alias("c"), q_purchase.alias("p"))
    return marked.agg(
        F.count_distinct(F.when(F.col("v") == 1, F.col("user_id"))).alias("n_view"),
        F.count_distinct(F.when(F.col("c") == 1, F.col("user_id"))).alias("n_view_click"),
        F.count_distinct(F.when(F.col("p") == 1, F.col("user_id"))).alias(
            "n_view_click_purchase"
        ),
    )


@query(
    "cohort_retention",
    oracle=f"""
    WITH wk AS (SELECT user_id, epoch_us(ts) // {_WEEK_US} AS w FROM events),
    first AS (SELECT user_id, min(w) AS cohort_w FROM wk GROUP BY user_id)
    SELECT cohort_w AS cohort_week, w - cohort_w AS week_offset,
           count(DISTINCT wk.user_id) AS n_active_users
    FROM wk JOIN first USING (user_id)
    GROUP BY cohort_week, week_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the epoch-week of their
    first event; each cell counts distinct users from that cohort active
    k weeks later. The first-seen table is one narrow row per user — it
    scales WITH the user base, so it is deliberately NOT broadcast: both
    join inputs hash-partition on user_id, the same key as the per-user
    min that produced it, so the planner reuses one exchange of the
    activity table for both sides."""
    ev = _t(spark, sf_dir, "events")
    wk = ev.select("user_id", F.expr(f"unix_micros(ts) div {_WEEK_US}").alias("w"))
    first = wk.groupBy("user_id").agg(F.min("w").alias("cohort_w"))
    return (
        wk.join(first, "user_id")
        .groupBy(
            F.col("cohort_w").alias("cohort_week"),
            (F.col("w") - F.col("cohort_w")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


_DAY_US = 86400 * 1_000_000


@query(
    "rolling_7d_revenue",
    oracle=f"""
    WITH d AS (SELECT o_custkey, o_orderkey, o_totalprice,
                      epoch_us(o_orderdate) // {_DAY_US} AS day
               FROM orders)
    SELECT o_custkey, o_orderkey, day,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY day
                                         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2)
             AS rolling_7d_total
    FROM d
    """,
)
def rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (vs the ROWS frame of running_sum_per_customer):
    each order's trailing-7-day spend per customer — the frame is bounded
    by VALUE distance on an integer epoch-day key (unix_micros div day_us,
    the integer-microsecond rule), so same-day orders always share a
    frame. One shuffle on the partition key, frames evaluated by a
    sliding aggregate within each sorted partition."""
    from pyspark.sql import Window

    # o_orderdate is parquet TIMESTAMP_NTZ; the session is pinned to UTC,
    # so the cast to (tz-adjusted) TIMESTAMP relabels without shifting.
    orders = _t(spark, sf_dir, "orders").withColumn(
        "day", F.expr(f"unix_micros(cast(o_orderdate as timestamp)) div {_DAY_US}")
    )
    w = Window.partitionBy("o_custkey").orderBy("day").rangeBetween(-6, Window.currentRow)
    return orders.select(
        "o_custkey", "o_orderkey", "day",
        F.round(F.sum("o_totalprice").over(w), 2).alias("rolling_7d_total"),
    )


@query(
    "benford_first_digit",
    oracle="""
    WITH d AS (
      SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders),
    c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
    t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c)
    SELECT digit, n,
           round(n / total, 6) AS freq,
           round(log10(1.0 + 1.0 / digit), 6) AS benford,
           round(n / total - log10(1.0 + 1.0 / digit), 6) AS deviation
    FROM c, t
    """,
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen on order totals: the leading-digit
    distribution vs log10(1 + 1/d) — the classic anomaly/fraud check
    for naturally occurring amounts (fabricated numbers over-represent
    mid digits).

    The first digit comes from the STRING of the truncated integer, not
    floor(log10(x)) — libm rounding at exact powers of ten could flip
    the float path's digit between engines, while bigint-to-string is
    identical everywhere. One 9-row aggregate; the Benford expectation
    is the same literal expression in both engines."""
    orders = _t(spark, sf_dir, "orders")
    d = orders.select(
        F.substring(F.floor("o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").cast("double").alias("total"))
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        F.round(F.col("n") / F.col("total"), 6).alias("freq"),
        F.round(benford, 6).alias("benford"),
        F.round(F.col("n") / F.col("total") - benford, 6).alias("deviation"),
    )
