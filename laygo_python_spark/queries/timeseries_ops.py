"""Time-series smoothing and robust-statistics queries — EWMA trend
lines over the events table and MAD-based outlier detection over
orders. Both follow the aggregate-rounding rule (see
winsorize_order_totals): every cross-engine float aggregate is rounded
BEFORE it feeds further arithmetic, so a last-ulp summation-order
difference can never cascade into downstream values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t

_DAY_US = 86400 * 1_000_000


@query(
    "ewma_daily_event_value",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
             round(sum(value), 6) AS daily_total
      FROM events GROUP BY 1, 2)
    SELECT a.event_type, a.day, a.daily_total,
           round(sum(b.daily_total * power(0.7, a.day - b.day))
                 / sum(power(0.7, a.day - b.day)), 6) AS ewma
    FROM daily a JOIN daily b
      ON b.event_type = a.event_type AND b.day <= a.day
    GROUP BY a.event_type, a.day, a.daily_total
    """,
)
def ewma_daily_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha=0.3, adjust=True —
    the pandas ``ewm`` definition: weights (1-a)^(t-i) normalized by
    their own sum) of daily event value per type.

    Scale shape: the raw stream is reduced to (type, day) FIRST — one
    partial+final aggregation — and the recursive smoothing runs on the
    tiny aggregated series via a within-type range self-join (days x
    days per type, hundreds of rows). The alternative of a running
    window with pow(1-a, -i) rescaling overflows doubles past ~700
    days, and a UDAF fold would leave codegen; the self-join keeps full
    fidelity at unbounded history. Daily totals are rounded before
    weighting (aggregate-rounding rule), so both engines smooth
    IDENTICAL inputs and the final round(6) only absorbs weighted-sum
    ordering."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("daily_total"))
    a, b = daily.alias("a"), daily.alias("b")
    w = F.pow(F.lit(0.7), F.col("a.day") - F.col("b.day"))
    return (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.day") <= F.col("a.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"), F.col("a.day").alias("day"),
                 F.col("a.daily_total").alias("daily_total"))
        .agg(
            F.round(
                F.sum(F.col("b.daily_total") * w) / F.sum(w), 6
            ).alias("ewma")
        )
    )


@query(
    "mad_outlier_orders",
    oracle="""
    WITH seg AS (SELECT c_mktsegment, o_totalprice
                 FROM orders JOIN customer ON o_custkey = c_custkey),
    med AS (SELECT c_mktsegment, round(quantile_cont(o_totalprice, 0.5), 3) AS med
            FROM seg GROUP BY 1),
    dev AS (SELECT s.c_mktsegment, abs(o_totalprice - m.med) AS d, m.med
            FROM seg s JOIN med m USING (c_mktsegment)),
    mad AS (SELECT c_mktsegment, round(quantile_cont(d, 0.5), 3) AS mad
            FROM dev GROUP BY 1)
    SELECT d.c_mktsegment, any_value(d.med) AS med, any_value(m.mad) AS mad,
           CAST(count(*) FILTER (WHERE d.d > 3 * 1.4826 * m.mad) AS BIGINT) AS n_outliers,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM dev d JOIN mad m USING (c_mktsegment)
    GROUP BY d.c_mktsegment
    """,
)
def mad_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per market segment: an order is an
    outlier when its absolute deviation from the segment median exceeds
    3 x 1.4826 x MAD (the normal-consistent robust z-score rule —
    median/MAD shrug off the very outliers that poison mean/stddev).

    Two exact interpolated-percentile aggregates (Spark ``percentile``
    ≡ DuckDB ``quantile_cont``), each rounded before reuse
    (aggregate-rounding rule) — to 3 decimals, not 2: the median of
    cent-valued prices is a 0.005 multiple, which sits ON the 3-decimal
    grid but exactly AT a 2-decimal rounding boundary where engine ulp
    differences flip the digit; the per-segment scalars come back as
    broadcast joins so order rows shuffle only for the percentile aggs
    themselves. Exact percentiles buffer each group's values — fine for
    bounded-cardinality segments; at petabyte scale swap the mergeable
    quantile sketch (operators/qsketch.py) into the same shape."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    seg = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select("c_mktsegment", "o_totalprice")
    med = seg.groupBy("c_mktsegment").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 3).alias("med")
    )
    dev = seg.join(F.broadcast(med), "c_mktsegment").select(
        "c_mktsegment", "med", F.abs(F.col("o_totalprice") - F.col("med")).alias("d")
    )
    mad = dev.groupBy("c_mktsegment").agg(
        F.round(F.percentile("d", F.lit(0.5)), 3).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "c_mktsegment")
        .groupBy("c_mktsegment")
        .agg(
            F.any_value("med").alias("med"),
            F.any_value("mad").alias("mad"),
            F.count(F.when(F.col("d") > 3 * 1.4826 * F.col("mad"), 1)).alias("n_outliers"),
            F.count("*").alias("n_orders"),
        )
    )
