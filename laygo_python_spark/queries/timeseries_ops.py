"""Time-series analytics queries — EWMA trend lines, MAD outliers,
CUSUM changepoint detection, day-of-week seasonal decomposition, and
autocorrelation, all over the events/orders tables. All follow the
aggregate-rounding rule (see winsorize_order_totals): every
cross-engine float aggregate is rounded BEFORE it feeds further
arithmetic, so a last-ulp summation-order difference can never cascade
into downstream values.

Shared scale shape: every query reduces the raw stream to (type, day)
FIRST — one partial+final aggregation over the 100 TB — and runs its
series arithmetic on the tiny daily frame (window functions /
self-joins over hundreds of rows per type). The expensive part is
always the one reduce; the analytics are free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import local_rows_df

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


_DAILY_SQL = f"""
    daily AS (
      SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
             round(sum(value), 6) AS daily_total
      FROM events GROUP BY 1, 2)"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, day, daily_total) — the shared reduce-first stage;
    totals rounded before any series arithmetic (rounding rule)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day"))
        .agg(F.round(F.sum("value"), 6).alias("daily_total"))
    )


@query(
    "cusum_changepoint_daily",
    oracle=f"""
    WITH {_DAILY_SQL},
    st AS (SELECT event_type, round(avg(daily_total), 6) AS mu,
                  round(stddev_samp(daily_total), 6) AS sigma
           FROM daily GROUP BY 1),
    z AS (SELECT d.event_type, d.day, (d.daily_total - s.mu) / s.sigma AS z
          FROM daily d JOIN st s USING (event_type)),
    c AS (SELECT event_type, day,
                 round(abs(sum(z) OVER (PARTITION BY event_type ORDER BY day)), 6) AS acs
          FROM z),
    m AS (SELECT event_type, max(acs) AS max_cusum FROM c GROUP BY 1)
    SELECT c.event_type, m.max_cusum, min(c.day) AS change_day
    FROM c JOIN m ON m.event_type = c.event_type AND c.acs = m.max_cusum
    GROUP BY c.event_type, m.max_cusum
    """,
)
def cusum_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type: standardize the daily
    series against its own mean/std, cumulate the z-scores in day order,
    and report where |CUSUM| peaks — the classic level-shift detector
    (a persistent shift makes the cumulative sum drift; the peak marks
    the most likely change day).

    Cross-engine determinism: mean and std are rounded before
    standardizing (rounding rule), and the cumulative sum runs in day
    order in BOTH engines — an ORDER BY window prefix-sums the same
    doubles in the same sequence, so the series is bit-identical before
    the final round(6). Ties on the peak resolve to the earliest day."""
    daily = _daily(spark, sf_dir)
    st = daily.groupBy("event_type").agg(
        F.round(F.avg("daily_total"), 6).alias("mu"),
        F.round(F.stddev_samp("daily_total"), 6).alias("sigma"),
    )
    z = daily.join(F.broadcast(st), "event_type").select(
        "event_type", "day", ((F.col("daily_total") - F.col("mu")) / F.col("sigma")).alias("z")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    c = z.select("event_type", "day", F.round(F.abs(F.sum("z").over(w)), 6).alias("acs"))
    m = c.groupBy("event_type").agg(F.max("acs").alias("max_cusum"))
    return (
        c.join(F.broadcast(m), ["event_type"])
        .filter(F.col("acs") == F.col("max_cusum"))
        .groupBy("event_type", "max_cusum")
        .agg(F.min("day").alias("change_day"))
    )


@query(
    "seasonal_dow_decompose",
    oracle=f"""
    WITH {_DAILY_SQL},
    dow AS (SELECT event_type, day % 7 AS dow, round(avg(daily_total), 6) AS dow_mean
            FROM daily GROUP BY 1, 2)
    SELECT d.event_type, d.day, d.daily_total, w.dow_mean,
           round(d.daily_total - w.dow_mean, 6) AS residual
    FROM daily d JOIN dow w ON w.event_type = d.event_type AND w.dow = d.day % 7
    """,
)
def seasonal_dow_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal decomposition: each daily total splits into
    its weekday-profile component (the mean of that type's values on
    that weekday) and a residual — the additive seasonal model that
    turns "traffic dropped" into "traffic dropped relative to a normal
    Tuesday", the first question every ops dashboard asks.

    The weekday profile is 7 rows per type, broadcast back onto the
    daily frame; profile means are rounded before subtraction (rounding
    rule) so residuals are exact differences of identical doubles."""
    daily = _daily(spark, sf_dir)
    dow = daily.groupBy("event_type", (F.col("day") % 7).alias("dow")).agg(
        F.round(F.avg("daily_total"), 6).alias("dow_mean")
    )
    return (
        daily.withColumn("dow", F.col("day") % 7)
        .join(F.broadcast(dow), ["event_type", "dow"])
        .select(
            "event_type",
            "day",
            "daily_total",
            "dow_mean",
            F.round(F.col("daily_total") - F.col("dow_mean"), 6).alias("residual"),
        )
    )


@query(
    "acf_daily_value",
    oracle=f"""
    WITH {_DAILY_SQL}
    SELECT a.event_type, l.lag,
           round(corr(a.daily_total, b.daily_total), 6) AS acf,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM daily a
    JOIN (VALUES (1), (2), (3)) l(lag) ON TRUE
    JOIN daily b ON b.event_type = a.event_type AND b.day = a.day - l.lag
    GROUP BY a.event_type, l.lag
    """,
)
def acf_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily series at lags 1-3 per event type —
    the seasonality/persistence fingerprint (lag-7 spikes mean weekly
    cycles; fast decay means noise), computed as corr of the series
    against its lag-shifted self.

    The lag shift is an equi-join on (type, day - lag) against a
    3-row lag table — on the tiny daily frame, not the raw stream.
    corr's running moments accumulate in engine-specific order, but
    over identical rounded inputs the drift is ~1e-13; round(6)
    absorbs it (the proven trend_per_event_type pattern)."""
    daily = _daily(spark, sf_dir)
    lags = F.broadcast(
        local_rows_df(daily.sparkSession, [(1,), (2,), (3,)], "lag int")
    )
    a, b = daily.alias("a"), daily.alias("b")
    return (
        a.crossJoin(lags)
        .join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.day") == F.col("a.day") - F.col("lag")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"), "lag")
        .agg(
            F.round(F.corr(F.col("a.daily_total"), F.col("b.daily_total")), 6).alias("acf"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
