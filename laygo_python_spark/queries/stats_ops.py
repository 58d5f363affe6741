"""Distribution-statistics operators: outlier clipping via exact
percentiles. Complements relational4's approximate sketches — this is the
exact path (single interpolated percentile over the full column), used
when the clip bounds must be reproducible to the cent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laygo_python_spark.operators.ids import assign_sequential_ids
from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t


@query(
    "winsorize_order_totals",
    oracle="""
    WITH b AS (SELECT round(quantile_cont(o_totalprice, 0.01), 2) AS lo,
                      round(quantile_cont(o_totalprice, 0.99), 2) AS hi
               FROM orders)
    SELECT o_orderkey, o_totalprice,
           least(greatest(o_totalprice, b.lo), b.hi) AS clipped,
           (o_totalprice < b.lo OR o_totalprice > b.hi) AS was_clipped
    FROM orders CROSS JOIN b
    """,
)
def winsorize_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorize order totals to the exact [p01, p99] envelope — the
    outlier-clipping step before value-based training-data weighting.

    The bounds are ONE interpolated-percentile aggregate (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``) attached as a broadcast
    scalar; rows never shuffle. Bounds are rounded to cents before
    clipping (aggregate-rounding rule) so a last-ulp interpolation
    difference between engines cannot leak into row values."""
    orders = _t(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.round(F.percentile("o_totalprice", F.lit(0.01)), 2).alias("lo"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 2).alias("hi"),
    )
    return (
        orders.select("o_orderkey", "o_totalprice")
        .crossJoin(F.broadcast(bounds))
        .select(
            "o_orderkey",
            "o_totalprice",
            F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi")).alias("clipped"),
            ((F.col("o_totalprice") < F.col("lo")) | (F.col("o_totalprice") > F.col("hi"))).alias(
                "was_clipped"
            ),
        )
    )


@query(
    "time_rollup_event_value",
    oracle="""
    SELECT event_type,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(hour(ts) AS INT) AS hr,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY event_type, ROLLUP(day, hr)
    """,
)
def time_rollup_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hour, day, and per-type
    grand totals from ONE pass — GROUP BY type + ROLLUP(day, hour)
    computes all three granularities with a single shuffle (Catalyst
    expands the grouping sets map-side), instead of three jobs or a
    stored rollup tree.

    Spelled as rollup(type, day, hr) minus the global all-null set
    (event_type is never null in the data, so the filter drops exactly
    the grand-total row the oracle's mixed GROUP BY doesn't produce)."""
    events = _t(spark, sf_dir, "events")
    return (
        events.select(
            "event_type",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            F.hour("ts").cast("int").alias("hr"),
            "value",
        )
        .rollup("event_type", "day", "hr")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .filter(F.col("event_type").isNotNull())
    )


@query(
    "latest_order_per_customer",
    oracle="""
    SELECT o_custkey,
           arg_max(o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S.%f')
                               || lpad(CAST(o_orderkey AS VARCHAR), 12, '0')) AS latest_orderkey,
           arg_max(o_totalprice, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S.%f')
                                 || lpad(CAST(o_orderkey AS VARCHAR), 12, '0')) AS latest_total,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax aggregation (max_by): each customer's most recent order in
    ONE partial+final aggregation — no window, no self-join, no sort.
    This is the scalable 'keep latest record per key' primitive; the
    window row_number spelling costs a full sort per key group.

    The ordering key is (timestamp string || zero-padded orderkey): a
    total order that both engines compare identically byte-wise."""
    orders = _t(spark, sf_dir, "orders")
    key = F.concat(
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
    )
    return orders.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", key).alias("latest_orderkey"),
        F.max_by("o_totalprice", key).alias("latest_total"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "trend_per_event_type",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(value), 4) AS avg_value,
           round(corr(value, CAST(epoch_us(ts) AS DOUBLE)), 6) AS corr_ts,
           round(regr_slope(value, CAST(epoch_us(ts) AS DOUBLE)) * 86400000000.0, 6) AS slope_per_day,
           round(regr_r2(value, CAST(epoch_us(ts) AS DOUBLE)), 6) AS r2
    FROM events GROUP BY event_type
    """,
)
def trend_per_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear trend of event values over time: corr / slope / R²
    in ONE partial+final aggregation pass (regression aggregates keep
    running moments, so they combine map-side like any sum — no window,
    no sort, no second scan). Time enters as integer microseconds
    (unix_micros ≡ epoch_us — the cross-engine timestamp rule); the
    slope is rescaled to per-day for readability."""
    events = _t(spark, sf_dir, "events")
    x = F.unix_micros("ts").cast("double")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.corr("value", x), 6).alias("corr_ts"),
        F.round(F.regr_slope("value", x) * 86400000000.0, 6).alias("slope_per_day"),
        F.round(F.regr_r2("value", x), 6).alias("r2"),
    )


@query(
    "histogram_order_totals",
    oracle="""
    SELECT CAST(least(floor(o_totalprice / 25000), 23) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders GROUP BY bucket
    """,
)
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (fixed $25k bins, top-capped) — one map-side
    bucket expression + one partial+final count agg. Fixed bounds keep it
    a single pass; data-dependent bounds would add one broadcast scalar
    (see winsorize_order_totals for that pattern)."""
    orders = _t(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 25000), F.lit(23)).cast("long")
    return orders.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@query(
    "incremental_hourly_stats",
    oracle="""
    SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY 1, 2
    """,
)
def incremental_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: a PRIOR aggregate table (history
    through Jan 20) is merged with a fresh DELTA batch (Jan 20+) by
    re-aggregating the union of partial states — count and sum partials
    combine associatively, so yesterday's 100 TB history is never
    rescanned; only its (keys × hours)-sized aggregate and the new day's
    raw rows are touched. The oracle is the full-batch answer: the
    incremental path must be indistinguishable from recomputation.

    (Partials that DON'T combine this way — exact distinct, medians —
    need sketch states instead: see approx_sketches.)"""
    events = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-20").cast("timestamp")
    hour = F.date_trunc("hour", "ts")

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type", hour.alias("h")).agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_raw")
        )

    prior = agg(events.filter(F.col("ts") < cut))      # stands in for the stored agg table
    delta = agg(events.filter(F.col("ts") >= cut))     # the new batch's partials
    merged = (
        prior.unionByName(delta)
        .groupBy("event_type", "h")
        .agg(F.sum("n").alias("n"), F.sum("total_raw").alias("total_raw"))
    )
    return merged.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("n").cast("long").alias("n"),
        F.round("total_raw", 2).alias("total"),
    )


@query(
    "validate_lineitem_rules",
    oracle="""
    SELECT 'discount_below_8pct' AS check_name, CAST(count(*) AS BIGINT) AS n_violations
    FROM lineitem WHERE NOT (l_discount < 0.08)
    UNION ALL
    SELECT 'qty_at_most_45', CAST(count(*) AS BIGINT)
    FROM lineitem WHERE NOT (l_quantity <= 45)
    UNION ALL
    SELECT 'tax_below_7pct', CAST(count(*) AS BIGINT)
    FROM lineitem WHERE NOT (l_tax < 0.07)
    """,
)
def validate_lineitem_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality screening (operators/quality.validate):
    three business-rule predicates over lineitem, reported as violations
    per rule. One codegen'd projection computes every check; the explode
    touches only violating rows. A row failing two rules counts once per
    rule here but once per ROW in the violations frame itself."""
    from laygo_python_spark.operators.quality import validate

    li = _t(spark, sf_dir, "lineitem")
    _, violations = validate(
        li,
        checks={
            "discount_below_8pct": F.col("l_discount") < 0.08,
            "qty_at_most_45": F.col("l_quantity") <= 45,
            "tax_below_7pct": F.col("l_tax") < 0.07,
        },
    )
    return (
        violations.select(F.explode("failed_checks").alias("check_name"))
        .groupBy("check_name")
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )


@query(
    "profile_orders_columns",
    oracle="""
    SELECT 'o_custkey' AS col, CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) - count(o_custkey) AS BIGINT) AS n_null,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           round(min(o_custkey), 2) AS min_v, round(max(o_custkey), 2) AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(o_totalprice) AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           round(min(o_totalprice), 2), round(max(o_totalprice), 2)
    FROM orders
    """,
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (null rate / exact distinct / range) for numeric
    columns, all columns in ONE scan: each metric set is an aggregate
    over the same pass, then unpivoted — not one job per column like a
    naive profiler. At 100 TB swap count(DISTINCT) for
    approx_count_distinct (see approx_sketches); exact distinct is kept
    here because the oracle must be deterministic."""
    orders = _t(spark, sf_dir, "orders")
    aggs = []
    for c in ("o_custkey", "o_totalprice"):
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__n_null"),
            F.count_distinct(c).alias(f"{c}__n_distinct"),
            F.round(F.min(c), 2).alias(f"{c}__min_v"),
            F.round(F.max(c), 2).alias(f"{c}__max_v"),
        ]
    wide = orders.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("col"),
            F.col(f"{c}__n").cast("long").alias("n"),
            F.col(f"{c}__n_null").cast("long").alias("n_null"),
            F.col(f"{c}__n_distinct").cast("long").alias("n_distinct"),
            F.col(f"{c}__min_v").cast("double").alias("min_v"),
            F.col(f"{c}__max_v").cast("double").alias("max_v"),
        )
        for c in ("o_custkey", "o_totalprice")
    ]
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


@query(
    "feature_scale_order_prices",
    oracle="""
    WITH st AS (
      SELECT round(min(o_totalprice), 3) AS lo, round(max(o_totalprice), 3) AS hi,
             round(avg(o_totalprice), 6) AS mu, round(stddev_samp(o_totalprice), 6) AS sigma
      FROM orders)
    SELECT o_orderkey,
           round((o_totalprice - st.lo) / (st.hi - st.lo), 6) AS minmax01,
           round((o_totalprice - st.mu) / st.sigma, 6) AS zscore,
           CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS INT) AS decile
    FROM orders, st
    """,
)
def feature_scale_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature engineering over a numeric column, the three standard
    encodings in one pass: min-max scaling to [0,1], z-score
    standardization, and equal-frequency decile binning — what an ML
    feature pipeline runs before training on tabular data.

    One global aggregate produces the four scalars (rounded before
    reuse — rounding rule), broadcast back as a 1-row cross join so
    the rows never shuffle for the scalings. The decile is EXACT
    ntile(10) semantics — but computed without the single-partition
    window ``ntile(10) OVER (ORDER BY ...)`` would cost: the global
    (value, key) rank comes from the range-partitioned sequential-id
    shape (operators/ids.py — one range shuffle, every task busy), and
    the ntile bucket is derived arithmetically from (rank, n): with
    base = n div 10 and r = n mod 10, SQL ntile gives the first r
    buckets base+1 rows and the rest base, so
    ``decile = rk <= r*(base+1) ? ceil(rk/(base+1))
                                : r + ceil((rk - r*(base+1))/base)``.
    (Note ``1 + floor((rk-1)*10/n)`` is NOT ntile when 10 ∤ n — it
    spreads the remainder instead of front-loading it.) The tiebreak on
    o_orderkey makes the total order — and therefore every bucket —
    deterministic across engines under duplicate prices."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    st = orders.agg(
        F.round(F.min("o_totalprice"), 3).alias("lo"),
        F.round(F.max("o_totalprice"), 3).alias("hi"),
        F.round(F.avg("o_totalprice"), 6).alias("mu"),
        F.round(F.stddev_samp("o_totalprice"), 6).alias("sigma"),
        F.count(F.lit(1)).alias("n"),
    )
    ranked = assign_sequential_ids(
        orders, ["o_totalprice", "o_orderkey"], id_col="__seq"
    ).withColumn("rk", F.col("__seq") + 1)
    base = (F.col("n") / 10).cast("long")
    rem = F.col("n") % 10
    big = rem * (base + 1)  # rows covered by the base+1-sized buckets
    decile = F.when(
        F.col("rk") <= big, F.ceil(F.col("rk") / (base + 1))
    ).otherwise(rem + F.ceil((F.col("rk") - big) / base))
    return (
        ranked.crossJoin(F.broadcast(st))
        .select(
            "o_orderkey",
            F.round((F.col("o_totalprice") - F.col("lo")) / (F.col("hi") - F.col("lo")), 6).alias("minmax01"),
            F.round((F.col("o_totalprice") - F.col("mu")) / F.col("sigma"), 6).alias("zscore"),
            decile.cast("int").alias("decile"),
        )
    )


@query(
    "spearman_price_acctbal",
    oracle="""
    WITH j AS (
      SELECT c_mktsegment, o_totalprice, c_acctbal, o_orderkey
      FROM orders JOIN customer ON o_custkey = c_custkey),
    r AS (
      SELECT c_mktsegment,
             rank() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice, o_orderkey) AS rp,
             rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, o_orderkey) AS rb
      FROM j)
    SELECT c_mktsegment,
           round(corr(CAST(rp AS DOUBLE), CAST(rb AS DOUBLE)), 6) AS spearman,
           CAST(count(*) AS BIGINT) AS n
    FROM r GROUP BY c_mktsegment
    """,
)
def spearman_price_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between order price and the customer's
    account balance, per market segment — the robust (monotonic, not
    linear) association measure: rank both variables, then Pearson-corr
    the ranks. Complements trend_per_event_type's parametric regr_*
    family.

    Ranks tiebreak on the order key, so both engines assign identical
    integer ranks and corr runs over identical inputs (round(6) absorbs
    accumulation order). The two rank windows share one partition-key
    shuffle; segments are bounded-cardinality so per-partition sorts
    stay healthy — at extreme group sizes swap percent_rank or the
    qsketch CDF for the exact window, same shape."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment", "o_totalprice", "c_acctbal", "o_orderkey"
    )
    wp = Window.partitionBy("c_mktsegment").orderBy("o_totalprice", "o_orderkey")
    wb = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "o_orderkey")
    r = j.select(
        "c_mktsegment",
        F.rank().over(wp).cast("double").alias("rp"),
        F.rank().over(wb).cast("double").alias("rb"),
    )
    return r.groupBy("c_mktsegment").agg(
        F.round(F.corr("rp", "rb"), 6).alias("spearman"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "chi2_segment_priority",
    oracle="""
    WITH j AS (
      SELECT c_mktsegment AS seg, o_orderpriority AS pri
      FROM orders JOIN customer ON o_custkey = c_custkey),
    o AS (SELECT seg, pri, CAST(count(*) AS DOUBLE) AS obs FROM j GROUP BY 1, 2),
    rt AS (SELECT seg, sum(obs) AS row_n FROM o GROUP BY 1),
    ct AS (SELECT pri, sum(obs) AS col_n FROM o GROUP BY 1),
    n AS (SELECT sum(obs) AS total FROM o)
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           round(sum(pow(obs - row_n * col_n / total, 2) / (row_n * col_n / total)), 6) AS chi2
    FROM o JOIN rt USING (seg) JOIN ct USING (pri), n
    """,
)
def chi2_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence statistic for market segment × order
    priority — the categorical-association screen (is priority
    distributed the same across segments?) that data-quality and
    feature-selection passes both run.

    One contingency aggregation (the only shuffle over the data), then
    row/column marginals and the 1-row total joined back onto the ≤
    25-cell table; observed counts are exact integers and the expected-
    count arithmetic is written with identical association order in
    both engines, so only the final sum needs round(6)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("seg"), F.col("o_orderpriority").alias("pri")
    )
    o = j.groupBy("seg", "pri").agg(F.count(F.lit(1)).cast("double").alias("obs"))
    rt = o.groupBy("seg").agg(F.sum("obs").alias("row_n"))
    ct = o.groupBy("pri").agg(F.sum("obs").alias("col_n"))
    n = o.agg(F.sum("obs").alias("total"))
    exp = F.col("row_n") * F.col("col_n") / F.col("total")
    return (
        o.join(F.broadcast(rt), "seg")
        .join(F.broadcast(ct), "pri")
        .crossJoin(F.broadcast(n))
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.round(F.sum(F.pow(F.col("obs") - exp, 2) / exp), 6).alias("chi2"),
        )
    )


@query(
    "impute_missing_acctbal",
    oracle="""
    WITH seeded AS (
      SELECT c_custkey, c_mktsegment,
             CASE WHEN c_custkey % 10 = 3 THEN NULL ELSE c_acctbal END AS bal
      FROM customer),
    m AS (SELECT c_mktsegment, round(avg(bal), 2) AS seg_mean
          FROM seeded GROUP BY 1)
    SELECT s.c_custkey,
           CAST(s.bal IS NULL AS BOOLEAN) AS was_missing,
           round(coalesce(s.bal, m.seg_mean), 2) AS bal_imputed
    FROM seeded s JOIN m USING (c_mktsegment)
    """,
)
def impute_missing_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-mean imputation — the standard missing-value repair before
    training on tabular data: fill each null with its segment's mean,
    flagging which rows were imputed. The fixture has no nulls, so 10%
    of balances are deterministically knocked out in BOTH engines first
    (the seeding idiom of text_normalize_clean; the predicate is plain
    modular arithmetic on the key because the engines' hash() functions
    are not cross-reproducible). Means are rounded before the coalesce
    (rounding rule); rows never shuffle — the per-segment means come
    back as a broadcast join, so at 100 TB this is one aggregate plus a
    map-side repair pass."""
    cust = _t(spark, sf_dir, "customer")
    seeded = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.when(F.col("c_custkey") % 10 == 3, F.lit(None)).otherwise(F.col("c_acctbal")).alias("bal"),
    )
    m = seeded.groupBy("c_mktsegment").agg(F.round(F.avg("bal"), 2).alias("seg_mean"))
    return seeded.join(F.broadcast(m), "c_mktsegment").select(
        "c_custkey",
        F.col("bal").isNull().alias("was_missing"),
        F.round(F.coalesce("bal", "seg_mean"), 2).alias("bal_imputed"),
    )


# Shared by psi_value_drift and its streaming twin (stream_drift_monitor,
# queries/streaming_ops.py): a bounded stream of per-batch histogram
# partials merged and folded must equal the batch answer exactly.
PSI_DRIFT_ORACLE = """
    WITH b AS (
      SELECT event_type,
             CAST(least(9, greatest(0, floor((value - 0.0) / 50.0))) AS INT) AS bin,
             CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS is_ref
      FROM events
      WHERE value IS NOT NULL),  -- mirror Spark: NULL measurements are EXCLUDED,
                                 -- never binned (DuckDB's greatest(0, NULL) = 0
                                 -- would otherwise count them as bin-0 mass)
    h AS (SELECT event_type, bin, sum(is_ref) AS cr, sum(1 - is_ref) AS cc
          FROM b GROUP BY event_type, bin),
    t AS (SELECT event_type, CAST(sum(cr) AS BIGINT) AS n_ref,
                 CAST(sum(cc) AS BIGINT) AS n_cur
          FROM h GROUP BY event_type),
    terms AS (
      SELECT h.event_type, t.n_ref, t.n_cur,
             greatest(CAST(cr AS DOUBLE) / t.n_ref, 1e-6) AS p,
             greatest(CAST(cc AS DOUBLE) / t.n_cur, 1e-6) AS q
      FROM h JOIN t ON h.event_type IS NOT DISTINCT FROM t.event_type)
    SELECT event_type,
           round(sum((q - p) * ln(q / p)), 6) AS psi,
           round(sum(0.5 * p * ln(p / ((p + q) / 2))
                   + 0.5 * q * ln(q / ((p + q) / 2))), 6) AS jsd,
           n_ref, n_cur
    FROM terms GROUP BY event_type, n_ref, n_cur
    """


@query("psi_value_drift", oracle=PSI_DRIFT_ORACLE)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor (operators/drift.distribution_drift):
    PSI + Jensen-Shannon divergence of the event `value` distribution,
    second half of January vs the first, per event type — the
    data-quality alarm a continuously-ingesting training pipeline runs
    on every batch (PSI > 0.25 = the crawl's character changed; JSD is
    the bounded symmetric companion). Fixed bin EDGES (10 × width-50
    over [0, 500)) rather than quantile bins keep the statistic
    engine-exact AND incrementally maintainable: per-bin counts are
    additive partials, so the reference histogram can be a stored
    artifact new batches merge into — the sketch mergeability contract.
    One combiner-compressed aggregation per side; the oracle replays
    the identical floored-proportion PSI/JSD fold (round 6 absorbs the
    bin-order float summation)."""
    from laygo_python_spark.operators.drift import distribution_drift

    ev = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    return distribution_drift(
        ev.filter(F.col("ts") < cut),
        ev.filter(F.col("ts") >= cut),
        col="value",
        lo=0.0,
        hi=500.0,
        n_bins=10,
        keys=["event_type"],
    )


@query(
    "moments_merge_shards",
    oracle="""
    WITH sh AS (SELECT source, count(*) AS n,
                       sum(CAST(n_chars AS DOUBLE)) AS s,
                       var_pop(CAST(n_chars AS DOUBLE)) * count(*) AS m2
                FROM documents GROUP BY source),
    g AS (SELECT sum(n) AS nn, sum(s) AS ss FROM sh),
    c AS (SELECT sum(sh.m2)
                 + sum(sh.n * (sh.s / sh.n - g.ss / g.nn)
                            * (sh.s / sh.n - g.ss / g.nn)) AS m2c
          FROM sh, g)
    SELECT CAST(g.nn AS BIGINT) AS n_rows,
           round(g.ss / g.nn, 6) AS mean,
           round(c.m2c / g.nn, 4) AS var_pop
    FROM g, c
    """,
)
def moments_merge_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable second-order statistics (operators/moments.py): each
    source shard emits a three-number (n, sum, M2) summary; the global
    mean/variance folds from the summaries alone — the Chan-Golub-
    LeVeque merge that lets 100 TB corpus stats cost one |shards|-row
    aggregation instead of a re-scan (the same mergeability contract as
    the HLL/CMS sketches). The oracle replays the identical shard-then-
    merge formula, so the gate certifies the merge algebra; merged ≡
    direct var_pop is pinned separately in tests/test_moments.py."""
    from laygo_python_spark.operators.moments import merge_moments, shard_moments

    docs = _t(spark, sf_dir, "documents")
    sh = shard_moments(docs, "n_chars", "source")
    return merge_moments(sh).select(
        "n_rows", F.round("mean", 6).alias("mean"), F.round("var_pop", 4).alias("var_pop")
    )
