"""Scalar-function-library showcase — the reference has NO function
library (users write Python lambdas, SURVEY.md §2.6); here the JVM
built-ins cover strings, dates, math, and conditionals. One query per
family, oracle-checked so the semantics provably match ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t


@query(
    "string_functions",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           length(c_name) AS name_len,
           replace(c_name, 'Customer', 'Cust') AS name_short,
           substring(c_mktsegment, 1, 4) AS seg4,
           concat(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           levenshtein(c_mktsegment, 'BUILDING') AS lev_building
    FROM customer WHERE c_custkey < 200
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family (upper/substr/replace/lpad/levenshtein/...)
    exercised as one projection, value-matched cross-engine."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.substring("c_mktsegment", 1, 4).alias("seg4"),
        F.concat("c_mktsegment", F.lit("#"), F.col("c_nationkey").cast("string")).alias("seg_nation"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("lev_building"),
    )


@query(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(dayofweek(o_orderdate) AS INT) AS dow,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo,
           strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS qtr_start,
           datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_95
    FROM orders WHERE o_orderkey < 300
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family. NB DuckDB dayofweek is 0=Sunday while Spark's is
    1=Sunday — normalized via (spark-1); dates emitted as strings."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow"),
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias("plus3mo"),
        F.date_format(F.date_trunc("quarter", "o_orderdate"), "yyyy-MM-dd").alias("qtr_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).cast("long").alias("days_since_95"),
    )


@query(
    "array_functions",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
               WHERE doc_id < 50)
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n,
           toks[1] AS first_tok,
           array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3_sorted,
           CAST(list_contains(toks, 'the') AS BOOLEAN) AS has_the,
           CAST(len(list_filter(toks, x -> length(x) > 4)) AS INT) AS n_long
    FROM t
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function family: size/element_at/sort/distinct/slice/
    contains/filter — the collection algebra the reference handled with
    plain Python lists (SURVEY.md §2.6), all JVM-side here."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = F.split(F.trim(F.col("text")), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n"),
        F.element_at(toks, 1).alias("first_tok"),
        F.concat_ws(",", F.slice(F.array_sort(F.array_distinct(toks)), 1, 3)).alias("first3_sorted"),
        F.array_contains(toks, "the").alias("has_the"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).alias("n_long"),
    )


@query(
    "math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_extendedprice), 6) AS sqrt_price,
           round(ln(l_extendedprice), 6) AS ln_price,
           round(pow(l_discount, 2), 6) AS disc_sq,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_ceil7,
           CAST(abs(l_quantity - 25) AS DOUBLE) AS abs_dev,
           greatest(l_tax, l_discount) AS max_rate
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (sqrt/ln/pow round to 6: libm implementations may
    differ in the last ulp across engines; integer-ish results are raw)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        F.ceil(F.col("l_quantity") / 7).cast("long").alias("qty_ceil7"),
        F.abs(F.col("l_quantity") - 25).cast("double").alias("abs_dev"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
    )


@query(
    "map_type_roundtrip",
    oracle="""
    SELECT user_id, event_type, count(*) AS cnt
    FROM events GROUP BY user_id, event_type
    """,
)
def map_type_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: per-user counts packed into a MAP<string,bigint>
    (map_from_entries over collected structs) and exploded back out.
    Matching the plain GROUP BY oracle proves the map construction /
    explosion round-trip is lossless. Maps are the right carrier for
    sparse per-entity feature bags at scale — one row per entity, not
    one row per (entity, feature), until explode brings it back."""
    ev = _t(spark, sf_dir, "events")
    per_ut = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    maps = per_ut.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "cnt"))).alias("m")
    )
    return maps.select("user_id", F.explode("m").alias("event_type", "cnt"))


@query(
    "window_rank_functions",
    oracle="""
    SELECT o_orderkey,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           round(percent_rank() OVER w, 9) AS prnk,
           round(cume_dist() OVER w, 9) AS cdist,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           round(nth_value(o_totalprice, 2) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS second_price,
           round(lag(o_totalprice, 1, 0.0) OVER w, 2) AS prev_price,
           round(lead(o_totalprice, 1, -1.0) OVER w, 2) AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-window family in one pass — rank, dense_rank,
    percent_rank, cume_dist, ntile, nth_value (full-frame), lag/lead
    with defaults — everything the reference's Python-side enumerate/
    sort idioms would hand-roll, here as ONE window shuffle on the
    partition key (all nine functions share the same (key, order) spec,
    so Catalyst evaluates them in a single Window node; the oracle's
    WINDOW clause mirrors that sharing). Ordering tiebreaks on the
    order key, so every rank is deterministic; percent_rank/cume_dist
    are exact integer ratios — bit-identical across engines."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 9).alias("prnk"),
        F.round(F.cume_dist().over(w), 9).alias("cdist"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.nth_value("o_totalprice", 2).over(wf), 2).alias("second_price"),
        F.round(F.lag("o_totalprice", 1, 0.0).over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice", 1, -1.0).over(w), 2).alias("next_price"),
    )


@query(
    "regex_functions",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '[a-z]{5,}') AS first_long_word,
           CAST(len(regexp_extract_all(text, '[a-z]{5,}')) AS INT) AS n_long_words,
           regexp_replace(substring(text, 1, 40), '[aeiou]', '*', 'g') AS devoweled_head,
           regexp_matches(text, 'hash') AS mentions_hash
    FROM documents
    """,
)
def regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar-function family — extract / extract-all / global
    replace / match-test in one map-only pass, restricted to the
    Java∩RE2 pattern subset both engines implement identically (char
    classes + bounded repetition; no backrefs or lookaround — the same
    discipline as pii_redaction). Spark's regexp_replace is global by
    default; DuckDB needs the explicit 'g' flag — the one semantic trap
    this query pins."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", "[a-z]{5,}", 0).alias("first_long_word"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]{5,}', 0)")).cast("int").alias("n_long_words"),
        F.regexp_replace(F.substring("text", 1, 40), "[aeiou]", "*").alias("devoweled_head"),
        F.col("text").rlike("hash").alias("mentions_hash"),
    )
