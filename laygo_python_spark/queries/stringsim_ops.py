"""Edit-distance similarity join query over operators/stringsim.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laygo_python_spark.operators.stringsim import edit_distance_pairs
from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t


@query(
    "edit_distance_name_pairs",
    oracle="""
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
    FROM (SELECT * FROM customer WHERE c_custkey <= 700) a
    JOIN (SELECT * FROM customer WHERE c_custkey <= 700) b
      ON (length(a.c_name) < length(b.c_name))
      OR (length(a.c_name) = length(b.c_name) AND a.c_custkey < b.c_custkey)
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def edit_distance_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer names within edit distance 1 — PassJoin segment filtering
    + exact levenshtein verify (the oracle brute-forces all pairs; the
    engine never does).

    Honest caveat visible in this very fixture: segment filtering
    degrades when strings share long boilerplate (every c_name starts
    'Customer#', so segment 0 is one giant bucket). The cure at scale is
    more segments (larger effective d+1) or gram enrichment — same
    skew-vs-selectivity dial as the LSH band count."""
    from pyspark.sql import functions as F

    # Bounded slice keeps the sf0.01 correctness gate cheap (the shared
    # 'Customer#' prefix makes candidates quadratic in this fixture —
    # see the caveat above); the scheme itself is size-independent.
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 700)
    return edit_distance_pairs(cust, id_col="c_custkey", str_col="c_name", max_dist=1)


@query(
    "sorted_neighborhood_name_pairs",
    oracle="""
    WITH r AS (
      SELECT c_custkey, c_name,
             row_number() OVER (ORDER BY c_name, c_custkey) AS rn
      FROM customer)
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           a.c_name AS key_a, b.c_name AS key_b,
           CAST(b.rn - a.rn AS INT) AS rank_gap,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
    FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 2
    """,
)
def sorted_neighborhood_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood candidates over customer names (window 3)
    with their exact edit distance — the skew-proof linear-output
    blocking strategy (operators/stringsim.sorted_neighborhood_pairs):
    where edit_distance_name_pairs' segment index degrades on the
    shared 'Customer#' prefix, the sort adjacency emits exactly
    2 candidates per row no matter how much boilerplate the keys
    share. The oracle rebuilds the same adjacency with a rank window
    (both engines sort by the identical (name, key) total order)."""
    from laygo_python_spark.operators.stringsim import sorted_neighborhood_pairs

    cust = _t(spark, sf_dir, "customer")
    pairs = sorted_neighborhood_pairs(cust, id_col="c_custkey", key_col="c_name", window=3)
    return pairs.withColumn("dist", F.levenshtein("key_a", "key_b").cast("int"))
