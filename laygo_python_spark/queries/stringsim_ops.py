"""Edit-distance similarity join query over operators/stringsim.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
