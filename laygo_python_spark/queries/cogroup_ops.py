"""Cogrouped-map queries — per-key reconciliation of two tables.

The reference has no multi-input operator (a laygo pipeline is one chunk
stream; reference laygo/pipeline.py:94-112); reconciling two datasets
there means collecting one side into a dict. Here the two tables are
co-partitioned by the key in ONE exchange each and every key's pair of
pandas frames is handed to arbitrary Python — the uplift surface that
``operators.cogroup.cogroup_apply`` provides.

Key-granularity note: cogroup pays per-GROUP Python/pandas overhead, so
it is the right tool for FEW keys × MANY rows (per-entity reconciliation,
per-key model scoring), not one-row-per-key rollups — those belong to
groupBy.agg. The query below keys on supplier (~100 groups of ~600 lines
at sf0.01), the shape cogroup is for.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laygo_python_spark.operators.cogroup import cogroup_apply
from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t


def _reconcile(sg: pd.DataFrame, lg: pd.DataFrame) -> pd.DataFrame:
    """Per-suppkey full-outer reconciliation: either side may be empty."""
    if len(sg):
        key, bal, has = sg["s_suppkey"].iloc[0], float(sg["s_acctbal"].iloc[0]), 1
    else:
        key, bal, has = lg["s_suppkey"].iloc[0], 0.0, 0
    if len(lg):
        # Exact integer-cents arithmetic: price has 2 decimals, discount 2
        # decimals, so price_cents * pct is an exact int64 — integer sums
        # are order-independent, unlike float sums, which can straddle a
        # rounding boundary differently per engine.
        cents = (lg["l_extendedprice"] * 100.0).round().astype("int64")
        pct = (100.0 - lg["l_discount"] * 100.0).round().astype("int64")
        rev = float((cents * pct).sum()) / 10000.0
    else:
        rev = 0.0
    return pd.DataFrame(
        {
            "suppkey": [key],
            "has_supplier": [has],
            "n_lines": [len(lg)],
            "acctbal": [bal],
            "line_revenue": [rev],
        }
    )


@query(
    "cogroup_order_reconcile",
    oracle="""
    WITH s AS (SELECT s_suppkey, s_acctbal FROM supplier WHERE s_acctbal >= 0),
         l AS (SELECT l_suppkey, count(*) AS n_lines,
                      sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * CAST(round(100 - l_discount * 100) AS BIGINT)) AS rev_i
               FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-01-01'
               GROUP BY l_suppkey)
    SELECT COALESCE(s.s_suppkey, l.l_suppkey) AS suppkey,
           CASE WHEN s.s_suppkey IS NULL THEN 0 ELSE 1 END AS has_supplier,
           CAST(COALESCE(l.n_lines, 0) AS BIGINT) AS n_lines,
           COALESCE(s.s_acctbal, 0) AS acctbal,
           CAST(COALESCE(l.rev_i, 0) AS DOUBLE) / 10000.0 AS line_revenue
    FROM s FULL OUTER JOIN l ON s.s_suppkey = l.l_suppkey
    """,
)
def cogroup_order_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconcile in-credit suppliers against their early-shipped lineitems.

    Mismatched filters make one-sided groups occur (negative-balance
    suppliers arrive with an empty left frame) — full-outer semantics a
    plain inner join can't express without a second pass; ``_reconcile``
    chooses them in Python. line_revenue is summed in exact integer cents
    so the engines' float-sum ordering can't straddle a rounding boundary.
    """
    suppliers = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") >= 0)
        .select("s_suppkey", "s_acctbal")
    )
    lines = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
        .select(F.col("l_suppkey").alias("s_suppkey"), "l_extendedprice", "l_discount")
    )
    return cogroup_apply(
        suppliers,
        lines,
        on=["s_suppkey"],
        fn=_reconcile,
        schema="suppkey bigint, has_supplier int, n_lines bigint, acctbal double, line_revenue double",
    )
