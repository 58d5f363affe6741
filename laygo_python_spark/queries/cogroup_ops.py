"""Cogrouped-map queries — per-key reconciliation of two tables.

The reference has no multi-input operator (a laygo pipeline is one chunk
stream; reference laygo/pipeline.py:94-112); reconciling two datasets
there means collecting one side into a dict. Here the two tables are
co-partitioned by the key in ONE exchange each and every key's pair of
pandas frames is handed to arbitrary Python — the uplift surface that
``operators.cogroup.cogroup_apply`` provides.

Key-granularity note: cogroup pays per-GROUP Python/pandas overhead AND
per-row Arrow transfer, so anything aggregable is reduced JVM-side
FIRST; Python sees one pre-reduced row per key per side and contributes
only what SQL can't express cleanly (full-outer defaulting chosen by
arbitrary code). That is the 100 TB split: codegen'd partial aggregation
does the data-proportional work, the Arrow hop is O(distinct keys).
Measured at sf0.1: 2.36 s when all ~300k filtered lines crossed into
pandas, 0.4 s after the JVM-side pre-reduce — same result, same oracle.
"""

from __future__ import annotations

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laygo_python_spark.operators.cogroup import cogroup_apply_arrow
from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t


def _reconcile(sg: pa.Table, lg: pa.Table) -> pa.Table:
    """Per-suppkey full-outer reconciliation: either side may be empty.

    Both sides arrive pre-reduced to at most one row per key; this
    function only chooses the outer-join defaulting (absent supplier →
    has_supplier=0, absent lines → zero revenue) in plain Python. On the
    pyarrow transport because ~every group is one row — the per-group
    cost is transport conversion, not logic (see cogroup_apply_arrow)."""
    if sg.num_rows:
        key, bal, has = sg["s_suppkey"][0].as_py(), float(sg["s_acctbal"][0].as_py()), 1
    else:
        key, bal, has = lg["s_suppkey"][0].as_py(), 0.0, 0
    if lg.num_rows:
        n = int(lg["n_lines"][0].as_py())
        rev = float(lg["rev_i"][0].as_py()) / 10000.0
    else:
        n, rev = 0, 0.0
    return pa.table(
        {
            "suppkey": pa.array([key], pa.int64()),
            "has_supplier": pa.array([has], pa.int32()),
            "n_lines": pa.array([n], pa.int64()),
            "acctbal": pa.array([bal], pa.float64()),
            "line_revenue": pa.array([rev], pa.float64()),
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
    chooses them in Python. The lineitem side is pre-reduced JVM-side
    (codegen'd partial+final agg) so only one row per key crosses the
    Arrow boundary; revenue is summed in exact integer cents there (price
    and discount have 2 decimals, so cents × pct is an exact int64 and
    the sum is order-independent, unlike a float sum).
    """
    suppliers = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") >= 0)
        .select("s_suppkey", "s_acctbal")
    )
    lines = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
                * F.round(100 - F.col("l_discount") * 100).cast("bigint")
            ).alias("rev_i"),
        )
    )
    return cogroup_apply_arrow(
        suppliers,
        lines,
        on=["s_suppkey"],
        fn=_reconcile,
        schema="suppkey bigint, has_supplier int, n_lines bigint, acctbal double, line_revenue double",
    )
