"""Data-governance queries — k-anonymity and l-diversity audits over
the customer table (operators/governance.py), the privacy-review pass
that runs before a corpus or telemetry join ships.

Reference parity: no governance surface in the reference engine
(ringoldsdev/laygo-python); uplift in the corpus-tooling family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t

def _bal_bucket():
    """Quasi-identifier bucket for account balance: fixed-width
    1000-unit bins via floor division — engine-exact on doubles (same
    fixed-edge posture as operators/drift.py; ntile would need a
    tiebreak contract). Built lazily: Column construction needs an
    active session, and query modules import at catalog-load time."""
    return F.floor(F.col("c_acctbal") / 1000).cast("long")


@query(
    "k_anonymity_audit",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
           CAST(count(*) AS BIGINT) AS group_size
    FROM customer
    GROUP BY c_nationkey, c_mktsegment, bal_bucket
    HAVING count(*) < 5
    ORDER BY c_nationkey, c_mktsegment, bal_bucket
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity violations (Sweeney 2002) under the quasi-identifier
    tuple (nation, market segment, account-balance kilobucket): every
    equivalence class with fewer than k=5 members is re-identifiable and
    must be generalized or suppressed before release. One partial+final
    aggregation over the QI columns — the shuffle carries (QI, partial
    count) only, and the output is by construction the small tail of the
    group-size distribution, so the audit costs one pass at any scale."""
    from laygo_python_spark.operators.governance import k_anonymity_violations

    cust = _t(spark, sf_dir, "customer")
    return k_anonymity_violations(
        cust.select(
            "c_nationkey", "c_mktsegment", _bal_bucket().alias("bal_bucket")
        ),
        ["c_nationkey", "c_mktsegment", "bal_bucket"],
        k=5,
    ).orderBy("c_nationkey", "c_mktsegment", "bal_bucket")


@query(
    "l_diversity_audit",
    oracle="""
    SELECT c_nationkey,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
           CAST(count(*) AS BIGINT) AS group_size,
           CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS distinct_sensitive
    FROM customer
    GROUP BY c_nationkey, bal_bucket
    HAVING count(DISTINCT c_mktsegment) < 3
    ORDER BY c_nationkey, bal_bucket
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity violations (Machanavajjhala et al. 2006): QI groups
    (nation, balance kilobucket) whose sensitive attribute (market
    segment) takes fewer than l=3 distinct values — attribute disclosure
    even where the group passes k-anonymity, the reason k alone is not a
    release criterion. Exact count(distinct) per group plans as Spark's
    two-phase expand aggregation; the flagged output is the small tail."""
    from laygo_python_spark.operators.governance import l_diversity_violations

    cust = _t(spark, sf_dir, "customer")
    return l_diversity_violations(
        cust.select("c_nationkey", "c_mktsegment", _bal_bucket().alias("bal_bucket")),
        ["c_nationkey", "bal_bucket"],
        "c_mktsegment",
        l=3,
    ).orderBy("c_nationkey", "bal_bucket")
