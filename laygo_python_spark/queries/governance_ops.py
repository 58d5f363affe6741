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


@query(
    "t_closeness_audit",
    oracle="""
    WITH c AS (SELECT c_nationkey,
                      CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
                      c_mktsegment AS s
               FROM customer WHERE c_mktsegment IS NOT NULL),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM c),
    gp AS (SELECT s, count(*) / (SELECT n FROM tot) AS p FROM c GROUP BY s),
    grp AS (SELECT c_nationkey, bal_bucket, CAST(count(*) AS BIGINT) AS group_size
            FROM c GROUP BY c_nationkey, bal_bucket),
    gs AS (SELECT c_nationkey, bal_bucket, s, count(*) AS n
           FROM c GROUP BY c_nationkey, bal_bucket, s),
    grid AS (SELECT g.c_nationkey, g.bal_bucket, g.group_size, gp.p,
                    coalesce(gs.n, 0) AS n
             FROM grp g CROSS JOIN gp
             LEFT JOIN gs ON gs.c_nationkey = g.c_nationkey
                         AND gs.bal_bucket = g.bal_bucket AND gs.s = gp.s),
    tvd AS (SELECT c_nationkey, bal_bucket, group_size,
                   round(0.5 * sum(abs(n / CAST(group_size AS DOUBLE) - p)), 6) AS tvd
            FROM grid GROUP BY c_nationkey, bal_bucket, group_size)
    SELECT c_nationkey, bal_bucket, group_size, tvd
    FROM tvd WHERE tvd >= 0.3
    ORDER BY c_nationkey, bal_bucket
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness violations (Li, Li & Venkatasubramanian 2007) — the
    third leg of the privacy triad: QI groups (nation, balance
    kilobucket) whose market-segment distribution sits >= 0.3
    total-variation distance from the table-wide mix. A group can pass
    k-anonymity AND l-diversity and still leak ("this group is 90% one
    segment"); this is the audit that catches it. Distribution work
    happens entirely on aggregates: global mix = one broadcast
    5-row aggregate, group mix = one partial+final aggregation, the
    zero-fill grid is |groups| x |domain| over already-aggregated
    frames, and the TVD fold compares on the round(6) value so the
    flag set is engine-exact."""
    from laygo_python_spark.operators.governance import t_closeness_violations

    cust = _t(spark, sf_dir, "customer")
    return t_closeness_violations(
        cust.select("c_nationkey", "c_mktsegment", _bal_bucket().alias("bal_bucket")),
        ["c_nationkey", "bal_bucket"],
        "c_mktsegment",
        t=0.3,
    ).orderBy("c_nationkey", "bal_bucket")


@query(
    "k_anonymity_certificate",
    oracle="""
    WITH g AS (SELECT c_nationkey, c_mktsegment,
                      CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
                      count(*) AS n
               FROM customer GROUP BY c_nationkey, c_mktsegment, bal_bucket)
    SELECT CAST(min(n) AS BIGINT) AS achieved_k,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(count(*) FILTER (n < 5) AS BIGINT) AS groups_below_k,
           CAST(coalesce(sum(n) FILTER (n < 5), 0) AS BIGINT) AS rows_at_risk
    FROM g
    """,
)
def k_anonymity_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row release certificate
    (operators/governance.k_anonymity_summary): the table's ACHIEVED k
    (min QI-group size), total groups, and the group/row counts below
    the k=5 bar — the number that goes in a data-release report, next
    to the per-group detail its sibling k_anonymity_audit emits. One
    partial+final aggregation then a 4-expression fold over the group
    table."""
    from laygo_python_spark.operators.governance import k_anonymity_summary

    cust = _t(spark, sf_dir, "customer")
    return k_anonymity_summary(
        cust.select("c_nationkey", "c_mktsegment", _bal_bucket().alias("bal_bucket")),
        ["c_nationkey", "c_mktsegment", "bal_bucket"],
        k=5,
    )


@query(
    "dp_noisy_counts",
    oracle="""
    WITH g AS (SELECT o_orderpriority AS k, count(*) AS c FROM orders
               GROUP BY o_orderpriority),
    n AS (SELECT k, c,
                 ((('0x' || substring(md5('dp' || chr(31)
                       || coalesce(k, chr(0) || 'null')), 1, 8))::BIGINT
                   % 1000000) + 0.5) / 1000000.0 AS u
          FROM g),
    r AS (SELECT k,
                 c + (-1.0) * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)) AS nc
          FROM n)
    SELECT k AS o_orderpriority, round(nc, 6) AS noisy_count,
           CAST(1.0 AS DOUBLE) AS epsilon
    FROM r
    ORDER BY o_orderpriority
    """,
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private-style histogram release
    (operators/governance.dp_laplace_counts): order counts by priority
    plus Laplace(1/ε) noise at ε=1, the sensitivity-1 counting
    mechanism. Noise derives deterministically from md5(salt⊕key)
    through the inverse Laplace CDF, so DuckDB replays the released
    values exactly — the gate certifies calibration and post-processing,
    while the operator docstring states plainly that replayable noise is
    a mechanics demonstration, not a cryptographic guarantee (production
    swaps in a CSPRNG draw)."""
    from laygo_python_spark.operators.governance import dp_laplace_counts

    orders = _t(spark, sf_dir, "orders")
    return dp_laplace_counts(orders, ["o_orderpriority"], epsilon=1.0).orderBy(
        "o_orderpriority"
    )
