"""Graph-analytics queries — iterative algorithms over edge lists
derived from the relational fixtures.

Companion to the connected-components dedup clustering
(operators/dedup.py): where that finds components, PageRank weighs
nodes by link structure. The oracle unrolls the same five power
iterations as chained CTEs — fixed iteration count makes an iterative
algorithm exactly SQL-expressible, so this one is oracle-gated rather
than rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laygo_python_spark.operators.pagerank import pagerank
from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t

# Part nodes are offset so supplier ids and part ids share one integer
# node space. The invariant is on the UN-offset side: suppkey must stay
# below the offset (TPC-H has 10,000×SF suppliers, so this holds to
# SF=10; the driver's fixtures top out at SF=0.1). Part keys may exceed
# the offset freely — they're the side being shifted.
_OFF = 100000

_PR_ITER = """
    pr{k} AS (
        SELECT e.dst AS node,
               0.15 / (SELECT n FROM nn) + 0.85 * sum(p.r / d.deg) AS r
        FROM edges e
        JOIN deg d ON e.src = d.src
        JOIN pr{j} p ON e.src = p.node
        GROUP BY e.dst
    )"""

_PR_ORACLE = (
    """
    WITH half AS (SELECT DISTINCT l_suppkey AS s, l_partkey + 100000 AS p FROM lineitem),
    edges AS (SELECT s AS src, p AS dst FROM half UNION ALL SELECT p, s FROM half),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT count(*) AS n FROM nodes),
    pr0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes),"""
    + ",".join(_PR_ITER.format(k=k, j=k - 1) for k in range(1, 6))
    + """
    SELECT node, round(r, 8) AS pr FROM pr5
    """
)


@query("pagerank_supplier_part", oracle=_PR_ORACLE)
def pagerank_supplier_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank the supplier↔part co-supply graph (symmetrized bipartite
    edge list from distinct lineitem pairs) with 5 power iterations.

    Exercises the iterative-relational machinery end to end: edges
    partitioned once and reused every round, rank vector checkpointed
    per round (operators/pagerank.py). Symmetrization means no dangling
    nodes, so the Spark loop and the unrolled-CTE oracle agree exactly;
    rounding to 8 decimals absorbs float-sum ordering differences
    between engines."""
    li = _t(spark, sf_dir, "lineitem")
    # Fail loudly if a larger fixture ever breaks the node-space
    # invariant (suppkey < _OFF) — silent supplier/part node collisions
    # would produce wrong ranks with no error. assert_true rides the
    # existing scan: no extra job.
    guard = F.assert_true(
        F.col("l_suppkey") < F.lit(_OFF),
        F.lit(f"pagerank_supplier_part: l_suppkey >= {_OFF} collides with part node space"),
    )
    half = li.select(
        F.when(guard.isNull(), F.col("l_suppkey")).alias("src"),
        (F.col("l_partkey") + _OFF).alias("dst"),
    ).distinct()
    edges = half.unionByName(half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return pagerank(edges, iterations=5).select("node", F.round("pr", 8).alias("pr"))
