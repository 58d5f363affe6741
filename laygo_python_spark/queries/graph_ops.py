"""Graph-analytics queries — iterative algorithms over edge lists
derived from the relational fixtures.

Companion to the connected-components dedup clustering
(operators/dedup.py): where that finds components, PageRank weighs
nodes by link structure, BFS measures distance from a seed set, and
triangle counting measures local clustering. Iterative algorithms stay
exactly SQL-expressible by fixing the iteration count (PageRank:
unrolled CTEs) or bounding the recursion depth (BFS: recursive CTE
with a hop cap), so all four are oracle-gated rather than rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import local_rows_df

from laygo_python_spark.operators.graph import bfs_hops, kcore, triangle_count
from laygo_python_spark.operators.pagerank import pagerank
from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t

# Part nodes are offset so supplier ids and part ids share one integer
# node space. The invariant is on the UN-offset side: suppkey must stay
# below the offset (TPC-H has 10,000×SF suppliers, so this holds to
# SF=10; the driver's fixtures top out at SF=0.1). Part keys may exceed
# the offset freely — they're the side being shifted.
_OFF = 100000


def _sp_edges(li: "DataFrame", what: str) -> "DataFrame":
    """Symmetrized supplier<->part edge list with the node-space guard:
    fail loudly if a larger fixture ever breaks the suppkey < _OFF
    invariant — silent supplier/part node collisions would merge graph
    nodes with no error. assert_true rides the existing scan: no extra
    job. Shared by pagerank/bfs/kcore so every consumer is guarded."""
    guard = F.assert_true(
        F.col("l_suppkey") < F.lit(_OFF),
        F.lit(f"{what}: l_suppkey >= {_OFF} collides with part node space"),
    )
    half = li.select(
        F.when(guard.isNull(), F.col("l_suppkey")).alias("src"),
        (F.col("l_partkey") + _OFF).alias("dst"),
    ).distinct()
    return half.unionByName(half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))

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
    edges = _sp_edges(_t(spark, sf_dir, "lineitem"), "pagerank_supplier_part")
    # checkpoint_every=0: with the r8 one-pass edge layout the 5-round
    # loop collapses into the final-round job (every rank-vector
    # exchange is a ReusedExchange in the merged plan), so the r6 sweet
    # spot inverted — r9 min-of-4 under quiesce: ce=2 3.88 s, ce=3
    # 3.61, ce=0 3.56. Long loops (≥ ~10 rounds) should still
    # checkpoint (lineage/planner growth; see operators/pagerank.py).
    # symmetric=True: _sp_edges symmetrizes, so the node set is deg's
    # key column (r7 — saves the union-distinct shuffle).
    return pagerank(edges, iterations=5, checkpoint_every=0, symmetric=True).select(
        "node", F.round("pr", 8).alias("pr")
    )


@query(
    "bfs_hops_supplier_part",
    oracle="""
    WITH RECURSIVE
    half AS (SELECT DISTINCT l_suppkey AS s, l_partkey + 100000 AS p FROM lineitem),
    edges AS (SELECT s AS src, p AS dst FROM half UNION ALL SELECT p, s FROM half),
    walk(node, hops) AS (
      SELECT DISTINCT src, 0 FROM edges WHERE src IN (1, 2, 3)
      UNION
      SELECT e.dst, w.hops + 1 FROM edges e JOIN walk w ON e.src = w.node
      WHERE w.hops < 3
    )
    SELECT node, CAST(min(hops) AS INT) AS hops FROM walk GROUP BY node
    """,
)
def bfs_hops_supplier_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum hop distance from suppliers {1,2,3} over the symmetrized
    supplier<->part graph, capped at 3 hops (operators/graph.bfs_hops).

    The Spark side is frontier BFS (only the frontier shuffles per
    round); the DuckDB oracle is a depth-capped recursive CTE min-hop
    walk — the two agree because BFS level = minimum hop count. Shares
    the node-space offset (and its suppkey < 100000 guard rationale)
    with pagerank_supplier_part above."""
    edges = _sp_edges(_t(spark, sf_dir, "lineitem"), "bfs_hops_supplier_part")
    sources = edges.select(F.col("src").alias("node")).filter(F.col("node").isin(1, 2, 3))
    out = bfs_hops(edges, sources, max_hops=3)
    return out.select("node", F.col("hops").cast("int").alias("hops"))


@query(
    "triangle_count_coparts",
    oracle="""
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
          FROM lp a JOIN lp b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM e e1
            JOIN e e2 ON e2.a = e1.b
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    members AS (SELECT x AS node FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri),
    counts AS (SELECT node, count(*) AS c FROM members GROUP BY node),
    nodes AS (SELECT a AS node FROM e UNION SELECT b FROM e)
    SELECT n.node, CAST(coalesce(c.c, 0) AS BIGINT) AS n_triangles
    FROM nodes n LEFT JOIN counts c USING (node)
    """,
)
def triangle_count_coparts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts in the co-order graph (parts are linked
    when some order contains both): the local-clustering staple, via the
    degree-orientation algorithm (operators/graph.triangle_count) whose
    wedge step is bounded by sum(outdeg^2) <= |E|^1.5 — survives
    power-law hubs that would make the naive per-node pairing
    quadratic. The oracle is the plain x<y<z three-way self-join, which
    counts each triangle exactly once."""
    lp = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = lp.alias("a"), lp.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
    return triangle_count(edges)


@query(
    "kcore_supplier_part",
    oracle="""
    WITH half AS (SELECT DISTINCT l_suppkey AS s, l_partkey + 100000 AS p FROM lineitem),
    e0 AS (SELECT s AS src, p AS dst FROM half UNION ALL SELECT p, s FROM half),
    k1 AS (SELECT src FROM e0 GROUP BY src HAVING count(*) >= 3),
    e1 AS (SELECT e.src, e.dst FROM e0 e
           JOIN k1 a ON e.src = a.src JOIN k1 b ON e.dst = b.src),
    k2 AS (SELECT src FROM e1 GROUP BY src HAVING count(*) >= 3),
    e2 AS (SELECT e.src, e.dst FROM e1 e
           JOIN k2 a ON e.src = a.src JOIN k2 b ON e.dst = b.src),
    k3 AS (SELECT src FROM e2 GROUP BY src HAVING count(*) >= 3),
    e3 AS (SELECT e.src, e.dst FROM e2 e
           JOIN k3 a ON e.src = a.src JOIN k3 b ON e.dst = b.src)
    SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM e3 GROUP BY src
    """,
)
def kcore_supplier_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the symmetrized supplier<->part graph after exactly 3
    peel rounds (operators/graph.kcore): parts linked to fewer than 3
    suppliers drop first, which lowers supplier degrees and can cascade
    — the dense-subgraph cleanup that precedes community/clustering
    passes. Fixing the round count makes the peeling exactly
    SQL-expressible (3 unrolled HAVING+semi-join rounds in the oracle),
    the same bounded-iteration trick as pagerank/bfs above; the
    operator's rounds=None mode peels to the true fixpoint."""
    edges = _sp_edges(_t(spark, sf_dir, "lineitem"), "kcore_supplier_part")
    # checkpoint_every=0: the 3 fixed peel rounds unroll into one job —
    # the per-round e-legs dedup to ReusedExchange nodes (r9 min-of-4
    # under quiesce: 2.83 s per-round-checkpointed → 2.32 s unrolled).
    return kcore(edges, k=3, rounds=3, checkpoint_every=0)


_PPR_ITER = """
    ppr{k} AS (
        SELECT e.dst AS node,
               CASE WHEN e.dst IN (1, 2, 3) THEN 0.15 / 3 ELSE 0.0 END
                 + 0.85 * sum(p.r / d.deg) AS r
        FROM edges e
        JOIN deg d ON e.src = d.src
        JOIN ppr{j} p ON e.src = p.node
        GROUP BY e.dst
    )"""

_PPR_ORACLE = (
    """
    WITH half AS (SELECT DISTINCT l_suppkey AS s, l_partkey + 100000 AS p FROM lineitem),
    edges AS (SELECT s AS src, p AS dst FROM half UNION ALL SELECT p, s FROM half),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    ppr0 AS (SELECT node, CASE WHEN node IN (1, 2, 3) THEN 1.0 / 3 ELSE 0.0 END AS r
             FROM nodes),"""
    + ",".join(_PPR_ITER.format(k=k, j=k - 1) for k in range(1, 4))
    + """
    SELECT node, round(r, 9) AS pr FROM ppr3 WHERE round(r, 9) > 0
    """
)


@query("ppr_similar_to_suppliers", oracle=_PPR_ORACLE)
def ppr_similar_to_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from suppliers {1, 2, 3}: teleport and
    initial mass go only to the source set, so ranks measure proximity
    to those suppliers through the co-supply structure — the
    "parts and suppliers most related to these" recommendation shape,
    vs the global importance its sibling pagerank_supplier_part
    computes. Same unrolled-CTE oracle trick with a per-node teleport
    term; zero-rank nodes (untouched by 3 hops of mass) are filtered
    on BOTH sides since 'unreached' is the semantic answer there."""
    edges = _sp_edges(_t(spark, sf_dir, "lineitem"), "ppr_similar_to_suppliers")
    sources = local_rows_df(edges.sparkSession, [(1,), (2,), (3,)], "node long")
    # sparse=True: the rank vector carries only REACHED nodes (the
    # 3-hop ball around the sources) instead of |V| rows — the shape
    # that survives a billion-node graph; pr>0 filter semantics are
    # unchanged (sparse omits exactly the zero rows).
    out = pagerank(
        edges, iterations=3, checkpoint_every=0, sources=sources, symmetric=True, sparse=True
    )
    return out.select("node", F.round("pr", 9).alias("pr")).filter(F.col("pr") > 0)


_LPA_ROUND = """
    v{k} AS (
        SELECT e.dst AS node, l.label, count(*) AS n
        FROM edges e JOIN l{j} l ON e.src = l.node
        GROUP BY e.dst, l.label
    ),
    l{k} AS (
        SELECT node, label FROM (
            SELECT node, label,
                   row_number() OVER (PARTITION BY node
                                      ORDER BY n DESC, label) AS rn
            FROM v{k})
        WHERE rn = 1
    )"""

_LPA_ORACLE = (
    """
    WITH half AS (SELECT DISTINCT l_suppkey AS s, l_partkey + 100000 AS p FROM lineitem),
    edges AS (SELECT s AS src, p AS dst FROM half UNION ALL SELECT p, s FROM half),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),"""
    + ",".join(_LPA_ROUND.format(k=k, j=k - 1) for k in range(1, 3))
    + """
    SELECT node, label FROM l2 ORDER BY node
    """
)


@query("label_propagation_communities", oracle=_LPA_ORACLE)
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation
    (operators/graph.label_propagation; Raghavan et al. 2007) on the
    supplier<->part co-supply graph: 2 rounds, every node adopting its
    neighbors' most frequent label with a count-desc-then-min-label
    tie-break. The deterministic synchronous variant is what makes a
    famously random algorithm exactly SQL-expressible — the oracle
    unrolls both rounds as join+argmax CTEs (the same trick that gates
    PageRank/BFS/k-core) and every (node, label) assignment row is
    hash-gated, not just a summary.

    Scale: each round is one edges⋈labels hash join (pre-partition the
    edge list on src once at scale and every round reuses the layout),
    one counting aggregation with map-side combine, and the per-node
    argmax as a partial-aggregatable max(struct) — no sort window;
    round 1 collapses to a single min(neighbor) aggregation under the
    identity init (all vote counts provably 1). Rounds localCheckpoint
    on the kcore release discipline (measured 4.7 → 1.9 s at sf0.1)."""
    from laygo_python_spark.operators.graph import label_propagation

    edges = _sp_edges(_t(spark, sf_dir, "lineitem"), "label_propagation_communities")
    # _sp_edges already returns the symmetric distinct edge set — skip
    # the operator's own symmetrize+distinct shuffle.
    return label_propagation(edges, rounds=2, assume_symmetric=True).orderBy("node")
