"""Edit-distance similarity join query over operators/stringsim.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


@query(
    "entity_resolution_clusters",
    oracle="""
    WITH RECURSIVE c AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 700),
    prs AS (
      SELECT a.c_custkey AS pa, b.c_custkey AS pb
      FROM c a JOIN c b
        ON (length(a.c_name) < length(b.c_name))
        OR (length(a.c_name) = length(b.c_name) AND a.c_custkey < b.c_custkey)
      WHERE levenshtein(a.c_name, b.c_name) <= 1),
    edges AS (SELECT pa AS s, pb AS d FROM prs UNION ALL SELECT pb, pa FROM prs),
    nodes AS (SELECT DISTINCT s AS node FROM edges),
    reach(node, label) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.d, r.label FROM edges e JOIN reach r ON r.node = e.s),
    cl AS (SELECT node, min(label) AS entity_id FROM reach GROUP BY node),
    assigned AS (
      SELECT c.c_custkey,
             CAST(COALESCE(cl.entity_id, c.c_custkey) AS BIGINT) AS entity_id
      FROM c LEFT JOIN cl ON cl.node = c.c_custkey)
    SELECT c_custkey, entity_id,
           CAST(count(*) OVER (PARTITION BY entity_id) AS BIGINT) AS n_members
    FROM assigned
    ORDER BY c_custkey
    """,
)
def entity_resolution_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: edit-distance-1 name pairs
    (PassJoin segment blocking + exact levenshtein verify,
    operators/stringsim.edit_distance_pairs) collapse into entity
    clusters by connected components (operators/dedup.
    connected_components — min-label propagation + pointer jumping),
    singletons keep their own id — the match→cluster→canonical-id
    pipeline of any customer-dedup / record-linkage job, with cluster
    size attached for the review queue. Every (record, entity,
    cluster-size) row is hash-gated: the oracle brute-forces the pair
    discovery the engine does via blocking and replays the transitive
    closure as a recursive CTE (the leakage_safe_split precedent).

    Scale: blocking keeps candidate generation near-linear (see
    edit_distance_name_pairs' skew caveat — shared prefixes are the
    dial), components converge in O(log diameter) rounds with shuffles
    on ids only, and the membership-count window partitions by entity.
    The bounded slice keeps the gate cheap; the plan is
    size-independent."""
    from laygo_python_spark.operators import dedup
    from laygo_python_spark.operators.stringsim import edit_distance_pairs

    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 700)
    pairs = edit_distance_pairs(cust, id_col="c_custkey", str_col="c_name", max_dist=1)
    cc = dedup.connected_components(pairs, src="id_a", dst="id_b")
    assigned = (
        cust.select("c_custkey")
        .join(cc.withColumnRenamed("node", "c_custkey"), "c_custkey", "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("cluster"), F.col("c_custkey")).cast("long").alias("entity_id"),
        )
    )
    w = Window.partitionBy("entity_id")
    return assigned.withColumn(
        "n_members", F.count(F.lit(1)).over(w).cast("long")
    ).orderBy("c_custkey")
