"""Bloom-filter join pruning — the runtime-filter pattern as a query.

Companion to the CMS/HLL/quantile sketch entries: where those estimate,
the bloom filter PRUNES — and because it has no false negatives and an
exact join runs after it, the query's final answer is exactly the plain
join's answer, which is what makes this oracle-gateable even though a
probabilistic structure sits in the middle of the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laygo_python_spark.operators.bloom import bloom_build, bloom_geometry, bloom_might_contain
from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t


@query(
    "bloom_prune_join",
    oracle="""
    SELECT c_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY c_custkey
    """,
)
def bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order revenue for the BUILDING segment, with the
    orders scan pruned by a bloom filter built from the segment's
    customer keys (operators/bloom.py) BEFORE the exact join.

    The scale story this demonstrates: at 100 TB the orders side is the
    data; a shuffle join would move every order row to discover that
    ~80% belong to other segments. Here the ⌈m/64⌉-row word table
    broadcasts, the k probes evaluate map-side (k broadcast left-joins
    — no exchange on the orders side), and only the ≈20% + fpp
    survivors reach the exact join, which removes the false positives —
    so the result is bit-identical to the plain join the oracle runs.
    The same artifact, parquet-persisted, turns tomorrow's incremental
    load into a map-only membership pass (bloom_merge rolls shards up).
    """
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    dim = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    m, k = bloom_geometry(50_000, fpp=0.01)
    bloom = bloom_build(dim, "c_custkey", m=m, k=k)
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    pruned = bloom_might_contain(bloom, orders, "o_custkey")
    return (
        pruned.join(F.broadcast(dim), pruned.o_custkey == dim.c_custkey)
        .groupBy("c_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "bloom_new_customers",
    oracle="""
    WITH seen AS (SELECT DISTINCT o_custkey FROM orders
                  WHERE o_orderdate < TIMESTAMP '1997-01-01'),
    batch AS (SELECT DISTINCT o_custkey FROM orders
              WHERE o_orderdate >= TIMESTAMP '1997-01-01')
    SELECT b.o_custkey FROM batch b
    WHERE b.o_custkey NOT IN (SELECT o_custkey FROM seen)
    """,
)
def bloom_new_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-seen key detection — the crawl-frontier / incremental-ingest
    shape: which customers in the new batch (1997+) have NEVER ordered
    before? The bloom is the anti-join ACCELERATOR: keys failing it are
    PROVABLY new (the certain direction of a bloom answer) and skip the
    exact check entirely; only the ≈fpp + truly-seen fraction that
    passes reaches the exact anti-join, whose small probe side makes it
    broadcast-able. The final answer is exact — identical to the plain
    NOT IN the oracle runs — because false positives are rescued by the
    exact pass and false negatives don't exist.

    At 100 TB: "seen" is yesterday's parquet-persisted bloom
    (bloom_merge rolls daily filters up), so the historical key set is
    never rescanned — the exact anti-join touches only the maybe-seen
    sliver."""
    from laygo_python_spark.operators.bloom import bloom_contains_col

    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    cut = F.lit("1997-01-01").cast("timestamp")
    seen = orders.filter(F.col("o_orderdate") < cut).select("o_custkey").distinct()
    batch = orders.filter(F.col("o_orderdate") >= cut).select("o_custkey").distinct()
    m, k = bloom_geometry(100_000, fpp=0.01)
    flagged = bloom_contains_col(
        bloom_build(seen, "o_custkey", m=m, k=k), batch, "o_custkey", flag="maybe_seen"
    )
    definitely_new = flagged.filter(~F.col("maybe_seen")).select("o_custkey")
    rescued = (
        flagged.filter(F.col("maybe_seen"))
        .select("o_custkey")
        .join(seen, "o_custkey", "left_anti")
    )
    return definitely_new.unionByName(rescued)
