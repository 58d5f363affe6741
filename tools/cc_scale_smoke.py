"""Connected-components scale smoke: 10^6 synthetic edges (chain +
clique mix — VERDICT r1 item 9), asserting correctness AND a bounded
round count (the pointer-jumping in operators/dedup.py must hold the
fixpoint at O(log diameter) rounds, not O(diameter)).

Usage: python tools/cc_scale_smoke.py [n_edges]
Prints one JSON line with edges, components found/expected, rounds, sec.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from laygo_python_spark.operators.dedup import connected_components  # noqa: E402
from laygo_python_spark.session import get_spark  # noqa: E402


def main() -> None:
    target_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("cc_scale_smoke")

    # Half the edges from 200-node CHAINS (diameter 200 — the adversarial
    # case for plain propagation), half from 10-node CLIQUES (the shape
    # real near-dup components take). Node ids are disjoint ranges.
    chain_len = 200  # edges per chain (201 nodes)
    n_chains = (target_edges // 2) // chain_len
    clique_n = 10  # 45 edges per clique
    n_cliques = (target_edges // 2) // (clique_n * (clique_n - 1) // 2)

    chain_base = 0
    chains = (
        spark.range(n_chains * chain_len)
        .select(
            (F.lit(chain_base) + F.col("id") + (F.col("id") / chain_len).cast("long"))
            .alias("doc_id_a")
        )
        .withColumn("doc_id_b", F.col("doc_id_a") + 1)
    )
    clique_base = n_chains * (chain_len + 1) + 1_000_000_000
    pairs = [(i, j) for i in range(clique_n) for j in range(i + 1, clique_n)]
    pair_df = spark.createDataFrame(pairs, ["i", "j"])
    cliques = (
        spark.range(n_cliques)
        .select((F.lit(clique_base) + F.col("id") * clique_n).alias("base"))
        .crossJoin(F.broadcast(pair_df))
        .select(
            (F.col("base") + F.col("i")).alias("doc_id_a"),
            (F.col("base") + F.col("j")).alias("doc_id_b"),
        )
    )
    edges = chains.unionByName(cliques).localCheckpoint(eager=True)
    n_edges = edges.count()
    expected_components = n_chains + n_cliques

    stats: dict = {}
    t0 = time.perf_counter()
    labels = connected_components(edges, max_iterations=30, stats=stats)
    n_components = labels.select("cluster").distinct().count()
    elapsed = time.perf_counter() - t0

    # correctness: every chain/clique collapses to exactly one cluster
    assert n_components == expected_components, (n_components, expected_components)
    # bounded rounds: ceil(log2(200)) = 8 propagation+jump phases + slack
    assert stats.get("rounds", 99) <= 15, f"rounds blew up: {stats}"

    print(
        json.dumps(
            {
                "edges": n_edges,
                "components": n_components,
                "expected": expected_components,
                "rounds": stats["rounds"],
                "sec": round(elapsed, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
