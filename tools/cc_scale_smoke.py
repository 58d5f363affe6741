"""Connected-components scale smoke: synthetic edges (chain + clique
mix — VERDICT r1 item 9), asserting correctness AND a bounded round
count (the pointer-jumping in operators/dedup.py must hold the fixpoint
at O(log diameter) rounds, not O(diameter)).

``--giant`` (VERDICT r2 item 9) adds the skewed-component shape at
10^7 edges: ONE giant chain component holding 20% of all edges
(diameter ~2·10^6 — the worst case for label propagation, and a single
component so the label traffic all converges on one min). Asserts the
round count stays logarithmic in THAT diameter and that executor
storage is released (no leaked per-round checkpoints).

Usage: python tools/cc_scale_smoke.py [n_edges] [--giant]
Prints one JSON line with edges, components found/expected, rounds, sec.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from laygo_python_spark.operators.dedup import connected_components  # noqa: E402
from laygo_python_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    giant = "--giant" in sys.argv[1:]
    target_edges = int(args[0]) if args else (10_000_000 if giant else 1_000_000)
    spark = get_spark("cc_scale_smoke")

    # Half the edges from 200-node CHAINS (diameter 200 — the adversarial
    # case for plain propagation), half from 10-node CLIQUES (the shape
    # real near-dup components take). Node ids are disjoint ranges.
    giant_edges = target_edges // 5 if giant else 0
    mix_edges = target_edges - giant_edges
    chain_len = 200  # edges per chain (201 nodes)
    n_chains = (mix_edges // 2) // chain_len
    clique_n = 10  # 45 edges per clique
    n_cliques = (mix_edges // 2) // (clique_n * (clique_n - 1) // 2)

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
    edges = chains.unionByName(cliques)
    expected_components = n_chains + n_cliques
    giant_diameter = 0
    if giant:
        # ONE chain of giant_edges edges — a single component whose
        # diameter equals the edge count. Disjoint id range.
        giant_base = 2_000_000_000
        giant_chain = (
            spark.range(giant_edges)
            .select((F.lit(giant_base) + F.col("id")).alias("doc_id_a"))
            .withColumn("doc_id_b", F.col("doc_id_a") + 1)
        )
        edges = edges.unionByName(giant_chain)
        expected_components += 1
        giant_diameter = giant_edges

    edges = edges.localCheckpoint(eager=True)
    n_edges = edges.count()

    stats: dict = {}
    t0 = time.perf_counter()
    # driver_threshold=0: this smoke MEASURES the distributed fixpoint's
    # round bound — never let the adaptive union-find path absorb it.
    labels = connected_components(edges, max_iterations=30, stats=stats, driver_threshold=0)
    n_components = labels.select("cluster").distinct().count()
    elapsed = time.perf_counter() - t0

    # correctness: every chain/clique collapses to exactly one cluster
    assert n_components == expected_components, (n_components, expected_components)
    # bounded rounds: propagation+jump covers >= 2^r - 1 hops after r
    # rounds, so ceil(log2(diameter)) phases + slack for convergence
    # detection. Default shape: ceil(log2(200)) = 8 -> bound 15; giant:
    # ceil(log2(2e6)) = 21 -> bound 26.
    bound = max(15, math.ceil(math.log2(max(giant_diameter, 2))) + 5)
    assert stats.get("rounds", 99) <= bound, f"rounds blew up: {stats} (bound {bound})"

    # storage release: the per-round localCheckpoints must be
    # unpersisted as rounds retire — only the edge checkpoint and the
    # final labels snapshot may remain pinned.
    live = dict(spark.sparkContext._jsc.getPersistentRDDs())
    assert len(live) <= 3, f"leaked checkpoints: {len(live)} persistent RDDs"

    print(
        json.dumps(
            {
                "edges": n_edges,
                "giant_component_diameter": giant_diameter,
                "components": n_components,
                "expected": expected_components,
                "rounds": stats["rounds"],
                "round_bound": bound,
                "persistent_rdds": len(live),
                "sec": round(elapsed, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
