"""One-off profile for pagerank_supplier_part (r4 verdict ask #4: the
4.24 s -> 5.06 s drift with an unchanged plan needed attribution).

Times, on a quiet machine at the bench SF:

* the full query, min of N warm runs (the number BENCH_r{N} books);
* its phases: the edge derivation alone, the collapsed 5-round loop
  (checkpoint_every=0, one job) vs per-round walls (checkpoint_every=1,
  5 jobs — where each round's time goes).

Usage: python tools/pagerank_profile.py [sf_dir] [runs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from laygo_python_spark.operators.pagerank import pagerank  # noqa: E402
from laygo_python_spark.queries import QUERIES, load_all  # noqa: E402
from laygo_python_spark.queries.graph_ops import _sp_edges  # noqa: E402
from laygo_python_spark.session import get_spark, read_table  # noqa: E402


def wall(f) -> float:
    t0 = time.perf_counter()
    f()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    load_all()
    spark = get_spark("pagerank_profile")
    q = QUERIES["pagerank_supplier_part"]

    # warm: JIT + shuffle services + table cache
    q(spark, sf_dir).count()

    full = [wall(lambda: q(spark, sf_dir).count()) for _ in range(runs)]

    li = read_table(spark, sf_dir, "lineitem")
    edges = _sp_edges(li, "profile")

    # phase: edge derivation alone (distinct + symmetrize)
    edge_wall = wall(lambda: edges.count())

    # phase: loop with per-round checkpoints — each round materializes,
    # so successive walls attribute time per round
    per_round: list[float] = []

    def timed_loop() -> None:
        raw = edges.select(F.col("src"), F.col("dst"), F.lit(1.0).alias("w"))
        deg = raw.groupBy("src").agg(F.sum("w").alias("deg"))
        e = raw.join(deg, "src").repartition("src").persist()
        nodes = (
            raw.select(F.col("src").alias("node"))
            .unionByName(raw.select(F.col("dst").alias("node")))
            .distinct()
        )
        n = nodes.count()
        nodes = (
            nodes.withColumn("base", F.lit(0.15 / n))
            .withColumn("pr0", F.lit(1.0 / n))
            .localCheckpoint(eager=True)
        )
        ranks = nodes.select("node", F.col("pr0").alias("pr"))
        try:
            for _ in range(5):
                t0 = time.perf_counter()
                contrib = e.join(ranks.withColumnRenamed("node", "src"), "src").select(
                    F.col("dst").alias("node"),
                    (F.col("pr") * F.col("w") / F.col("deg")).alias("c"),
                )
                ranks = (
                    nodes.join(
                        contrib.groupBy("node").agg(F.sum("c").alias("s")), "node", "left"
                    )
                    .select(
                        "node",
                        (F.col("base") + F.lit(0.85) * F.coalesce(F.col("s"), F.lit(0.0))).alias(
                            "pr"
                        ),
                    )
                    .localCheckpoint(eager=True)
                )
                per_round.append(round(time.perf_counter() - t0, 3))
        finally:
            e.unpersist()

    loop_wall = wall(timed_loop)

    # the collapsed production shape (checkpoint_every=0) for contrast
    collapsed = wall(lambda: pagerank(edges, iterations=5, checkpoint_every=0).count())

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "full_runs_s": full,
                "full_min_s": min(full),
                "edge_derive_s": edge_wall,
                "per_round_s": per_round,
                "per_round_loop_total_s": loop_wall,
                "collapsed_loop_s": collapsed,
            }
        )
    )


if __name__ == "__main__":
    main()
