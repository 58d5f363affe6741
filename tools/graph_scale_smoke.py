"""PageRank + BFS + triangle + count-min-sketch scale smoke.

PageRank: a synthetic hub graph (each node links to id/2 and id/3, then
symmetrized — the CLI argument counts DIRECTED pre-symmetrization
links, so the run holds ~2× that many edges; the JSON reports the true
count). Asserts probability mass is conserved (Σpr ≈ 1, the invariant a
wrong contribution join breaks first) and prints sec/round. Rounds are
fixed (power iteration), so wall time scales linearly with |E| — the
per-round shuffle carries only the rank vector (operators/pagerank.py).

BFS: frontier BFS from node 2 over the same graph, 6 hops. Asserts the
level sets partition the visited set (Σ per-hop counts = |visited|) and
that each successive frontier is non-empty through the cap — the
frontier-only shuffle means sec/hop tracks |frontier|, not |E|.

Triangles: 10^5 planted 5-cliques (10 triangles each, 6 per node)
UNIONed with a 10^5-degree hub star contributing ZERO triangles — the
adversarial shape for triangle counting: naive per-node wedge pairing
generates deg² = 10^10 candidates at the hub, while degree orientation
(operators/graph.py) directs every star edge leaf→hub, giving the hub
out-degree 0 and the whole star no wedges at all. Asserts exact global
and per-role counts.

CMS: 10^7 rows over ~1000 near-uniform keys PLUS one planted heavy key
carrying ~9% of all mass, through a 4×65536 sketch; asserts the sketch
never exceeds d×w rows, that the heavy key tops the estimates with an
exact (collision-free) count, and that every top-5 estimate bounds its
true count from above.

Usage: python tools/graph_scale_smoke.py [pr_links] [cms_rows] [tri_cliques]
Prints one JSON line per smoke.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from laygo_python_spark.operators.cms import cms_build, cms_estimate  # noqa: E402
from laygo_python_spark.operators.graph import bfs_hops, kcore, triangle_count  # noqa: E402
from laygo_python_spark.operators.pagerank import pagerank  # noqa: E402
from laygo_python_spark.session import get_spark  # noqa: E402


def pagerank_smoke(spark, n_links: int) -> None:
    # ~2 directed links per node before symmetrization.
    n_nodes = n_links // 2
    half = (
        spark.range(2, n_nodes)
        .select(F.col("id").alias("src"), (F.col("id") / 2).cast("long").alias("dst"))
        .unionByName(
            spark.range(3, n_nodes).select(
                F.col("id").alias("src"), (F.col("id") / 3).cast("long").alias("dst")
            )
        )
    )
    edges = half.unionByName(half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    iters = 5
    t = time.time()
    ranks = pagerank(edges, iterations=iters)
    total, n = ranks.agg(F.sum("pr"), F.count(F.lit(1))).first()
    dt = time.time() - t
    # Symmetrized graph has no dangling nodes → mass exactly conserved
    # (up to float accumulation): Σpr = 1.
    assert abs(total - 1.0) < 1e-6, total
    print(
        json.dumps(
            {
                "smoke": "pagerank",
                "edges": edges.count(),
                "nodes": n,
                "iters": iters,
                "sum_pr": round(total, 9),
                "sec": round(dt, 2),
                "sec_per_round": round(dt / iters, 2),
            }
        )
    )


def bfs_smoke(spark, n_links: int) -> None:
    n_nodes = n_links // 2
    half = (
        spark.range(2, n_nodes)
        .select(F.col("id").alias("src"), (F.col("id") / 2).cast("long").alias("dst"))
        .unionByName(
            spark.range(3, n_nodes).select(
                F.col("id").alias("src"), (F.col("id") / 3).cast("long").alias("dst")
            )
        )
    )
    edges = half.unionByName(half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sources = spark.createDataFrame([(2,)], "node long")
    max_hops = 6
    t = time.time()
    out = bfs_hops(edges, sources, max_hops=max_hops).persist()
    per_hop = {r["hops"]: r["n"] for r in out.groupBy("hops").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = out.count()
    dt = time.time() - t
    out.unpersist()
    # Level sets partition the visited set, start at the source, and
    # stay non-empty through the cap (the ÷2/÷3 hub graph reaches new
    # nodes every round at this size).
    assert per_hop.get(0) == 1, per_hop
    assert sum(per_hop.values()) == total, (per_hop, total)
    assert all(per_hop.get(k, 0) > 0 for k in range(max_hops + 1)), per_hop
    print(
        json.dumps(
            {
                "smoke": "bfs",
                "links": n_links,
                "hops": max_hops,
                "reached": total,
                "per_hop": [per_hop.get(k, 0) for k in range(max_hops + 1)],
                "sec": round(dt, 2),
                "sec_per_hop": round(dt / max_hops, 2),
            }
        )
    )


def triangle_smoke(spark, n_cliques: int) -> None:
    clique = 5
    hub_deg = 100_000
    # Planted 5-cliques on nodes [i*5+1, i*5+5]; pair offsets (p,q) with
    # 0 <= p < q < 5 give the C(5,2)=10 edges per clique.
    pairs = [(p, q) for p in range(clique) for q in range(clique) if p < q]
    pair_df = spark.createDataFrame(pairs, "p int, q int")
    cliques = (
        spark.range(n_cliques)
        .crossJoin(pair_df)
        .select(
            (F.col("id") * clique + F.col("p") + 1).alias("src"),
            (F.col("id") * clique + F.col("q") + 1).alias("dst"),
        )
    )
    # Hub star on a DISJOINT negative node range: max degree 10^5, zero
    # triangles — the shape degree orientation exists for.
    star = spark.range(1, hub_deg + 1).select(
        F.lit(-1).cast("long").alias("src"), (-1 - F.col("id")).alias("dst")
    )
    edges = cliques.unionByName(star)
    t = time.time()
    out = triangle_count(edges).persist()
    stats = out.agg(
        F.sum("n_triangles").alias("s"),
        F.count(F.lit(1)).alias("n"),
        F.max(F.when(F.col("node") < 0, F.col("n_triangles"))).alias("star_max"),
        F.min(F.when(F.col("node") > 0, F.col("n_triangles"))).alias("clique_min"),
        F.max(F.when(F.col("node") > 0, F.col("n_triangles"))).alias("clique_max"),
    ).first()
    dt = time.time() - t
    out.unpersist()
    want_tris = n_cliques * 10  # C(5,3) per clique
    assert stats["s"] == 3 * want_tris, stats
    assert stats["star_max"] == 0, stats
    assert stats["clique_min"] == 6 and stats["clique_max"] == 6, stats
    assert stats["n"] == n_cliques * clique + hub_deg + 1, stats
    print(
        json.dumps(
            {
                "smoke": "triangles",
                "edges": n_cliques * 10 + hub_deg,
                "hub_degree": hub_deg,
                "triangles": want_tris,
                "sec": round(dt, 2),
            }
        )
    )


def kcore_smoke(spark, n_cliques: int) -> None:
    clique = 5
    # 5-cliques (every node degree 4) chained by single bridge edges
    # (bridges add degree 1 to two nodes per clique): at k=4 nothing
    # peels on the first round except... nothing — every clique node has
    # degree >= 4; at k=5 EVERYTHING peels. The asserted shape: k=4
    # keeps all clique nodes; pendant bridge chains of degree < 4 never
    # appear. Plus a 10^5-node path, which a k=2 fixpoint erases
    # entirely — the cascade depth stressor (bounded rounds keep it
    # cheap; the assert uses rounds, not fixpoint, at this size).
    pairs = [(p, q) for p in range(clique) for q in range(clique) if p < q]
    pair_df = spark.createDataFrame(pairs, "p int, q int")
    cliques = (
        spark.range(n_cliques)
        .crossJoin(pair_df)
        .select(
            (F.col("id") * clique + F.col("p") + 1).alias("src"),
            (F.col("id") * clique + F.col("q") + 1).alias("dst"),
        )
    )
    bridges = spark.range(n_cliques - 1).select(
        (F.col("id") * clique + clique).alias("src"),
        ((F.col("id") + 1) * clique + 1).alias("dst"),
    )
    path_n = 100_000
    path = spark.range(1, path_n).select(
        (-F.col("id")).alias("src"), (-F.col("id") - 1).alias("dst")
    )
    edges = cliques.unionByName(bridges).unionByName(path)
    t = time.time()
    surv = kcore(edges, k=4, rounds=2).persist()
    n_surv = surv.count()
    neg = surv.filter(F.col("node") < 0).count()
    dt = time.time() - t
    surv.unpersist()
    assert n_surv == n_cliques * clique, (n_surv, n_cliques * clique)
    assert neg == 0, neg  # the path (all degree <= 2) is gone by round 1
    t = time.time()
    gone = kcore(path, k=2, rounds=6).count()
    dt2 = time.time() - t
    # Each k=2 round peels both path ends: after r rounds 2r nodes are
    # gone — bounded rounds shrink it deterministically.
    assert gone == path_n - 1 - 2 * 6 + 1, gone
    print(
        json.dumps(
            {
                "smoke": "kcore",
                "edges": n_cliques * 10 + n_cliques - 1 + path_n - 1,
                "k4_survivors": n_surv,
                "sec": round(dt, 2),
                "path_rounds_sec": round(dt2, 2),
            }
        )
    )


def cms_smoke(spark, n_rows: int) -> None:
    # ~1000 near-uniform keys, plus every (id % 11 == 0) row remapped to
    # planted key -1 → one genuinely heavy key holding ~9% of all mass.
    d, w = 4, 65536
    df = spark.range(n_rows).select(
        F.when(F.pmod(F.col("id"), F.lit(11)) == 0, F.lit(-1))
        .otherwise((F.lit(n_rows) / (F.pmod(F.col("id"), F.lit(997)) + 1)).cast("long"))
        .alias("k")
    )
    t = time.time()
    sk = cms_build(df, "k", d=d, w=w)
    sk_rows = sk.count()
    build = time.time() - t
    assert sk_rows <= d * w, sk_rows
    # Deterministic top-5 (key tiebreak) and persisted, so the two uses
    # below — probe set and join side — can't resolve to different rows.
    heavy = (
        df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("exact"))
        .orderBy(F.desc("exact"), "k")
        .limit(5)
        .persist()
    )
    est = cms_estimate(sk, heavy.select("k"), "k", d=d, w=w)
    j = est.join(heavy, "k").collect()
    heavy.unpersist()
    assert len(j) == 5, j
    assert all(r["est"] >= r["exact"] for r in j), j
    top = max(j, key=lambda r: r["est"])
    assert top["k"] == -1 and top["exact"] >= n_rows // 11, top
    max_over = max(r["est"] - r["exact"] for r in j)
    print(
        json.dumps(
            {
                "smoke": "cms",
                "rows": n_rows,
                "sketch_rows": sk_rows,
                "build_sec": round(build, 2),
                "top5_max_overcount": int(max_over),
            }
        )
    )


def main() -> None:
    pr_links = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cms_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    tri_cliques = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    spark = get_spark("graph_scale_smoke")
    pagerank_smoke(spark, pr_links)
    bfs_smoke(spark, pr_links)
    triangle_smoke(spark, tri_cliques)
    kcore_smoke(spark, tri_cliques)
    cms_smoke(spark, cms_rows)


if __name__ == "__main__":
    main()
