"""Label-propagation + hybrid-retrieval scale smoke.

LPA: a planted-community graph — `n_comm` disjoint 8-node CLIQUES
(dense communities are LPA's convergence sweet spot: round 1 pulls
every non-min node to the min id, round 2 folds the min node in;
rings/bipartite shapes famously oscillate under the synchronous
update, which is exactly why the operator fixes the round count) —
asserts every community collapses to EXACTLY one label and distinct
communities never merge (the invariant a wrong argmax or a
cross-joined vote breaks first). Per-round cost is one edges⋈labels
join + one counted agg + one bounded argmax window, so sec/round
tracks |E|.

Hybrid retrieval: BM25 + RRF over `n_docs` synthetic docs (~20 tokens
each from a 1000-word Zipf-ish vocabulary, 3 planted docs stuffed with
the query terms). Asserts the planted docs own the lexical top-3, that
RRF fusion of the lexical list with a disagreeing second list keeps
any doc present in BOTH lists above docs present in ONE (the rank-sum
property), and prints docs/sec through the postings-proportional BM25
plan (the explode filters to query-vocabulary postings BEFORE any
shuffle, so wall time tracks postings, not corpus tokens).

Usage: python tools/lpa_retrieval_scale_smoke.py [n_comm] [n_docs]
Prints one JSON line per smoke.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from laygo_python_spark.operators.graph import label_propagation
from laygo_python_spark.operators.retrieval import bm25_topk, rrf_fuse, with_rank
from laygo_python_spark.session import get_spark


def lpa_smoke(spark, n_comm: int) -> None:
    size = 8
    rounds = 3
    t0 = time.time()
    # all (i, j) pairs within each clique, i < j — one directed edge
    # per unordered pair; the operator symmetrizes.
    pairs = [(i, j) for i in range(size) for j in range(size) if i < j]
    base = spark.range(n_comm).select(F.col("id").alias("c"))
    edges = base.select(
        F.explode(
            F.array(*[F.struct(F.lit(i).alias("i"), F.lit(j).alias("j")) for i, j in pairs])
        ).alias("p"),
        "c",
    ).select(
        (F.col("c") * size + F.col("p.i")).alias("src"),
        (F.col("c") * size + F.col("p.j")).alias("dst"),
    )
    labels = label_propagation(edges, rounds=rounds, checkpoint_every=1)
    per_comm = (
        labels.select((F.col("node") / size).cast("long").alias("c"), "label")
        .groupBy("c")
        .agg(F.countDistinct("label").alias("n_labels"), F.min("label").alias("lo"))
    )
    n_bad = per_comm.filter(F.col("n_labels") != 1).count()
    # labels must also be community-local (no cross-community merge):
    # every community's single label lies inside its own id range.
    n_foreign = per_comm.filter(
        (F.col("lo") < F.col("c") * size) | (F.col("lo") >= (F.col("c") + 1) * size)
    ).count()
    wall = time.time() - t0
    assert n_bad == 0, f"{n_bad} communities did not converge to one label"
    assert n_foreign == 0, f"{n_foreign} communities adopted a foreign label"
    print(
        json.dumps(
            {
                "smoke": "lpa",
                "communities": n_comm,
                "nodes": n_comm * size,
                "edges_directed": n_comm * (size * (size - 1) // 2),
                "rounds": rounds,
                "sec": round(wall, 2),
                "sec_per_round": round(wall / rounds, 2),
            }
        )
    )


def retrieval_smoke(spark, n_docs: int) -> None:
    t0 = time.time()
    # Zipf-ish vocabulary: token t_k appears with weight ~1/k.
    words = ", ".join(
        f"concat('t', cast(pmod(cast(conv(substr(md5(concat(cast(id as string), '_{j}')), 1, 8), 16, 10) as bigint), "
        f"cast(pow(2, {10 - j % 7}) as bigint)) as string))"
        for j in range(20)
    )
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(f"concat_ws(' ', {words})").alias("text"),
    )
    planted = spark.createDataFrame(
        [(n_docs + i, "join hash scan " * 8) for i in range(3)],
        "doc_id long, text string",
    )
    corpus = docs.unionByName(planted)
    lex = with_rank(bm25_topk(corpus, ["join", "hash", "scan"], k=10)).select(
        "doc_id", "rank"
    )
    top3 = {r["doc_id"] for r in lex.filter(F.col("rank") <= 3).collect()}
    wall = time.time() - t0
    assert top3 == {n_docs, n_docs + 1, n_docs + 2}, f"planted docs not on top: {top3}"
    # RRF rank-sum property: a doc in both lists beats single-list docs
    # at comparable ranks.
    other = spark.createDataFrame(
        [(n_docs + 1, 1), (12345, 2)], "doc_id long, rank int"
    )
    fused = {r["doc_id"]: r["rank"] for r in rrf_fuse([lex, other], k=10).collect()}
    assert fused[n_docs + 1] == 1, f"both-lists doc not first: {fused}"
    print(
        json.dumps(
            {
                "smoke": "hybrid_retrieval",
                "docs": n_docs + 3,
                "bm25_topk_sec": round(wall, 2),
                "docs_per_sec": int((n_docs + 3) / wall),
            }
        )
    )


def main() -> None:
    n_comm = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = get_spark()
    lpa_smoke(spark, n_comm)
    retrieval_smoke(spark, n_docs)


if __name__ == "__main__":
    main()
