"""End-to-end hybrid retrieval stack, composed from the library's own
operators — the production RAG / seed-expansion shape:

  lexical BM25 top-k (operators/retrieval.bm25_topk)
  + dense cosine top-k (operators/similarity.brute_force_topk)
  → reciprocal-rank fusion (operators/retrieval.rrf_fuse)
  → offline quality certificate: nDCG / MRR / P@k against a judgment
    table (operators/retrieval.ranking_metrics)
  → and, before any of it ships as training data, embedding-space
    decontamination of the corpus against the held-out eval slice
    (operators/semdedup.semantic_contamination)

The scale contract at each stage: BM25 cost follows the query terms'
POSTINGS, not the vocabulary; the dense leg broadcasts the (tiny) query
set; fusion and eval run over k-row retriever HEADS only, O(N·k)
whatever the corpus; decontamination broadcasts the eval embeddings and
folds its per-row argmax map-side, so the corpus never shuffles
anywhere in this file.

Executed by tests/test_examples.py so it can never rot.
Run directly: python examples/retrieval_stack.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from laygo_python_spark.operators.retrieval import (
    bm25_topk,
    ranking_metrics,
    rrf_fuse,
    with_rank,
)
from laygo_python_spark.operators.semdedup import semantic_contamination
from laygo_python_spark.operators.similarity import brute_force_topk
from laygo_python_spark.session import read_table

QUERY_TERMS = ["join", "hash", "scan"]


def run(spark, sf_dir: str) -> dict:
    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")

    # 1) the two retrievers — each keeps its own scale path
    lex = with_rank(bm25_topk(docs, QUERY_TERMS, k=20)).select("doc_id", "rank")
    dense = brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=20).select(
        F.col("neighbor_id").alias("doc_id"), F.col("rank").cast("int").alias("rank")
    )

    # 2) fuse the heads
    fused = rrf_fuse([lex, dense], k=10)
    fused_ids = [r["doc_id"] for r in fused.orderBy("rank").collect()]

    # 3) eval loop: graded judgments = distinct query terms present
    rel = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
        .filter(F.col("term").isin(QUERY_TERMS))
        .groupBy("doc_id")
        .agg(F.countDistinct("term").cast("int").alias("rel"))
    )
    metrics = ranking_metrics(fused.select("doc_id", "rank"), rel, k=10).collect()[0]

    # 4) governance: nothing semantically overlapping the eval slice
    # may ship as training data
    flagged = semantic_contamination(
        emb.filter(F.col("vec_id") % 25 != 0),
        emb.filter(F.col("vec_id") % 25 == 0),
        threshold=0.38,
    )
    return {
        "n_lex": lex.count(),
        "n_dense": dense.count(),
        "fused_ids": fused_ids,
        "ndcg": metrics["ndcg"],
        "mrr": metrics["mrr"],
        "p_at_k": metrics["p_at_k"],
        "n_contaminated": flagged.count(),
    }


if __name__ == "__main__":
    from laygo_python_spark.session import get_spark

    stats = run(get_spark(), os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    print(stats)
