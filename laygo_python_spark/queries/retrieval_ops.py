"""Hybrid-retrieval queries — rank fusion and offline ranking-quality
evaluation, the glue between the lexical (operators/retrieval.py BM25)
and dense (operators/similarity.py ANN) retrieval families: a RAG or
seed-expansion pipeline runs BOTH retrievers and fuses the lists, and a
retrieval stack without an offline eval loop (nDCG/MRR against a
judgment table) cannot be tuned at all.

Reference parity: the reference engine (ringoldsdev/laygo-python) has no
retrieval surface; uplift in the corpus-tooling family (SURVEY.md §2.6/§7
posture, same as dedup/ANN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t

_QUERY_TERMS = ["join", "hash", "scan"]

# BM25 replay shared by both oracles (identical arithmetic to the
# bm25_topk_docs oracle in text_ops2.py, parameterized top-k head).
_BM25_CTES = """
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
           FROM tok WHERE term IN ('join', 'hash', 'scan') GROUP BY doc_id, term),
    dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
    bm AS (
      SELECT tf.doc_id,
             round(sum(ln(1.0 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5))
                 * (tf.tf * 2.2)
                 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))), 6) AS score
      FROM tf JOIN dft USING (term) JOIN dl USING (doc_id), stats s
      GROUP BY tf.doc_id),
    lex AS (
      SELECT doc_id, rank FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        FROM bm)
      WHERE rank <= {lex_k})
"""


@query(
    "rrf_hybrid_topk",
    oracle=(
        "    WITH "
        + _BM25_CTES.format(lex_k=50)
        + """,
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT v FROM e WHERE vec_id = 0),
    dense AS (
      SELECT doc_id, rank FROM (
        SELECT c.vec_id AS doc_id,
               row_number() OVER (
                 ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.vec_id) AS rank
        FROM e c, q WHERE c.vec_id <> 0)
      WHERE rank <= 50),
    contrib AS (
      SELECT doc_id, 1.0 / (60 + rank) AS c FROM lex
      UNION ALL
      SELECT doc_id, 1.0 / (60 + rank) AS c FROM dense),
    fused AS (
      SELECT doc_id, round(sum(c), 6) AS rrf_score,
             CAST(count(*) AS INT) AS n_lists
      FROM contrib GROUP BY doc_id)
    SELECT doc_id, rrf_score, n_lists,
           CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS INT) AS rank
    FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10
    """
    ),
)
def rrf_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-50 for {join, hash, scan} fused with
    the dense cosine top-50 of query vector vec_id=0 by reciprocal-rank
    fusion (operators/retrieval.rrf_fuse; Cormack et al. 2009,
    1/(60+rank) per list). The production RAG shape: run both
    retrievers, keep only their k-row HEADS, fuse on ranks — the fusion
    stage is O(N·k) regardless of corpus size, so the expensive halves
    keep their own scale paths (postings-proportional BM25,
    bucketed/IVF ANN) and the combiner never touches the corpus.

    Cross-engine exactness: both input ranks are integers derived from
    round-then-rank orderings the repo already hash-gates
    (bm25_topk_docs, embedding_cosine_topk); each fused score is a sum
    of at most two identical doubles, rounded to 6 before the final
    ordering."""
    from laygo_python_spark.operators.retrieval import bm25_topk, rrf_fuse, with_rank
    from laygo_python_spark.operators.similarity import brute_force_topk

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = with_rank(bm25_topk(docs, _QUERY_TERMS, k=50)).select("doc_id", "rank")
    dense = (
        brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=50)
        .select(F.col("neighbor_id").alias("doc_id"), F.col("rank").cast("int").alias("rank"))
    )
    return rrf_fuse([lex, dense], k=10).orderBy(F.desc("rrf_score"), F.asc("doc_id"))


@query(
    "retrieval_eval_ndcg",
    oracle=(
        "    WITH "
        + _BM25_CTES.format(lex_k=10)
        + """,
    rel AS (
      SELECT doc_id, CAST(count(DISTINCT term) AS INT) AS rel
      FROM tok WHERE term IN ('join', 'hash', 'scan') GROUP BY doc_id),
    got AS (
      SELECT sum((power(2.0, coalesce(rel.rel, 0)) - 1.0)
                 / (ln(lex.rank + 1.0) / ln(2.0))) AS dcg,
             min(CASE WHEN coalesce(rel.rel, 0) > 0 THEN lex.rank END) AS first_rel,
             avg(CASE WHEN coalesce(rel.rel, 0) > 0 THEN 1.0 ELSE 0.0 END) AS p_at_k
      FROM lex LEFT JOIN rel USING (doc_id)),
    ideal AS (
      SELECT sum((power(2.0, r) - 1.0) / (ln(rnk + 1.0) / ln(2.0))) AS idcg
      FROM (SELECT CAST(rel AS DOUBLE) AS r,
                   row_number() OVER (ORDER BY rel DESC) AS rnk
            FROM rel)
      WHERE rnk <= 10)
    SELECT round(dcg, 6) AS dcg, round(idcg, 6) AS idcg,
           round(dcg / idcg, 6) AS ndcg,
           round(coalesce(1.0 / first_rel, 0.0), 6) AS mrr,
           round(p_at_k, 6) AS p_at_k
    FROM got, ideal
    """
    ),
)
def retrieval_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline ranking-quality certificate for the BM25 top-10
    (operators/retrieval.ranking_metrics): DCG@10 / ideal-DCG@10 /
    nDCG@10 (Järvelin & Kekäläinen 2002, gain 2^rel−1), MRR, and P@10,
    against a graded judgment table derived deterministically from the
    corpus itself (rel = number of distinct query terms the document
    contains, 0–3) — the eval loop every retrieval stack needs before
    any tuning decision is trustworthy.

    Scale shape: the ranked list is a 10-row head; the judgment table
    reduces through a TakeOrderedAndProject top-k for the ideal-DCG leg
    and a broadcast join for the DCG leg, so nothing corpus-sized
    shuffles. One row out; every metric rounds to 6 before the gate."""
    from laygo_python_spark.operators.retrieval import bm25_topk, ranking_metrics, with_rank

    docs = _t(spark, sf_dir, "documents")
    ranking = with_rank(bm25_topk(docs, _QUERY_TERMS, k=10))
    rel = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
        )
        .filter(F.col("term").isin(_QUERY_TERMS))
        .groupBy("doc_id")
        .agg(F.countDistinct("term").cast("int").alias("rel"))
    )
    return ranking_metrics(ranking, rel, k=10)
