"""Lexical retrieval — BM25 scoring and top-k search over a document
corpus, the keyword complement of the embedding-ANN family
(operators/similarity.py, ivf.py, pq.py): a training-data pipeline uses
it for targeted corpus probes ("find the docs about X"), seed-set
expansion for classifier labels, and benchmark-contamination checks by
keyword, anywhere a dense index is overkill or unavailable.

Okapi BM25 (Robertson & Zaragoza 2009, public) with the standard
non-negative idf = ln(1 + (N - df + 0.5)/(df + 0.5)) and the usual
k1/b defaults (1.2 / 0.75).

Scale shape: tokenization is one map-only explode; document length and
the query-term postings are two combiner-compressed aggregations; N and
avgdl ride as broadcast 1-row aggregates. The per-term work is
proportional to the POSTINGS of the query terms (the explode filters to
the query vocabulary before any shuffle), not the corpus vocabulary —
the classic inverted-index access pattern expressed relationally, so
Catalyst sees an aggregation pipeline it can partial-aggregate
map-side. No Python, no UDF; every expression codegens.

Reference parity: the reference engine (ringoldsdev/laygo-python) has
no text-retrieval surface; this is uplift in the corpus-tooling family
(SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, score) — BM25 of every document that matches at least one
    query term (docs matching none are absent: score 0 is the floor and
    carries no ranking information; emitting |corpus| zero rows would
    defeat the postings-proportional cost shape)."""
    if not terms:
        raise ValueError("bm25_scores: need at least one query term")
    tok = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    # N and avgdl are one tiny aggregate over the |V|-row length table,
    # broadcast into the scoring join.
    stats = F.broadcast(
        dl.agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
        )
    )
    tf = (
        tok.filter(F.col("term").isin([str(t) for t in terms]))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    # document frequency per query term — tf is already one row per
    # (doc, term), so a plain count is the distinct-doc count.
    df_t = F.broadcast(
        tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    )
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * (F.col("tf") * F.lit(k1 + 1.0)) / norm
    return (
        tf.join(df_t, "term")
        .join(dl, id_col)
        .crossJoin(stats)
        .select(F.col(id_col), contrib.alias("c"))
        .groupBy(id_col)
        .agg(F.sum("c").alias("score"))
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k (id, score) by BM25, deterministic ordering (score rounded
    to 6 places desc, id asc tiebreak — rounding BEFORE ranking keeps
    the rank cross-engine stable where raw double sums could differ in
    the last ulp). Plans as TakeOrderedAndProject: per-partition heaps
    merge k-row heads on the driver, never a global sort."""
    scored = bm25_scores(docs, terms, k1, b, id_col, text_col)
    return (
        scored.select(id_col, F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
