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

from functools import reduce

from pyspark.sql import DataFrame, Window
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


def with_rank(
    ranking: DataFrame,
    score_col: str = "score",
    id_col: str = "doc_id",
    ascending: bool = False,
) -> DataFrame:
    """Attach a dense 1-based ``rank`` column (score order, id
    tiebreak). Meant for the SMALL top-k head of a retrieval list —
    the single-partition window is over k rows, never the corpus."""
    order = F.asc(score_col) if ascending else F.desc(score_col)
    w = Window.orderBy(order, F.asc(id_col))
    return ranking.withColumn("rank", F.row_number().over(w).cast("int"))


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    k_rrf: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    of N retrieval lists — the standard hybrid-retrieval combiner (e.g.
    lexical BM25 + dense cosine): each list contributes
    1/(k_rrf + rank) per document, missing documents contribute 0, and
    the fused score is the sum.

    Inputs are (id, rank) frames — the TOP-K HEADS of their retrievers,
    so every frame here is tiny regardless of corpus size; the fusion
    itself is a union + one aggregation over ≤ N·k rows. Rank is
    integer, so each contribution is the identical double in any
    engine; a document appears in ≤ N lists, and the fused score is
    rounded to 6 before the final ordering (round-then-rank), so the
    output order is cross-engine exact. Returns
    (id, rrf_score, n_lists, rank)."""
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    contribs = [
        r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("rank"))).alias("c"),
        )
        for r in rankings
    ]
    fused = (
        reduce(lambda a, b: a.unionByName(b), contribs)
        .groupBy(id_col)
        .agg(
            F.round(F.sum("c"), 6).alias("rrf_score"),
            F.count(F.lit(1)).cast("int").alias("n_lists"),
        )
    )
    w = Window.orderBy(F.desc("rrf_score"), F.asc(id_col))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def ranking_metrics(
    ranking: DataFrame,
    relevance: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    rel_col: str = "rel",
) -> DataFrame:
    """Offline retrieval-quality metrics for ONE ranked list against a
    graded relevance table: DCG@k, ideal DCG@k (from the BEST k
    relevance grades in the whole judgment table — true nDCG, not
    local-reorder nDCG), nDCG@k, MRR (first rank with rel > 0), and
    P@k (fraction of the k with rel > 0). One row out.

    ``ranking`` is filtered to rank <= k INSIDE this function (r9
    advice: a caller passing a longer ranking previously got DCG@N vs
    IDCG@k, letting nDCG exceed 1 and mislabeling P@k), so every metric
    is @k by construction; ``relevance`` may be corpus-sized — the
    ideal-DCG side reduces it with a TakeOrderedAndProject top-k
    (per-partition heaps, no global sort) and the join side broadcasts
    the ≤k-row ranking, so nothing corpus-sized shuffles. ``relevance``
    must be unique per id (a judgment table) — duplicate ids would
    double-join ranked rows.
    Standard formulas (Järvelin & Kekäläinen 2002): gain = 2^rel - 1,
    discount = log2(rank + 1)."""
    ranked = (
        ranking.filter(F.col("rank") <= k)
        .select(id_col, "rank")
        .join(relevance.select(id_col, rel_col), id_col, "left")
    )
    gain = F.pow(F.lit(2.0), F.coalesce(F.col(rel_col), F.lit(0)).cast("double")) - 1.0
    # log2 spelled as ln(x)/ln(2) in BOTH engines (one libm call and one
    # division), not a log2 builtin whose formula could differ.
    disc = F.log(F.col("rank").cast("double") + 1.0) / F.log(F.lit(2.0))
    got = ranked.agg(
        F.sum(gain / disc).alias("dcg"),
        F.min(F.when(F.coalesce(F.col(rel_col), F.lit(0)) > 0, F.col("rank"))).alias(
            "first_rel"
        ),
        F.avg((F.coalesce(F.col(rel_col), F.lit(0)) > 0).cast("double")).alias("p_at_k"),
    )
    ideal = (
        relevance.select(F.col(rel_col).cast("double").alias("r"))
        .orderBy(F.desc("r"))
        .limit(k)
        .withColumn("rank", F.row_number().over(Window.orderBy(F.desc("r"))))
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("r")) - 1.0)
                / (F.log(F.col("rank").cast("double") + 1.0) / F.log(F.lit(2.0)))
            ).alias("idcg")
        )
    )
    return got.crossJoin(F.broadcast(ideal)).select(
        F.round("dcg", 6).alias("dcg"),
        F.round("idcg", 6).alias("idcg"),
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("first_rel"), F.lit(0.0)), 6
        ).alias("mrr"),
        F.round("p_at_k", 6).alias("p_at_k"),
    )
