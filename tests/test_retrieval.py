"""BM25 lexical retrieval: formula differential vs a pure-Python
reference, determinism, edge cases, and the TakeOrdered plan shape.
"""

from __future__ import annotations

import math

import pytest

from laygo_python_spark.operators.retrieval import bm25_scores, bm25_topk


def _bm25_ref(corpus: dict[int, str], terms: list[str], k1=1.2, b=0.75) -> dict[int, float]:
    toks = {d: t.split(" ") for d, t in corpus.items()}
    dl = {d: len(t) for d, t in toks.items()}
    n, avgdl = len(corpus), sum(dl.values()) / len(corpus)
    out: dict[int, float] = {}
    for term in terms:
        df = sum(1 for t in toks.values() if term in t)
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, t in toks.items():
            tf = t.count(term)
            if tf:
                out[d] = out.get(d, 0.0) + idf * (tf * (k1 + 1)) / (
                    tf + k1 * (1 - b + b * dl[d] / avgdl)
                )
    return out


CORPUS = {
    0: "spark shuffle join join join",
    1: "hash join probe build",
    2: "scan filter project scan scan scan",
    3: "unrelated words entirely here now",
    4: "join hash scan join hash scan",
}


def test_bm25_matches_pure_python_reference(spark):
    df = spark.createDataFrame(list(CORPUS.items()), "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in bm25_scores(df, ["join", "hash", "scan"]).collect()}
    want = _bm25_ref(CORPUS, ["join", "hash", "scan"])
    assert set(got) == set(want)  # doc 3 (no match) is absent
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)


def test_bm25_topk_order_and_determinism(spark):
    df = spark.createDataFrame(list(CORPUS.items()), "doc_id long, text string")
    a = [tuple(r) for r in bm25_topk(df, ["join", "hash", "scan"], k=3).collect()]
    b = [tuple(r) for r in bm25_topk(df.repartition(7), ["join", "hash", "scan"], k=3).collect()]
    assert a == b and len(a) == 3
    want = _bm25_ref(CORPUS, ["join", "hash", "scan"])
    expect = sorted(want, key=lambda d: (-round(want[d], 6), d))[:3]
    assert [d for d, _ in a] == expect


def test_bm25_empty_terms_rejected(spark):
    df = spark.createDataFrame(list(CORPUS.items()), "doc_id long, text string")
    with pytest.raises(ValueError, match="at least one query term"):
        bm25_scores(df, [])


def test_bm25_unseen_term_contributes_nothing(spark):
    df = spark.createDataFrame(list(CORPUS.items()), "doc_id long, text string")
    base = {r["doc_id"]: r["score"] for r in bm25_scores(df, ["join"]).collect()}
    plus = {r["doc_id"]: r["score"] for r in bm25_scores(df, ["join", "zzz_absent"]).collect()}
    assert base == pytest.approx(plus)


def test_bm25_topk_plans_as_take_ordered(spark, sf_dir):
    from laygo_python_spark.plans import physical_plan
    from laygo_python_spark.session import read_table

    plan = physical_plan(bm25_topk(read_table(spark, sf_dir, "documents"), ["join"], k=10))
    assert "TakeOrderedAndProject" in plan  # per-partition heaps, no global sort


# ---------------------------------------------------------------- RRF


def test_rrf_fuse_known_values(spark):
    from laygo_python_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    den = spark.createDataFrame([(2, 1), (4, 2)], "doc_id long, rank int")
    rows = {r["doc_id"]: r for r in rrf_fuse([lex, den], k=10).collect()}
    assert rows[2]["rrf_score"] == round(1 / 62 + 1 / 61, 6)
    assert rows[2]["n_lists"] == 2
    assert rows[1]["rrf_score"] == round(1 / 61, 6)
    assert rows[4]["n_lists"] == 1
    # doc 2 (in both lists) outranks everything
    assert rows[2]["rank"] == 1
    # tie between doc 1 (lex rank 1) and doc 4 (dense... 1/61 vs 1/62):
    # doc 1 at 1/61 beats doc 4 at 1/62, doc 3 last
    assert rows[1]["rank"] == 2 and rows[4]["rank"] == 3 and rows[3]["rank"] == 4


def test_rrf_fuse_tie_breaks_on_id(spark):
    from laygo_python_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(7, 1), (3, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(3, 1), (7, 2)], "doc_id long, rank int")
    out = rrf_fuse([a, b], k=10).collect()
    # identical fused scores -> lower doc_id first
    assert [r["doc_id"] for r in out] == [3, 7]
    assert out[0]["rrf_score"] == out[1]["rrf_score"]


def test_rrf_fuse_validation(spark):
    from laygo_python_spark.operators.retrieval import rrf_fuse

    with pytest.raises(ValueError, match="at least one ranking"):
        rrf_fuse([])


def test_ranking_metrics_known_values(spark):
    import math

    from laygo_python_spark.operators.retrieval import ranking_metrics

    # ranked list: ranks 1..3 with relevance 0, 2, 1; one unranked doc
    # with relevance 3 (belongs in the ideal head).
    ranking = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], "doc_id long, rank int")
    rel = spark.createDataFrame([(11, 2), (12, 1), (99, 3)], "doc_id long, rel int")
    row = ranking_metrics(ranking, rel, k=3).collect()[0]
    dcg = (2**2 - 1) / math.log2(3) + (2**1 - 1) / math.log2(4)
    idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3) + (2**1 - 1) / math.log2(4)
    assert row["dcg"] == pytest.approx(dcg, abs=1e-6)
    assert row["idcg"] == pytest.approx(idcg, abs=1e-6)
    assert row["ndcg"] == pytest.approx(dcg / idcg, abs=1e-6)
    assert row["mrr"] == pytest.approx(1 / 2, abs=1e-6)  # first relevant at rank 2
    assert row["p_at_k"] == pytest.approx(2 / 3, abs=1e-6)


def test_ranking_metrics_perfect_ranking(spark):
    from laygo_python_spark.operators.retrieval import ranking_metrics

    ranking = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    rel = spark.createDataFrame([(1, 3), (2, 1)], "doc_id long, rel int")
    row = ranking_metrics(ranking, rel, k=2).collect()[0]
    assert row["ndcg"] == pytest.approx(1.0, abs=1e-9)
    assert row["mrr"] == 1.0 and row["p_at_k"] == 1.0


def test_ranking_metrics_nothing_relevant(spark):
    from laygo_python_spark.operators.retrieval import ranking_metrics

    ranking = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    rel = spark.createDataFrame([], "doc_id long, rel int")
    row = ranking_metrics(ranking, rel, k=2).collect()[0]
    assert row["dcg"] == 0.0 and row["mrr"] == 0.0 and row["p_at_k"] == 0.0
    # no judgments at all -> idcg undefined (NULL), pinned not invented
    assert row["idcg"] is None and row["ndcg"] is None


def test_with_rank_orders_and_tiebreaks(spark):
    from laygo_python_spark.operators.retrieval import with_rank

    df = spark.createDataFrame(
        [(1, 2.0), (2, 3.0), (3, 2.0)], "doc_id long, score double"
    )
    out = with_rank(df).orderBy("rank").collect()
    assert [(r["doc_id"], r["rank"]) for r in out] == [(2, 1), (1, 2), (3, 3)]


def test_ranking_metrics_filters_ranking_to_k(spark):
    """Metrics are @k by construction (r9 advice): a ranking longer than
    k must be truncated inside the function, so nDCG cannot exceed 1 and
    P@k counts exactly k slots."""
    import math

    from laygo_python_spark.operators.retrieval import ranking_metrics

    # 4 ranked docs, k=2: ranks 3-4 (both relevant) must NOT count.
    ranking = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3), (4, 4)], "doc_id long, rank int"
    )
    rel = spark.createDataFrame([(2, 1), (3, 3), (4, 2)], "doc_id long, rel int")
    row = ranking_metrics(ranking, rel, k=2).collect()[0]
    dcg = (2**1 - 1) / math.log2(3)                       # only rank-2 doc counts
    idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3)
    assert row["dcg"] == pytest.approx(dcg, abs=1e-6)
    assert row["idcg"] == pytest.approx(idcg, abs=1e-6)
    assert row["ndcg"] == pytest.approx(dcg / idcg, abs=1e-6)
    assert row["ndcg"] <= 1.0
    assert row["p_at_k"] == pytest.approx(1 / 2, abs=1e-6)  # 1 relevant of k=2
    assert row["mrr"] == pytest.approx(1 / 2, abs=1e-6)
