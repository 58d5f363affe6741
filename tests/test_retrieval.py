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
