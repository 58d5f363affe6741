"""Semantic dedup (operators/semdedup.py) — keep-rule equivalence
against a brute-force numpy reference, determinism, and the
cluster-cap guard."""

from __future__ import annotations

import numpy as np
import pytest

from laygo_python_spark.operators.semdedup import semantic_dedup


def _mk_corpus(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _ref_keep(vecs, centroids, threshold):
    """Scalar reference: nearest cell by ||c||²-2x·c (ties to lowest
    cell), drop iff a lower-id same-cell vector clears the threshold."""
    X = np.asarray(vecs, dtype=np.float64)
    d2 = (centroids**2).sum(axis=1)[None, :] - 2.0 * X @ centroids.T
    cell = d2.argmin(axis=1)
    keep = []
    for i in range(len(X)):
        ok = True
        for j in range(i):
            if cell[j] != cell[i]:
                continue
            a, b = X[i], X[j]
            sim = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
            if sim >= threshold:
                ok = False
                break
        keep.append(ok)
    return cell, keep


def test_matches_bruteforce_reference(spark):
    rng = np.random.default_rng(17)
    base = rng.normal(size=(12, 8))
    # implant duplicate groups: near-copies of vectors 0 and 3
    vecs = np.concatenate([base, base[0:1] + 0.01, base[3:4] * 1.5, base[0:1] * -1.0])
    cent = rng.normal(size=(3, 8))
    got = {
        r.vec_id: (r.cell, r.keep)
        for r in semantic_dedup(
            _mk_corpus(spark, vecs), threshold=0.9, centroids=cent
        ).collect()
    }
    cell, keep = _ref_keep(vecs, cent, 0.9)
    assert len(got) == len(vecs)
    for i in range(len(vecs)):
        assert got[i] == (cell[i], keep[i]), i
    # the implanted near-copies landed in their source's cell and were dropped
    assert got[12][1] is False or cell[12] != cell[0]
    assert got[13][1] is False or cell[13] != cell[3]
    # anti-parallel copy has sim -1: never a duplicate
    assert got[14][1] is True


def test_trained_path_and_all_kept_when_orthogonal(spark):
    # orthogonal unit vectors: nothing clears any positive threshold
    vecs = np.eye(6)
    out = semantic_dedup(_mk_corpus(spark, vecs), threshold=0.5, n_clusters=2).collect()
    assert len(out) == 6 and all(r.keep for r in out)


def test_max_cluster_cap_keeps_remainder(spark):
    # 5 identical vectors, one cluster; cap=3 → only ids 0,1,2 pair up:
    # 0 kept, 1,2 dropped, 3,4 KEPT (outside the cap, not silently dropped)
    vecs = np.tile(np.arange(1.0, 5.0), (5, 1))
    cent = np.array([[1.0, 2.0, 3.0, 4.0], [-9.0, -9.0, -9.0, -9.0]])
    got = {
        r.vec_id: r.keep
        for r in semantic_dedup(
            _mk_corpus(spark, vecs), threshold=0.99, centroids=cent, max_cluster=3
        ).collect()
    }
    assert got == {0: True, 1: False, 2: False, 3: True, 4: True}


def test_deterministic_across_runs(spark):
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(30, 16))
    cent = rng.normal(size=(4, 16))
    df = _mk_corpus(spark, vecs)
    a = sorted(map(tuple, semantic_dedup(df, 0.4, centroids=cent).collect()))
    b = sorted(map(tuple, semantic_dedup(df, 0.4, centroids=cent).collect()))
    assert a == b


# --------------------------------------------- semantic contamination


def test_semantic_contamination_flags_planted_leak(spark):
    from laygo_python_spark.operators.semdedup import semantic_contamination

    dim = 4
    ev = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (1, [0.99, 0.01, 0.0, 0.0]),   # leak of eval 100
            (2, [0.0, 0.0, 1.0, 0.0]),     # orthogonal to both
            (3, [0.0, 0.98, 0.0, 0.02]),   # leak of eval 101
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["eval_id"], r["sim"])
        for r in semantic_contamination(corpus, ev, threshold=0.9).collect()
    }
    assert set(got) == {1, 3}
    assert got[1][0] == 100 and got[1][1] > 0.99
    assert got[3][0] == 101 and got[3][1] > 0.97


def test_semantic_contamination_tie_breaks_min_eval_id(spark):
    from laygo_python_spark.operators.semdedup import semantic_contamination

    v = [0.5, 0.5, 0.0]
    ev = spark.createDataFrame(
        [(200, v), (100, v)], "vec_id long, embedding array<double>"
    )
    corpus = spark.createDataFrame([(1, v)], "vec_id long, embedding array<double>")
    rows = semantic_contamination(corpus, ev, threshold=0.5).collect()
    assert len(rows) == 1 and rows[0]["eval_id"] == 100


def test_semantic_contamination_empty_below_threshold(spark):
    from laygo_python_spark.operators.semdedup import semantic_contamination

    ev = spark.createDataFrame([(9, [1.0, 0.0])], "vec_id long, embedding array<double>")
    corpus = spark.createDataFrame([(1, [0.0, 1.0])], "vec_id long, embedding array<double>")
    assert semantic_contamination(corpus, ev, threshold=0.5).count() == 0
