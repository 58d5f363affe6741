"""pagerank (operators/pagerank.py) vs an in-test pure-Python power
iteration — the differential-model style the join/dedup operators use.
"""

from __future__ import annotations

import pytest

from laygo_python_spark.operators.pagerank import pagerank


def _model(edges, iters=5, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    out = {u: 0 for u in nodes}
    for u, _ in edges:
        out[u] += 1
    r = {u: 1.0 / len(nodes) for u in nodes}
    for _ in range(iters):
        nxt = {u: (1 - d) / len(nodes) for u in nodes}
        for u, v in edges:
            nxt[v] += d * r[u] / out[u]
        r = nxt
    return r


def test_pagerank_matches_python_model(spark):
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (2, 4), (4, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["pr"] for r in pagerank(df, iterations=5).collect()}
    want = _model(edges)
    assert set(got) == set(want)
    assert all(abs(got[k] - want[k]) < 1e-12 for k in want)


def test_pagerank_dangling_node_keeps_receiving(spark):
    # 2 has no out-edges: it must still appear with rank >= (1-d)/N, and
    # the run must not error (contribution join just has no rows for it).
    df = spark.createDataFrame([(1, 2), (3, 2), (3, 1)], "src long, dst long")
    got = {r["node"]: r["pr"] for r in pagerank(df, iterations=3).collect()}
    want = _model([(1, 2), (3, 2), (3, 1)], iters=3)
    assert set(got) == {1, 2, 3}
    assert all(abs(got[k] - want[k]) < 1e-12 for k in want)
    assert got[2] > got[3]  # sink accumulates, pure source decays


def test_pagerank_repeated_calls_agree(spark):
    # Deterministic across invocations (fresh persists each call — the
    # operator unpersists its edge/node caches in a finally block;
    # localCheckpoint blocks are released by driver GC, not leaked
    # explicit persists).
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    a = sorted(map(tuple, pagerank(df, iterations=4).collect()))
    b = sorted(map(tuple, pagerank(df, iterations=4).collect()))
    assert a == b


def test_pagerank_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    out = pagerank(df, iterations=3)
    assert out.columns == ["node", "pr"]
    assert out.count() == 0


def test_weighted_pagerank_matches_model(spark):
    edges = [(1, 2, 3.0), (1, 3, 1.0), (2, 3, 2.0), (3, 1, 1.0)]

    def model(iters=4, d=0.85):
        nodes = {1, 2, 3}
        out = {u: sum(w for a, _, w in edges if a == u) for u in nodes}
        r = {u: 1 / 3 for u in nodes}
        for _ in range(iters):
            nxt = {u: (1 - d) / 3 for u in nodes}
            for u, v, w in edges:
                nxt[v] += d * r[u] * w / out[u]
            r = nxt
        return r

    df = spark.createDataFrame(edges, "src long, dst long, wt double")
    got = {r["node"]: r["pr"] for r in pagerank(df, iterations=4, weight="wt").collect()}
    want = model()
    assert all(abs(got[k] - want[k]) < 1e-12 for k in want)
    # weight=None must equal the unweighted model (all weights 1).
    un = {r["node"]: r["pr"] for r in pagerank(df.drop("wt"), iterations=4).collect()}
    assert un != got  # weights actually change the answer on this graph


def test_personalized_pagerank_matches_model(spark):
    """PPR on a small directed graph vs a plain-python power iteration:
    teleport and init restricted to the source set; non-source ranks
    decay toward pure link-derived mass."""
    from laygo_python_spark.operators.pagerank import pagerank

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    srcs = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["pr"] for r in pagerank(df, iterations=4, sources=srcs).collect()}

    from collections import defaultdict
    out = defaultdict(list)
    deg = defaultdict(int)
    for a, b in edges:
        out[a].append(b)
        deg[a] += 1
    nodes = {n for e in edges for n in e}
    r = {n: (1.0 if n == 1 else 0.0) for n in nodes}
    for _ in range(4):
        nxt = {n: (0.15 if n == 1 else 0.0) for n in nodes}
        for u in nodes:
            for v in out[u]:
                nxt[v] += 0.85 * r[u] / deg[u]
        r = nxt
    for n in nodes:
        assert abs(got[n] - r[n]) < 1e-12, (n, got[n], r[n])


def test_personalized_pagerank_empty_sources_raises(spark):
    import pytest as _pytest
    from laygo_python_spark.operators.pagerank import pagerank

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    empty = spark.createDataFrame([], "node long")
    with _pytest.raises(ValueError, match="non-empty source set"):
        pagerank(df, sources=empty)


def test_sparse_personalized_equals_dense(spark):
    # sparse mode must equal the dense personalized ranks restricted to
    # pr > 0 — on a graph where the 2-round ball does NOT cover all
    # nodes, so the sparsity is actually exercised.
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7)]
    sym = edges + [(b, a) for a, b in edges]
    df = spark.createDataFrame(sym, "src long, dst long")
    srcs = spark.createDataFrame([(1,)], "node long")
    dense = {
        r["node"]: r["pr"]
        for r in pagerank(df, iterations=2, sources=srcs).collect()
        if r["pr"] > 0
    }
    sparse = {
        r["node"]: r["pr"]
        for r in pagerank(
            df, iterations=2, sources=srcs, symmetric=True, sparse=True
        ).collect()
    }
    assert sparse == pytest.approx(dense)
    assert set(sparse) == {1, 2, 3}  # the 2-hop ball only


def test_sparse_requires_sources(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="sparse"):
        pagerank(df, sparse=True)


def test_sparse_drops_out_of_graph_sources_like_dense(spark):
    # r7 advice: a source node absent from the graph must be DROPPED in
    # sparse mode exactly as the dense broadcast-flag join drops it —
    # previously sparse emitted a teleport-only row for it. n_s stays the
    # full source-set count in both modes, so surviving ranks agree too.
    edges = [(1, 2), (2, 3)]
    sym = edges + [(b, a) for a, b in edges]
    df = spark.createDataFrame(sym, "src long, dst long")
    srcs = spark.createDataFrame([(1,), (99,)], "node long")  # 99 not in graph
    dense = {
        r["node"]: r["pr"]
        for r in pagerank(df, iterations=2, sources=srcs).collect()
        if r["pr"] > 0
    }
    sparse = {
        r["node"]: r["pr"]
        for r in pagerank(
            df, iterations=2, sources=srcs, symmetric=True, sparse=True
        ).collect()
    }
    assert 99 not in sparse
    assert sparse == pytest.approx(dense)


def test_symmetric_fold_base_null_weights_fall_back_to_teleport(spark):
    # r7 advice: with symmetric=True (fold_base path) a node whose ONLY
    # incoming contributions are null (null weight -> deg null -> c null)
    # must get the teleport base (1-d)/N, matching the dense path's
    # coalesce — not a null pr.
    sym = [(1, 2, None), (2, 1, None), (1, 3, 1.0), (3, 1, 1.0)]
    df = spark.createDataFrame(sym, "src long, dst long, w double")
    got = {
        r["node"]: r["pr"]
        for r in pagerank(df, iterations=2, weight="w", symmetric=True).collect()
    }
    dense = {
        r["node"]: r["pr"]
        for r in pagerank(df, iterations=2, weight="w", symmetric=False).collect()
    }
    assert all(v is not None for v in got.values())
    assert got == pytest.approx(dense)


def test_sparse_ppr_drops_nodes_reached_only_via_null_weights(spark):
    # r8 review: a node whose ONLY path carries a null weight must not
    # surface as a NULL-pr row in sparse mode — dense coalesces the same
    # case to 0.0 and the sparse contract emits only pr > 0 nodes.
    sym = [(1, 2, 1.0), (2, 1, 1.0), (2, 3, None), (3, 2, None)]
    df = spark.createDataFrame(sym, "src long, dst long, w double")
    srcs = spark.createDataFrame([(1,)], "node long")
    rows = pagerank(
        df, iterations=2, weight="w", sources=srcs, symmetric=True, sparse=True
    ).collect()
    assert all(r["pr"] is not None for r in rows)
    assert 3 not in {r["node"] for r in rows}


def test_zero_sum_weights_do_not_crash_under_ansi(spark):
    # Spark 4 defaults spark.sql.ansi.enabled=true, where x/0 is a
    # job-killing SparkArithmeticException — a source whose weights sum
    # to exactly zero must distribute no mass instead (same treatment
    # as null weights), in BOTH the dense and symmetric paths.
    sym = [(1, 2, 1.0), (1, 3, -1.0), (2, 1, 1.0), (3, 1, 1.0)]
    df = spark.createDataFrame(sym, "src long, dst long, w double")
    dense = {r["node"]: r["pr"] for r in pagerank(df, iterations=2, weight="w").collect()}
    symm = {
        r["node"]: r["pr"]
        for r in pagerank(df, iterations=2, weight="w", symmetric=True).collect()
    }
    assert all(v is not None for v in dense.values())
    assert symm == pytest.approx(dense)
