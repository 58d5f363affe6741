"""bfs_hops / triangle_count (operators/graph.py) vs in-test pure-Python
models — the differential-model style used by the pagerank/dedup tests.
"""

from __future__ import annotations

from itertools import combinations

import pytest

from pyspark.sql import functions as F

from laygo_python_spark.operators.graph import bfs_hops, triangle_count


def _bfs_model(edges, sources, max_hops):
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    hops = {s: 0 for s in sources}
    frontier = set(sources)
    for k in range(1, max_hops + 1):
        frontier = {v for u in frontier for v in adj.get(u, ())} - hops.keys()
        for v in frontier:
            hops[v] = k
        if not frontier:
            break
    return hops


def _tri_model(edges):
    canon = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    nodes = {n for e in canon for n in e}
    counts = dict.fromkeys(nodes, 0)
    for a, b, c in combinations(sorted(nodes), 3):
        if {(a, b), (b, c), (a, c)} <= canon:
            counts[a] += 1
            counts[b] += 1
            counts[c] += 1
    return counts


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_bfs_matches_model_on_directed_graph(spark):
    #     1 -> 2 -> 3 -> 4 -> 5 (chain) plus a shortcut 1 -> 4 and a
    # back-edge 5 -> 1; node 9 unreachable from 1.
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4), (5, 1), (9, 1)]
    src = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_hops(_df(spark, edges), src, max_hops=4).collect()}
    assert got == _bfs_model(edges, [1], 4)
    assert got[4] == 1  # direct shortcut wins over the 3-hop chain path
    assert 9 not in got  # out-edge only; never reached


def test_bfs_hop_cap_truncates(spark):
    edges = [(i, i + 1) for i in range(6)]
    src = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_hops(_df(spark, edges), src, max_hops=2).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_bfs_multi_source_takes_nearest(spark):
    edges = [(1, 2), (2, 3), (3, 4), (10, 4)]
    src = spark.createDataFrame([(1,), (10,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_hops(_df(spark, edges), src, max_hops=4).collect()}
    assert got[4] == 1  # via 10, not the 3-hop path via 1


def test_bfs_early_exit_on_exhausted_frontier(spark):
    # Component exhausted after 1 hop; max_hops=10 must not loop 10 rounds
    # of empty work (behavioral check: result is still correct).
    edges = [(1, 2), (2, 1)]
    src = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_hops(_df(spark, edges), src, max_hops=10).collect()}
    assert got == {1: 0, 2: 1}


def test_triangles_match_model_incl_zero_nodes(spark):
    # K4 on {1..4} (every node in C(3,3 of its peers)=3 triangles), a
    # pendant node 5, and an isolated edge 6-7 (both zero-triangle).
    edges = [(a, b) for a, b in combinations([1, 2, 3, 4], 2)] + [(4, 5), (6, 7)]
    got = {r["node"]: r["n_triangles"] for r in triangle_count(_df(spark, edges)).collect()}
    want = _tri_model(edges)
    assert got == want
    assert got[1] == 3 and got[5] == 0 and got[6] == 0


def test_triangles_canonicalize_dupes_loops_orientations(spark):
    # Same triangle fed as duplicates, reversed orientations, and a
    # self-loop: counts once per node.
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (2, 2), (1, 2)]
    got = {r["node"]: r["n_triangles"] for r in triangle_count(_df(spark, edges)).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangles_on_random_graph(spark):
    # Deterministic pseudo-random graph: hash-derived edge set, dense
    # enough for hub nodes to exercise the degree orientation.
    edges = [
        (a, b)
        for a in range(1, 25)
        for b in range(1, 25)
        if a < b and (a * 7919 + b * 104729) % 5 < 2
    ]
    got = {r["node"]: r["n_triangles"] for r in triangle_count(_df(spark, edges)).collect()}
    assert got == _tri_model(edges)
    assert sum(got.values()) % 3 == 0 and sum(got.values()) > 0


def test_triangles_empty_and_triangle_free(spark):
    empty = triangle_count(_df(spark, []).filter(F.lit(False)))
    assert empty.count() == 0
    # Bipartite graphs are triangle-free: every count is 0.
    star = [(0, i) for i in range(1, 6)]
    got = {r["node"]: r["n_triangles"] for r in triangle_count(_df(spark, star)).collect()}
    assert set(got.values()) == {0}


def _kcore_model(edges, k):
    """Reference fixpoint peeling on a python adjacency map."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    return {n: len(nb) for n, nb in adj.items() if nb}


def test_kcore_fixpoint_matches_model(spark):
    from laygo_python_spark.operators.graph import kcore

    # A 4-clique (3-core) with a pendant path hanging off it, plus a
    # disjoint triangle (2-core, dies at k=3) — peeling must cascade
    # down the path and erase the triangle.
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6), (7, 8), (8, 9), (7, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r["node"], r["deg"]) for r in kcore(df, k=3).collect()}
    want = {(n, d) for n, d in _kcore_model(edges, 3).items()}
    assert got == want == {(1, 3), (2, 3), (3, 3), (4, 3)}


def test_kcore_bounded_rounds_monotone(spark):
    from laygo_python_spark.operators.graph import kcore

    # A long path: each k=2 peel round removes both current endpoints,
    # so survivors shrink monotonically with rounds and never dip below
    # the fixpoint (empty — a path has no 2-core).
    edges = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    sizes = [kcore(df, k=2, rounds=r).count() for r in (1, 2, 3)]
    assert sizes == sorted(sizes, reverse=True) and sizes[0] > sizes[-1]
    assert kcore(df, k=2).count() == 0  # fixpoint: no 2-core in a path


def test_kcore_validation(spark):
    from laygo_python_spark.operators.graph import kcore
    import pytest as _pytest

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with _pytest.raises(ValueError, match="k must be"):
        kcore(df, k=0)


# ------------------------------------------------- label propagation


def test_label_propagation_two_components_converge(spark):
    from laygo_python_spark.operators.graph import label_propagation

    # two triangles, disjoint: each converges to its own min label.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)],
        "src long, dst long",
    )
    got = {r["node"]: r["label"] for r in label_propagation(edges, rounds=2).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_label_propagation_majority_wins_over_min(spark):
    from laygo_python_spark.operators.graph import label_propagation

    # node 100 has neighbors {2, 3, 4}; after round 1 all three carry
    # label 1 (hub 1 connects them)... build a direct majority case:
    # neighbors of 50 are {7, 8, 9}; 7 and 8 are mutually connected so
    # keep each other's min, 9 is isolated otherwise.
    edges = spark.createDataFrame(
        [(7, 8), (50, 7), (50, 8), (50, 9)], "src long, dst long"
    )
    one = {r["node"]: r["label"] for r in label_propagation(edges, rounds=1).collect()}
    # round 1: 50's neighbor labels are {7, 8, 9} -> tie -> min = 7;
    # 7's neighbors {8, 50} -> min 8; 8's -> {7,50} -> 7; 9's -> {50} -> 50
    assert one == {50: 7, 7: 8, 8: 7, 9: 50}
    two = {r["node"]: r["label"] for r in label_propagation(edges, rounds=2).collect()}
    # round 2: 50 sees labels {8 (from 7), 7 (from 8), 50 (from 9)} ->
    # tie of singletons -> 7; 9 sees only 50's label 7 -> 7.
    assert two[9] == 7 and two[50] == 7


def test_label_propagation_deterministic_across_partitionings(spark):
    from laygo_python_spark.operators.graph import label_propagation

    edges = [(i, i + 1) for i in range(1, 30)] + [(5, 25), (2, 17)]
    a = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    b = spark.createDataFrame(edges, "src long, dst long").repartition(13)
    ra = sorted(map(tuple, label_propagation(a, rounds=3).collect()))
    rb = sorted(map(tuple, label_propagation(b, rounds=3).collect()))
    assert ra == rb


def test_label_propagation_validation(spark):
    from laygo_python_spark.operators.graph import label_propagation

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="rounds"):
        label_propagation(edges, rounds=0)
