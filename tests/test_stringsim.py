"""edit_distance_pairs (operators/stringsim.py) — PassJoin-style segment
filtering must lose NO pair vs brute force, including insert/delete pairs
where segment positions shift.
"""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from laygo_python_spark.operators.stringsim import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


def _truth(data: list[tuple[int, str]], d: int) -> list[tuple[int, int, int]]:
    out = []
    for (ia, sa), (ib, sb) in itertools.combinations(data, 2):
        if (len(sa), ia) > (len(sb), ib):
            (ia, sa), (ib, sb) = (ib, sb), (ia, sa)
        dist = _lev(sa, sb)
        if dist <= d:
            out.append((ia, ib, dist))
    return sorted(out)


def test_known_pairs_with_indels(spark):
    data = [(1, "kitten"), (2, "sitten"), (3, "sittin"), (4, "kitty"),
            (5, "mitten"), (6, "kittens"), (7, "itten"), (8, "abc")]
    df = spark.createDataFrame(data, "id int, s string")
    got = sorted((r.id_a, r.id_b, r.dist) for r in edit_distance_pairs(df, "id", "s", 1).collect())
    assert got == _truth(data, 1)


@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=2, max_size=8), min_size=2, max_size=14, unique=True
    ),
    d=st.integers(min_value=1, max_value=2),
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_matches_bruteforce_on_random_strings(spark, words, d):
    """Tiny alphabet ('abc') makes near-pairs common — the adversarial
    case for candidate filtering. The join must equal brute force."""
    data = list(enumerate(words))
    df = spark.createDataFrame(data, "id int, s string")
    got = sorted((r.id_a, r.id_b, r.dist) for r in edit_distance_pairs(df, "id", "s", d).collect())
    assert got == _truth(data, d)


def test_fastss_equals_passjoin_on_shared_prefix_corpus(spark):
    """The r2-bench degenerate shape: every string shares a long prefix,
    so every PassJoin segment-0 key is one hot bucket. Both strategies
    must return the identical exact result; fastss must also handle
    empty/short strings (no degenerate-length special case needed)."""
    data = [(i, f"Customer#{i:04d}") for i in range(60)] + [
        (100, ""), (101, "a"), (102, "ab"), (103, "Customer#0001x")
    ]
    df = spark.createDataFrame(data, "id int, s string")
    fast = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(df, "id", "s", 1, strategy="fastss").collect()
    )
    passj = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(df, "id", "s", 1, strategy="passjoin").collect()
    )
    assert fast == passj == _truth(data, 1)


def test_sorted_neighborhood_linear_output_and_adjacency(spark):
    from laygo_python_spark.operators.stringsim import sorted_neighborhood_pairs

    rows = [(i, f"user_{i:04d}") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, name string").repartition(7)
    pairs = sorted_neighborhood_pairs(df, "id", "name", window=4).collect()
    # Exactly n*(w-1) - (1+2+...+(w-1)) pairs: linear, skew-independent.
    assert len(pairs) == 100 * 3 - (1 + 2 + 3)
    # Adjacency respects the (name, id) sort order: zero-padded names
    # sort like ids, so every pair's gap equals the id difference.
    assert all(r["id_b"] - r["id_a"] == r["rank_gap"] for r in pairs)


def test_sorted_neighborhood_skewed_keys_stay_linear(spark):
    from laygo_python_spark.operators.stringsim import sorted_neighborhood_pairs

    # 1000 IDENTICAL keys — the equi-join blockers' worst case (one
    # bucket, ~500k pairs); sorted-neighborhood must still emit ~2/row.
    df = spark.createDataFrame([(i, "same") for i in range(1000)], "id long, name string")
    n = sorted_neighborhood_pairs(df, "id", "name", window=3).count()
    assert n == 1000 * 2 - (1 + 2)


def test_sorted_neighborhood_validation(spark):
    import pytest as _pytest
    from laygo_python_spark.operators.stringsim import sorted_neighborhood_pairs

    df = spark.createDataFrame([(1, "a")], "id long, name string")
    with _pytest.raises(ValueError, match="window must be"):
        sorted_neighborhood_pairs(df, "id", "name", window=1)
