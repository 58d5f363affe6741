"""Mergeable moment statistics — per-shard (n, sum, M2) summaries merged
into exact global mean/variance.

The 100 TB shape for corpus statistics: each shard/partition/day emits a
THREE-NUMBER summary; summaries merge associatively (Chan, Golub &
LeVeque 1983 pairwise update — exact in real arithmetic), so global
moments cost one tiny aggregation over |shards| rows instead of a
re-scan. This is the same mergeability discipline as the HLL/CMS/
Misra-Gries sketches (operators/hll.py, cms.py), instantiated for
second-order statistics.

Merge identity used (two-pass, CENTERED on the grand mean):
  N = Σnᵢ,  S = Σsᵢ,  m̄ = S/N
  M2 = ΣM2ᵢ + Σ nᵢ·(sᵢ/nᵢ − m̄)²
  var_pop = M2/N

The algebraically-equivalent one-pass form ΣM2ᵢ + Σsᵢ²/nᵢ − S²/N is
catastrophically cancelling when mean ≫ std (token counts, payment
amounts): the two large terms agree in their leading ~(mean/std)²
relative digits, so float64 loses that many digits of M2 and can go
NEGATIVE at scale. Centering first makes every term O(n·var) — no
cancellation, variance provably ≥ ΣM2ᵢ ≥ 0 — at the cost of one extra
tiny aggregation over the |shards|-row summary table (the shard table
is summary-scale by contract, so the second pass is noise). Pinned by
the mean/std ≤ 1e6 and 1e9-offset property tests in
tests/test_budget_moments.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shard_moments(
    df: DataFrame, value_col: str | Column, shard_col: str | Column
) -> DataFrame:
    """Per-shard (shard, n, s, m2). NULL values are excluded (aggregate
    semantics in both engines); a 1-row shard has m2 = 0 (var_pop)."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    return df.filter(v.isNotNull()).groupBy(shard_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v.cast("double")).alias("s"),
        (F.var_pop(v.cast("double")) * F.count(F.lit(1))).alias("m2"),
    )


def merge_moments_by(shards: DataFrame, keys: list[str]) -> DataFrame:
    """Fold a (…keys, n, s, m2) shard table into one (…keys, n_rows,
    mean, var_pop) row per key group — the read side of the
    mergeable-summary contract. ``keys=[]`` gives the global fold.

    n=0 rows are filtered (an empty shard contributes nothing):
    ``shard_moments`` never emits them, but this is the documented read
    side for USER-SUPPLIED/stored partials tables, where an n=0 row
    would divide by zero — a job kill under ANSI mode, a silently
    nulled M2 contribution otherwise.

    Two aggregations: pass 1 folds the grand (N, S, m̄) per key group;
    pass 2 re-reads the shard table with m̄ broadcast-joined on and
    folds the CENTERED spread Σnᵢ(mᵢ−m̄)² (see module docstring for why
    centering, not the one-pass identity). Both passes scan only the
    |shards|-row summary table; the broadcast side is one row per key
    group."""
    shards = shards.filter(F.col("n") > 0)
    totals = shards.groupBy(*keys).agg(
        F.sum("n").alias("__n"), F.sum("s").alias("__s")
    ).withColumn("__mean", F.col("__s") / F.col("__n"))
    if keys:
        # NULL-SAFE equi-join (eqNullSafe), not a plain key join: groupBy
        # emits a row for a NULL key group, and a plain join would never
        # match it back — silently dropping the group's moments (NULL
        # keys are realistic in user-supplied partials, e.g. source
        # unset). Totals keys are renamed so the join condition is
        # unambiguous and the duplicates drop cleanly.
        tot = totals.select(
            *[F.col(k).alias(f"__tk_{i}") for i, k in enumerate(keys)],
            "__n",
            "__s",
            "__mean",
        )
        cond = None
        for i, k in enumerate(keys):
            c = shards[k].eqNullSafe(F.col(f"__tk_{i}"))
            cond = c if cond is None else (cond & c)
        joined = shards.join(F.broadcast(tot), cond).drop(
            *[f"__tk_{i}" for i in range(len(keys))]
        )
    else:
        joined = shards.crossJoin(F.broadcast(totals))
    d = F.col("s") / F.col("n") - F.col("__mean")
    agg = joined.groupBy(*keys).agg(
        F.first("__n").alias("__n"),
        F.first("__mean").alias("__mean"),
        (F.sum("m2") + F.sum(F.col("n") * d * d)).alias("__m2c"),
    )
    return agg.select(
        *keys,
        F.col("__n").cast("long").alias("n_rows"),
        F.col("__mean").alias("mean"),
        (F.col("__m2c") / F.col("__n")).alias("var_pop"),
    )


def merge_moments(shards: DataFrame) -> DataFrame:
    """Global fold of a (n, s, m2) shard table — see merge_moments_by."""
    return merge_moments_by(shards, [])
