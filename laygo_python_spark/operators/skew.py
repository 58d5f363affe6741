"""Skew-handling operators: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) covers most cases at
runtime; explicit salting remains necessary for (a) skewed AGGREGATIONS
with expensive per-group state, where a single hot key pins one task,
and (b) engines/paths where AQE can't see the skew (e.g. inside
applyInPandas groups). The salt must be DETERMINISTIC (derived by hash
from row content, never rand()) so results are reproducible and
re-executed stages agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(df: DataFrame, n_salts: int = 16) -> Column:
    """Deterministic per-row salt in [0, n_salts): hash of all columns.
    Never rand() — a re-executed task must produce the same salt."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).alias("__salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: phase 1 aggregates on
    (keys + salt) — the hot key's rows spread over n_salts reducers —
    phase 2 merges the partials on keys alone (tiny input).

    ``aggs`` maps output name → phase-1 aggregate; phase 2 re-merges
    with sum/min/max by name convention: every aggregate here must be
    decomposable (sum/count→sum, min→min, max→max).
    """
    phase1 = df.withColumn("__salt", salt_column(df, n_salts)).groupBy(*keys, "__salt").agg(
        *[c.alias(name) for name, c in aggs.items()]
    )
    merge = []
    for name in aggs:
        low = name.lower()
        if low.startswith("min"):
            merge.append(F.min(name).alias(name))
        elif low.startswith("max"):
            merge.append(F.max(name).alias(name))
        else:  # sums and counts both merge by summation
            merge.append(F.sum(name).alias(name))
    return phase1.groupBy(*keys).agg(*merge)


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skewed fact ⋈ small dim without broadcast (for when the dim is
    small enough to replicate n_salts× but broadcast is disabled or the
    build side exceeds the driver limit): replicate each dim row under
    every salt, salt the fact deterministically, equi-join on
    (key, salt). The hot key's fact rows land on n_salts reducers."""
    fact_s = fact.withColumn("__salt", salt_column(fact, n_salts))
    dim_s = dim.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return fact_s.join(dim_s, [key, "__salt"]).drop("__salt")
