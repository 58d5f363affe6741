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

import re
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(df: DataFrame, n_salts: int = 16) -> Column:
    """Deterministic per-row salt in [0, n_salts): hash of all columns.
    Never rand() — a re-executed task must produce the same salt."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).alias("__salt")


_MERGE_FNS: dict[str, Callable[[str], Column]] = {
    "sum": F.sum,
    "count": F.sum,  # partial counts merge by summation
    "min": F.min,
    "max": F.max,
}


def _infer_merge(col: Column) -> Callable[[str], Column] | None:
    """Read the aggregate function at the HEAD of the expression (e.g.
    ``Column<'sum(l_quantity)'>``). Inference keys on the function, never
    on the user's output name — an output named ``minutes_total`` over a
    sum() merges by summation, as it must."""
    m = re.match(r"Column<'(\w+)\(", str(col))
    if m:
        return _MERGE_FNS.get(m.group(1).lower())
    return None


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column | tuple[Column, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: phase 1 aggregates on
    (keys + salt) — the hot key's rows spread over n_salts reducers —
    phase 2 merges the partials on keys alone (tiny input).

    ``aggs`` maps output name → phase-1 aggregate, either:

    - a bare Column whose head is a decomposable aggregate
      (sum/count → merge by sum, min → min, max → max) — the merge is
      inferred from the aggregate FUNCTION itself, or
    - an explicit ``(aggregate, merge)`` tuple with merge in
      {"sum", "min", "max"} for wrapped/derived phase-1 expressions.

    Anything the inference cannot classify raises — a silently wrong
    merge (e.g. averaging partial averages) is worse than an error.
    """
    phase1_cols: dict[str, Column] = {}
    merge: list[Column] = []
    for name, spec in aggs.items():
        if isinstance(spec, tuple):
            c, how = spec
            if how not in ("sum", "min", "max"):
                raise ValueError(f"merge for {name!r} must be 'sum', 'min' or 'max', got {how!r}")
            merge_fn: Callable[[str], Column] | None = _MERGE_FNS[how]
        else:
            c = spec
            merge_fn = _infer_merge(c)
            if merge_fn is None:
                raise ValueError(
                    f"cannot infer how to merge partials for {name!r} ({str(c)}): pass an "
                    "explicit (aggregate, merge) tuple with merge in {'sum','min','max'} — "
                    "non-decomposable aggregates (avg, stddev, ...) must be rewritten as "
                    "decomposable parts (e.g. sum+count) before salting"
                )
        phase1_cols[name] = c
        merge.append(merge_fn(name).alias(name))
    phase1 = df.withColumn("__salt", salt_column(df, n_salts)).groupBy(*keys, "__salt").agg(
        *[c.alias(name) for name, c in phase1_cols.items()]
    )
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
