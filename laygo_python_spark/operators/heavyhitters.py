"""Misra-Gries heavy hitters — a DETERMINISTIC mergeable frequency
summary, completing the sketch family (CMS estimates with one-sided
probabilistic error, HLL counts distincts, qsketch does quantiles;
this one FINDS the frequent keys with a worst-case guarantee and no
randomness at all).

The reference has no sketch surface (SURVEY §2: exact fold/reduce
only); this is uplift for the 100 TB "what are the heavy keys?"
problem — frequent tokens before tokenizer training, hot users, skewed
join keys worth salting (operators/skew.py takes the output of exactly
this question). An exact groupBy count needs state proportional to the
number of DISTINCT keys; Misra-Gries holds k counters per partition,
full stop, and still guarantees after merging:

    true_freq(x) ≥ est(x) ≥ true_freq(x) − n/(k+1)      (n = total rows)

so every key with true_freq > n/(k+1) is GUARANTEED present in the
summary — regardless of partitioning, batch boundaries, or merge
order (Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable
Summaries", PODS 2012: sum counters, subtract the (k+1)-th largest,
keep positives).

Shapes:
- ``mg_summarize``: mapInPandas, one k-counter dict per PARTITION —
  embarrassingly parallel, bounded memory, no shuffle. Python touches
  each row once via vectorized pandas value_counts (the per-batch
  exact counts fold into the dict; the MG reduction runs per batch,
  not per row).
- ``mg_merge``: pure relational — union + groupBy sum, then the
  subtraction rule via a bounded single-partition window (the input
  is ≤ partitions×k rows, KBs not TBs — the same bounded-small-side
  rationale as cms._geometry).
- ``mg_heavy_hitters``: the discovery→verify composition: summary
  candidates (a guaranteed superset of everything above the floor)
  → broadcast semi-join recount → exact filter. The final answer is
  EXACT — identical to the full groupBy/HAVING — but the groupBy ran
  only over candidate keys, with the map-side hash table bounded by
  the candidate list instead of the key universe.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mg_summarize(df: DataFrame, key: str, k: int = 64) -> DataFrame:
    """Per-partition Misra-Gries summaries: ``(<key>, cnt)``, at most k
    rows per partition however many rows or distinct keys it holds.

    Feed the union of summaries to ``mg_merge`` (same k!) to get the
    corpus-level summary; the per-partition error is n_p/(k+1) and
    errors add across the merge to the global n/(k+1) bound."""
    if k < 1:
        raise ValueError(f"mg_summarize: k must be >= 1, got {k}")
    key_field = df.schema[key]
    out_schema = f"`{key}` {key_field.dataType.simpleString()}, cnt long"

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for batch in batches:
            for val, c in batch[key].value_counts(dropna=True).items():
                counters[val] = counters.get(val, 0) + int(c)
            if len(counters) > k:
                # Mergeable-summaries reduction: subtract the (k+1)-th
                # largest counter from all, drop the non-positive — the
                # batch form of MG's decrement-all step, same bound.
                t = sorted(counters.values(), reverse=True)[k]
                counters = {kk: v - t for kk, v in counters.items() if v - t > 0}
        yield pd.DataFrame({key: list(counters.keys()), "cnt": list(counters.values())})

    return df.select(key).mapInPandas(summarize, schema=out_schema)


def mg_merge(summaries: DataFrame, key: str, k: int = 64) -> DataFrame:
    """Merge per-partition summaries into one ≤k-row corpus summary
    ``(<key>, est)``, preserving the n/(k+1) bound.

    Sum counters by key, find the (k+1)-th largest sum (a window over
    the bounded summary frame — partitions×k rows), subtract it
    everywhere, keep positives. With ≤k distinct keys the threshold is
    0 and the merge is exact."""
    summed = summaries.groupBy(key).agg(F.sum("cnt").alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), F.col(key))
    ranked = summed.withColumn("__rn", F.row_number().over(w))
    thresh = ranked.agg(
        F.coalesce(F.max(F.when(F.col("__rn") == k + 1, F.col("cnt"))), F.lit(0)).alias("t")
    )
    return (
        ranked.crossJoin(F.broadcast(thresh))
        .withColumn("est", F.col("cnt") - F.col("t"))
        .filter(F.col("est") > 0)
        .select(key, "est")
    )


def mg_heavy_hitters(df: DataFrame, key: str, min_freq: float, k: int | None = None) -> DataFrame:
    """EXACT heavy hitters: every key appearing in ≥ ``min_freq``
    fraction of rows, with its exact count — discovered with bounded
    state, verified with an exact recount.

    ``k`` defaults to the smallest value whose guarantee covers the
    floor (k+1 > 1/min_freq, doubled for slack). Because the summary
    provably contains every key above n/(k+1) < min_freq·n, the
    candidate set is a superset of the answer; the broadcast semi-join
    recount then makes the result identical to the full
    groupBy/HAVING — that exactness is what lets the query version
    oracle-gate a sketch-shaped plan."""
    if not (0.0 < min_freq < 1.0):
        raise ValueError(f"mg_heavy_hitters: min_freq must be in (0, 1), got {min_freq}")
    if k is None:
        k = max(1, int(2.0 / min_freq))
    if (k + 1) * min_freq <= 1.0:
        raise ValueError(
            f"mg_heavy_hitters: k={k} cannot guarantee floor {min_freq} (need k+1 > 1/min_freq)"
        )
    candidates = mg_merge(mg_summarize(df, key, k=k), key, k=k).select(key)
    n_tot = df.agg(F.count(F.lit(1)).alias("n_tot"))
    return (
        df.join(F.broadcast(candidates), key, "left_semi")
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(n_tot))
        .filter(F.col("cnt") >= F.col("n_tot") * min_freq)
        .select(key, "cnt")
    )
