"""Distribution-drift monitors — PSI and Jensen-Shannon divergence over
fixed-width bins, per group key.

The training-data-pipeline staple: compare this week's crawl (or
shard, or source) against a reference window and alarm when a feature's
distribution moved. Fixed bin EDGES (not quantile bins) keep the
statistic engine-exact and incrementally maintainable: per-bin counts
are plain additive aggregates, so the reference histogram can be a
stored artifact that new batches update without rescanning history —
the same mergeability contract as the sketches (operators/hll.py etc.).

Everything is Column algebra — one partial+final aggregation per side,
a per-(key, bin) join of two tiny histograms, then a per-key fold. No
Python, no UDFs; at 100 TB each side's shuffle carries n_keys × n_bins
partial rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Proportion floor — the standard PSI guard for empty bins (keeps
# ln(p/q) finite). Both engines evaluate greatest(x, eps) identically.
EPS = 1e-6


def bin_col(col: Column, lo: float, hi: float, n_bins: int) -> Column:
    """Clamped fixed-width bin index in [0, n_bins): floor((x-lo)/w),
    out-of-range values land in the edge bins. Pure double arithmetic —
    bit-identical across engines."""
    w = (hi - lo) / n_bins
    raw = F.floor((col - F.lit(lo)) / F.lit(w))
    return F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), raw)).cast("int")


def binned_counts(
    df: DataFrame, col: str, lo: float, hi: float, n_bins: int, keys: list[str]
) -> DataFrame:
    """(keys..., bin, cnt) histogram — one combiner-compressed
    aggregation; the shuffle moves n_keys × n_bins partial rows."""
    return (
        df.select(*keys, bin_col(F.col(col), lo, hi, n_bins).alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def categorical_counts(df: DataFrame, col: str, keys: list[str]) -> DataFrame:
    """(keys..., bin, cnt) where the "bin" IS the category value — the
    categorical twin of ``binned_counts`` (source mix, language mix,
    license mix...). Same additive-partial mergeability."""
    return (
        df.select(*keys, F.col(col).cast("string").alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def distribution_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    lo: float | None = None,
    hi: float | None = None,
    n_bins: int = 10,
    keys: list[str] | None = None,
    categorical: bool = False,
) -> DataFrame:
    """(keys..., psi, jsd, n_ref, n_cur) — Population Stability Index
    and Jensen-Shannon divergence (natural log) between the reference
    and current distributions of ``col``, per group key.

    Numeric mode bins by the fixed [lo, hi) edges; ``categorical=True``
    treats each distinct value of ``col`` as its own bin (source mix,
    language mix — lo/hi/n_bins ignored). Reading: PSI < 0.1 stable,
    0.1-0.25 moderate shift, > 0.25 alarm (the conventional
    thresholds); JSD ∈ [0, ln 2] is the symmetric, always-finite
    companion. Proportions are floored at ``EPS`` so empty bins stay
    finite — the classic PSI convention, replayed verbatim by the SQL
    oracle."""
    keys = keys or []
    if categorical:
        r = categorical_counts(ref, col, keys)
        c = categorical_counts(cur, col, keys)
    else:
        if lo is None or hi is None:
            raise ValueError("distribution_drift: numeric mode needs lo and hi bin edges")
        r = binned_counts(ref, col, lo, hi, n_bins, keys)
        c = binned_counts(cur, col, lo, hi, n_bins, keys)
    return drift_from_counts(r, c, keys)


def drift_from_counts(ref_hist: DataFrame, cur_hist: DataFrame, keys: list[str]) -> DataFrame:
    """The PSI/JSD fold over two (keys..., bin, cnt) histograms — split
    out so STORED histograms work too: a streaming gate keeps per-batch
    histogram partials as a parquet artifact (additive, so replay-safe
    partition overwrites merge exactly) and folds against the committed
    reference without ever touching raw history rows."""
    r = ref_hist.withColumnRenamed("cnt", "cr")
    c = cur_hist.withColumnRenamed("cnt", "cc")
    j = r.join(c, [*keys, "bin"], "full").fillna(0, subset=["cr", "cc"])
    wk = [F.col(k) for k in keys]
    tot = j.groupBy(*wk).agg(
        F.sum("cr").alias("n_ref"), F.sum("cc").alias("n_cur")
    )
    j = j.join(tot, keys) if keys else j.crossJoin(F.broadcast(tot))
    p = F.greatest(F.col("cr") / F.col("n_ref"), F.lit(EPS))
    q = F.greatest(F.col("cc") / F.col("n_cur"), F.lit(EPS))
    m = (p + q) / 2
    psi_term = (q - p) * F.log(q / p)
    jsd_term = 0.5 * p * F.log(p / m) + 0.5 * q * F.log(q / m)
    return (
        j.groupBy(*wk, "n_ref", "n_cur")
        .agg(
            F.round(F.sum(psi_term), 6).alias("psi"),
            F.round(F.sum(jsd_term), 6).alias("jsd"),
        )
        .select(*keys, "psi", "jsd", "n_ref", "n_cur")
    )
