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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Proportion floor — the standard PSI guard for empty bins (keeps
# ln(p/q) finite). Both engines evaluate greatest(x, eps) identically.
EPS = 1e-6


def bin_col(col: Column, lo: float, hi: float, n_bins: int) -> Column:
    """Clamped fixed-width bin index in [0, n_bins): floor((x-lo)/w),
    out-of-range values land in the edge bins. Pure double arithmetic —
    bit-identical across engines."""
    if not (hi > lo) or n_bins <= 0:
        raise ValueError(f"bin_col: need hi > lo and n_bins > 0, got [{lo}, {hi}) / {n_bins}")
    w = (hi - lo) / n_bins
    raw = F.floor((col - F.lit(lo)) / F.lit(w))
    return F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), raw)).cast("int")


def binned_counts(
    df: DataFrame, col: str, lo: float, hi: float, n_bins: int, keys: list[str]
) -> DataFrame:
    """(keys..., bin, cnt) histogram — one combiner-compressed
    aggregation; the shuffle moves n_keys × n_bins partial rows.

    NULL measurements are EXCLUDED, not binned: greatest/least skip
    NULLs, so without the filter a 100%-NULL batch would masquerade as
    all-mass-in-bin-0 — a drift monitor hiding the most common
    data-quality failure (r8 review). Track the null RATE separately if
    it matters (it usually does): ``F.avg(col.isNull().cast("int"))``."""
    return (
        df.filter(F.col(col).isNotNull())
        .select(*keys, bin_col(F.col(col), lo, hi, n_bins).alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


NULL_CATEGORY = "__null__"


def categorical_counts(
    df: DataFrame, col: str, keys: list[str], null_category: str = NULL_CATEGORY
) -> DataFrame:
    """(keys..., bin, cnt) where the "bin" IS the category value — the
    categorical twin of ``binned_counts`` (source mix, language mix,
    license mix...). Same additive-partial mergeability. NULL is a
    legitimate category in a mix, so it becomes the ``null_category``
    sentinel instead of a NULL bin (a NULL bin value would fall out of
    downstream joins on stored histograms and report spurious drift —
    r8 review).

    Collision-FREE, not collision-documented (r9 advice): a real value
    that merely EQUALS the sentinel (an upstream feed that already
    sentinel-encodes its NULLs) must not silently merge with the NULL
    population — that would understate or fabricate drift. Real values
    carrying the sentinel as a prefix are escape-doubled (sentinel
    prepended once more), which is injective: no real value can land on
    the bare sentinel, and no two real values can land on the same
    escaped label. Values without the prefix — everything, in practice
    — keep their label verbatim."""
    s = F.col(col).cast("string")
    bin_expr = (
        F.when(s.isNull(), F.lit(null_category))
        .when(s.startswith(null_category), F.concat(F.lit(null_category), s))
        .otherwise(s)
    )
    return (
        df.select(*keys, bin_expr.alias("bin"))
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
    finite — the classic PSI convention. The SQL oracle replays the
    fold including the NULL-measurement exclusion (WHERE value IS NOT
    NULL — DuckDB's greatest(0, NULL) = 0 would otherwise bin NULLs as
    bin-0 mass) and a null-safe key join; one remaining documented
    delta: DuckDB's x/0 → NULL → greatest(NULL, EPS) = EPS happens to
    equal the Spark when-guard's EPS floor for one-sided groups."""
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
    reference without ever touching raw history rows.

    Shape notes (r8 review): the sides align by UNION + groupBy, never
    a join — groupBy treats NULL key/bin values as ordinary group
    members where an equi-join would silently drop them and report
    false drift; per-key totals are window sums over the same frame (no
    totals re-join, and an empty key list is just the global window);
    and a key present on only ONE side gets proportion 0 → the EPS
    floor → a maximal-drift alarm, instead of the divide-by-zero that
    ANSI mode turns into a job-killing exception (a brand-new group
    appearing in the current window is exactly the event a drift
    monitor exists to catch)."""
    u = ref_hist.select(
        *keys, "bin", F.col("cnt").alias("cr"), F.lit(0).cast("long").alias("cc")
    ).unionByName(
        cur_hist.select(
            *keys, "bin", F.lit(0).cast("long").alias("cr"), F.col("cnt").alias("cc")
        )
    )
    j = u.groupBy(*keys, "bin").agg(F.sum("cr").alias("cr"), F.sum("cc").alias("cc"))
    w = Window.partitionBy(*[F.col(k) for k in keys])
    j = j.withColumn("n_ref", F.sum("cr").over(w)).withColumn(
        "n_cur", F.sum("cc").over(w)
    )
    p = F.greatest(
        F.when(F.col("n_ref") > 0, F.col("cr") / F.col("n_ref")).otherwise(F.lit(0.0)),
        F.lit(EPS),
    )
    q = F.greatest(
        F.when(F.col("n_cur") > 0, F.col("cc") / F.col("n_cur")).otherwise(F.lit(0.0)),
        F.lit(EPS),
    )
    m = (p + q) / 2
    psi_term = (q - p) * F.log(q / p)
    jsd_term = 0.5 * p * F.log(p / m) + 0.5 * q * F.log(q / m)
    return (
        j.groupBy(*keys, "n_ref", "n_cur")
        .agg(
            F.round(F.sum(psi_term), 6).alias("psi"),
            F.round(F.sum(jsd_term), 6).alias("jsd"),
        )
        .select(*keys, "psi", "jsd", "n_ref", "n_cur")
    )
