"""As-of (backward) join — an operator Spark lacks natively
(pyspark has no merge_asof analog in the DataFrame API).

Implementation: the union+window trick, not a range join —

1. tag probe (left) rows and reference (right) rows, union them;
2. one window partitioned by the join keys, ordered by (time, tag)
   with reference rows sorting before probes at equal timestamps
   (so ``<=`` semantics hold);
3. ``last(struct(values), ignorenulls=True)`` over
   unbounded-preceding..current propagates the most recent reference
   ROW's values forward (one struct, so NULL fields attach as NULL and
   all values come from the same row — pd.merge_asof semantics);
4. keep only probe rows.

Cost: ONE shuffle on the join keys + a sort within partitions — same
price as a window function, no per-group Python, no O(n·m) range join.
At 100 TB this is the only shape that works when both sides are large;
``applyInPandas`` + ``pd.merge_asof`` per group is the fallback when the
window state per key would not fit (not needed here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    values: list[str],
    right_on: str | None = None,
    suffix: str = "_asof",
    tolerance=None,
) -> DataFrame:
    """For each left row, attach the ``values`` columns of the latest
    right row with ``right[right_on] <= left[on]`` within the same
    ``by`` group (backward as-of, ties included). Left rows with no
    prior right row get nulls — left-join semantics.

    ``tolerance`` (pd.merge_asof parity): a Column/literal bounding how
    stale the match may be — matches older than ``on - tolerance`` are
    nulled. Same units as the time columns (an INTERVAL expression for
    timestamps, a number for numerics). Applied AFTER the window fill,
    so it adds zero shuffles.
    """
    right_on = right_on or on
    out_values = [f"{v}{suffix}" for v in values]

    # ALL value columns ride in ONE struct per reference row: the struct
    # is non-null whenever a reference row exists, so a matched row whose
    # value is genuinely NULL attaches as NULL (pd.merge_asof semantics)
    # instead of being skipped by a per-column ignorenulls last() — and
    # every attached value comes from the SAME reference row.
    # __rt carries the matched row's own time so a post-fill tolerance
    # check can see how stale the match is.
    ref_struct = F.struct(
        *[F.col(v).alias(ov) for v, ov in zip(values, out_values)],
        F.col(right_on).alias("__rt"),
    )

    probe = left.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(1).alias("__is_probe"),
        F.struct(*left.columns).alias("__row"),
        F.lit(None).cast(
            "struct<"
            + ",".join(f"{ov}:{right.schema[v].dataType.simpleString()}" for v, ov in zip(values, out_values))
            + f",__rt:{right.schema[right_on].dataType.simpleString()}>"
        ).alias("__ref"),
    )
    ref = right.select(
        *by,
        F.col(right_on).alias("__t"),
        F.lit(0).alias("__is_probe"),
        F.lit(None).cast(probe.schema["__row"].dataType).alias("__row"),
        ref_struct.alias("__ref"),
    )
    w = (
        Window.partitionBy(*by)
        .orderBy("__t", "__is_probe")  # reference sorts before probe at equal t → <= semantics
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = probe.unionByName(ref).select(
        "__is_probe",
        "__row",
        "__t",
        F.last("__ref", ignorenulls=True).over(w).alias("__ref"),
    )
    if tolerance is not None:
        fresh = (F.col("__t") - F.col("__ref.__rt")) <= tolerance
        filled = filled.withColumn("__ref", F.when(fresh, F.col("__ref")))
    return filled.filter(F.col("__is_probe") == 1).select(
        *[F.col(f"__row.{c}").alias(c) for c in left.columns],
        *[F.col(f"__ref.{ov}").alias(ov) for ov in out_values],
    )
