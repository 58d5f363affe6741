"""As-of join — an operator Spark lacks natively (pyspark has no
merge_asof analog in the DataFrame API).

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

``direction="forward"`` mirrors it (first over current..following);
``"nearest"`` evaluates both windows — same single shuffle, two sorts —
and picks the closer match per row.

Cost: ONE shuffle on the join keys + a sort within partitions — same
price as a window function, no per-group Python, no O(n·m) range join.
At 100 TB this is the only shape that works when both sides are large;
``applyInPandas`` + ``pd.merge_asof`` per group is the fallback when the
window state per key would not fit (not needed here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the ``values`` columns of the matching
    right row within the same ``by`` group; left rows with no match get
    nulls — left-join semantics. ``direction`` (pd.merge_asof parity):

    - ``"backward"`` (default): latest right row with
      ``right[right_on] <= left[on]`` (ties included);
    - ``"forward"``: earliest right row with ``right_on >= on``;
    - ``"nearest"``: whichever of the two is closer in time
      (backward wins exact-distance ties, matching pandas).

    ``tolerance``: a Column/literal bounding how far the match may be —
    farther matches are nulled. Same units as the time columns (an
    INTERVAL expression for timestamps, a number for numerics). Applied
    AFTER the window fill, so it adds zero shuffles.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    right_on = right_on or on
    out_values = [f"{v}{suffix}" for v in values]

    # ALL value columns ride in ONE struct per reference row: the struct
    # is non-null whenever a reference row exists, so a matched row whose
    # value is genuinely NULL attaches as NULL (pd.merge_asof semantics)
    # instead of being skipped by a per-column ignorenulls last() — and
    # every attached value comes from the SAME reference row.
    # __rt carries the matched row's own time so tolerance/nearest can
    # see the match distance after the fill.
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
    unioned = probe.unionByName(ref)

    # Backward: refs sort BEFORE probes at equal t so <= holds under
    # last() over preceding..current. Forward mirrors: probes first,
    # first() over current..following.
    wb = (
        Window.partitionBy(*by)
        .orderBy("__t", "__is_probe")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*by)
        .orderBy("__t", F.desc("__is_probe"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    def _bounded(match: Column, dist: Column) -> Column:
        if tolerance is None:
            return match
        return F.when(dist <= tolerance, match)

    cols = ["__is_probe", "__row", "__t"]
    if direction == "backward":
        filled = unioned.select(*cols, F.last("__ref", ignorenulls=True).over(wb).alias("__m"))
        chosen = _bounded(F.col("__m"), F.col("__t") - F.col("__m.__rt"))
    elif direction == "forward":
        filled = unioned.select(*cols, F.first("__ref", ignorenulls=True).over(wf).alias("__m"))
        chosen = _bounded(F.col("__m"), F.col("__m.__rt") - F.col("__t"))
    else:  # nearest: one shuffle, two sorts, pick the closer fresh match
        filled = unioned.select(
            *cols,
            F.last("__ref", ignorenulls=True).over(wb).alias("__b"),
            F.first("__ref", ignorenulls=True).over(wf).alias("__f"),
        )
        back = _bounded(F.col("__b"), F.col("__t") - F.col("__b.__rt"))
        fwd = _bounded(F.col("__f"), F.col("__f.__rt") - F.col("__t"))
        closer_fwd = (F.col("__f.__rt") - F.col("__t")) < (F.col("__t") - F.col("__b.__rt"))
        chosen = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(closer_fwd, fwd)
            .otherwise(back)  # exact-distance tie → backward (pandas)
        )

    return filled.withColumn("__ref", chosen).filter(F.col("__is_probe") == 1).select(
        *[F.col(f"__row.{c}").alias(c) for c in left.columns],
        *[F.col(f"__ref.{ov}").alias(ov) for ov in out_values],
    )
