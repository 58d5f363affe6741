"""Plan introspection helpers — assert the physical plan is the one you
want (pushdown reached the scan, the dim join went broadcast, codegen
spans are wide). Used by tests and perf iteration; the reference has no
optimizer to introspect (SURVEY.md §4)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def has_pushed_filters(df: DataFrame) -> bool:
    """True when at least one data filter reached the parquet scan."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters:" in line:
            _, _, rest = line.partition("PushedFilters:")
            if rest.strip() not in ("[]", ""):
                return True
    return False


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def scan_read_schema(df: DataFrame) -> list[str]:
    """Columns actually read by the first parquet scan (column pruning check)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            _, _, rest = line.partition("ReadSchema:")
            inner = rest.strip().lstrip("struct<").rstrip(">")
            return [c.split(":")[0] for c in inner.split(",") if c]
    return []


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges — the scale metric to minimize."""
    return physical_plan(df).count("Exchange")
