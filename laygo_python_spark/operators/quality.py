"""Data-quality operators: declarative row validation and nested-schema
flattening — the ingest-hardening utilities every ETL pipeline needs.

The reference handles bad rows only via try/except in user lambdas
(reference transformer.py:488-535); here checks are declarative Column
predicates, so validation is codegen'd and the clean/violation split is
two filters over one cached pass — no Python, no second scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def validate(
    df: DataFrame,
    checks: dict[str, Column],
) -> tuple[DataFrame, DataFrame]:
    """Split rows into (clean, violations) against named check predicates.

    ``checks`` maps check-name -> Column predicate that clean rows
    satisfy. Returns ``clean`` (every check true) and ``violations``
    (original row + ``failed_checks: array<string>`` naming each failed
    predicate — one row per bad input row even when several checks fail,
    so violation counts mean rows, not (row × check) pairs).

    Both outputs derive from one projection: at scale, persist the input
    (or write both sides in one foreachBatch) to avoid a double scan.
    """
    # Null-safe failure test: a predicate evaluating to NULL (e.g.
    # `col > 0` on a NULL value) is a FAILED check, not a pass — NULLs
    # are the most common bad-row class and `~pred` alone would let them
    # sail through as clean.
    failed = F.array_compact(
        F.array(
            *[
                F.when(~pred.eqNullSafe(F.lit(True)), F.lit(name))
                for name, pred in checks.items()
            ]
        )
    )
    marked = df.withColumn("failed_checks", failed)
    clean = marked.filter(F.size("failed_checks") == 0).drop("failed_checks")
    violations = marked.filter(F.size("failed_checks") > 0)
    return clean, violations


def flatten_schema(df: DataFrame, sep: str = "_") -> DataFrame:
    """Recursively flatten struct columns into top-level columns
    (``a.b.c`` -> ``a_b_c``) — arrays/maps are left intact (explode is a
    semantic choice, not a rename). Pure projection: free at any scale."""

    def leaves(schema: StructType, prefix: list[str]) -> list[Column]:
        cols: list[Column] = []
        for field in schema.fields:
            path = [*prefix, field.name]
            if isinstance(field.dataType, StructType):
                cols += leaves(field.dataType, path)
            else:
                cols.append(F.col(".".join(path)).alias(sep.join(path)))
        return cols

    return df.select(*leaves(df.schema, []))
