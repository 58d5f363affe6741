"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the engine's operator catalog
(laygo_python_spark/queries/*) for the sf0.01 DuckDB correctness gate.
Column aliases match between Spark results and oracle SQL — the driver's
compare sorts columns by name before hashing values.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may import this file by path from any cwd — make the
# package importable regardless.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-style pricing summary: scan → pushed filter → partial+final
    aggregation (see laygo_python_spark/queries/relational.py).
    """
    from laygo_python_spark.queries.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from laygo_python_spark import queries as q

    q.load_all()
    return dict(q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted for non-SQL-expressible ops —
    the driver records a weaker rows-only check for those)."""
    from laygo_python_spark import queries as q

    q.load_all()
    return dict(q.ORACLES)
