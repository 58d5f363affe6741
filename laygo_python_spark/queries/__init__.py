"""Query registry — the driver-facing catalog behind __spark_entry__.py.

Each query is registered with a name, a ``(spark, sf_dir) -> DataFrame``
callable, and (when SQL-expressible) a DuckDB oracle SQL string over the
same parquet tables. Column names/aliases MUST match between the Spark
result and the oracle — the driver's compare sorts columns by name before
hashing values (see /root/repo/__spark_entry__.py docstring).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable:
    """Register a query; ``oracle=None`` marks it non-SQL-expressible
    (the driver then records a weaker rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run.

    Import errors PROPAGATE: a missing dependency must fail the
    correctness gate loudly, not silently shrink the registered-query
    catalog (every module below registers driver-graded queries).
    """
    from laygo_python_spark.queries import (  # noqa: F401
        advanced_ops,
        analytics_ops,
        bloom_ops,
        cogroup_ops,
        core_ops,
        dedup_ops,
        graph_ops,
        functions_ops,
        governance_ops,
        ids_ops,
        interval_ops,
        mixing_ops,
        pysource_ops,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        relational6,
        retrieval_ops,
        sampling_ops,
        selection_ops,
        similarity_ops,
        stats_ops,
        stringsim_ops,
        streaming_ops,
        text_ops,
        timeseries_ops,
        text_ops2,
        warehouse_ops,
    )
