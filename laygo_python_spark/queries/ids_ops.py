"""Global sequential ID assignment query — oracle-checked against the
window spelling the operator exists to avoid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from laygo_python_spark.operators.ids import assign_sequential_ids
from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t


@query(
    "assign_global_ids",
    oracle="""
    SELECT doc_id, source,
           CAST(row_number() OVER (ORDER BY source, doc_id) - 1 AS BIGINT) AS seq_id
    FROM documents
    """,
)
def assign_global_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 0-based ids over (source, doc_id) order — the DuckDB oracle
    is the single-stream window form; the Spark plan is the scalable
    zipWithIndex shape (range shuffle + broadcast offsets), asserted
    single-partition-free in tests/test_plans.py."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return assign_sequential_ids(docs, order_by=["source", "doc_id"])
