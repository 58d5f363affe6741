"""laygo_python_spark — a PySpark-native analytics engine with the
capabilities of ringoldsdev/laygo-python, re-expressed Spark-first.

The reference (read-only at /root/reference/) is a pure-Python fluent,
lazy, chunk-oriented pipeline library (Pipeline / Transformer / shared
context / branch fan-out — see SURVEY.md). This package keeps the fluent
API shape but compiles everything to vanilla DataFrame operations so that
Catalyst/Tungsten own optimization and execution:

- ``Pipeline``       — binds a source DataFrame to transformers + context
                       (reference: laygo/pipeline.py:71-112)
- ``Transformer``    — a reusable, composable DataFrame -> DataFrame
                       program (reference: laygo/transformers/transformer.py:135-163)
- ``Context``        — broadcast-read / accumulator-write shared state
                       (reference: laygo/context/parallel.py:39-138)
- ``operators``      — relational uplift + training-data-pipeline ops
                       (dedup, similarity search, text analysis, multimodal)
- ``streaming``      — Structured Streaming helpers (watermark, windows,
                       sessionization)

Design stance (SURVEY.md §7.1): fluent chaining, lazy execution until a
terminal op, reusable transformers, per-batch error isolation, and branch
fan-out are kept; single-use iterators become re-usable DataFrames; the
thread/process/HTTP strategy choice becomes partitioning/cluster config.
"""

from laygo_python_spark.context import Context, PipelineContext
from laygo_python_spark.errors import ErrorHandler, raise_error
from laygo_python_spark.pipeline import Pipeline
from laygo_python_spark.session import get_spark, read_table, read_tables
from laygo_python_spark.transformer import Transformer, create_transformer

__all__ = [
    "Context",
    "ErrorHandler",
    "Pipeline",
    "Transformer",
    "create_transformer",
    "get_spark",
    "raise_error",
    "read_table",
    "read_tables",
    "PipelineContext",
]

__version__ = "0.1.0"
