"""Python UDTFs — the table-function escape hatch of the UDF surface
(SURVEY.md §2.12: the reference's UDTF-analog is map-to-list + flatten,
laygo transformer.py:262-280; Spark 3.5+ makes it a first-class lateral
relation).

Use these ONLY when the expansion logic genuinely needs Python — the
pure-Column `slice`+`explode` form (queries/text_ops.py doc_chunks) is
the fast path and stays in codegen. A UDTF runs one Python process per
task like any Python UDF; at 100 TB that's acceptable for low-volume
expansions and wrong for per-token work.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx: int, chunk_text: string")
class ChunkText:
    """Sliding-window text chunker as a table function:
    ``LATERAL chunk_text(text, size, stride)`` emits one row per window.
    Mirrors the doc_chunks query so the two paths can be differentially
    tested against each other."""

    def eval(self, text: str, size: int, stride: int):  # noqa: D102
        if text is None:
            return
        toks = text.strip().split(" ")
        starts = range(0, max(len(toks) - size + 1, 1), stride)
        for idx, s in enumerate(starts):
            yield idx, " ".join(toks[s : s + size])


@udtf(returnType="key: string, value: string")
class ExplodeKeyValues:
    """Parse a ``k=v;k=v`` string into (key, value) rows — the classic
    semi-structured expansion that SQL alone can't do cleanly when the
    grammar has quirks (empty pairs, missing '=')."""

    def eval(self, s: str):  # noqa: D102
        if not s:
            return
        for pair in s.split(";"):
            if not pair:
                continue
            k, sep, v = pair.partition("=")
            yield k.strip(), (v.strip() if sep else None)


def register_udtfs(spark: SparkSession) -> None:
    """Make the UDTFs callable from SQL (``LATERAL chunk_text(...)``)."""
    spark.udtf.register("chunk_text", ChunkText)
    spark.udtf.register("explode_key_values", ExplodeKeyValues)
