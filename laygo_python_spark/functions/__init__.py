"""Scalar function surface.

The reference has no function library — users write arbitrary Python
lambdas (SURVEY.md §2.6). Here the 600+ built-ins in
``pyspark.sql.functions`` are the primary surface (JVM-side, codegen'd);
this module re-exports them plus engine-specific helpers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import *  # noqa: F401,F403 — deliberate re-export


def revenue(price: str = "l_extendedprice", discount: str = "l_discount") -> Column:
    """discounted revenue — the idiom every TPC-H-ish query repeats."""
    return F.col(price) * (1 - F.col(discount))


def normalized_text(col: str = "text") -> Column:
    """Whitespace-collapsed, lowercased text — the dedup normal form."""
    return F.lower(F.regexp_replace(F.col(col), r"\s+", " "))


def token_array(col: str = "text") -> Column:
    """Whitespace tokenizer (BPE-ish regex variant: split on non-word)."""
    return F.split(F.trim(F.col(col)), r"\s+")


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns, computed
    JVM-side with higher-order functions — no Python in the loop."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)
