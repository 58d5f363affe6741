"""The migration examples (examples/migration_from_laygo.py) must stay
runnable and produce the reference README's documented outputs."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/examples")

import migration_from_laygo as ex


def test_basic_pipeline(spark):
    assert ex.basic_pipeline(spark) == [4, 8, 12, 16, 20]


def test_context_aware(spark):
    result, snapshot = ex.context_aware(spark)
    assert result == [12, 15]
    assert snapshot["multiplier"] == 3


def test_etl_pipeline(spark):
    assert ex.etl_pipeline(spark) == ["Alice", "Carol"]


def test_reusable_transformer(spark):
    r1, r2 = ex.reusable_transformer(spark)
    assert r1 == [4, 8] and r2 == [0, 4, 8, 12, 16]


def test_branch_router(spark):
    assert ex.branch_router(spark) == {"high_value": [1, 3], "standard": [2, 4]}
