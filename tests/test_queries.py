"""Smoke tests for the driver contract: entry() and every queries() entry
runs at sf0.001 and returns a well-formed DataFrame. Value-level
correctness is enforced by tools/verify_oracle.py (DuckDB at sf0.01).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_every_query_has_callable_signature():
    qs = entrymod.queries()
    assert len(qs) >= 20
    for name, fn in qs.items():
        assert callable(fn), name


def test_oracles_are_subset_of_queries():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_at_sf0001(spark, sf_dir, name):
    fn = entrymod.queries()[name]
    df = fn(spark, sf_dir)
    # a stable schema and a successful (possibly empty) materialization
    assert df.columns
    df.limit(5).collect()
