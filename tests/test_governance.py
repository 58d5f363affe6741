"""k-anonymity / l-diversity audits (operators/governance.py): known
small-table values, NULL-QI grouping, and input validation.
"""

from __future__ import annotations

import pytest

from laygo_python_spark.operators.governance import (
    k_anonymity_summary,
    k_anonymity_violations,
    l_diversity_violations,
)


def _people(spark):
    # QI (city, age_band); sensitive = condition.
    rows = [
        ("nyc", "20s", "flu"),
        ("nyc", "20s", "flu"),
        ("nyc", "20s", "cold"),
        ("nyc", "30s", "flu"),      # group of 1 -> k violation
        ("sf", "20s", "flu"),
        ("sf", "20s", "flu"),       # group of 2, 1 distinct condition
        (None, "40s", "cold"),      # NULL city is its own bucket
    ]
    return spark.createDataFrame(rows, "city string, age_band string, condition string")


def test_k_anonymity_violations_known(spark):
    df = _people(spark)
    got = {
        (r["city"], r["age_band"]): r["group_size"]
        for r in k_anonymity_violations(df, ["city", "age_band"], k=3).collect()
    }
    # nyc/20s has 3 rows -> passes at k=3; the rest are below
    assert got == {("nyc", "30s"): 1, ("sf", "20s"): 2, (None, "40s"): 1}


def test_k_anonymity_summary_certificate(spark):
    row = k_anonymity_summary(_people(spark), ["city", "age_band"], k=3).collect()[0]
    assert row["achieved_k"] == 1
    assert row["n_groups"] == 4
    assert row["groups_below_k"] == 3
    assert row["rows_at_risk"] == 4


def test_k_anonymity_all_pass_when_k_1(spark):
    assert k_anonymity_violations(_people(spark), ["city"], k=1).count() == 0


def test_l_diversity_violations_known(spark):
    df = _people(spark)
    got = {
        (r["city"], r["age_band"]): (r["group_size"], r["distinct_sensitive"])
        for r in l_diversity_violations(df, ["city", "age_band"], "condition", l=2).collect()
    }
    # nyc/20s has 2 distinct conditions -> passes l=2; single-condition
    # groups are the attribute-disclosure flags.
    assert got == {
        ("nyc", "30s"): (1, 1),
        ("sf", "20s"): (2, 1),
        (None, "40s"): (1, 1),
    }


def test_l_diversity_large_group_can_still_violate(spark):
    # 10 rows, same QI, one condition: k-anonymous at k=5, NOT 2-diverse.
    rows = [("nyc", "flu")] * 10
    df = spark.createDataFrame(rows, "city string, condition string")
    assert k_anonymity_violations(df, ["city"], k=5).count() == 0
    v = l_diversity_violations(df, ["city"], "condition", l=2).collect()
    assert len(v) == 1 and v[0]["distinct_sensitive"] == 1


def test_governance_validation(spark):
    df = _people(spark)
    with pytest.raises(ValueError, match="quasi-identifier"):
        k_anonymity_violations(df, [], k=3)
    with pytest.raises(ValueError, match="quasi-identifier"):
        l_diversity_violations(df, [], "condition")
