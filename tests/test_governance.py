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


def test_t_closeness_flags_skewed_group(spark):
    from laygo_python_spark.operators.governance import t_closeness_violations

    # global mix: 50/50 flu/cold; group 'skew' is 100% flu (TVD 0.5),
    # group 'even' mirrors the population (TVD 0).
    rows = [("skew", "flu")] * 4 + [("even", "flu")] * 2 + [("even", "cold")] * 2 + [
        ("rest", "cold")
    ] * 2
    df = spark.createDataFrame(rows, "grp string, cond string")
    got = {r["grp"]: r["tvd"] for r in t_closeness_violations(df, ["grp"], "cond", t=0.2).collect()}
    assert "even" not in got
    assert got["skew"] == pytest.approx(0.4, abs=1e-6)  # |1-0.6|/2 + |0-0.4|/2
    assert got["rest"] == pytest.approx(0.6, abs=1e-6)


def test_t_closeness_null_sensitive_excluded_and_empty_raises(spark):
    from laygo_python_spark.operators.governance import t_closeness_violations

    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("b", "x")], "grp string, cond string"
    )
    # single non-NULL condition -> every group matches the global mix
    assert t_closeness_violations(df, ["grp"], "cond", t=0.01).count() == 0
    nulls = spark.createDataFrame([("a", None)], "grp string, cond string")
    with pytest.raises(ValueError, match="no non-NULL sensitive rows"):
        t_closeness_violations(nulls, ["grp"], "cond")


def test_t_closeness_null_qi_group_joins_its_own_counts(spark):
    """A NULL-QI group must match its own per-sensitive counts (null-safe
    grid join, r9 advice): a perfectly population-mirroring NULL group
    has tvd 0, not the spurious 0.5 an equi-join would report."""
    from laygo_python_spark.operators.governance import t_closeness_violations

    rows = (
        [(None, "flu")] * 2 + [(None, "cold")] * 2   # NULL group: 50/50 = global mix
        + [("a", "flu")] * 2 + [("a", "cold")] * 2   # same mix
        + [("b", "flu")] * 4                         # 100% flu vs global 2/3 -> tvd 1/3
    )
    df = spark.createDataFrame(rows, "grp string, cond string")
    # NULL and 'a' are both 50/50 vs global (2/3, 1/3): tvd 1/6 < t=0.2.
    got = {r["grp"]: r["tvd"] for r in t_closeness_violations(df, ["grp"], "cond", t=0.2).collect()}
    assert None not in got and "a" not in got
    assert got == {"b": pytest.approx(1 / 3, abs=1e-6)}
