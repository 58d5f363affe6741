"""As-of join and salted-aggregation validation on hand-built goldens."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from laygo_python_spark.operators.asof import asof_join
from laygo_python_spark.operators.skew import salted_agg, salted_broadcast_join


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_backward_with_ties_and_misses(spark):
    probes = spark.createDataFrame(
        [
            Row(pid=1, k="a", t=ts("2024-01-01T10:00:00")),  # before any ref → null
            Row(pid=2, k="a", t=ts("2024-01-01T12:00:00")),  # exactly at ref r1 → tie included
            Row(pid=3, k="a", t=ts("2024-01-01T15:00:00")),  # after r2 → r2
            Row(pid=4, k="b", t=ts("2024-01-01T15:00:00")),  # other group → r3
        ]
    )
    refs = spark.createDataFrame(
        [
            Row(k="a", t=ts("2024-01-01T12:00:00"), v=10.0),  # r1
            Row(k="a", t=ts("2024-01-01T14:00:00"), v=20.0),  # r2
            Row(k="b", t=ts("2024-01-01T09:00:00"), v=99.0),  # r3
        ]
    )
    out = {r.pid: r.v_asof for r in asof_join(probes, refs, on="t", by=["k"], values=["v"]).collect()}
    assert out == {1: None, 2: 10.0, 3: 20.0, 4: 99.0}


def test_asof_multiple_value_columns_and_rowcount(spark):
    probes = spark.createDataFrame([Row(pid=i, k="x", t=ts(f"2024-01-01T10:0{i}:00")) for i in range(5)])
    refs = spark.createDataFrame([Row(k="x", t=ts("2024-01-01T10:02:00"), v=1.0, w="hello")])
    out = asof_join(probes, refs, on="t", by=["k"], values=["v", "w"]).orderBy("pid").collect()
    assert len(out) == 5  # left-join semantics: every probe survives
    assert [r.v_asof for r in out] == [None, None, 1.0, 1.0, 1.0]
    assert [r.w_asof for r in out] == [None, None, "hello", "hello", "hello"]


def test_salted_agg_equals_plain_agg(spark, sf_dir):
    from laygo_python_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    plain = {
        (r.event_type): (r.n, round(r.t, 2))
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t")).collect()
    }
    salted = {
        (r.event_type): (r.n, round(r.total_raw, 2))
        for r in salted_agg(
            ev, ["event_type"], {"n": F.count(F.lit(1)), "total_raw": F.sum("value")}, n_salts=8
        ).collect()
    }
    assert salted == plain


def test_salted_agg_min_max_merge(spark):
    df = spark.createDataFrame([(k, v) for k in "ab" for v in range(10)], ["k", "v"])
    out = {
        r.k: (r.min_v, r.max_v)
        for r in salted_agg(df, ["k"], {"min_v": F.min("v"), "max_v": F.max("v")}, n_salts=4).collect()
    }
    assert out == {"a": (0, 9), "b": (0, 9)}


def test_salted_broadcast_join_equals_plain_join(spark):
    fact = spark.createDataFrame([(i % 3, i) for i in range(100)], ["key", "v"])
    dim = spark.createDataFrame([(0, "zero"), (1, "one"), (2, "two")], ["key", "name"])
    plain = sorted((r.key, r.v, r.name) for r in fact.join(dim, "key").collect())
    salted = sorted((r.key, r.v, r.name) for r in salted_broadcast_join(fact, dim, "key", n_salts=4).collect())
    assert salted == plain


def test_pack_sequences_invariants(spark, sf_dir):
    """Packing invariants: every doc in exactly one bin; no multi-doc bin
    over budget; oversized docs isolated in singleton bins."""
    from laygo_python_spark.operators.packing import pack_sequences
    from laygo_python_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.trim("text"), " ")).cast("long").alias("n_tokens")
    )
    total_docs = docs.count()
    bins = pack_sequences(docs, budget=128).collect()
    packed = [d for b in bins for d in b.doc_ids]
    assert len(packed) == total_docs and len(set(packed)) == total_docs
    for b in bins:
        assert b.n_docs == len(b.doc_ids)
        if b.n_docs > 1:
            assert b.total_tokens <= 128
    # packing efficiency: with ~40-token docs and 128 budget, bins should
    # average well above one doc
    assert sum(b.n_docs for b in bins) / len(bins) > 1.5


def test_pack_sequences_oversized_doc_isolated(spark):
    from laygo_python_spark.operators.packing import pack_sequences

    # coalesce(1): packing is partition-local by design, so co-binning
    # assertions need the docs in one partition
    docs = spark.createDataFrame([(1, 1000), (2, 50), (3, 60)], ["doc_id", "n_tokens"]).coalesce(1)
    bins = pack_sequences(docs, budget=128).collect()
    by_doc = {d: b for b in bins for d in b.doc_ids}
    assert by_doc[1].n_docs == 1 and by_doc[1].total_tokens == 1000
    assert by_doc[2].bin_id == by_doc[3].bin_id  # 50+60 fit one bin


def test_salted_agg_merge_inferred_from_function_not_name(spark):
    """An output NAMED 'minutes_total' over a sum() must merge by
    summation — r1 inferred the merge from the name prefix and would
    have min()'d it silently (ADVICE r1)."""
    df = spark.createDataFrame([("a", 10), ("a", 20), ("b", 5)], ["k", "mins"])
    out = {
        r.k: r.minutes_total
        for r in salted_agg(df, ["k"], {"minutes_total": F.sum("mins")}, n_salts=4).collect()
    }
    assert out == {"a": 30, "b": 5}


def test_salted_agg_rejects_non_decomposable(spark):
    import pytest

    df = spark.createDataFrame([("a", 1.0)], ["k", "v"])
    with pytest.raises(ValueError, match="decomposable"):
        salted_agg(df, ["k"], {"avg_v": F.avg("v")}, n_salts=4)


def test_salted_agg_explicit_merge_spec(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2)], ["k", "v"])
    out = salted_agg(
        df, ["k"], {"total": (F.sum("v").cast("double"), "sum")}, n_salts=4
    ).collect()
    assert out[0].total == 3.0


def test_asof_join_attaches_null_from_matched_row(spark):
    """A matched reference row whose value IS NULL must attach NULL —
    not an older non-null value (pd.merge_asof semantics, ADVICE r1).
    With several value columns, all must come from the same row."""
    probes = spark.createDataFrame([("k", 10, 1)], ["k", "t", "pid"])
    refs = spark.createDataFrame(
        [("k", 1, 100, "old"), ("k", 5, None, "new")],
        "k string, t long, v long, w string",
    )
    row = asof_join(probes, refs, on="t", by=["k"], values=["v", "w"]).collect()[0]
    assert row.v_asof is None  # the t=5 row matched; its v is NULL
    assert row.w_asof == "new"  # and w comes from that same row


def test_sketch_merge_matches_exact_within_tolerance(spark, sf_dir):
    from laygo_python_spark.queries.relational4 import sketch_merge_daily_users

    row = sketch_merge_daily_users(spark, sf_dir).collect()[0]
    assert row["n_days"] >= 28
    assert row["rel_err"] < 0.05, row


def test_asof_tolerance_matches_pandas(spark):
    # Differential vs pd.merge_asof(tolerance=...): matches staler than
    # the tolerance must come back NULL, fresh ones unchanged.
    import pandas as pd

    probes_pd = pd.DataFrame({"k": [1, 1, 1, 2], "t": [10, 25, 100, 50], "pid": [0, 1, 2, 3]})
    refs_pd = pd.DataFrame({"k": [1, 1, 2], "t": [8, 20, 10], "v": [1.0, 2.0, 9.0]})
    want = pd.merge_asof(
        probes_pd.sort_values("t"),
        refs_pd.sort_values("t"),
        on="t",
        by="k",
        tolerance=15,
    ).set_index("pid")["v"]

    probes = spark.createDataFrame(probes_pd)
    refs = spark.createDataFrame(refs_pd)
    got = {
        r["pid"]: r["v_asof"]
        for r in asof_join(probes, refs, on="t", by=["k"], values=["v"], tolerance=15).collect()
    }
    for pid in probes_pd["pid"]:
        w = want.loc[pid]
        g = got[pid]
        assert (pd.isna(w) and g is None) or w == g, (pid, w, g)


def test_asof_no_tolerance_unchanged(spark):
    probes = spark.createDataFrame([(1, 100, 0)], "k int, t int, pid int")
    refs = spark.createDataFrame([(1, 1, 7.0)], "k int, t int, v double")
    out = asof_join(probes, refs, on="t", by=["k"], values=["v"]).first()
    assert out["v_asof"] == 7.0  # arbitrarily stale still matches without tolerance


def test_asof_directions_match_pandas(spark):
    # Differential vs pd.merge_asof across all three directions,
    # with and without tolerance, including exact-distance ties
    # (probe t=30 sits exactly between refs at 25 and 35).
    import pandas as pd

    probes_pd = pd.DataFrame(
        {"k": [1, 1, 1, 1, 2, 2], "t": [5, 22, 30, 90, 7, 60], "pid": [0, 1, 2, 3, 4, 5]}
    )
    refs_pd = pd.DataFrame(
        {"k": [1, 1, 1, 2, 2], "t": [10, 25, 35, 8, 40], "v": [1.0, 2.0, 3.0, 9.0, 8.0]}
    )
    probes = spark.createDataFrame(probes_pd)
    refs = spark.createDataFrame(refs_pd)
    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 10):
            want = pd.merge_asof(
                probes_pd.sort_values("t"),
                refs_pd.sort_values("t"),
                on="t",
                by="k",
                direction=direction,
                **({} if tol is None else {"tolerance": tol}),
            ).set_index("pid")["v"]
            got = {
                r["pid"]: r["v_asof"]
                for r in asof_join(
                    probes, refs, on="t", by=["k"], values=["v"],
                    direction=direction, tolerance=tol,
                ).collect()
            }
            for pid in probes_pd["pid"]:
                w, g = want.loc[pid], got[pid]
                assert (pd.isna(w) and g is None) or w == g, (direction, tol, pid, w, g)


def test_asof_bad_direction_raises(spark):
    import pytest

    probes = spark.createDataFrame([(1, 1, 0)], "k int, t int, pid int")
    with pytest.raises(ValueError, match="unknown direction"):
        asof_join(probes, probes, on="t", by=["k"], values=["pid"], direction="sideways")


def test_pack_sequences_bins_query_deterministic(spark, sf_dir):
    # The registered packing query must produce an identical row set on
    # repeated runs (the driver gate re-executes it): md5 group routing +
    # in-group (tokens desc, doc_id) order pins the packing outcome
    # independent of partition layout.
    from laygo_python_spark.queries import QUERIES, load_all

    load_all()
    a = sorted(map(tuple, QUERIES["pack_sequences_bins"](spark, sf_dir).collect()))
    b = sorted(map(tuple, QUERIES["pack_sequences_bins"](spark, sf_dir).collect()))
    assert a == b and a
    # every bin respects the budget unless it holds a single oversized doc
    assert all(t <= 512 or n == 1 for _, _, t, n in a)


def _ffd_reference(items, budget, max_open):
    """Pure-Python replica of the capped-first-fit state machine —
    the differential ground truth for pack_sequences_grouped."""
    loads, ndocs, open_idx = [], [], []
    for t in items:
        for j in open_idx:
            if loads[j] + t <= budget:
                loads[j] += t
                ndocs[j] += 1
                break
        else:
            loads.append(t)
            ndocs.append(1)
            open_idx.append(len(loads) - 1)
            if len(open_idx) > max_open:
                open_idx.pop(0)
    return list(zip(range(1, len(loads) + 1), loads, ndocs))


def test_pack_sequences_grouped_differential(spark):
    # Random corpus (sizes spanning < and > budget) → the Spark grouped
    # operator must equal the pure-Python state machine, group by group.
    import random

    from laygo_python_spark.operators.packing import pack_sequences_grouped

    rng = random.Random(7)
    rows = [(i, rng.randint(1, 700)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long").repartition(13)
    got = sorted(
        map(tuple, pack_sequences_grouped(df, budget=512, n_groups=4).collect())
    )
    import hashlib

    def grp_of(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:6], 16) % 4

    expect = []
    for g in range(4):
        items = sorted(
            ((t, i) for i, t in rows if grp_of(i) == g), key=lambda p: (-p[0], p[1])
        )
        for bin_id, tot, n in _ffd_reference([t for t, _ in items], 512, 64):
            expect.append((g, bin_id, tot, n))
    assert got == sorted(expect)


def test_pack_sequences_grouped_max_open_cap(spark):
    # With max_open=1 a bin CLOSES as soon as a second one opens: doc 4
    # (size 1, packed last under tokens-desc order) can no longer reach
    # bins 1-2 (each 9, both closed) even though 9+1 <= 10 — it lands in
    # the newest open bin instead. One group so the scenario is exact.
    # Order (tokens desc, id asc): 9, 9, 3, 1 → bin1=9 (closes when bin2
    # opens), bin2=9 (closes when bin3 opens), bin3=3+1=4.
    from laygo_python_spark.operators.packing import pack_sequences_grouped

    df = spark.createDataFrame(
        [(1, 9), (2, 3), (3, 9), (4, 1)], "doc_id long, n_tokens long"
    )
    got = sorted(
        (r["bin_id"], r["total_tokens"], r["n_docs"])
        for r in pack_sequences_grouped(
            df, budget=10, n_groups=1, max_open=1
        ).collect()
    )
    assert got == [(1, 9, 1), (2, 9, 1), (3, 4, 2)]


def test_pack_sequences_grouped_layout_independent(spark):
    # Same corpus, wildly different input partitioning → identical bins
    # (the whole point of the grouped variant vs pack_sequences).
    from laygo_python_spark.operators.packing import pack_sequences_grouped

    rows = [(i, (i * 37) % 600 + 1) for i in range(300)]
    a = spark.createDataFrame(rows, "doc_id long, n_tokens long").coalesce(1)
    b = spark.createDataFrame(rows[::-1], "doc_id long, n_tokens long").repartition(17)
    pa = sorted(map(tuple, pack_sequences_grouped(a, budget=512).collect()))
    pb = sorted(map(tuple, pack_sequences_grouped(b, budget=512).collect()))
    assert pa == pb and pa


def test_pack_sequences_grouped_with_doc_ids_membership(spark):
    # with_doc_ids=True: bins carry membership; every doc appears in
    # exactly one bin and each bin's doc count/total matches its list.
    from laygo_python_spark.operators.packing import pack_sequences_grouped

    rows = [(i, (i * 53) % 400 + 1) for i in range(200)]
    toks = dict(rows)
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences_grouped(df, budget=512, n_groups=4, with_doc_ids=True).collect()
    seen = []
    for r in out:
        assert r["n_docs"] == len(r["doc_ids"])
        assert r["total_tokens"] == sum(toks[d] for d in r["doc_ids"])
        seen.extend(r["doc_ids"])
    assert sorted(seen) == [i for i, _ in rows]


def test_pack_sequences_grouped_string_ids(spark):
    # r8 review: membership must keep the caller's id type — string ids
    # route through the md5 hash and come back as array<string>.
    from laygo_python_spark.operators.packing import pack_sequences_grouped

    rows = [(f"doc-{i}", (i * 31) % 200 + 1) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id string, n_tokens long")
    out = pack_sequences_grouped(df, budget=256, n_groups=2, with_doc_ids=True).collect()
    seen = sorted(d for r in out for d in r["doc_ids"])
    assert seen == sorted(i for i, _ in rows)


def test_pack_sequences_grouped_parameter_sweep_differential(spark):
    # Broader config coverage for the capped-FFD state machine: several
    # (budget, n_groups, max_open) corners — tiny budgets (every doc
    # oversized), tight caps (constant closing), many groups (sparse
    # groups) — each against the pure-Python reference.
    import hashlib
    import random

    from laygo_python_spark.operators.packing import pack_sequences_grouped

    rng = random.Random(29)
    rows = [(i, rng.randint(1, 300)) for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    for budget, n_groups, max_open in ((64, 2, 2), (1, 3, 64), (300, 1, 1), (128, 16, 4)):
        got = sorted(
            map(
                tuple,
                pack_sequences_grouped(
                    df, budget=budget, n_groups=n_groups, max_open=max_open
                ).collect(),
            )
        )
        expect = []
        for g in range(n_groups):
            items = sorted(
                ((t, i) for i, t in rows
                 if int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16) % n_groups == g),
                key=lambda p: (-p[0], p[1]),
            )
            for bin_id, tot, n in _ffd_reference([t for t, _ in items], budget, max_open):
                expect.append((g, bin_id, tot, n))
        assert got == sorted(expect), (budget, n_groups, max_open)


def test_pack_sequences_grouped_null_ids_dropped(spark):
    # r9 advice: a NULL id md5s to a NULL group and used to crash
    # int(grp) inside the executor — unidentifiable docs are dropped
    # deterministically instead.
    from laygo_python_spark.operators.packing import pack_sequences_grouped

    df = spark.createDataFrame(
        [(1, 9), (None, 3), (3, 9), (None, 1)], "doc_id long, n_tokens long"
    )
    got = sorted(
        (r["bin_id"], r["total_tokens"], r["n_docs"])
        for r in pack_sequences_grouped(df, budget=10, n_groups=1).collect()
    )
    assert got == [(1, 9, 1), (2, 9, 1)]  # the two NULL-id docs are gone
