"""Query-level cross-validation for rows-only catalog entries that have
no DuckDB oracle: each gets a semantic pin here so "rows-only" never
means "unchecked". (Operator-level tests live in test_dedup /
test_similarity etc.; these assert the REGISTERED query behaves.)
"""

from __future__ import annotations

from laygo_python_spark.queries import QUERIES, load_all

load_all()


def test_minhash_signature_sample_shape_and_determinism(spark, sf_dir):
    a = QUERIES["minhash_signature_sample"](spark, sf_dir).collect()
    b = QUERIES["minhash_signature_sample"](spark, sf_dir).collect()
    assert len(a) > 0
    # Scalar-only columns (the driver canon sorts across all columns —
    # array cells are unhashable there, r2's one red row).
    by_doc = {}
    for r in a:
        assert isinstance(r["value"], int)
        by_doc.setdefault(r["doc_id"], []).append(r["slot"])
    assert all(sorted(slots) == list(range(8)) for slots in by_doc.values())
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # Driver-canon compatibility: pandas sort_values over every column
    # must not throw on the result's cell types.
    import pandas as pd

    pdf = pd.DataFrame([r.asDict() for r in a])
    pdf.sort_values(by=list(pdf.columns))


def test_approx_sketches_within_tolerance(spark, sf_dir):
    # catalog-retired in r8 (engine-versioned estimates have no honest
    # oracle; hll_relational_daily_users is the oracle-green twin) but
    # still pytest-gated as the built-in sketch API smoke check
    from laygo_python_spark.queries.relational4 import approx_sketches

    for r in approx_sketches(spark, sf_dir).collect():
        # HLL++ at default rsd=5%; generous bound for tiny groups.
        assert abs(r["approx_parts"] - r["exact_parts"]) <= max(3, 0.15 * r["exact_parts"]), r


def test_fast_cosine_topk_matches_exact_fold(spark, sf_dir):
    exact = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["sim"])
        for r in QUERIES["embedding_cosine_topk"](spark, sf_dir).collect()
    }
    fast = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["sim"])
        for r in QUERIES["embedding_cosine_topk_fast"](spark, sf_dir).collect()
    }
    assert exact.keys() == fast.keys()
    for key, (nid, sim) in exact.items():
        fnid, fsim = fast[key]
        assert fnid == nid, (key, nid, fnid)
        assert abs(fsim - sim) < 1e-9


def test_multimodal_decode_features_contract(spark, sf_dir):
    rows = QUERIES["multimodal_decode_features"](spark, sf_dir).collect()
    assert len(rows) > 0
    cols = set(rows[0].asDict())
    assert {"media_id", "width", "height"} <= cols
    assert {f"f{i}" for i in range(8)} <= cols  # scalar slots (oracle-hashable)
    # Deterministic stub: same input → identical output.
    again = QUERIES["multimodal_decode_features"](spark, sf_dir).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))


def test_cms_heavy_hitters_semantic_pin(spark, sf_dir):
    # The registered query must honor the CMS contract on real data:
    # every estimate bounds its exact twin from above, overcount is
    # exactly est - exact, and repeated runs agree (seeded hashes).
    a = QUERIES["cms_heavy_hitters"](spark, sf_dir).collect()
    assert 0 < len(a) <= 20
    for r in a:
        assert r["est"] >= r["exact"] >= 1, r
        assert r["overcount"] == r["est"] - r["exact"], r
    b = QUERIES["cms_heavy_hitters"](spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_qsketch_value_quantiles_semantic_pin(spark, sf_dir):
    rows = QUERIES["qsketch_value_quantiles"](spark, sf_dir).collect()
    assert [r["q"] for r in rows] == [0.5, 0.95, 0.99]
    for r in rows:
        # gamma=1.02 → relative error ≤ ~2(gamma-1); rel_err is derived.
        assert r["rel_err"] <= 0.04, r
        assert abs(r["rel_err"] - abs(r["est"] - r["exact"]) / r["exact"]) < 1e-3


def test_ann_pq_topk_semantic_pin(spark, sf_dir):
    rows = QUERIES["ann_pq_topk"](spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, rs in by_q.items():
        assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] == list(range(1, 11))
        sims = [r["sim"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)
        assert all(r["neighbor_id"] != q for r in rs)


def test_ann_ivfpq_topk_semantic_pin(spark, sf_dir):
    rows = QUERIES["ann_ivfpq_topk"](spark, sf_dir).collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) <= {0, 1, 2, 3, 4}
    for q, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(ranks) + 1))
        assert all(r["neighbor_id"] != q for r in rs)


def test_hll_relational_daily_users_semantic_pin(spark, sf_dir):
    """Each day's estimate within 10% of that day's exact distinct
    users; the merged estimate within 10% of the exact 3-day union
    (p=12 → rse 1.6%, so 10% is ~6 sigma of slack)."""
    from pyspark.sql import functions as F

    from laygo_python_spark.session import read_table

    rows = {r["day"]: r["est_distinct"] for r in QUERIES["hll_relational_daily_users"](spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    days = [d for d in rows if d != "merged"]
    assert len(days) == 3 and "merged" in rows
    union_exact = (
        ev.filter(F.col("day").cast("string").isin(days)).select("user_id").distinct().count()
    )
    assert abs(rows["merged"] - union_exact) / union_exact < 0.1
    for d in days:
        exact = ev.filter(F.col("day").cast("string") == d).select("user_id").distinct().count()
        assert abs(rows[d] - exact) / exact < 0.1, (d, rows[d], exact)
