"""Catalog-wide anti-pattern sweep: build the physical plan of EVERY
registered query at sf0.001 and reject the three classic scale-killers —
cartesian products, row-at-a-time Python UDFs, and full-column scans that
ignore pruning. Individual plan-shape assertions live in test_plans.py;
this is the net that catches a regression in any query nobody thought to
pin.
"""

from __future__ import annotations

import pytest

from laygo_python_spark.plans import physical_plan
from laygo_python_spark.queries import ORACLES, QUERIES, load_all

load_all()

# Queries whose body drives execution rather than returning a lazy plan
# (streaming run-to-completion, driver-fixpoint loops, k-means training):
# their plan is either unavailable or not meaningful to sweep.
_EXECUTING = {
    "stream_hourly_counts",
    "stream_session_windows",
    "stream_incremental_dedup",
    "stream_substring_dedup",
    "loop_double",
    "dedup_cluster_representatives",
    "ann_ivf_topk",
}

# brute-force exact ANN is O(n·q) by design — the documented exact
# baseline; every scale path (LSH/IVF) is bucketed.
# ngram_jaccard_pairs: the bitmask strategy's broadcast NLJ runs over
# DISTINCT gram-set masks, and only fires when the global vocabulary is
# <= 64 grams — the deduped set space is then tiny relative to the
# corpus and the broadcast is self-limiting (the blocked/prefix paths
# join on equi keys and never NLJ).
_KNOWN_BNLJ = {
    # the min-bands grid join: SIX broadcast threshold rows fanned
    # against the O(candidates) LSH pair stream (n_bands >= m is
    # inherently non-equi); bounded by construction
    "lsh_threshold_tuning",
    # same grid idiom (FIVE broadcast n_probe rows vs the one-pass
    # probe-ranked candidate stream; probe_rank <= n_probe is
    # inherently non-equi) PLUS brute_force_topk's documented exact
    # ground-truth scan (gate-scale/sampled audit input at 100 TB)
    "ivf_nprobe_recall_curve",
    # grid idiom again (SIX broadcast radius rows vs the pigeonhole
    # candidate stream; hamming <= r is non-equi) + the exact-Jaccard
    # truth join's documented audit-scale scan
    "simhash_radius_tuning",
    "embedding_cosine_topk",
    "embedding_cosine_topk_fast",
    "embedding_near_dups",
    # exact top-k in the PCA-reduced space: same intentional
    # broadcast-the-queries exhaustive scan as embedding_cosine_topk
    # (brute_force_topk docstring), on 8x smaller vectors
    "embedding_pca_topk",
    "ngram_jaccard_pairs",
    # same operator, same bitmask-path rationale, filtered to cross-side pairs
    "dedup_new_vs_seen",
    # Hamming shortlist = intentional exhaustive scan over packed SIGN
    # CODES (32x smaller than the vectors, XOR+popcount per row) — the
    # compressed-domain analog of the cosine baseline's broadcast scan;
    # sub-linear variants are the LSH/IVF families
    "ann_binary_rerank_topk",
    # exact negative mining: the label-mismatch predicate is non-equi by
    # design (it must see EVERY cross-label pair), fused into the same
    # broadcast-the-anchors exhaustive scan as embedding_cosine_topk
    "hard_negative_mining",
    # dense leg of the hybrid fusion = brute_force_topk's intentional
    # broadcast-the-queries exhaustive scan (the fusion itself is
    # O(N·k) over the retriever heads)
    "rrf_hybrid_topk",
    # both rankings (full-dim and 16-dim prefix) are the same
    # intentional exact-baseline scan; the truncated leg is the 4x
    # byte saving being measured
    "embedding_matryoshka_recall",
    # eval embeddings broadcast against the corpus by design — eval
    # sets are tiny next to the corpus, and the per-row argmax folds
    # map-side into a partial max(struct) aggregation
    "decontaminate_semantic",
}

# Arrow-batched Python surfaces (mapInPandas/applyInPandas/cogroup) are
# the documented escape hatch — allowed; only ROW-AT-A-TIME eval is not.
_SWEEP = sorted(set(QUERIES) - _EXECUTING)


@pytest.mark.parametrize("name", _SWEEP)
def test_no_scale_killers(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        # Driver-canonicalizer contract: oracle-gated queries must emit
        # SCALAR output columns only — the driver's pandas sort_values
        # crashes on array/map cells (CORRECTNESS_r07 embedding_pca_project).
        from pyspark.sql.types import ArrayType, MapType

        bad = [f.name for f in df.schema.fields if isinstance(f.dataType, (ArrayType, MapType))]
        assert not bad, f"{name}: array/map-typed oracle output columns {bad}"
    plan = physical_plan(df)
    if name not in _KNOWN_BNLJ:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        # A broadcast CROSS nested-loop is the scalar-attach pattern
        # (crossJoin(broadcast(1-row agg)) — e.g. a global threshold or
        # doc count) and is the right plan; any OTHER nested-loop join
        # (non-cross condition, non-broadcast) is a scale killer.
        for line in plan.splitlines():
            if "BroadcastNestedLoopJoin" in line:
                assert ", Cross" in line, f"{name}: non-cross nested-loop join: {line.strip()}"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"


# ---------------------------------------------------------------------------
# Partition-less Window lint: `Window.orderBy(...)` with no partitionBy
# funnels its ENTIRE input through one task — the classic works-at-sf0.01
# dies-at-100TB trap. A partition-less Window is acceptable ONLY over a
# provably bounded frame. Auto-allowed: a Limit anywhere below the Window
# (TakeOrdered first, rank the k survivors). Name-allowed: frames bounded
# by construction where the bound isn't visible in the plan shape.
_BOUNDED_WINDOW_QUERIES = {
    # drift_from_counts' keys=[] global totals window runs over the
    # merged CELL histograms — ≤ 2·n_centroids (= 32) rows by
    # construction, never raw vectors.
    "embedding_cell_drift",
    # qsketch bucket table is <= O(log(range)/log(1+2*eps)) rows
    # (operators/qsketch.py:99) — the cumulative-count window runs over
    # sketch buckets, never raw rows.
    "qsketch_value_quantiles",
    "feature_bucket_boundaries",
    # Misra-Gries candidate set is <= k rows by the sketch's guarantee
    # (operators/heavyhitters.py:87).
    "mg_heavy_hitters_brands",
    # bitmask strategy's bit-assignment window runs over the distinct
    # gram vocabulary ONLY when it's <= 64 grams (operators/dedup.py:471
    # gates on the count) — bounded by the strategy precondition.
    "ngram_jaccard_pairs",
    "dedup_new_vs_seen",
    # composes the blocked exact-Jaccard verify, whose auto strategy
    # picks the bitmask path at test scale — same <=64-gram gate.
    "dedup_minhash_verified",
}


def _unbounded_global_windows(df) -> list[str]:
    """Partition-less Window nodes in the optimized logical plan whose
    subtree contains no Limit (i.e. nothing bounds the rows the single
    window task would receive)."""

    def subtree_bounded(node) -> bool:
        name = node.getClass().getSimpleName()
        if "Limit" in name:  # GlobalLimit / LocalLimit
            return True
        return any(
            subtree_bounded(node.children().apply(i))
            for i in range(node.children().size())
        )

    bad: list[str] = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name == "Window" and node.partitionSpec().isEmpty():
            if not subtree_bounded(node):
                bad.append(node.simpleString(120))
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return bad


@pytest.mark.parametrize("name", _SWEEP)
def test_no_unbounded_global_window(spark, sf_dir, name):
    if name in _BOUNDED_WINDOW_QUERIES:
        pytest.skip("window frame bounded by construction (see allowlist)")
    bad = _unbounded_global_windows(QUERIES[name](spark, sf_dir))
    assert not bad, f"{name}: partition-less Window over unbounded input: {bad}"


# ---------------------------------------------------------------------------
# Oracle output-dtype lint: the driver's gate fetches the DuckDB side
# through pandas (`rel.df()`), where HUGEINT and DECIMAL render as
# float64 while Spark's BIGINT renders as int64 — value-identical rows
# then hash differently (CORRECTNESS_r08 embedding_binary_quantize:
# a bare integer `sum(...)` promoted to HUGEINT was the round's only
# red). DuckDB promotes every integer `sum()` this way, so the repo's
# convention is `CAST(sum(...) AS BIGINT)`; this lint type-checks every
# oracle (plan only, no execution) and rejects any output type outside
# the kinds Spark can emit identically through the pandas path.
_ORACLE_OK_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN"}


def test_oracle_output_dtypes():
    import duckdb

    from laygo_python_spark.session import TABLES

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    bad = []
    for name, sql in sorted(ORACLES.items()):
        rel = con.sql(sql)
        for c, ty in zip(rel.columns, rel.types):
            base = str(ty).split("(")[0]
            if base not in _ORACLE_OK_TYPES:
                bad.append(f"{name}.{c}: {ty}")
    assert not bad, (
        "oracle output columns with pandas-divergent DuckDB types "
        f"(HUGEINT/DECIMAL/DATE/... — cast them in the oracle SQL): {bad}"
    )


# ---------------------------------------------------------------------------
# Plan-shape regression gate (r10 verdict ask #6): PLAN_AUDIT.md is a
# generated report a human triages; nothing STOPPED a future edit from
# silently adding a single-partition hazard between triages. This test
# diffs every query's (exchanges, broadcasts, python_stages,
# single_partition, windows) tuple against the committed baseline
# (tests/plan_baseline.json) and fails on any WORSENING — an intentional
# plan change regenerates the baseline via tools/gen_plan_baseline.py
# and carries the triage in its commit message. Improvements pass (and
# are worth a baseline refresh, but must not break the suite).
_BASELINE_METRICS = ("exchanges", "broadcasts", "python_stages", "single_partition", "windows")


def test_plan_shape_baseline(spark, sf_dir):
    import json
    import os

    from tools.plan_audit import audit_one

    path = os.path.join(os.path.dirname(__file__), "plan_baseline.json")
    with open(path) as f:
        baseline = json.load(f)

    regressions: list[str] = []
    missing: list[str] = []
    for name in _SWEEP:
        if name not in baseline:
            missing.append(name)
            continue
        row = audit_one(name, QUERIES[name], spark)
        if row is None or "error" in row:
            regressions.append(f"{name}: plan build failed: {row and row.get('error')}")
            continue
        worse = {
            m: (baseline[name][m], row[m])
            for m in _BASELINE_METRICS
            if row[m] > baseline[name][m]
        }
        if worse:
            regressions.append(f"{name}: {worse}")
    assert not missing, (
        "queries absent from tests/plan_baseline.json — run "
        f"tools/gen_plan_baseline.py and commit the triaged diff: {missing}"
    )
    assert not regressions, (
        "plan-shape WORSENED vs tests/plan_baseline.json (metric: "
        "(baseline, now)). If intentional, regenerate via "
        f"tools/gen_plan_baseline.py and triage in the commit: {regressions}"
    )
