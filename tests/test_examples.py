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


def test_pretraining_pipeline_end_to_end(spark, sf_dir, tmp_path):
    import pretraining_pipeline as pp

    counts = pp.run(spark, sf_dir, str(tmp_path))
    assert (
        counts["ingested"]
        > counts["after_ingest_gate"]
        >= counts["after_quality"]
        >= counts["after_dedup"]
        >= counts["after_decontamination"]
        > 0
    )
    # the gate drops EXACTLY the previously-ingested docs (every 7th:
    # bloom false positives must be rescued by the exact anti-join)
    assert counts["ingested"] - counts["after_ingest_gate"] == (counts["ingested"] + 6) // 7
    # the partitioned output reads back split-pruned
    back = spark.read.parquet(str(tmp_path / "documents"))
    assert set(r["split"] for r in back.select("split").distinct().collect()) == {"train", "eval"}
    # every packed bin respects the token budget unless it is a single oversized doc
    import pyspark.sql.functions as F

    bins = spark.read.parquet(str(tmp_path / "packed_bins"))
    bad = bins.filter((F.col("total_tokens") > 512) & (F.col("n_docs") > 1)).count()
    assert bad == 0


def test_warehouse_maintenance_end_to_end(spark, sf_dir, tmp_path):
    from examples.warehouse_maintenance import run as wh_run

    stats = wh_run(spark, sf_dir, str(tmp_path))
    assert stats["changed_rows"] > 0
    assert stats["scd2_versions"] > 0
    assert stats["grid_rows"] > 0
    assert stats["files_before"] == 24 and stats["files_after"] < 24
    back = spark.read.parquet(str(tmp_path / "dim_customer"))
    assert back.count() >= 150  # sf0.001 customer count


def test_incremental_analytics(spark):
    import incremental_analytics as inc

    from laygo_python_spark.sources.python_datasource import register

    register(spark)
    top, distinct_est, n_maybe_seen, mg_top, drift_cert = inc.incremental_heavy_users(spark)
    # 120k events over user_id = id % 1000 → every user ~120 events;
    # CMS estimates bound truth from above, HLL is within 5%.
    assert len(top) == 10
    assert all(est >= 120 for _, est in top)
    assert abs(distinct_est - 1000) <= 50
    # Bloom: of the 10k probes only user 0 is a real member; the rest
    # pass at ~fpp (2^17 bits over 1000 keys → well under 1%).
    assert 1 <= n_maybe_seen <= 100
    # MG certificate on a uniform stream: estimates never exceed the
    # true per-user count (~120), certifying no heavy user exists.
    assert len(mg_top) <= 5
    assert all(0 < est <= 150 for _, est in mg_top)
    # Drift certificate from stored histograms: the generator is
    # stationary across shards, so PSI/JSD are ~0.
    psi, jsd = drift_cert
    assert psi < 0.01 and jsd < 0.01, drift_cert


def test_migration_http_worker(spark):
    assert ex.http_worker(spark) == [2, 4, 6, 8, 10]


def test_retrieval_stack_end_to_end(spark, sf_dir):
    from examples.retrieval_stack import run as rs_run

    stats = rs_run(spark, sf_dir)
    assert stats["n_lex"] == 20 and stats["n_dense"] == 20
    # fusion returns a full, deduplicated top-10
    assert len(stats["fused_ids"]) == 10
    assert len(set(stats["fused_ids"])) == 10
    # the judgment table is derived from the same corpus the lexical
    # leg retrieves from, so the fused list must contain relevant docs
    assert 0.0 < stats["ndcg"] <= 1.0
    assert 0.0 < stats["mrr"] <= 1.0
    assert stats["p_at_k"] > 0.0
    assert stats["n_contaminated"] >= 0


def test_curation_budget_end_to_end(spark, sf_dir):
    from examples.curation_budget import TOKEN_BUDGET, run as cb_run

    stats = cb_run(spark, sf_dir)
    assert 0 < stats["n_after_dedup"] <= stats["n_docs"]
    assert sum(stats["bucket_counts"].values()) == stats["n_after_dedup"]
    assert 0 < stats["n_selected"] <= stats["n_after_dedup"]
    # the budget bound held: mean * n is the selected token mass
    assert stats["selected_token_mean"] * stats["n_selected"] <= TOKEN_BUDGET
    assert stats["selected_token_var"] >= 0.0
    # one released row per source present in the selection
    assert len(stats["released_mix"]) >= 1


def test_ann_maintenance_end_to_end(spark, sf_dir, tmp_path):
    from examples.ann_maintenance import run as am_run

    stats = am_run(spark, sf_dir, str(tmp_path / "ivf"))
    assert stats["n_added"] > 0
    assert stats["cell_skew"] >= 1.0
    assert stats["worst_distortion_inflation"] >= 0.0
    assert 0.0 < stats["worst_appended_frac"] <= 1.0
    assert isinstance(stats["retrain_recommended"], bool)
    # compaction is search-identical — the OPTIMIZE contract
    assert stats["search_identical_after_compact"]
    assert len(stats["topk_before"]) > 0
