"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the engine's operator catalog
(laygo_python_spark/queries/*) for the sf0.01 DuckDB correctness gate.
Column aliases match between Spark results and oracle SQL — the driver's
compare sorts columns by name before hashing values.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may import this file by path from any cwd — make the
# package importable regardless.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-style pricing summary: scan → pushed filter → partial+final
    aggregation (see laygo_python_spark/queries/relational.py).
    """
    from laygo_python_spark.queries.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


# Driver-rotation steering (round 10): the correctness gate checks the
# FIRST 50 entries of queries() per round. Priority order this round:
# (a) FRESHNESS FIRST (r9 verdict ask #1) — all 20 names whose latest
# driver check is r05, including §2-core reduce_sum/union_keys; after
# this round no catalog name's latest driver row is older than r6;
# (b) the 6 r10-new queries (ANN-routed kNN vote, DP noisy counts,
# token-budget curation, mergeable moments, quality buckets, dedup
# savings report); (c) every query whose CODE changed in r10 —
# t_closeness_audit (null-safe QI grid join), retrieval_eval_ndcg
# (rank<=k filter), cms_join_size_estimate (DECIMAL accumulate),
# ann_binary_rerank_topk (auto-gated pre-prune), the index-append
# family (view/background-writes path), and the iterative graph family
# (wd layout + round-1 fold + AQE parallelism floor); (d) fill to 50
# with the oldest r6-stale names (TPC-H sweep shapes + 2 ANN).
# Recompute per round from the CORRECTNESS_r*.json union.
_ROTATION_FRONT = [
    # (a) latest check r05 — all 20
    "array_functions", "date_functions", "map_type_roundtrip",
    "math_functions", "minhash_signature_sample", "ngram_jaccard_pairs",
    "q1_pricing_summary", "q3_shipping_priority", "reduce_sum",
    "reference_workload", "regex_functions", "revenue_by_nation",
    "rolling_7d_revenue", "salted_heavy_hitters", "stratified_sample",
    "string_functions", "tfidf_top_terms", "union_keys",
    "weighted_sample_topk", "window_rank_functions",
    # (b) r10-new (all 8 — incl. the late streaming mergeable-summary
    # twins)
    "ann_knn_label_vote", "dp_noisy_counts", "token_budget_select",
    "moments_merge_shards", "quality_bucket_report",
    "dedup_savings_report", "stream_moments_merge",
    "stream_value_quantiles",
    # (c) r10-changed code (ann_lsh_topk + embedding_near_dups moved
    # here late-round: the keys-only LSH restructure touched them)
    "t_closeness_audit", "retrieval_eval_ndcg", "cms_join_size_estimate",
    "ann_binary_rerank_topk", "dedup_index_append", "dedup_index_compact",
    "stream_incremental_dedup", "pagerank_supplier_part",
    "ppr_similar_to_suppliers", "kcore_supplier_part",
    "label_propagation_communities", "ann_lsh_topk",
    "embedding_near_dups",
    # (d) r6-stale fill (9 of 40; the rest stay r6 — within policy)
    "q2_top_supplier_per_nation", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q7_volume_shipping", "q9_product_profit",
    "q11_important_part_revenue", "q12_late_shipment_priorities",
    "q15_top_supplier", "q17_small_quantity_revenue",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, oldest-
    driver-checked names fronted (see _ROTATION_FRONT)."""
    from laygo_python_spark import queries as q

    q.load_all()
    fronted = {n: q.QUERIES[n] for n in _ROTATION_FRONT if n in q.QUERIES}
    fronted.update(q.QUERIES)
    return fronted


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted for non-SQL-expressible ops —
    the driver records a weaker rows-only check for those)."""
    from laygo_python_spark import queries as q

    q.load_all()
    return dict(q.ORACLES)
