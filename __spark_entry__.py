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


# Driver-rotation steering (round 12): the correctness gate checks the
# FIRST 50 entries of queries() per round. Priority order this round
# (r11 verdict ask #1): retire the r7 freshness bulge — ALL 46 names
# whose latest green driver row is r7 (recomputed from
# CORRECTNESS_r01..r11.json; after this round no catalog name's latest
# driver row is older than r8) — plus the r12-new names (the
# stream_dp_release lesson: a post-rotation landing goes ungated for a
# full round). 46 + 4 fills the 50 exactly. Recompute per round from
# CORRECTNESS_r*.json.
# r13 NOTE: `substring_incremental_spans`, `pq_m_distortion_curve` and
# `simhash_radius_tuning` / `stream_substring_dedup` (late-r12 names)
# landed after this 50-slot front filled — they MUST lead the r13 front
# (they are builder-oracle-green at HEAD; see ORACLE_FULL_r12.txt).
_ROTATION_FRONT = [
    # r12-NEW — must gate this round
    "substring_span_dedup", "substring_dup_coverage",
    "ivf_nprobe_recall_curve", "multimodal_jpeg_arith_stats",
    # latest check r07 — all 46
    "bigram_lm_xent", "bigram_pmi_collocations", "char_entropy_score",
    "chi2_segment_priority", "chunk_dedup_spans",
    "cusum_changepoint_daily", "decontaminate_ngram_overlap",
    "dedup_exact", "doc_chunks", "doc_fingerprint",
    "doc_quality_score", "edit_distance_name_pairs",
    "ewma_daily_event_value", "feature_scale_order_prices",
    "gapfill_hourly_purchases", "impute_missing_acctbal",
    "incremental_hourly_stats", "lang_id_heuristic",
    "mad_outlier_orders", "merge_upsert_customer_balance",
    "multimodal_mp3_meta", "ngram_containment_pairs", "pii_redaction",
    "profile_orders_columns", "quality_gate", "regex_token_count",
    "repetition_score", "rolling_hash_fingerprint",
    "scd2_priority_history", "seasonal_dow_decompose",
    "snapshot_diff_orders", "sorted_neighborhood_name_pairs",
    "spearman_price_acctbal", "stopword_ratio",
    "stream_click_error_join", "stream_dedup_user_types",
    "stream_hourly_counts", "stream_session_windows",
    "stream_sliding_counts", "stream_stateful_user_counts",
    "text_normalize_clean", "token_count", "unigram_logprob_score",
    "validate_lineitem_rules", "vocab_coverage_curve",
    "zorder_morton_keys",
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
