"""End-to-end corpus curation under a token budget, composed from the
library's own operators — the data-mixing decision a pretraining run
makes before it spends compute:

  dedup economics first (operators/dedup + connected_components →
    dedup_savings_report shape: what would dedup save?)
  → quality landscape (fixed-edge lexical-density buckets — no global
    sort; queries/text_ops2.quality_bucket_report shape)
  → greedy token-budget selection (operators/budget.
    greedy_budget_select: distributed prefix sums, never a one-task
    window)
  → mergeable stats certificate of the SELECTED slice
    (operators/moments: per-source (n, sum, M2) → exact global moments)
  → and a privacy-shaped release of the per-source mix
    (operators/governance.dp_laplace_counts — deterministic noise here
    so the example is reproducible; production swaps in a CSPRNG).

Scale contract at each stage: dedup clusters come from bucketed
candidate joins (never all-pairs); the buckets and moments are
partial+final aggregations; the budget selection's running total is
range-partition + broadcast offsets + one Arrow cumsum pass; the DP
release aggregates |groups| rows. The corpus never collapses to one
partition anywhere in this file.

Executed by tests/test_examples.py so it can never rot.
Run directly: python examples/curation_budget.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from laygo_python_spark.operators.budget import greedy_budget_select
from laygo_python_spark.operators.dedup import connected_components, ngram_jaccard_pairs
from laygo_python_spark.operators.governance import dp_laplace_counts
from laygo_python_spark.operators.moments import merge_moments, shard_moments
from laygo_python_spark.session import read_table

TOKEN_BUDGET = 20000


def run(spark, sf_dir: str) -> dict:
    docs = read_table(spark, sf_dir, "documents")

    # 1) dedup economics: drop near-dup copies before they eat budget
    pairs = ngram_jaccard_pairs(docs, n=1, threshold=0.95)
    cl = connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("cluster").alias("cluster")
    )
    deduped = (
        docs.join(cl, "doc_id", "left")
        .withColumn("cluster", F.coalesce("cluster", "doc_id"))
        .filter(F.col("doc_id") == F.col("cluster"))
        .drop("cluster")
    )
    n_docs, n_kept = docs.count(), deduped.count()

    # 2) quality landscape: lexical density per doc, fixed-edge buckets
    tok = deduped.select("doc_id", "source", F.explode(F.split(F.trim("text"), " ")).alias("w"))
    st = tok.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("w").alias("n_distinct"),
    )
    scored = st.select(
        "doc_id", "source", "n_tokens",
        (F.col("n_distinct").cast("double") / F.col("n_tokens")).alias("q"),
    )
    buckets = (
        scored.withColumn("bucket", F.least(F.floor(F.col("q") * 10).cast("int"), F.lit(9)))
        .groupBy("bucket").count().orderBy("bucket").collect()
    )

    # 3) fill the token budget, best quality-per-token first
    selected = greedy_budget_select(
        scored, [F.col("q").desc(), F.col("doc_id").asc()], "n_tokens",
        budget=TOKEN_BUDGET, out_col="cum_tokens",
    )

    # 4) certificate of the selected slice: exact moments via mergeable
    #    per-source summaries (what a 100 TB run reports WITHOUT a rescan)
    moments = merge_moments(shard_moments(selected, "n_tokens", "source")).collect()[0]

    # 5) release the per-source mix with calibrated noise
    mix = dp_laplace_counts(selected, ["source"], epsilon=1.0).orderBy("source").collect()

    return {
        "n_docs": n_docs,
        "n_after_dedup": n_kept,
        "bucket_counts": {r["bucket"]: r["count"] for r in buckets},
        "n_selected": moments["n_rows"],
        "selected_token_mean": moments["mean"],
        "selected_token_var": moments["var_pop"],
        "released_mix": {r["source"]: r["noisy_count"] for r in mix},
    }


if __name__ == "__main__":
    from laygo_python_spark.session import get_spark

    stats = run(get_spark(), os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    print(stats)
