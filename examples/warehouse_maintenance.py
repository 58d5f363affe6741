"""Nightly warehouse maintenance — the dimensional-pipeline companion to
examples/pretraining_pipeline.py, composed from operators/warehouse.py:

  detect changes (snapshot_diff) → upsert the dim (merge_upsert,
  broadcast changeset) → record history (scd2_collapse) → densify the
  ops dashboard series (gapfill) → balanced shards out → compact the
  fragmented landing zone back to right-sized files (compact_parquet)

Run directly: python examples/warehouse_maintenance.py [sf_dir]
Executed by tests/test_examples.py at sf0.001 so it can never rot.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from laygo_python_spark.operators.warehouse import (
    compact_parquet,
    gapfill,
    merge_upsert,
    scd2_collapse,
    snapshot_diff,
)
from laygo_python_spark.session import get_spark, read_table
from laygo_python_spark.sources.sinks import write_training_shards


def run(spark: SparkSession, sf_dir: str, out_dir: str) -> dict[str, int]:
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    events = read_table(spark, sf_dir, "events")

    # 1. What changed since the last load? (Simulated: the "new" snapshot
    #    bumps balances by the recent order revenue.) Only key + row-hash
    #    move through the shuffle.
    recent = orders.filter(F.col("o_orderdate") >= F.lit("1997-06-01").cast("timestamp"))
    deltas = recent.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("delta")
    )
    old_dim = customer.select("c_custkey", "c_name", "c_acctbal")
    new_dim = merge_upsert(
        old_dim,
        deltas,
        on=["c_custkey"],
        update_set={
            "c_name": old_dim["c_name"],
            "c_acctbal": F.round(old_dim["c_acctbal"] + F.coalesce(deltas["delta"], F.lit(0.0)), 2),
        },
        insert_set={"c_name": F.lit("(new)"), "c_acctbal": deltas["delta"]},
        broadcast_source=True,
    )
    changed = snapshot_diff(old_dim, new_dim, on=["c_custkey"]).count()

    # 2. Dimension history: collapse each customer's priority change log
    #    into SCD2 validity ranges (one window shuffle).
    log = orders.select(
        "o_custkey", "o_orderpriority", F.struct("o_orderdate", "o_orderkey").alias("ord")
    )
    history = scd2_collapse(log, key=["o_custkey"], attr="o_orderpriority", ts="ord")
    n_versions = history.count()

    # 3. Ops dashboard: dense hourly event series with forward fill.
    sparse = events.groupBy("event_type", F.date_trunc("hour", "ts").alias("h")).agg(
        F.round(F.sum("value"), 2).alias("v")
    )
    dense = gapfill(sparse, series=["event_type"], ts="h", step="1 hour", fill_cols=["v"])
    n_grid = dense.count()

    # 4. Publish the refreshed dim as balanced shards.
    write_training_shards(new_dim, f"{out_dir}/dim_customer", shard_rows=500, order_by=["c_custkey"])

    # 5. Nightly OPTIMIZE: the incremental writers left a fragmented
    #    landing zone (simulated); rewrite it into key-ordered files
    #    whose min/max stats stay narrow for tomorrow's scans.
    frag = f"{out_dir}/events_landing"
    events.select("event_id", "user_id", "event_type", "value").repartition(24).write.parquet(frag)
    cstats = compact_parquet(
        spark, frag, f"{out_dir}/events_compacted", target_bytes=8 << 20, order_by=["event_id"]
    )

    return {
        "changed_rows": changed,
        "scd2_versions": n_versions,
        "grid_rows": n_grid,
        "files_before": cstats["files_before"],
        "files_after": cstats["files_after"],
    }


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    with tempfile.TemporaryDirectory() as tmp:
        stats = run(get_spark("warehouse_maintenance"), sf, tmp)
    print(stats)
