"""ANN index lifecycle, composed from the library's own operators — the
maintenance loop an embedding-serving team schedules around a stored
IVF index:

  build the cell-partitioned index from the base snapshot
    (operators/ivf.ivf_index_write — train once, search many)
  → grow it with the next ingest batch WITHOUT retraining
    (ivf_index_add: map-only assignment at the FIXED stored centroids)
  → read the maintenance dashboards:
      cell-balance skew (ivf_index_stats — the retrain alarm)
      + rebuild economics (per-cell appended fraction and quantization-
        distortion inflation — the ann_index_rebuild_economics shape:
        WHEN does append-degradation justify paying the retrain job?)
  → run the cheap maintenance op either way
    (ivf_index_compact: small-file OPTIMIZE, search-identical)
  → and prove the probe path survived it (top-k before ≡ after).

Scale contract at each stage: the index is cell-partitioned parquet
(a probe prunes unprobed cell= directories at file-listing level);
append is one Arrow-batched matmul pass over the NEW batch only; both
dashboards aggregate to ≤ n_centroids rows; compaction rewrites each
cell to one file behind a checked-rename swap. The corpus is never
re-scanned and never collapses to one partition.

Executed by tests/test_examples.py so it can never rot.
Run directly: python examples/ann_maintenance.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from laygo_python_spark.operators.ann_artifacts import load_ivf_centroids
from laygo_python_spark.operators.ivf import (
    ivf_index_add,
    ivf_index_compact,
    ivf_index_stats,
    ivf_index_write,
    ivf_search_indexed,
    nprobe_recall_curve,
    train_centroids,
)
from laygo_python_spark.session import read_table

K_CELLS = 16
SKEW_RETRAIN_BAR = 4.0
DISTORTION_RETRAIN_BAR = 1.25


def run(spark, sf_dir: str, path: str) -> dict:
    emb = read_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 3 != 0)
    fresh = emb.filter(F.col("vec_id") % 3 == 0)
    queries = emb.filter(F.col("vec_id") < 3)

    # 1) build at the committed snapshot centroids (train live if this
    #    corpus has no committed artifact)
    cent = load_ivf_centroids(sf_dir, k=K_CELLS)
    if cent is None:
        cent = train_centroids(base, K_CELLS)
    ivf_index_write(base, path, n_centroids=K_CELLS, centroids=cent)

    # 2) the next ingest batch grows the index without a retrain
    n_added = ivf_index_add(spark, path, fresh)

    # 3a) dashboard: cell-balance skew (the ivf_index_stats alarm)
    skew = ivf_index_stats(spark, path).select("skew").first()["skew"]

    # 3b) dashboard: append-degradation economics — per-cell appended
    #     fraction and true-distortion inflation over the FIXED
    #     centroids (appended ids are the % 3 == 0 batch by step 2)
    cells = spark.read.parquet(f"{path}/cells")
    cent_df = spark.read.parquet(f"{path}/centroids")
    from laygo_python_spark.operators.similarity import dot

    d2 = (
        dot(F.col("cv"), F.col("cv"))
        - 2 * dot(F.col("cv"), F.col("centroid"))
        + dot(F.col("centroid"), F.col("centroid"))
    )
    per_cell = (
        cells.join(F.broadcast(cent_df), "cell")
        .select("cell", (F.col("neighbor_id") % 3 == 0).alias("is_app"), d2.alias("d2"))
        .groupBy("cell")
        .agg(
            F.avg(F.when(~F.col("is_app"), F.col("d2"))).alias("base_d2"),
            F.avg(F.when(F.col("is_app"), F.col("d2"))).alias("app_d2"),
            F.avg(F.col("is_app").cast("double")).alias("appended_frac"),
        )
    )
    econ = per_cell.agg(
        F.max(F.col("app_d2") / F.col("base_d2")).alias("worst_inflation"),
        F.max("appended_frac").alias("worst_appended_frac"),
    ).first()
    retrain = (
        skew > SKEW_RETRAIN_BAR
        or (econ["worst_inflation"] or 0.0) > DISTORTION_RETRAIN_BAR
        or (econ["worst_appended_frac"] or 0.0) > 0.5
    )

    # 3c) dashboard: the search-time knob — measured recall@k vs
    #     cells-scanned cost over the n_probe grid at the SAME fixed
    #     centroids (operators/ivf.nprobe_recall_curve; the
    #     ivf_nprobe_recall_curve gate query). The operator reads the
    #     smallest n_probe whose recall clears the serving bar off the
    #     measured curve instead of guessing from cell counts.
    RECALL_BAR = 0.95
    curve = {
        r["n_probe"]: (r["recall_at_5"], r["avg_scanned"])
        for r in nprobe_recall_curve(
            emb, queries, grid=(1, 2, 4, K_CELLS), k=5, centroids=cent
        ).collect()
    }
    n_probe_pick = min(
        (g for g, (rec, _) in curve.items() if rec >= RECALL_BAR),
        default=K_CELLS,
    )

    # 4) cheap maintenance runs regardless: collapse append small-files
    before = ivf_search_indexed(spark, path, queries, k=5).collect()
    compact_stats = ivf_index_compact(spark, path)
    after = ivf_search_indexed(spark, path, queries, k=5).collect()

    key = lambda rows: sorted(  # noqa: E731
        (r["query_id"], r["neighbor_id"], round(r["sim"], 9)) for r in rows
    )
    return {
        "n_added": n_added,
        "cell_skew": float(skew),
        "worst_distortion_inflation": float(econ["worst_inflation"] or 0.0),
        "worst_appended_frac": float(econ["worst_appended_frac"] or 0.0),
        "retrain_recommended": bool(retrain),
        "nprobe_curve": {g: (round(r, 6), s) for g, (r, s) in sorted(curve.items())},
        "n_probe_pick": int(n_probe_pick),
        "files_compacted": compact_stats,
        "search_identical_after_compact": key(before) == key(after),
        "topk_before": key(before),
    }


if __name__ == "__main__":
    from laygo_python_spark.session import get_spark

    with tempfile.TemporaryDirectory(prefix="ann_maint_") as tmp:
        stats = run(
            get_spark(),
            os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
            f"{tmp}/ivf",
        )
    print(stats)
