"""ANN-routed kNN-label-vote scale smoke (r9 verdict ask #2).

Pins the claim that makes ``ann_knn_label_vote`` the 100 TB path where
the exact ``knn_label_vote`` is only a gate-scale oracle probe: the
BROADCAST side of the routed plan is O(queries · n_tables) bucket-key
rows — independent of corpus size — while the exact twin broadcasts a
fixed FRACTION of the corpus (grows without bound).

Method: run the routed vote at two corpus sizes (n and 4n) with a fixed
query count, read the physical plan's broadcast-exchange inputs, and
assert (a) every BroadcastExchange feeds from the query-derived or
shortlist-derived side, never a full-corpus scan, and (b) the routed
vote agrees with the exact vote on well-separated clusters (planted
Gaussian-ish blobs: LSH recall ~1 there, so any disagreement means a
routing bug, not ANN approximation).

Usage: python tools/ann_vote_scale_smoke.py [n_corpus]
Prints one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from laygo_python_spark.operators.similarity import lsh_bucketed_topk
from laygo_python_spark.session import get_spark

DIM = 16


def _blobs(spark, n: int, n_labels: int = 4):
    """n deterministic vectors in n_labels well-separated orthants:
    label L's vectors sit near axis direction e_{L} with a small
    deterministic jitter, so cosine separates labels by a wide margin."""
    base = spark.range(n).select(F.col("id").alias("vec_id"))
    lab = F.pmod(F.col("vec_id"), F.lit(n_labels))
    comps = []
    for d in range(DIM):
        jitter = (F.pmod(F.hash(F.col("vec_id") * (d + 1)), F.lit(1000)) / 10000.0)
        comps.append(
            F.when(lab == d % n_labels, F.lit(1.0) + jitter).otherwise(jitter)
        )
    return base.select(
        "vec_id",
        F.array(*comps).alias("embedding"),
        F.concat(F.lit("L"), lab.cast("string")).alias("label"),
    )


def _vote(top, labels):
    votes = (
        top.join(labels.withColumnRenamed("vec_id", "neighbor_id").withColumnRenamed("label", "nl"), "neighbor_id")
        .groupBy("query_id", "nl")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    vw = Window.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("nl"))
    return votes.withColumn("vr", F.row_number().over(vw)).filter("vr = 1").select(
        "query_id", F.col("nl").alias("predicted_label")
    )


def routed_plan_and_vote(spark, emb, n_queries: int = 40):
    q = emb.filter(F.col("vec_id") % 25 == 0).limit(n_queries)
    c = emb.filter(F.col("vec_id") % 25 != 0)
    top = lsh_bucketed_topk(c, q, k=5, n_planes=4, n_tables=8, dim=DIM)
    labels = emb.select("vec_id", "label")
    out = _vote(top, labels)
    plan = out._jdf.queryExecution().executedPlan().toString()
    return out, plan


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    spark = get_spark("ann_vote_smoke")
    report: dict[str, object] = {"smoke": "ann_knn_label_vote", "n_corpus": n}

    for tag, size in (("small", n), ("large", 4 * n)):
        emb = _blobs(spark, size).localCheckpoint(eager=True)
        t0 = time.time()
        out, plan = routed_plan_and_vote(spark, emb)
        rows = out.collect()
        report[f"{tag}_sec"] = round(time.time() - t0, 2)
        report[f"{tag}_queries"] = len(rows)
        # (a) broadcast independence: the plan must not broadcast a
        # corpus-sized side. Every BroadcastExchange in this plan feeds
        # either the LIMIT-ed query head or the tiny shortlist/labels
        # join; a full-corpus broadcast would show a scan with no limit
        # and no query filter upstream. Cheap textual check: count
        # broadcast exchanges and assert the corpus's `% 25 <> 0` filter
        # branch never appears under one.
        bads = 0
        # The corpus-side filter in this plan is `(vec_id % 25) != 0`.
        # Split the plan into exchange subtrees the crude way: any line
        # range between a BroadcastExchange and the next Exchange.
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "BroadcastExchange" in ln:
                depth_prefix = len(ln) - len(ln.lstrip(" :+-*"))
                for sub in lines[i + 1 :]:
                    p = len(sub) - len(sub.lstrip(" :+-*"))
                    if p <= depth_prefix and ("Exchange" in sub or "Scan" not in sub and sub.strip() == ""):
                        break
                    if "% 25) != 0" in sub or "% 25) <> 0" in sub:
                        # a corpus-filtered scan under a broadcast: only
                        # legal when it is ALSO shortlist-semi-joined —
                        # flag it for eyeballs.
                        bads += 1
                        break
        report[f"{tag}_corpus_broadcasts"] = bads
        # (b) planted-blob agreement: every prediction matches the true
        # label (wide-margin clusters -> LSH recall ~1).
        truth = {r["vec_id"]: r["label"] for r in emb.filter(F.col("vec_id") % 25 == 0).select("vec_id", "label").collect()}
        wrong = sum(1 for r in rows if truth.get(r["query_id"]) != r["predicted_label"])
        report[f"{tag}_wrong"] = wrong
        assert wrong == 0, f"routed vote disagreed on planted blobs: {wrong}"
        assert bads == 0, "corpus-sized side under a BroadcastExchange"

    print(json.dumps(report))


if __name__ == "__main__":
    main()
