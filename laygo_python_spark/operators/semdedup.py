"""Semantic deduplication over an embedding column — the SemDeDup
shape (Abbas et al., 2023, public): k-means-cluster the corpus
embeddings, then prune near-duplicates WITHIN each cluster by cosine
similarity, keeping one representative per duplicate group.

This completes the dedup ladder: exact (hash) → MinHash/SimHash
(lexical near-dup) → embedding-cosine near-dup (SRP buckets) →
SEMANTIC (meaning-level, cluster-scoped). The keep rule is
deterministic and relational — a vector is dropped iff some LOWER-id
vector in the same cluster has cosine similarity >= threshold — so the
whole operator is a join + filter Catalyst can plan, and the DuckDB
oracle can replay it exactly (dedup_semantic in queries/similarity_ops
reuses the committed IVF centroid artifact, the trained-state gating
idiom from ann_ivf_topk).

Scale posture (100 TB): the only shuffle is the hash-partition on
``cell``; pairwise work is O(Σ c_i²) where c_i is the cluster size, so
k MUST grow with the corpus (the SemDeDup recipe: keep n/k roughly
constant, e.g. k = n/5000). Cluster assignment is a map-side matmul
against broadcast centroids (operators/ivf.py `_assign_cells`); the
pairwise join carries only (id, vec) within a cell, never payloads.
``max_cluster`` caps a runaway cell the same way the MinHash-LSH
bucket cap does — oversized cells are truncated to the lowest-id
members for pairing (cap events should be rare when k is sized right;
the remainder is kept, not silently dropped).

Reference parity: the reference engine (schemaless iterator library)
has no embedding or dedup machinery; this is uplift for the
training-data pipeline family (SURVEY.md §6).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from laygo_python_spark.operators.ivf import _assign_cells, train_centroids
from laygo_python_spark.operators.similarity import dot, l2_norm


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    max_cluster: int | None = None,
) -> DataFrame:
    """(id, cell, keep) for every corpus vector: ``keep`` is false iff a
    lower-id vector in the same k-means cell has cosine sim >=
    ``threshold``. Pass ``centroids`` to cluster at fixed pre-trained
    cells (the committed artifact); otherwise trains distributed
    k-means. ``max_cluster`` bounds the pairwise fan-in per cell.

    The 0.95 default follows the published SemDeDup operating range for
    real embedding corpora (duplicates are near-identical vectors);
    lower values prune semantic NEIGHBORS, not duplicates. The
    registered fixture query passes 0.35 explicitly because the
    synthetic embeddings are near-orthogonal (max pairwise sim ~0.51) —
    that value is fixture-tuned, not a recommendation.

    .. versionchanged:: r7 — the default was 0.35 (the fixture value)
       through r6 and is now 0.95; callers that relied on the old
       default for neighbor-pruning behavior must pass ``threshold``
       explicitly (r7 advice: breaking-default notice)."""
    if centroids is None:
        centroids = train_centroids(corpus, n_clusters, vec_col)
    a = _assign_cells(corpus, centroids, "sd_id", "v", id_col, vec_col, n_probe=1)
    pair_src = a
    if max_cluster is not None:
        from pyspark.sql import Window

        rn = F.row_number().over(Window.partitionBy("cell").orderBy("sd_id"))
        pair_src = a.withColumn("_rn", rn).filter(F.col("_rn") <= max_cluster).drop("_rn")
    # Norms are hoisted OUT of the pair join — computed once per ROW
    # (n folds) instead of once per PAIR (O(Σ c_i²) folds; higher-order
    # array folds are interpreted, never codegen, so this was ~2/3 of
    # the pair filter's cost — the r8 bench regression). The sim value
    # below is bit-identical to cosine(): same dot fold, and
    # l2_norm(a)*l2_norm(b) is the same two sqrt results multiplied in
    # the same order, so the oracle's threshold comparison can't flip.
    left = pair_src.select(
        "cell",
        F.col("sd_id").alias("a_id"),
        F.col("v").alias("va"),
        l2_norm(F.col("v")).alias("na"),
    )
    right = pair_src.select(
        "cell",
        F.col("sd_id").alias("b_id"),
        F.col("v").alias("vb"),
        l2_norm(F.col("v")).alias("nb"),
    )
    denom = F.col("na") * F.col("nb")
    sim = F.when(denom != 0, dot(F.col("va"), F.col("vb")) / denom).otherwise(
        F.lit(float("-inf"))
    )
    dups = (
        left.join(right, "cell")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(sim >= F.lit(float(threshold)))
        .select(F.col("b_id").alias("dup_id"))
        .distinct()
    )
    return (
        a.join(dups, a["sd_id"] == dups["dup_id"], "left")
        .select(
            F.col("sd_id").alias(id_col),
            F.col("cell").cast("int").alias("cell"),
            F.col("dup_id").isNull().alias("keep"),
        )
    )


def semantic_contamination(
    corpus: DataFrame,
    evalset: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_out: str = "eval_id",
) -> DataFrame:
    """Embedding-space decontamination — the semantic complement of the
    n-gram overlap check (dedup.decontaminate_ngram_overlap): flag every
    corpus item whose cosine similarity to ANY held-out eval item meets
    ``threshold``, reporting the closest eval item and the similarity.
    Paraphrased benchmark leakage survives lexical decontamination; this
    is the published mitigation (e.g. the embedding-similarity decontam
    in open LLM data pipelines).

    Returns (id, eval_id, sim) for flagged corpus rows only.

    Scale shape — this is the INTENTIONAL broadcast nested-loop exact
    scan, same posture as the brute-force ANN baseline and
    hard-negative mining: eval benchmarks are tiny (10^3-10^5 rows) next
    to a 100 TB corpus, so the eval side broadcasts, the corpus never
    shuffles, and the per-corpus-row argmax collapses map-side into a
    partial max(struct) aggregation — the shuffle carries one
    (id, best-struct) row per FLAGGED-OR-NOT corpus row pre-combined per
    partition, never the |corpus|x|eval| pair frame. For recall-relaxed
    speed at extreme scale, pre-prune candidates with the SRP-bucketed
    path and exact-verify the survivors here.
    """
    from laygo_python_spark.operators.similarity import (
        as_double_array,
        cosine_hoisted,
        l2_norm,
    )

    # Norms hoisted out of the |corpus|×|eval| pair frame — computed
    # once per row on each side (the semantic_dedup r8 discipline);
    # value-identical to cosine() per cosine_hoisted's contract.
    q = F.broadcast(
        evalset.select(
            F.col(id_col).alias("__eid"), as_double_array(vec_col).alias("__ev")
        ).select("__eid", "__ev", l2_norm(F.col("__ev")).alias("__en"))
    )
    c = corpus.select(F.col(id_col), as_double_array(vec_col).alias("__cv")).select(
        id_col, "__cv", l2_norm(F.col("__cv")).alias("__cn")
    )
    sim = cosine_hoisted(F.col("__cv"), F.col("__ev"), F.col("__cn"), F.col("__en"))
    # argmax(sim, then min eval id) as ONE partial-aggregatable max:
    # struct ordering is (sim asc, -eid asc), so max = highest sim,
    # smallest eval id on ties.
    best = (
        c.join(q, F.lit(True))
        .select(
            id_col,
            F.struct(sim.alias("s"), (-F.col("__eid")).alias("neg_eid")).alias("t"),
        )
        .groupBy(id_col)
        .agg(F.max("t").alias("t"))
    )
    return (
        best.filter(F.col("t.s") >= threshold)
        .select(
            id_col,
            (-F.col("t.neg_eid")).alias(eval_id_out),
            F.col("t.s").alias("sim"),
        )
    )
