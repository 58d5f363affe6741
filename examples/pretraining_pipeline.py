"""End-to-end pretraining-data pipeline — the workload this engine
exists for, composed from the library's own operators:

  ingest → normalize → language filter → quality gate → exact dedup
  → MinHash-LSH near-dedup (pairs → clusters → representatives)
  → semantic dedup (embedding clusters, SemDeDup shape)
  → eval-split decontamination → deterministic train/eval split
  → token counts → sequence packing → partitioned parquet out

Every stage is a DataFrame→DataFrame function (the `df.transform`
protocol), so the whole pipeline is ONE lazy plan per action, Catalyst
sees all of it, and the only Python-at-runtime is the numpy minhash
stage (Arrow-batched mapInPandas).

Run directly: python examples/pretraining_pipeline.py [sf_dir]
Executed by tests/test_examples.py at sf0.001 so it can never rot.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laygo_python_spark.functions import normalized_text
from laygo_python_spark.operators.dedup import connected_components, minhash_lsh_candidates
from laygo_python_spark.operators.packing import pack_sequences_grouped
from laygo_python_spark.session import get_spark, read_table
from laygo_python_spark.sources.sinks import to_parquet

WEEKLY_STOPWORDS = ("the", "a", "of", "and", "to")  # tiny synthetic-corpus stand-in


def incremental_gate(docs: DataFrame, seen_fps: DataFrame, seen_bloom: DataFrame) -> DataFrame:
    """Front door for incremental ingest: skip docs whose exact
    fingerprint is already in the ingested index, BEFORE any
    normalization/dedup work runs on them. The bloom (yesterday's
    parquet artifact, operators/bloom.py) answers map-side; only the
    ≈fpp + truly-seen sliver that passes needs the exact anti-join
    against the fingerprint table — at 100 TB the historical index is
    never rescanned and re-crawled bytes are dropped at the gate."""
    from laygo_python_spark.operators.bloom import bloom_contains_col

    flagged = bloom_contains_col(
        seen_bloom, docs.withColumn("fp", F.md5("text")), "fp", flag="maybe_seen"
    )
    new = flagged.filter(~F.col("maybe_seen"))
    rescued = flagged.filter(F.col("maybe_seen")).join(seen_fps, "fp", "left_anti")
    return new.unionByName(rescued).drop("maybe_seen", "fp")


def normalize(docs: DataFrame) -> DataFrame:
    """Whitespace-collapse + lowercase into the dedup normal form, keep
    token counts (whitespace tokenizer — swap for a BPE count UDF when a
    tokenizer ships in the image)."""
    toks = F.split(normalized_text(), " ")
    return docs.select(
        "doc_id", "source", "lang",
        normalized_text().alias("text"),
        F.size(toks).alias("n_tokens"),
    )


def language_filter(docs: DataFrame, keep: tuple[str, ...] = ("en", "de")) -> DataFrame:
    """Keep target languages. The fixture has a lang column; for raw
    text see the lang_id_heuristic query (stopword-hit n-gram scoring)."""
    return docs.filter(F.col("lang").isin(*keep))


def quality_gate(docs: DataFrame, min_tokens: int = 5, max_stopword_ratio: float = 0.9) -> DataFrame:
    """Gopher-style cheap quality rules: length floor + stopword-ratio
    ceiling (degenerate keyword-stuffed docs score ~1.0)."""
    toks = F.split(F.col("text"), " ")
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*WEEKLY_STOPWORDS)))
    ratio = stop_hits / F.greatest(F.size(toks), F.lit(1))
    return docs.filter((F.col("n_tokens") >= min_tokens) & (ratio <= max_stopword_ratio))


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Drop byte-identical texts, keeping the smallest doc_id — a single
    hash-shuffle on the md5 fingerprint, never on the text itself."""
    w = F.md5("text")
    keep = docs.groupBy(w.alias("fp")).agg(F.min("doc_id").alias("doc_id"))
    return docs.join(keep, "doc_id", "left_semi")


def near_dedup(docs: DataFrame) -> DataFrame:
    """MinHash-LSH near-duplicate removal: star-mode candidate edges
    from band buckets, clustered to components, keep each cluster's min
    doc_id. The edges only feed connected components, so star mode is
    lossless here — and a boilerplate flood costs O(n) edges, not
    O(n²) pairs. All text stays on executors; only (id, id) edges
    shuffle."""
    pairs = minhash_lsh_candidates(docs, num_hashes=64, bands=16, clique_mode="star")
    clusters = connected_components(pairs)  # (node, cluster)
    losers = clusters.filter(F.col("node") != F.col("cluster")).select(F.col("node").alias("doc_id"))
    return docs.join(losers, "doc_id", "left_anti")


def semantic_dedup_stage(docs: DataFrame, emb: DataFrame) -> DataFrame:
    """Meaning-level rung of the dedup ladder (SemDeDup shape,
    operators/semdedup.py): cluster the embedding sidecar, drop docs
    whose lower-id cluster-mate clears the cosine threshold. Docs
    without an embedding pass through untouched — the stage only ever
    subtracts ids it has evidence for."""
    from laygo_python_spark.operators.semdedup import semantic_dedup

    verdict = semantic_dedup(emb, threshold=0.35, n_clusters=8)
    drop = verdict.filter(~F.col("keep")).select(F.col("vec_id").alias("doc_id"))
    return docs.join(drop, "doc_id", "left_anti")


def split_and_decontaminate(docs: DataFrame, n: int = 3) -> DataFrame:
    """Assign the md5-bucket train/eval split, then drop training docs
    sharing any word n-gram with the eval split (broadcast semi join —
    eval sets are small by construction)."""
    bucket = F.pmod(F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10).cast("long"), F.lit(100))
    docs = docs.withColumn("split", F.when(bucket < 90, "train").otherwise("eval"))
    toks = F.split(F.col("text"), " ")
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    grams = docs.select("doc_id", "split", F.explode(starts).alias("i"), toks.alias("toks")).select(
        "doc_id", "split", F.concat_ws(" ", F.slice("toks", F.col("i"), n)).alias("g")
    )
    eval_grams = grams.filter(F.col("split") == "eval").select("g").distinct()
    contaminated = (
        grams.filter(F.col("split") == "train").join(F.broadcast(eval_grams), "g").select("doc_id").distinct()
    )
    return docs.join(contaminated, "doc_id", "left_anti")


def run(spark: SparkSession, sf_dir: str, out_dir: str) -> dict[str, int]:
    docs = read_table(spark, sf_dir, "documents")
    stages: dict[str, int] = {"ingested": docs.count()}

    # Incremental front door: yesterday's run (simulated: every 7th doc)
    # left behind a fingerprint table + bloom; today's feed re-contains
    # those docs and must drop them at the gate, before any other work.
    from laygo_python_spark.operators.bloom import bloom_build, bloom_geometry

    seen_fps = docs.filter(F.col("doc_id") % 7 == 0).select(F.md5("text").alias("fp")).distinct()
    m, k = bloom_geometry(100_000, fpp=0.01)
    seen_bloom = bloom_build(seen_fps, "fp", m=m, k=k)
    docs = incremental_gate(docs, seen_fps, seen_bloom)
    stages["after_ingest_gate"] = docs.count()

    docs = docs.transform(normalize).transform(language_filter).transform(quality_gate)
    stages["after_quality"] = docs.count()

    docs = docs.transform(exact_dedup).transform(near_dedup)
    stages["after_dedup"] = docs.count()

    docs = semantic_dedup_stage(docs, read_table(spark, sf_dir, "embeddings"))
    stages["after_semantic_dedup"] = docs.count()

    docs = docs.transform(split_and_decontaminate)
    stages["after_decontamination"] = docs.count()

    # Pack the training split into 512-token bins for the trainer — the
    # GROUPED variant, so the packing (and therefore the training data
    # order) is identical on any cluster size / partition layout;
    # pack_sequences is the shuffle-free alternative when
    # reproducibility across layouts doesn't matter.
    train = docs.filter(F.col("split") == "train")
    bins = pack_sequences_grouped(train, budget=512, n_groups=8, with_doc_ids=True)
    stages["train_bins"] = bins.count()

    to_parquet(docs, f"{out_dir}/documents", partition_by=["split"])
    to_parquet(bins, f"{out_dir}/packed_bins")
    return stages


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    with tempfile.TemporaryDirectory() as out:
        counts = run(get_spark(), sf, out)
        print(counts)
        assert counts["ingested"] >= counts["after_quality"] >= counts["after_dedup"] >= counts["after_decontamination"]
