"""Deterministic sampling & dataset-mixing operators — training-data
pipeline staples. Everything is hash-based (md5, available in both
engines) rather than rand(): splits must be REPRODUCIBLE across runs,
engines, and partitionings — `df.sample()`'s seeded RNG changes with the
partitioning, a silent foot-gun for train/eval contamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t


def hash_bucket(key: F.Column, buckets: int = 100) -> F.Column:
    """Stable bucket in [0, buckets) from the md5 of the key — identical
    in any engine with md5, independent of partitioning/run/engine."""
    return F.pmod(F.conv(F.substring(F.md5(key.cast("string")), 1, 6), 16, 10).cast("long"), F.lit(buckets))


@query(
    "hash_split_train_eval",
    oracle="""
    SELECT CASE WHEN (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 100) < 90
                THEN 'train' ELSE 'eval' END AS split,
           count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY split
    """,
)
def hash_split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/10 train/eval split assigned by content-stable hash — the split
    of a document never changes when the corpus is re-partitioned,
    re-sharded, or grown (new docs hash independently)."""
    docs = _t(spark, sf_dir, "documents")
    split = F.when(hash_bucket(F.col("doc_id")) < 90, "train").otherwise("eval")
    return docs.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").cast("long").alias("total_chars")
    )


@query(
    "training_mix_weights",
    oracle="""
    WITH bucketed AS (
      SELECT source,
             (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 100) AS b
      FROM documents)
    SELECT source, count(*) AS n_sampled
    FROM bucketed
    WHERE (source IN ('src0', 'src1') AND b < 80) OR (source NOT IN ('src0', 'src1') AND b < 20)
    GROUP BY source
    """,
)
def training_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted dataset mixing: keep 80% of high-quality sources, 20% of
    the rest — the mixture-reweighting step of a pretraining data
    pipeline, with hash-deterministic membership (re-runs produce the
    exact same mix)."""
    docs = _t(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    hi = F.col("source").isin("src0", "src1")
    keep = (hi & (b < 80)) | (~hi & (b < 20))
    return docs.filter(keep).groupBy("source").agg(F.count(F.lit(1)).alias("n_sampled"))


@query(
    "temperature_mix_weights",
    oracle="""
    WITH c AS (SELECT source, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY source),
    t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c),
    p AS (SELECT source, n, n / t.total AS raw_share,
                 pow(n / t.total, 0.5) AS scaled
          FROM c, t),
    z AS (SELECT CAST(sum(scaled) AS DOUBLE) AS z FROM p)
    SELECT p.source, CAST(p.n AS BIGINT) AS n_docs,
           round(p.raw_share, 6) AS raw_share,
           round(p.scaled / z.z, 6) AS temp_share,
           round((p.scaled / z.z) / p.raw_share, 6) AS upsample_factor
    FROM p, z
    """,
)
def temperature_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled corpus mixing (alpha = 0.5): sampling shares
    proportional to p_s^alpha renormalized — the standard upweighting
    of small/rare sources in multilingual and multi-domain pretraining
    (alpha=1 keeps natural proportions, alpha→0 approaches uniform).
    Complements training_mix_weights' fixed keep-ratios with the
    principled curve; upsample_factor is the per-doc repetition rate a
    sampler would apply.

    One count aggregation; the two corpus scalars are 1-row cross
    joins, and the power/normalize arithmetic is written with the same
    association order in both engines (rounding rule on outputs only —
    inputs are exact integer counts)."""
    docs = _t(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count(F.lit(1)).cast("double").alias("n"))
    t = c.agg(F.sum("n").cast("double").alias("total"))
    p = c.crossJoin(F.broadcast(t)).select(
        "source",
        "n",
        (F.col("n") / F.col("total")).alias("raw_share"),
        F.pow(F.col("n") / F.col("total"), 0.5).alias("scaled"),
    )
    z = p.agg(F.sum("scaled").cast("double").alias("z"))
    return p.crossJoin(F.broadcast(z)).select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.round("raw_share", 6).alias("raw_share"),
        F.round(F.col("scaled") / F.col("z"), 6).alias("temp_share"),
        F.round((F.col("scaled") / F.col("z")) / F.col("raw_share"), 6).alias("upsample_factor"),
    )
