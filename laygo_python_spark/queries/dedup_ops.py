"""Deduplication queries over ``documents`` (see operators/dedup.py for
the scale rationale). The exact n-gram Jaccard query carries a full
DuckDB oracle, and so does ``dedup_minhash_verified`` — the end-to-end
LSH-discovery→exact-verify composition, checked against DuckDB's
all-pairs Jaccard (sound because 32×4 banding makes a missed 0.95-pair
a ~4e-24 event). The raw LSH/SimHash candidate queries remain rows-only
(DuckDB lacks xxhash64) and are cross-validated in tests/test_dedup.py
against planted duplicates and the exact-Jaccard ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laygo_python_spark.operators import dedup
from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t


@query(
    "ngram_jaccard_pairs",
    oracle="""
    WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(trim(text), ' ')) AS g
                 FROM documents),
    counts AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS i
              FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT doc_id_a, doc_id_b,
           CAST(i AS DOUBLE) / (ca.n + cb.n - i) AS jaccard
    FROM inter
    JOIN counts ca ON doc_id_a = ca.doc_id
    JOIN counts cb ON doc_id_b = cb.doc_id
    WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.95
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact unigram-Jaccard near-duplicate pairs (threshold 0.95).
    Integer intersect/union counts on both engines → the jaccard double
    is bit-identical, so the raw value is oracle-safe unrounded."""
    return dedup.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), n=1, threshold=0.95)


@query("dedup_minhash_lsh")  # rows-only: DuckDB lacks xxhash64
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(128) + LSH(32 bands × 4 rows) candidate pairs on 3-gram
    shingles — the O(candidates) discovery path for near-dup detection
    at 100 TB. Deterministic (fixed seed); validated in tests against
    planted duplicates and exact Jaccard."""
    return dedup.minhash_lsh_candidates(
        _t(spark, sf_dir, "documents"), shingle_n=3, num_hashes=128, bands=32
    )


@query("dedup_simhash")  # rows-only: DuckDB lacks xxhash64/bit_count parity
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-duplicate pairs within Hamming distance 3, found
    via pigeonhole chunk banding (4×16-bit equi-join, never O(n²))."""
    return dedup.simhash_near_dups(_t(spark, sf_dir, "documents"), max_hamming=3)


@query(
    "dedup_cluster_representatives",
    oracle="""
    WITH RECURSIVE tok AS (SELECT DISTINCT doc_id, unnest(string_split(trim(text), ' ')) AS g
                 FROM documents),
    grams AS (SELECT doc_id, g,
                     count(*) OVER (PARTITION BY doc_id) AS n_grams
              FROM tok),
    pairs AS (
      SELECT a.doc_id AS pa, b.doc_id AS pb
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING CAST(count(*) AS DOUBLE)
             / (any_value(a.n_grams) + any_value(b.n_grams) - count(*)) >= 0.95),
    edges AS (SELECT pa AS s, pb AS d FROM pairs UNION ALL SELECT pb, pa FROM pairs),
    nodes AS (SELECT DISTINCT s AS node FROM edges),
    reach(node, label) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.d, r.label FROM edges e JOIN reach r ON r.node = e.s)
    SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS cluster
    FROM reach GROUP BY node
    """,
)
def dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup pipeline: exact-Jaccard pairs (>= 0.95) →
    connected components → (doc_id, cluster) where cluster is the
    smallest member id (the representative to KEEP). The oracle
    recomputes the same clustering with a recursive CTE — an iterative
    distributed algorithm checked against declarative transitive
    closure."""
    pairs = dedup.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), n=1, threshold=0.95)
    return dedup.connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("cluster").cast("long").alias("cluster")
    )


@query("minhash_signature_sample")  # rows-only: DuckDB lacks crc32
def minhash_signature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 8 signature slots for the 20 lowest doc_ids — a stable probe
    of the signature computation itself (drift here breaks all LSH).

    Exploded to scalar (doc_id, slot, value) rows: the driver's
    canonicalizer sorts the pandas frame across all columns, and raw
    array columns are unhashable there (r2's one red row)."""
    sig = dedup.minhash_signatures(_t(spark, sf_dir, "documents"))
    return sig.filter(F.col("doc_id") < 20).select(
        "doc_id", F.posexplode(F.slice("sig", 1, 8)).alias("slot", "value")
    )


@query(
    "dedup_minhash_verified",
    oracle="""
    WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(trim(text), ' ')) AS g
                 FROM documents),
    counts AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS i
              FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT doc_id_a, doc_id_b,
           CAST(i AS DOUBLE) / (ca.n + cb.n - i) AS jaccard
    FROM inter
    JOIN counts ca ON doc_id_a = ca.doc_id
    JOIN counts cb ON doc_id_b = cb.doc_id
    WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.95
    """,
)
def dedup_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end discovery→verify dedup path, oracle-gated, as a
    BLOCK→VERIFY pipeline (the entity-resolution shape):

    1. star-mode LSH banding (linear edges, NO bucket ever capped —
       zero connectivity loss) proposes the candidate neighborhood;
    2. connected components turn it into blocks;
    3. the exact adaptive Jaccard join runs WITHIN blocks only
       (``block_col``), so the quadratic work is confined to documents
       LSH already linked.

    The DuckDB oracle computes ALL-PAIRS exact Jaccard — the two agree
    iff LSH blocking recall at the 0.95 threshold is total, which 32
    bands × 4 rows makes a near-certainty: a pair at s=0.95 lands in
    different blocks only if every one of its 32 bands missed
    ((1-s^4)^32 ≈ 4e-24) AND no transitive path links them. This is the
    hard correctness signal for the whole LSH family: any drift in
    shingling, hashing, banding or blocking breaks the match. (The
    pre-r3 shape — pairwise LSH candidates + per-pair verification —
    silently LOST 163k of 191k sf0.1 pairs to the bucket cap and took
    39 s; this shape matches the oracle at every SF.)"""
    docs = _t(spark, sf_dir, "documents")
    star = dedup.minhash_lsh_candidates(
        docs, shingle_n=1, num_hashes=128, bands=32, clique_mode="star"
    )
    comp = dedup.connected_components(star)
    blocked = docs.join(
        comp, docs["doc_id"] == comp["node"], "inner"
    ).select(docs["doc_id"], docs["text"], comp["cluster"])
    return dedup.ngram_jaccard_pairs(
        blocked, n=1, threshold=0.95, block_col="cluster"
    )


@query(
    "dedup_new_vs_seen",
    oracle="""
    WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(trim(text), ' ')) AS g
                 FROM documents),
    counts AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS i
              FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT doc_id_a, doc_id_b,
           CAST(i AS DOUBLE) / (ca.n + cb.n - i) AS jaccard
    FROM inter
    JOIN counts ca ON doc_id_a = ca.doc_id
    JOIN counts cb ON doc_id_b = cb.doc_id
    WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.95
      AND (doc_id_a % 2) <> (doc_id_b % 2)
    """,
)
def dedup_new_vs_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot contamination check — the incremental-ingest twin
    of ngram_jaccard_pairs: split the corpus into "seen" (even ids,
    standing in for yesterday's index) and "new" (odd ids, today's
    batch) and report only the near-duplicate pairs that CROSS the
    boundary — the docs today's batch must drop before training.

    Here the exact set-similarity join runs on the union and filters to
    cross-side pairs (exact, oracle-gated); the 100 TB production shape
    stores yesterday's LSH band table and signature groups as artifacts
    (minhash_lsh_candidates internals; same artifact-reuse discipline
    as the parquet-persisted bloom in operators/bloom.py) and joins
    only today's bands against them, so the seen corpus is never
    re-shingled — its text is not even read."""
    pairs = dedup.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), n=1, threshold=0.95)
    return pairs.filter((F.col("doc_id_a") % 2) != (F.col("doc_id_b") % 2))
