"""Deduplication operators over a text corpus — the core of a
large-scale training-data pipeline.

Four tiers, all JVM-side (no Python in any hot path):

1. **Exact** — hash-groupBy on a normalized fingerprint (see
   queries/text_ops.py::dedup_exact). One shuffle of 32-byte keys.
2. **N-gram Jaccard** — exact set similarity via token self-join.
   Quadratic in corpus size per shared token: the *verification*
   primitive, not the discovery path at scale.
3. **MinHash + LSH banding** — the discovery path: shingle → minhash
   signature (H universal hashes over xxhash64) → band → bucket join.
   Only documents sharing a band bucket are compared; cost is
   O(candidates), not O(n²). Collision prob for Jaccard s:
   1 - (1 - s^R)^B with H = B*R signatures.
4. **SimHash** — 64-bit locality-sensitive fingerprint; near-dups are
   pairs within Hamming distance k, found by pigeonhole banding on
   16-bit chunks (hamming <= 3 → at least one of 4 chunks equal).

At 100 TB: every stage is explode/groupBy/join on short keys — the
shuffles move hashes and ids, never document text. Skewed buckets
(stopword-ish shingles) are capped via a bucket-size limit before the
pair join, which also bounds the quadratic blowup inside one bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Universal-hash constants: h_i(x) = (a_i * x + b_i) mod P over
# x = xxhash64(shingle) folded into [0, 2^31). P = 2^31 - 1 (prime);
# a_i*x + b_i < 2^62 so the arithmetic never overflows a signed 64-bit
# (Spark 4 runs ANSI mode — overflow would raise, not wrap).
_P = 2_147_483_647


def _hash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs — a simple LCG expansion of the seed so
    results are reproducible across runs and engines."""
    params = []
    state = seed
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        a = (state % (_P - 1)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        b = state % _P
        params.append((a, b))
    return params


def tokens(text_col: str = "text") -> Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


def shingles(text_col: str = "text", n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> — pure Column algebra:
    transform over a sequence of start offsets, concat_ws over slices.
    Docs shorter than n yield an empty array (NB: F.sequence(1, 0)
    counts DOWN in Spark, so the short case needs an explicit guard)."""
    toks = tokens(text_col)
    n_shingles = F.size(toks) - (n - 1)
    return F.when(n_shingles < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_shingles, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 128,
    seed: int = 42,
) -> DataFrame:
    """(id, sig array<long>) — one minhash signature per document.

    Shape chosen for scale: explode distinct shingles → ONE xxhash64 per
    shingle → groupBy(id) with ``num_hashes`` min() aggregates over cheap
    affine rehashes. All aggregates are codegen'd with map-side partial
    aggregation, so the shuffle carries (id, H longs) partials — never
    shingle text. (A first implementation as nested array
    transform/array_min built a megabyte-scale expression tree per slot
    and re-hashed shingles H times; this form is ~50× faster.)"""
    exploded = docs.select(
        F.col(id_col), F.explode(F.array_distinct(shingles(text_col, shingle_n))).alias("s")
    ).select(id_col, F.pmod(F.xxhash64("s"), F.lit(_P)).alias("h"))
    aggs = [
        F.min(F.pmod(F.col("h") * a + b, F.lit(_P))).alias(f"m{i}")
        for i, (a, b) in enumerate(_hash_params(num_hashes, seed))
    ]
    return (
        exploded.groupBy(id_col)
        .agg(*aggs)
        .select(F.col(id_col), F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("sig"))
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    seed: int = 42,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding.

    Returns (doc_id_a, doc_id_b, n_bands) with doc_id_a < doc_id_b —
    pairs sharing at least one band bucket, and the number of shared
    bands (a cheap similarity proxy). Follow with ``verify_jaccard`` or
    signature comparison for the exact decision.

    ``max_bucket`` drops degenerate buckets (e.g. boilerplate shingle
    sets shared by everything) — at 100 TB a single hot bucket would
    otherwise force one task to emit size² pairs.
    """
    rows_per_band = num_hashes // bands
    assert bands * rows_per_band == num_hashes, "bands must divide num_hashes"

    sig = minhash_signatures(docs, id_col, text_col, shingle_n, num_hashes, seed)
    band_entries = sig.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                # band key = hash of (band index, that band's signature slice)
                lambda b: F.xxhash64(b, F.concat_ws(",", F.slice("sig", b * rows_per_band + 1, rows_per_band))),
            )
        ).alias("band_key"),
    )
    # Cap hot buckets before the pair join (skew guard).
    sized = band_entries.join(
        band_entries.groupBy("band_key").count().filter(F.col("count") <= max_bucket).select("band_key"),
        "band_key",
        "left_semi",
    )
    a = sized.alias("a")
    b = sized.alias("b")
    return (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("doc_id_a"), F.col(f"b.{id_col}").alias("doc_id_b"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 1,
    threshold: float = 0.9,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing a token —
    the verification primitive. Token self-join is quadratic per shared
    token; use minhash_lsh_candidates for discovery at scale and this
    (restricted to the candidate set) for the exact decision."""
    grams = docs.select(
        F.col(id_col), F.explode(F.array_distinct(shingles(text_col, n) if n > 1 else tokens(text_col))).alias("g")
    ).distinct()
    counts = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    a, b = grams.alias("a"), grams.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("doc_id_a"), F.col(f"b.{id_col}").alias("doc_id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    ca = counts.select(F.col(id_col).alias("doc_id_a"), F.col("n_grams").alias("na"))
    cb = counts.select(F.col(id_col).alias("doc_id_b"), F.col("n_grams").alias("nb"))
    jac = F.col("n_inter").cast("double") / (F.col("na") + F.col("nb") - F.col("n_inter"))
    return (
        inter.join(ca, "doc_id_a")
        .join(cb, "doc_id_b")
        .select("doc_id_a", "doc_id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
) -> DataFrame:
    """(id, sh bigint) — 64-bit SimHash per document: per token take
    xxhash64, then for each bit position sum +1/-1 across tokens and set
    the bit when the sum is positive.

    Same scalable shape as minhash_signatures: explode tokens → one hash
    each → groupBy(id) with ``bits`` sum() aggregates (map-side combined),
    then assemble the fingerprint from the tallies."""
    exploded = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("t")).select(
        id_col, F.xxhash64("t").alias("h")
    )
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"t{b}")
        for b in range(bits)
    ]
    tallied = exploded.groupBy(id_col).agg(*aggs)
    fingerprint = None
    for b in range(bits):
        # bit 63 is the sign bit of a signed long: setting it adds -2^63
        weight = (1 << b) if b < 63 else -(1 << 63)
        piece = F.when(F.col(f"t{b}") > 0, F.lit(weight).cast("long")).otherwise(F.lit(0).cast("long"))
        fingerprint = piece if fingerprint is None else fingerprint + piece
    return tallied.select(F.col(id_col), fingerprint.alias("sh"))


def simhash_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance, via pigeonhole
    banding: split the 64-bit fingerprint into 4 chunks of 16 bits —
    any pair within Hamming distance 3 must agree on >= 1 chunk, so the
    candidate join is equi on (chunk_index, chunk_value), never O(n²).
    Returns (doc_id_a, doc_id_b, hamming)."""
    n_chunks = max_hamming + 1
    if 64 % n_chunks != 0:
        raise ValueError("max_hamming+1 must divide 64 so chunks tile the fingerprint")
    chunk_bits = 64 // n_chunks
    sh = simhash_fingerprints(docs, id_col, text_col)
    chunk_structs = [
        F.struct(
            F.lit(i).alias("chunk_idx"),
            F.shiftright(F.col("sh"), i * chunk_bits)
            .bitwiseAND(F.lit((1 << chunk_bits) - 1))
            .alias("chunk_val"),
        )
        for i in range(n_chunks)
    ]
    chunks = sh.select(id_col, "sh", F.explode(F.array(*chunk_structs)).alias("c")).select(
        id_col, "sh", "c.chunk_idx", "c.chunk_val"
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_id_a"),
            F.col(f"b.{id_col}").alias("doc_id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
        .select("doc_id_a", "doc_id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
