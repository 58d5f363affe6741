"""Dedup operator validation — planted duplicates, cross-validation of
the approximate discovery paths against exact Jaccard ground truth, and
partitioning invariance (the property the reference asserts as chunk-size
invariance).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from laygo_python_spark.operators import dedup
from laygo_python_spark.session import read_table


@pytest.fixture(scope="module")
def planted(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again tonight"
    rows = [
        Row(doc_id=1, text=base),
        Row(doc_id=2, text=base),  # exact dup of 1
        Row(doc_id=3, text=near),  # near dup of 1/2 (one word differs)
        Row(doc_id=4, text="completely unrelated content about spark query engines and shuffles"),
        Row(doc_id=5, text="another distinct document mentioning benchmarks and parquet readers"),
    ]
    return spark.createDataFrame(rows)


def test_minhash_finds_exact_and_near_dups(planted):
    pairs = {(r.doc_id_a, r.doc_id_b): r.n_bands for r in dedup.minhash_lsh_candidates(planted, shingle_n=3).collect()}
    assert pairs.get((1, 2)) == 32  # identical docs share every band
    assert (1, 3) in pairs and (2, 3) in pairs  # near dups share many bands
    assert (4, 5) not in pairs


def test_simhash_finds_exact_and_near_dups(planted):
    pairs = {(r.doc_id_a, r.doc_id_b): r.hamming for r in dedup.simhash_near_dups(planted).collect()}
    assert pairs.get((1, 2)) == 0
    assert (4, 5) not in pairs


def test_jaccard_exact_values(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b c d"), Row(doc_id=2, text="a b c e"), Row(doc_id=3, text="x y z w")]
    )
    rows = dedup.ngram_jaccard_pairs(df, n=1, threshold=0.0).collect()
    vals = {(r.doc_id_a, r.doc_id_b): r.jaccard for r in rows}
    assert vals[(1, 2)] == pytest.approx(3 / 5)  # {a,b,c} / {a,b,c,d,e}
    assert (1, 3) not in vals  # no shared tokens → no pair emitted


def test_lsh_star_mode_same_components(spark, sf_dir):
    """clique_mode='star' must reach the same connected components over
    the same discovered doc set as the full pairs expansion — with an
    edge count bounded by O(docs) per clique instead of O(docs²)."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_candidates(docs, shingle_n=1)
    star = dedup.minhash_lsh_candidates(docs, shingle_n=1, clique_mode="star")
    n_pairs, n_star = pairs.count(), star.count()
    assert n_star <= n_pairs
    cc_pairs = {
        (r.node, r.cluster) for r in dedup.connected_components(pairs).collect()
    }
    cc_star = {
        (r.node, r.cluster) for r in dedup.connected_components(star).collect()
    }
    assert cc_pairs == cc_star and cc_pairs


def test_lsh_sig_dedup_keeps_identical_docs_past_cap(spark):
    """A group of identical docs larger than max_bucket must still be
    discovered: signature dedup collapses it to one banded signature,
    so the bucket cap no longer silently drops its pairs (r3 found
    27k of 190k true pairs lost at sf0.1 pre-dedup)."""
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="identical boilerplate text body") for i in range(40)]
        + [Row(doc_id=100, text="a completely different document entirely")]
    )
    got = {
        (r.doc_id_a, r.doc_id_b)
        for r in dedup.minhash_lsh_candidates(docs, shingle_n=1, max_bucket=10).collect()
    }
    assert got == {(i, j) for i in range(40) for j in range(i + 1, 40)}


def test_jaccard_strategies_agree(spark, sf_dir):
    """The bitmask (vocab <= 64) and prefix-filter (AllPairs) strategies
    are different physical plans for the same exact result — pin
    equivalence on the fixture corpus (tiny vocab: bitmask-eligible,
    and the repeated-set shape the bitmask dedup exploits) at two
    thresholds, including jaccard values bit-for-bit."""
    docs = read_table(spark, sf_dir, "documents")
    for threshold in (0.95, 0.5):
        bm = sorted(
            map(tuple, dedup.ngram_jaccard_pairs(docs, threshold=threshold, strategy="bitmask").collect())
        )
        pf = sorted(
            map(tuple, dedup.ngram_jaccard_pairs(docs, threshold=threshold, strategy="prefix").collect())
        )
        assert bm == pf and bm, f"strategy mismatch at t={threshold}"


def test_jaccard_bitmask_rejects_large_vocab(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(f"tok{i}_{j}" for j in range(10))) for i in range(10)]
    )
    with pytest.raises(ValueError, match="distinct grams"):
        dedup.ngram_jaccard_pairs(df, strategy="bitmask").collect()


def test_minhash_estimates_track_exact_jaccard(spark, sf_dir):
    """On the fixture corpus, every LSH candidate pair with full-band
    agreement must have high exact shingle-Jaccard — and candidates are
    a superset of the very-high-similarity pairs."""
    docs = read_table(spark, sf_dir, "documents")
    cand = dedup.minhash_lsh_candidates(docs, shingle_n=3, num_hashes=128, bands=32)
    exact = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.9)
    cand_pairs = {(r.doc_id_a, r.doc_id_b) for r in cand.collect()}
    exact_pairs = {(r.doc_id_a, r.doc_id_b) for r in exact.collect()}
    # recall: pairs with 3-gram jaccard >= 0.9 collide in >=1 of 32 bands
    # with probability 1-(1-0.9^4)^32 ≈ 1.0
    missed = exact_pairs - cand_pairs
    assert not missed, f"LSH missed high-similarity pairs: {missed}"


def test_minhash_partitioning_invariance(planted):
    r1 = sorted(map(tuple, dedup.minhash_lsh_candidates(planted.repartition(1), shingle_n=3).collect()))
    r7 = sorted(map(tuple, dedup.minhash_lsh_candidates(planted.repartition(7), shingle_n=3).collect()))
    assert r1 == r7


def test_simhash_rejects_untileable_hamming(planted):
    # 7 chunks don't tile 60 bits (default) — and 5 don't tile 64
    with pytest.raises(ValueError):
        dedup.simhash_near_dups(planted, max_hamming=6)
    with pytest.raises(ValueError):
        dedup.simhash_near_dups(planted, max_hamming=4, bits=64, hash_fn="crc32")


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="one two")])  # shorter than n=3
    from pyspark.sql import functions as F

    out = df.select(dedup.shingles("text", 3).alias("s")).collect()[0]["s"]
    assert out == []
    # and the LSH pipeline simply drops it rather than erroring
    assert dedup.minhash_lsh_candidates(df, shingle_n=3).count() == 0


def test_rolling_hash_order_sensitive_and_partition_invariant(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma"), Row(doc_id=2, text="gamma beta alpha")]
    )

    P, B = 2_147_483_647, 1_000_003
    toks = F.split(F.trim(F.col("text")), r"\s+")
    h = F.aggregate(toks, F.lit(0).cast("long"),
                    lambda acc, t: F.pmod(acc * B + F.pmod(F.xxhash64(t), F.lit(P)), F.lit(P)))
    one = {r.doc_id: r.h for r in df.repartition(1).select("doc_id", h.alias("h")).collect()}
    many = {r.doc_id: r.h for r in df.repartition(4).select("doc_id", h.alias("h")).collect()}
    assert one == many                 # partitioning-invariant
    assert one[1] != one[2]            # order-sensitive (same bag of words)


def test_connected_components_clusters(spark):
    # two chains and a singleton-pair: {1,2,3} via (1-2),(2-3); {10,11}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["doc_id_a", "doc_id_b"]
    )
    got = {r.node: r.cluster for r in dedup.connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_converges(spark):
    # a 12-node path graph needs ~diameter rounds of propagation
    edges = spark.createDataFrame([(i, i + 1) for i in range(12)], ["doc_id_a", "doc_id_b"])
    got = {r.node: r.cluster for r in dedup.connected_components(edges).collect()}
    assert set(got.values()) == {0} and len(got) == 13


def test_dedup_queries_leave_no_cached_blocks(spark, planted):
    """Persist hygiene: the pair-discovery operators must not leak cached
    blocks into a long-lived session (VERDICT r1: simhash's .persist()
    accumulated blocks with NO release path). simhash pins its
    fingerprints with a localCheckpoint and the result carries an
    explicit ``_release_pin()`` handle (DataFrame.unpersist cannot see
    RDD-level checkpoint caches). connected_components releases superseded checkpoints
    eagerly — only the blocks backing its RETURNED frame may remain."""
    import gc
    import time

    def persistent() -> int:
        gc.collect()
        spark._jvm.System.gc()
        return len(dict(spark.sparkContext._jsc.getPersistentRDDs()))

    base = persistent()
    sim = dedup.simhash_near_dups(planted)
    sim.collect()
    sim._release_pin()  # deterministic release of the fingerprint pin
    lsh = dedup.minhash_lsh_candidates(planted)
    lsh.collect()
    lsh._release_pin()  # deterministic release of the signature-group pin
    dedup.ngram_jaccard_pairs(planted, threshold=0.5).collect()
    # <=: the async ContextCleaner may also release OLDER sessions' blocks
    # while this test runs; the invariant is "no NEW blocks survive".
    # Poll briefly: blocks without an explicit handle are freed by the
    # ASYNC ContextCleaner after dereference — give it a moment.
    deadline = time.time() + 20
    while persistent() > base and time.time() < deadline:
        time.sleep(0.5)
    assert persistent() <= base

    edges = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["doc_id_a", "doc_id_b"])
    result = dedup.connected_components(edges)
    result.collect()
    # at most the one live checkpoint backing `result` beyond baseline
    assert persistent() <= base + 1


def test_simhash_fingerprints_compute_once(spark, planted):
    """Fingerprints are pinned by an eager localCheckpoint before the
    pair self-join (exchange reuse does not fire across Python-UDF
    subtrees), so the executed plan reads the checkpointed RDD on both
    join sides and contains NO Python stage — the mapInPandas pass ran
    exactly once, at checkpoint time."""
    df = dedup.simhash_near_dups(planted)
    df.collect()
    # AQE's toString echoes the Initial Plan below the Final Plan —
    # only the final section is what executed.
    plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "MapInPandas" not in plan
    assert "ExistingRDD" in plan


def test_simhash_compose_zero_jobs_with_hint(spark, planted):
    """With an ``n_fingerprints`` hint, COMPOSING simhash_near_dups must
    run zero Spark jobs (no plan-time count, lazy checkpoint) — callers
    building plans ahead of execution get pure plan building. The
    result must still be correct once executed."""
    sc = spark.sparkContext
    # count all jobs across groups via the JVM status tracker
    jvm_tracker = sc._jsc.sc().statusTracker()
    jobs_before = len(jvm_tracker.getJobIdsForGroup(None))
    df = dedup.simhash_near_dups(planted, n_fingerprints=100)
    jobs_after = len(jvm_tracker.getJobIdsForGroup(None))
    assert jobs_after == jobs_before, "composing with a hint must trigger no Spark jobs"
    pairs = {(r.doc_id_a, r.doc_id_b): r.hamming for r in df.collect()}
    assert pairs.get((1, 2)) == 0


def test_crc32_hash_paths_match_md5_structure(spark, planted):
    """Defaults flipped in r5: md5 (the oracle-proven family) is now
    what a no-args caller gets, and crc32 is the opt-in fast path —
    this test keeps the crc32 VARIANT honest by pinning the same
    planted structure the md5 default finds: exact dups at full band
    agreement / hamming 0, unrelated docs unpaired."""
    lsh = {
        (r.doc_id_a, r.doc_id_b): r.n_bands
        for r in dedup.minhash_lsh_candidates(planted, shingle_n=3, hash_fn="crc32").collect()
    }
    assert lsh.get((1, 2)) == 32
    assert (4, 5) not in lsh
    sim = {
        (r.doc_id_a, r.doc_id_b): r.hamming
        for r in dedup.simhash_near_dups(planted, bits=64, hash_fn="crc32").collect()
    }
    assert sim.get((1, 2)) == 0
    assert (4, 5) not in sim


def test_lsh_and_simhash_oracle_cap_semantics_differential(spark):
    """The generated DuckDB oracles replicate the max_bucket skew guard
    — differential check ON A CORPUS THAT TRIPS THE CAP (the standard
    sf0.01 gate never does): near-dup docs put >cap distinct signatures
    in shared band buckets; Spark with a tiny cap must equal the oracle
    generated with the same cap, including reduced n_bands and the
    cap-immune same-signature pairs."""
    import duckdb
    import pandas as pd

    from laygo_python_spark.queries.dedup_ops import _minhash_lsh_oracle, _simhash_oracle

    base = "the quick brown fox jumps over the lazy dog again and again near the river"
    texts = [base] + [base.replace("river", w) for w in ("ocean", "lake", "pond", "creek")]
    texts.append(base)  # exact dup of doc 0 → same-sig pair, cap-immune
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    docs = spark.createDataFrame(pdf)

    con = duckdb.connect()
    con.register("documents", pdf)

    got = sorted(
        (r.doc_id_a, r.doc_id_b, r.n_bands)
        for r in dedup.minhash_lsh_candidates(
            docs, shingle_n=3, num_hashes=128, bands=32, max_bucket=2, hash_fn="md5"
        ).collect()
    )
    want = sorted(map(tuple, con.execute(_minhash_lsh_oracle(max_bucket=2)).fetchall()))
    assert got == want and len(got) > 0
    # the cap actually fired: some cross pair counts fewer than 32 bands
    assert any(n < 32 for _, _, n in got)

    got_sh = sorted(
        (r.doc_id_a, r.doc_id_b, r.hamming)
        for r in dedup.simhash_near_dups(
            docs, max_hamming=3, bits=60, hash_fn="md5", max_bucket=1
        ).collect()
    )
    want_sh = sorted(map(tuple, con.execute(_simhash_oracle(max_bucket=1)).fetchall()))
    assert got_sh == want_sh


def test_incremental_lsh_equals_batch_cross_pairs(spark, sf_dir):
    """The stored-index match must reproduce the batch operator's
    (new x seen) candidate pairs exactly — same pairs, same n_bands —
    whenever the index used the same params and no bucket capped."""
    docs = read_table(spark, sf_dir, "documents")
    seen = docs.filter("doc_id % 2 = 0")
    new = docs.filter("doc_id % 2 = 1")
    idx = dedup.minhash_index(seen, shingle_n=3)
    inc = {
        (r.doc_id_new, r.doc_id_seen): r.n_bands
        for r in dedup.minhash_match_incremental(new, idx, shingle_n=3).collect()
    }
    batch = {}
    for r in dedup.minhash_lsh_candidates(docs, shingle_n=3).collect():
        if (r.doc_id_a % 2) != (r.doc_id_b % 2):
            n, s = (r.doc_id_a, r.doc_id_b) if r.doc_id_a % 2 else (r.doc_id_b, r.doc_id_a)
            batch[(n, s)] = r.n_bands
    assert inc == batch and inc


def test_minhash_index_parquet_roundtrip(spark, tmp_path, planted):
    """The artifact story: write the index, reload it cold, match —
    identical output to matching against the in-memory build."""
    seen = planted.filter("doc_id <= 3")
    new = planted.filter("doc_id > 3")
    idx = dedup.minhash_index(seen, shingle_n=1)
    direct = sorted(map(tuple, dedup.minhash_match_incremental(new, idx, shingle_n=1).collect()))
    path = str(tmp_path / "lsh_index")
    dedup.minhash_index_write(idx, path)
    reloaded = dedup.minhash_index_read(spark, path)
    from_disk = sorted(map(tuple, dedup.minhash_match_incremental(new, reloaded, shingle_n=1).collect()))
    assert direct == from_disk


def test_simhash_incremental_equals_batch_cross_pairs(spark, sf_dir):
    """simhash_match_incremental against a stored index reproduces the
    batch operator's (new x seen) pairs — pairs and hamming equal —
    when no bucket caps."""
    docs = read_table(spark, sf_dir, "documents")
    seen = docs.filter("doc_id % 2 = 0")
    new = docs.filter("doc_id % 2 = 1")
    idx = dedup.simhash_index(seen)
    inc = {
        (r.doc_id_new, r.doc_id_seen): r.hamming
        for r in dedup.simhash_match_incremental(new, idx).collect()
    }
    batch = {}
    for r in dedup.simhash_near_dups(docs).collect():
        if (r.doc_id_a % 2) != (r.doc_id_b % 2):
            n, s = (r.doc_id_a, r.doc_id_b) if r.doc_id_a % 2 else (r.doc_id_b, r.doc_id_a)
            batch[(n, s)] = r.hamming
    assert inc == batch and inc


def test_simhash_index_parquet_roundtrip(spark, tmp_path, planted):
    seen = planted.filter("doc_id <= 3")
    new = planted.filter("doc_id > 3")
    idx = dedup.simhash_index(seen)
    direct = sorted(map(tuple, dedup.simhash_match_incremental(new, idx).collect()))
    path = str(tmp_path / "sh_index")
    dedup.simhash_index_write(idx, path)
    from_disk = sorted(
        map(tuple, dedup.simhash_match_incremental(new, dedup.simhash_index_read(spark, path)).collect())
    )
    assert direct == from_disk


def test_simhash_incremental_rep_mode_linear_under_flood(spark):
    """mode='rep' routes each new flood doc to the seen group's ONE
    stored representative — linear rows, not n_new x n_seen pairs."""
    boiler = "terms of service apply all rights reserved click here now"
    seen = spark.createDataFrame([Row(doc_id=i, text=boiler) for i in range(50)])
    new = spark.createDataFrame([Row(doc_id=100 + i, text=boiler) for i in range(20)])
    idx = dedup.simhash_index(seen)
    rep_rows = dedup.simhash_match_incremental(new, idx, mode="rep").collect()
    assert len(rep_rows) == 20  # one row per new doc
    assert {r.doc_id_seen for r in rep_rows} == {0}  # all route to the rep
    pair_rows = dedup.simhash_match_incremental(new, idx, mode="pairs").count()
    assert pair_rows == 20 * 50


def test_minhash_incremental_rep_mode_linear_under_flood(spark):
    boiler = "terms of service apply all rights reserved click here to unsubscribe now"
    seen = spark.createDataFrame([Row(doc_id=i, text=boiler) for i in range(50)])
    new = spark.createDataFrame([Row(doc_id=100 + i, text=boiler) for i in range(20)])
    idx = dedup.minhash_index(seen)
    rep_rows = dedup.minhash_match_incremental(new, idx, mode="rep").collect()
    assert len(rep_rows) == 20
    assert {r.doc_id_seen for r in rep_rows} == {0}
    assert all(r.n_bands == 32 for r in rep_rows)
    assert dedup.minhash_match_incremental(new, idx, mode="pairs").count() == 20 * 50


def test_ngram_containment_pairs_matches_model(spark):
    # quote shape: doc 1 is a short passage, doc 2 embeds it verbatim in
    # a much longer text — containment(1→2) = 1.0 while Jaccard is tiny;
    # doc 3 is unrelated. Reference model: brute-force python sets.
    passage = "the quick brown fox jumps over the lazy dog tonight"
    long_doc = "unrelated preamble words here " + passage + " and then a very long tail " + " ".join(f"filler{i}" for i in range(40))
    rows = [(1, passage), (2, long_doc), (3, "completely different content " + " ".join(f"w{i}" for i in range(30)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def grams(t, n=3):
        w = t.split()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    model = {}
    g = {i: grams(t) for i, t in rows}
    for a in g:
        for b in g:
            if a != b and g[a]:
                c = len(g[a] & g[b]) / len(g[a])
                if c >= 0.5:
                    model[(a, b)] = c
    got = {
        (r.doc_id_a, r.doc_id_b): r.containment
        for r in dedup.ngram_containment_pairs(df, n=3, threshold=0.5).collect()
    }
    assert got == pytest.approx(model)
    assert got[(1, 2)] == 1.0 and (2, 1) not in got  # directed, asymmetric


def test_ngram_containment_max_df_drops_stop_grams(spark):
    # one boilerplate shingle shared by EVERY doc: with max_df it leaves
    # the universe entirely (numerator AND denominator), so two docs
    # whose only overlap is boilerplate report no pair at all.
    boiler = "copyright footer text"
    rows = [(i, f"unique{i} alpha{i} beta{i} " + boiler) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with_cap = dedup.ngram_containment_pairs(df, n=3, threshold=0.1, max_df=3).collect()
    assert with_cap == []
    no_cap = dedup.ngram_containment_pairs(df, n=3, threshold=0.1).collect()
    assert len(no_cap) == 20  # all directed pairs share the boilerplate gram


def test_cc_driver_path_equals_distributed_path(spark):
    # r8 adaptive small-graph path: union-find (default threshold) and
    # the distributed fixpoint (driver_threshold=0) must emit identical
    # (node, cluster) labels — chain + clique + singleton-pair mix.
    import random

    from laygo_python_spark.operators.dedup import connected_components

    rng = random.Random(31)
    edges = [(i, i + 1) for i in range(50)]                    # chain
    edges += [(100 + a, 100 + b) for a in range(8) for b in range(a)]  # clique
    edges += [(rng.randint(200, 260), rng.randint(200, 260)) for _ in range(40)]
    df = spark.createDataFrame(edges, "doc_id_a long, doc_id_b long")
    fast = {(r["node"], r["cluster"]) for r in connected_components(df).collect()}
    dist_stats: dict = {}
    dist = {
        (r["node"], r["cluster"])
        for r in connected_components(df, driver_threshold=0, stats=dist_stats).collect()
    }
    assert fast == dist
    assert dist_stats.get("rounds", 1) > 0  # the distributed path actually ran


def test_cluster_split_colocates_near_duplicates(spark):
    # The leakage guard itself: every member of a near-dup cluster gets
    # the cluster's split — planted copies can never straddle train/eval,
    # while the naive per-doc hash split DOES leak on the same corpus
    # (differential proof the operator earns its keep).
    from pyspark.sql import functions as F

    from laygo_python_spark.operators.dedup import cluster_split, ngram_jaccard_pairs
    from laygo_python_spark.queries.sampling_ops import hash_bucket

    base = [(i, f"unique text body number {i} with tail {i * 7}") for i in range(40)]
    # plant 10 near-dup groups of 3 copies each (ids 100+, identical text)
    planted = [(100 + g * 3 + j, f"duplicated payload group {g}") for g in range(10) for j in range(3)]
    df = spark.createDataFrame(base + planted, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(df, n=1, threshold=0.95)
    out = cluster_split(df, pairs).collect()
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())  # atomic clusters
    planted_clusters = {r["cluster"] for r in out if r["doc_id"] >= 100}
    assert len(planted_clusters) == 10  # each group is one cluster, label = min id
    assert planted_clusters == {100 + g * 3 for g in range(10)}
    # Differential at 50/50 (where per-doc straddling is near-certain):
    # the naive split leaks on at least one planted group; cluster_split
    # at the same percentage still cannot, by construction.
    naive = {
        r["doc_id"]: ("train" if r["b"] < 50 else "eval")
        for r in df.select("doc_id", hash_bucket(F.col("doc_id")).alias("b")).collect()
    }
    leaked = any(
        len({naive[100 + g * 3 + j] for j in range(3)}) > 1 for g in range(10)
    )
    assert leaked  # the hazard is real on this corpus
    out50 = cluster_split(df, pairs, train_pct=50).collect()
    by_cluster50: dict = {}
    for r in out50:
        by_cluster50.setdefault(r["cluster"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster50.values())  # — and absent here


# ---- substring-span dedup (Lee et al. 2022 exact-substring modality) ----


@pytest.fixture(scope="module")
def span_docs(spark):
    """Hand-built corpus with known maximal spans. Tokens are digits of a
    per-doc counter so nothing matches unless planted.

    - docs 10/11 share an exact 20-token run: positions 5..24 in doc 10,
      positions 0..19 in doc 11 (doc 11 STARTS with the shared passage).
    - doc 12 shares a shorter 9-token run with doc 10 (below min_len=16
      at k=8 -> must NOT be reported, but IS a valid k-gram match).
    - doc 13 repeats doc 10's passage TWICE (two diagonals -> two spans
      against doc 10).
    - doc 14 is unrelated.
    """
    shared = [f"S{i}" for i in range(20)]
    short = [f"T{i}" for i in range(9)]

    def filler(doc, n, tag="f"):
        return [f"{tag}{doc}_{i}" for i in range(n)]

    rows = [
        Row(doc_id=10, text=" ".join(filler(10, 5) + shared + short + filler(10, 6, "g"))),
        Row(doc_id=11, text=" ".join(shared + filler(11, 15))),
        Row(doc_id=12, text=" ".join(filler(12, 3) + short + filler(12, 20, "g"))),
        Row(doc_id=13, text=" ".join(shared + filler(13, 4) + shared)),
        Row(doc_id=14, text=" ".join(filler(14, 30))),
    ]
    return spark.createDataFrame(rows)


def test_substring_spans_exact_offsets(span_docs):
    spans = {
        (r.doc_id_a, r.doc_id_b, r.start_a, r.start_b, r.span_len)
        for r in dedup.substring_span_pairs(span_docs, k=8, min_len=16).collect()
    }
    assert (10, 11, 5, 0, 20) in spans
    # doc 13 carries the passage twice -> two diagonals vs doc 10 AND vs 11
    assert (10, 13, 5, 0, 20) in spans
    assert (10, 13, 5, 24, 20) in spans
    assert (11, 13, 0, 0, 20) in spans
    assert (11, 13, 0, 24, 20) in spans
    # the 9-token run is discoverable at k=8 but below min_len
    assert not any(p[:2] == (10, 12) for p in spans)
    assert not any(14 in p[:2] for p in spans)
    assert len(spans) == 5


def test_substring_spans_min_len_boundary(span_docs):
    # min_len == span length exactly -> included; one more -> excluded
    at = dedup.substring_span_pairs(span_docs, k=8, min_len=20).collect()
    assert {(r.doc_id_a, r.doc_id_b) for r in at} == {(10, 11), (10, 13), (11, 13)}
    above = dedup.substring_span_pairs(span_docs, k=8, min_len=21).collect()
    assert above == []
    # k=8 min_len=9 surfaces the short 9-token run with exact offsets
    low = {
        (r.doc_id_a, r.doc_id_b, r.start_a, r.start_b, r.span_len)
        for r in dedup.substring_span_pairs(span_docs, k=8, min_len=9).collect()
    }
    assert (10, 12, 25, 3, 9) in low


def test_substring_spans_max_df_drops_boilerplate(spark):
    # header on EVERY doc; unique plant on one pair. max_df below the
    # corpus count must drop the header spans but keep the plant.
    header = [f"H{i}" for i in range(20)]
    plant = [f"P{i}" for i in range(16)]
    rows = [
        Row(doc_id=i, text=" ".join(header + [f"u{i}_{j}" for j in range(10)]))
        for i in range(6)
    ]
    rows += [
        Row(doc_id=6, text=" ".join(header + plant)),
        Row(doc_id=7, text=" ".join(header + [f"u7_{j}" for j in range(4)] + plant)),
    ]
    df = spark.createDataFrame(rows)
    unfiltered = dedup.substring_span_pairs(df, k=8, min_len=16).collect()
    assert any(r.span_len >= 20 for r in unfiltered)  # header found everywhere
    got = {
        (r.doc_id_a, r.doc_id_b, r.start_a, r.start_b, r.span_len)
        for r in dedup.substring_span_pairs(df, k=8, min_len=16, max_df=3).collect()
    }
    assert got == {(6, 7, 20, 24, 16)}


def test_substring_coverage_unions_overlaps(span_docs):
    spans = dedup.substring_span_pairs(span_docs, k=8, min_len=16)
    cov = {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.dup_fraction)
        for r in dedup.substring_dup_coverage(span_docs, spans).collect()
    }
    # doc 10's [5,25) interval appears vs BOTH 11 and 13 twice -> unions to 20
    assert cov[10] == (40, 20, 0.5)
    assert cov[11] == (35, 20, round(20 / 35, 6))
    # doc 13: [0,20) and [24,44) from two plants, each matched twice
    assert cov[13] == (44, 40, round(40 / 44, 6))
    assert cov[12] == (32, 0, 0.0)
    assert cov[14] == (30, 0, 0.0)


def test_substring_spans_partitioning_invariance(span_docs):
    base = sorted(
        map(tuple, dedup.substring_span_pairs(span_docs, k=8, min_len=16).collect())
    )
    for parts in (1, 7):
        got = sorted(
            map(
                tuple,
                dedup.substring_span_pairs(
                    span_docs.repartition(parts), k=8, min_len=16
                ).collect(),
            )
        )
        assert got == base


def test_substring_incremental_equals_batch_cross_pairs(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    seen = docs.filter("doc_id % 2 = 0")
    new = docs.filter("doc_id % 2 = 1")
    idx = dedup.substring_index(seen, k=8)
    inc = sorted(
        map(tuple, dedup.substring_match_incremental(new, idx, min_len=9).collect())
    )
    full = dedup.substring_span_pairs(docs, k=8, min_len=9)
    want = sorted(
        map(
            tuple,
            full.filter(
                "NOT (doc_id_a % 2 = 0 AND doc_id_b % 2 = 0)"
            ).collect(),
        )
    )
    assert inc == want and len(want) > 0


def test_substring_index_write_read_append_replay(spark, span_docs, tmp_path):
    path = str(tmp_path / "ss_idx")
    seen = span_docs.filter("doc_id IN (10, 12, 14)")
    late = span_docs.filter("doc_id = 11")
    probe = span_docs.filter("doc_id = 13")

    dedup.substring_index_write(dedup.substring_index(seen, k=8), path)
    idx = dedup.substring_index_read(spark, path)
    assert idx["params"] == {"k": 8, "max_df": None}

    # append doc 11, replay the same batch id — postings must not double
    n1 = dedup.substring_index_append(spark, path, late, batch_id=0)
    assert n1 > 0
    assert dedup.substring_index_append(spark, path, late, batch_id=0) == 0
    total = spark.read.parquet(f"{path}/postings").count()

    # matching doc 13 against the grown index finds its spans vs BOTH
    # the original corpus (10) and the appended doc (11)
    got = {
        (r.doc_id_a, r.doc_id_b, r.start_a, r.start_b, r.span_len)
        for r in dedup.substring_match_incremental(
            probe, dedup.substring_index_read(spark, path), min_len=16
        ).collect()
    }
    assert (10, 13, 5, 0, 20) in got and (10, 13, 5, 24, 20) in got
    assert (11, 13, 0, 0, 20) in got and (11, 13, 0, 24, 20) in got
    assert spark.read.parquet(f"{path}/postings").count() == total


def test_simhash_radius_tuning_monotone_and_consistent(spark, sf_dir):
    from laygo_python_spark.queries.dedup_ops import simhash_radius_tuning
    from laygo_python_spark.session import read_table

    rows = {r.radius: r for r in simhash_radius_tuning(spark, sf_dir).collect()}
    assert set(rows) == set(range(6))
    for r in range(1, 6):
        # widening the radius can only add candidates and true positives
        assert rows[r].n_candidates >= rows[r - 1].n_candidates
        assert rows[r].true_positives >= rows[r - 1].true_positives
        assert rows[r].recall >= rows[r - 1].recall
    # the loosest-radius candidate count equals an actual
    # simhash_near_dups run at the same parameters — the curve measures
    # the real discovery path
    docs = read_table(spark, sf_dir, "documents").filter("doc_id % 2 = 0")
    direct = dedup.simhash_near_dups(docs, max_hamming=5, hash_fn="md5").count()
    assert rows[5].n_candidates == direct


def test_substring_strip_keeps_first_occurrence_and_converges(span_docs):
    spans = dedup.substring_span_pairs(span_docs, k=8, min_len=16)
    out = {r.doc_id: r for r in dedup.substring_strip_spans(span_docs, spans).collect()}
    # doc 10 is the lowest id in every pair it joins — untouched
    assert out[10].n_removed == 0
    assert out[10].text == span_docs.filter("doc_id = 10").first().text
    # doc 11 loses its copy of the shared passage ([0, 20))
    assert out[11].n_removed == 20
    assert out[11].text == " ".join(f"f11_{i}" for i in range(15))
    # doc 13 loses BOTH copies ([0,20) and [24,44)) but keeps the filler
    assert out[13].n_removed == 40
    assert out[13].text == " ".join(f"f13_{i}" for i in range(4))
    # untouched docs round-trip (modulo whitespace normalization)
    assert out[14].n_removed == 0 and out[12].n_removed == 0

    # convergence: one strip pass removes every >=16-token duplicate —
    # re-detecting on the stripped corpus finds nothing
    stripped = dedup.substring_strip_spans(span_docs, spans)
    again = dedup.substring_span_pairs(stripped, k=8, min_len=16).collect()
    assert again == []
