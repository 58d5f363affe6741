"""IVF ANN validation: recall vs brute force, multi-probe improvement,
planted-neighbor retrieval."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from laygo_python_spark.operators import similarity
from laygo_python_spark.operators.ivf import ivf_topk, train_centroids
from laygo_python_spark.session import read_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings")


def test_centroids_shape_and_determinism(emb):
    c1 = train_centroids(emb, n_centroids=8)
    c2 = train_centroids(emb, n_centroids=8)
    assert c1.shape == (8, 64)
    assert (c1 == c2).all()


def test_ivf_recall_vs_brute_force(emb):
    queries = emb.filter("vec_id < 20")
    bf = {(r.query_id, r.neighbor_id) for r in similarity.brute_force_topk(emb, queries, k=10).collect()}
    ivf1 = {(r.query_id, r.neighbor_id) for r in ivf_topk(emb, queries, k=10, n_centroids=8, n_probe=1).collect()}
    ivf3 = {(r.query_id, r.neighbor_id) for r in ivf_topk(emb, queries, k=10, n_centroids=8, n_probe=3).collect()}
    r1, r3 = len(bf & ivf1) / len(bf), len(bf & ivf3) / len(bf)
    assert r3 >= r1  # more probes → recall can only grow
    assert r3 >= 0.4, f"3-probe recall {r3:.2f} too low for 8 cells"


def test_ivf_finds_planted_identical_vector(spark):
    # modulus 53 > corpus size → no two base vectors identical/parallel
    base = [Row(vec_id=i, embedding=[float((i * 7 + j) % 53) for j in range(8)]) for i in range(50)]
    planted = [Row(vec_id=99, embedding=base[0].embedding)]
    corpus = spark.createDataFrame(base + planted)
    out = ivf_topk(corpus, corpus.filter("vec_id = 0"), k=1, n_centroids=4, n_probe=1).collect()
    assert out[0].neighbor_id == 99 and out[0].sim == pytest.approx(1.0)


def test_ivf_scores_match_brute_force_sims(emb):
    queries = emb.filter("vec_id < 5")
    bf = {(r.query_id, r.neighbor_id): r.sim for r in similarity.brute_force_topk(emb, queries, k=20).collect()}
    for r in ivf_topk(emb, queries, k=10, n_centroids=8, n_probe=2).collect():
        if (r.query_id, r.neighbor_id) in bf:
            assert r.sim == pytest.approx(bf[(r.query_id, r.neighbor_id)], rel=1e-12)


def test_ivf_indexed_search_matches_direct_and_prunes_partitions(emb, tmp_path):
    """The stored-index search must (a) return exactly what ivf_topk
    computes with the same training params, and (b) read ONLY the
    probed cell= directories — partition pruning visible in the scan's
    PartitionFilters."""
    from laygo_python_spark.operators.ivf import ivf_index_write, ivf_search_indexed
    from laygo_python_spark.plans import formatted_plan

    path = str(tmp_path / "ivf_index")
    ivf_index_write(emb, path, n_centroids=8)
    queries = emb.filter("vec_id < 10")
    spark = emb.sparkSession
    indexed = ivf_search_indexed(spark, path, queries, k=10, n_probe=2)
    direct = ivf_topk(emb, queries, k=10, n_centroids=8, n_probe=2)
    got = sorted((r.query_id, r.neighbor_id, r.rank) for r in indexed.collect())
    want = sorted((r.query_id, r.neighbor_id, r.rank) for r in direct.collect())
    assert got == want and got
    plan = formatted_plan(indexed)
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200]


def test_ivf_index_add_matches_fixed_centroid_rebuild(spark, emb, tmp_path):
    """Verdict r4 ask #3: growing a stored IVF index by assigning new
    vectors to the FIXED stored centroids must search identically to an
    index rebuilt from scratch over the union at those same centroids —
    cell assignment depends only on (vector, centroids)."""
    import numpy as np

    from laygo_python_spark.operators.ivf import (
        ivf_index_add,
        ivf_index_stats,
        ivf_index_write,
        ivf_search_indexed,
    )

    day1 = emb.filter("vec_id % 2 = 0")
    day2 = emb.filter("vec_id % 2 = 1")
    grown, rebuilt = str(tmp_path / "grown"), str(tmp_path / "rebuilt")
    ivf_index_write(day1, grown, n_centroids=8)
    n = ivf_index_add(spark, grown, day2)
    assert n == day2.count()

    cent_rows = spark.read.parquet(f"{grown}/centroids").collect()
    centroids = np.array(
        [r["centroid"] for r in sorted(cent_rows, key=lambda r: r["cell"])], dtype=np.float64
    )
    ivf_index_write(day1.unionByName(day2), rebuilt, centroids=centroids)

    queries = emb.filter("vec_id < 10")
    got = ivf_search_indexed(spark, grown, queries, k=5, n_probe=2).collect()
    want = ivf_search_indexed(spark, rebuilt, queries, k=5, n_probe=2).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    stats = ivf_index_stats(spark, grown).collect()
    assert sum(r["n"] for r in stats) == day1.count() + day2.count()
    assert all(r["skew"] >= 1.0 for r in stats)


def test_committed_artifact_loader_matches_fixture(spark, sf_dir):
    # The committed trained-state artifact must resolve for the fixture
    # corpus (keyed by exact-integer signature) with the geometry the
    # registered queries search at — and a foreign corpus key must miss
    # (falling back to live training) rather than load wrong floats.
    from laygo_python_spark.operators.ann_artifacts import (
        load_ivf_centroids,
        load_pq_codebooks,
    )

    cent = load_ivf_centroids(sf_dir, k=16)
    assert cent is not None and cent.shape == (16, 64)
    cb = load_pq_codebooks(sf_dir, m=32, ksub=64)
    assert cb is not None and cb.shape == (32, 64, 2)
    assert load_ivf_centroids(sf_dir, k=7) is None
    assert load_ivf_centroids("/nonexistent", k=16) is None


def test_nprobe_recall_curve_properties_and_consistency(emb):
    from laygo_python_spark.operators.ivf import nprobe_recall_curve

    queries = emb.filter("vec_id < 20")
    cent = train_centroids(emb, n_centroids=8)
    rows = {
        r.n_probe: r
        for r in nprobe_recall_curve(
            emb, queries, grid=(1, 2, 8), k=10, centroids=cent
        ).collect()
    }
    assert set(rows) == {1, 2, 8}
    # recall and scanned-cost both monotone in n_probe; full probe = exact
    assert rows[1].recall_at_10 <= rows[2].recall_at_10 <= rows[8].recall_at_10
    assert rows[1].avg_scanned < rows[2].avg_scanned < rows[8].avg_scanned
    assert rows[8].recall_at_10 == 1.0
    assert all(r.n_queries == 20 for r in rows.values())

    # the curve's n_probe=2 point must equal the recall of an actual
    # ivf_topk run at the same centroids — the curve measures the real
    # search path, not a parallel re-implementation
    bf = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(emb, queries, k=10).collect()
    }
    ivf2 = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, queries, k=10, n_probe=2, centroids=cent).collect()
    }
    assert rows[2].recall_at_10 == round(len(ivf2 & bf) / len(bf), 6)
