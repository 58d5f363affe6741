"""Data-selection operators: DSIR importance weights (differential vs a
pure-Python reference), farthest-point sampling (known geometry +
invariants), nearest-center assignment, and the selection_ops query
semantics that the SQL oracle alone can't pin (tie handling, scale
shape)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from laygo_python_spark.operators.coreset import assign_to_centers, farthest_point_sample
from laygo_python_spark.operators.dsir import dsir_log_weights, dsir_select_topk


def _md5_bucket(tok: str, buckets: int = 128) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % buckets


def _dsir_reference(rows, target_sources, buckets=128):
    """Pure-Python DSIR: add-1-smoothed hashed-unigram multinomials,
    target slice vs full corpus, per-doc log weight."""
    c_raw: dict[int, int] = {}
    c_tgt: dict[int, int] = {}
    doc_toks = {}
    for doc_id, text, source in rows:
        toks = text.strip().split(" ")
        doc_toks[doc_id] = toks
        for t in toks:
            b = _md5_bucket(t, buckets)
            c_raw[b] = c_raw.get(b, 0) + 1
            if source in target_sources:
                c_tgt[b] = c_tgt.get(b, 0) + 1
    n_raw = sum(c_raw.values())
    n_tgt = sum(c_tgt.values())
    out = {}
    for doc_id, toks in doc_toks.items():
        w = 0.0
        for t in toks:
            b = _md5_bucket(t, buckets)
            w += math.log((c_tgt.get(b, 0) + 1) / (n_tgt + buckets))
            w -= math.log((c_raw[b] + 1) / (n_raw + buckets))
        out[doc_id] = w
    return out


CORPUS = [
    (0, "alpha beta gamma alpha", "good"),
    (1, "alpha beta beta delta", "good"),
    (2, "zig zag zog zig zag", "junk"),
    (3, "alpha gamma delta beta", "junk"),
    (4, "zog zig noise noise zag", "junk"),
    (5, "beta alpha alpha gamma", "junk"),
]


def test_dsir_matches_pure_python_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string, source string")
    got = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(docs, F.col("source") == "good").collect()
    }
    want = _dsir_reference(CORPUS, {"good"})
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-6)
    # Target-like junk doc 3/5 (alpha/beta/gamma vocabulary) must outscore
    # the zig/zag docs — the whole point of the method.
    assert got[3] > got[2] and got[5] > got[4]


def test_dsir_select_topk_rank_and_tiebreak(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string, source string")
    sel = dsir_select_topk(docs, F.col("source") == "good", k=3).collect()
    assert [r["rank"] for r in sel] == [1, 2, 3]
    ws = [r["log_weight"] for r in sel]
    assert ws == sorted(ws, reverse=True)
    # ranks are dense over the rounded weight with id tiebreak: equal
    # weights must order by doc_id
    for a, b in zip(sel, sel[1:]):
        if a["log_weight"] == b["log_weight"]:
            assert a["doc_id"] < b["doc_id"]


def test_fps_picks_extremes_on_a_line(spark):
    # Points on a line at 0, 1, 2, 10: seed=min id (x=0), farthest is
    # x=10, then the midpoint-ish x=2 (dist 4 to nearest center per
    # rounded squared euclidean: min(4, 64) = 4 beats x=1's min(1,81)=1).
    pts = [(0, [0.0]), (1, [1.0]), (2, [2.0]), (3, [10.0])]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    centers = farthest_point_sample(df, k=3)
    assert [c[0] for c in centers] == [0, 3, 2]


def test_fps_duplicate_points_early_stop(spark):
    pts = [(0, [1.0, 1.0]), (1, [1.0, 1.0]), (2, [1.0, 1.0])]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    centers = farthest_point_sample(df, k=3)
    # all residual distances are 0 -> greedy stops after the seed
    assert [c[0] for c in centers] == [0]


def test_fps_k_bounds(spark):
    df = spark.createDataFrame([(0, [0.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        farthest_point_sample(df, k=0)
    assert farthest_point_sample(df.filter("vec_id < 0"), k=2) == []


def test_assign_to_centers_nearest_with_tiebreak(spark):
    pts = [(0, [0.0]), (1, [4.0]), (2, [2.0])]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    centers = [(0, [0.0]), (1, [4.0])]
    got = {r["vec_id"]: (r["center_id"], r["dist"]) for r in assign_to_centers(df, centers).collect()}
    assert got[0] == (0, 0.0)
    assert got[1] == (1, 0.0)
    # x=2 is equidistant (squared dist 4 both) -> lower center_id wins
    assert got[2] == (0, 4.0)


def test_fps_assignment_covers_every_point(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centers = farthest_point_sample(emb, k=4)
    assert len(centers) == 4
    out = assign_to_centers(emb, centers)
    assert out.count() == emb.count()
    # every center assigns to itself at distance 0
    self_rows = {r["vec_id"]: r for r in out.filter(
        F.col("vec_id").isin([c[0] for c in centers])).collect()}
    for cid, _ in centers:
        assert self_rows[cid]["center_id"] == cid
        assert self_rows[cid]["dist"] == 0.0


def test_fps_vectorized_matches_fold_path(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    fold = farthest_point_sample(emb, k=5)
    fast = farthest_point_sample(emb, k=5, vectorized=True)
    assert [c[0] for c in fast] == [c[0] for c in fold]


def test_assign_vectorized_matches_fold_path(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centers = farthest_point_sample(emb, k=4)
    fold = {r["vec_id"]: (r["center_id"], r["dist"])
            for r in assign_to_centers(emb, centers).collect()}
    fast = {r["vec_id"]: (r["center_id"], r["dist"])
            for r in assign_to_centers(emb, centers, vectorized=True).collect()}
    assert set(fold) == set(fast)
    mismatch = [k for k in fold if fold[k][0] != fast[k][0]]
    assert not mismatch
    for k in fold:
        assert fast[k][1] == pytest.approx(fold[k][1], abs=2e-6)


def test_knn_vote_tiebreak_prefers_smaller_label(spark, sf_dir, monkeypatch):
    from laygo_python_spark.queries.selection_ops import knn_label_vote

    out = knn_label_vote(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    # one prediction per query, votes within [1, 5]
    assert len({r["query_id"] for r in rows}) == len(rows)
    assert all(1 <= r["votes"] <= 5 for r in rows)


def test_sparse_tfidf_cosine_matches_pure_python(spark):
    from laygo_python_spark.operators.sparsesim import hashed_tfidf, sparse_cosine_topk

    corpus = [
        (0, "alpha beta gamma"),
        (1, "alpha beta delta"),
        (2, "zig zag zog"),
        (3, "alpha alpha beta"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    vecs = hashed_tfidf(docs, buckets=256)
    probes = docs.select("doc_id").filter("doc_id = 0")
    got = {
        r["neighbor_id"]: r["sim"]
        for r in sparse_cosine_topk(vecs, probes, k=4).collect()
    }

    # pure-python reference
    n = len(corpus)
    tf: dict[tuple[int, int], int] = {}
    for d, text in corpus:
        for t in text.split(" "):
            b = _md5_bucket(t, 256)
            tf[(d, b)] = tf.get((d, b), 0) + 1
    df: dict[int, int] = {}
    for (d, b) in tf:
        df[b] = df.get(b, 0) + 1
    w = {k: v * (math.log((n + 1) / (df[k[1]] + 1)) + 1.0) for k, v in tf.items()}
    import collections

    vec = collections.defaultdict(dict)
    for (d, b), x in w.items():
        vec[d][b] = x

    def cos(a, b):
        dot = sum(vec[a].get(k, 0.0) * vec[b][k] for k in vec[b])
        na = math.sqrt(sum(x * x for x in vec[a].values()))
        nb = math.sqrt(sum(x * x for x in vec[b].values()))
        return dot / (na * nb)

    # doc 2 (zig zag zog) shares no bucket with doc 0: the inverted
    # join never pairs them — correct sparse semantics (cos = 0, and a
    # zero-overlap doc can't be a top-k hit), so it is ABSENT.
    assert cos(0, 2) == 0.0 and 2 not in got
    for d in (1, 3):
        assert got[d] == pytest.approx(cos(0, d), abs=1e-6)
    # doc 3 (alpha alpha beta) is closer to doc 0 than doc 1
    assert got[3] > got[1]


def test_sparse_tfidf_max_df_drops_stop_buckets(spark):
    from laygo_python_spark.operators.sparsesim import hashed_tfidf

    docs = spark.createDataFrame(
        [(0, "the alpha"), (1, "the beta"), (2, "the gamma"), (3, "the delta")],
        "doc_id long, text string",
    )
    full = hashed_tfidf(docs, buckets=512)
    pruned = hashed_tfidf(docs, buckets=512, max_df_frac=0.9)
    the_b = _md5_bucket("the", 512)
    assert full.filter(F.col("bucket") == the_b).count() == 4
    assert pruned.filter(F.col("bucket") == the_b).count() == 0
    # each doc keeps its distinctive term's bucket
    assert pruned.count() == 4


def test_zipf_fit_on_planted_power_law(spark):
    # freq(rank) = round(1000 / rank): slope of ln f on ln rank ~= -1
    rows = []
    wid = 0
    for rank in range(1, 51):
        freq = max(1, round(1000 / rank))
        word = f"w{rank:03d}"
        rows.extend((wid + i, word) for i in range(freq))
        wid += freq
    docs = spark.createDataFrame(
        [(0, " ".join(w for _, w in rows))], "doc_id long, text string"
    )
    tok = docs.select(F.explode(F.split(F.trim("text"), " ")).alias("g"))
    f = tok.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql import Window

    top = f.orderBy(F.desc("c"), F.asc("g")).limit(100)
    rnk = F.row_number().over(Window.orderBy(F.desc("c"), F.asc("g")))
    r = top.select(
        F.log(F.col("c").cast("double")).alias("lc"), F.log(rnk.cast("double")).alias("lr")
    )
    slope = r.agg(F.regr_slope("lc", "lr")).collect()[0][0]
    assert slope == pytest.approx(-1.0, abs=0.02)


def test_ann_knn_label_vote_matches_exact_on_separated_blobs(spark):
    """On wide-margin clusters LSH recall is ~1, so the ANN-routed vote
    must agree with an exact vote — any disagreement is a routing bug,
    not ANN approximation. Also pins the scale contract: the routed
    query produces one prediction per query with votes in [1, 5]."""
    from laygo_python_spark.operators.similarity import lsh_bucketed_topk
    from pyspark.sql import Window

    dim, n, n_labels = 16, 400, 4
    base = spark.range(n).select(F.col("id").alias("vec_id"))
    lab = F.pmod(F.col("vec_id"), F.lit(n_labels))
    comps = []
    for d in range(dim):
        jitter = F.pmod(F.hash(F.col("vec_id") * (d + 1)), F.lit(1000)) / 10000.0
        comps.append(F.when(lab == d % n_labels, F.lit(1.0) + jitter).otherwise(jitter))
    emb = base.select(
        "vec_id",
        F.array(*comps).alias("embedding"),
        F.concat(F.lit("L"), lab.cast("string")).alias("label"),
    ).localCheckpoint(eager=True)

    q = emb.filter(F.col("vec_id") % 25 == 0)
    c = emb.filter(F.col("vec_id") % 25 != 0)
    top = lsh_bucketed_topk(c, q, k=5, n_planes=4, n_tables=8, dim=dim)
    labels = emb.select("vec_id", "label")
    votes = (
        top.join(
            labels.withColumnRenamed("vec_id", "neighbor_id").withColumnRenamed("label", "nl"),
            "neighbor_id",
        )
        .groupBy("query_id", "nl")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    vw = Window.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("nl"))
    got = {
        r["query_id"]: r["nl"]
        for r in votes.withColumn("vr", F.row_number().over(vw)).filter("vr = 1").collect()
    }
    truth = {r["vec_id"]: r["label"] for r in q.select("vec_id", "label").collect()}
    assert got and set(got) == set(truth)
    assert all(got[k] == truth[k] for k in got)
