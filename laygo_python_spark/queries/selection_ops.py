"""Data-selection & embedding-curation operators — the model-targeted
half of a training-data pipeline: importance-resampled quality selection
(DSIR), hard-negative mining for contrastive training, farthest-point
diversity coresets, kNN label propagation, and Zipf-fit corpus health.

Reference-parity note: the reference engine (laygo,
transformers/transformer.py) stops at map/filter/reduce — this family is
capability uplift per SURVEY.md §2.6/§7, same posture as the dedup/ANN
modules. Every query here is hash-gated against a DuckDB replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from laygo_python_spark.queries import query
from laygo_python_spark.session import read_table as _t

_DSIR_ORACLE = """
    WITH tok AS (SELECT doc_id, source, unnest(string_split(trim(text), ' ')) AS g
                 FROM documents),
    tb AS (SELECT doc_id, source,
                  (('0x' || substring(md5(g), 1, 8))::BIGINT % 128) AS bucket
           FROM tok),
    raw AS (SELECT bucket, count(*) AS c_raw FROM tb GROUP BY bucket),
    tgt AS (SELECT bucket, count(*) AS c_tgt FROM tb WHERE source = 'src0' GROUP BY bucket),
    n_raw AS (SELECT CAST(sum(c_raw) AS DOUBLE) AS n_raw FROM raw),
    n_tgt AS (SELECT CAST(coalesce(sum(c_tgt), 0) AS DOUBLE) AS n_tgt FROM tgt),
    lr AS (SELECT raw.bucket,
                  ln((coalesce(tgt.c_tgt, 0) + 1) / (n_tgt.n_tgt + 128.0))
                  - ln((raw.c_raw + 1) / (n_raw.n_raw + 128.0)) AS lw
           FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket, n_raw, n_tgt),
    db AS (SELECT doc_id, bucket, count(*) AS cnt FROM tb GROUP BY doc_id, bucket),
    w AS (SELECT doc_id,
                 CAST(sum(cnt) AS BIGINT) AS n_tokens,
                 round(sum(cnt * lw), 6) AS log_weight
          FROM db JOIN lr ON db.bucket = lr.bucket GROUP BY doc_id),
    top AS (SELECT * FROM w ORDER BY log_weight DESC, doc_id LIMIT 100)
    SELECT doc_id, n_tokens, log_weight,
           CAST(row_number() OVER (ORDER BY log_weight DESC, doc_id) AS INT) AS rank
    FROM top
"""


@query("dsir_select_docs", oracle=_DSIR_ORACLE)
def dsir_select_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (operators/dsir.py; Xie et al. 2023,
    arXiv:2302.03169): fit two add-1-smoothed bag-of-hashed-ngrams
    multinomials — target = the 'src0' slice, raw = the full corpus —
    and keep the 100 documents with the highest log importance weight
    sum_tokens log(p_target/p_raw). The hashed feature uses the repo's
    md5-prefix convention so both engines bucket identically; weights
    round to 6 decimals BEFORE ranking (round-then-rank: a last-ulp
    summation difference cannot flip the selection), id tiebreak.

    Scale: token explode is map-local; both model fits collapse to 128
    bucket rows; the only data-sized shuffle carries (doc, bucket, cnt);
    the selection plans as TakeOrderedAndProject."""
    from laygo_python_spark.operators.dsir import dsir_select_topk

    docs = _t(spark, sf_dir, "documents")
    return dsir_select_topk(docs, F.col("source") == "src0", k=100)


_HARD_NEG_ORACLE = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id < 5),
    s AS (SELECT q.vec_id AS query_id, q.label AS query_label,
                 c.vec_id AS neighbor_id, c.label AS neighbor_label,
                 list_cosine_similarity(q.v, c.v) AS sim
          FROM q JOIN e c ON c.vec_id <> q.vec_id AND c.label <> q.label),
    r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, neighbor_id) AS rank
          FROM s)
    SELECT query_id, query_label, neighbor_id, neighbor_label, sim,
           CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 10
"""


@query("hard_negative_mining", oracle=_HARD_NEG_ORACLE)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: for each
    anchor, the top-10 most-similar vectors with a DIFFERENT label —
    the negatives that sit closest to the decision boundary and carry
    the most gradient signal. The label-mismatch predicate is applied
    BEFORE ranking (a post-filter would under-fill the negative set).
    Same broadcast-score-rank shape as embedding_cosine_topk with the
    label inequality fused into the join condition; the sequential-fold
    cosine is bit-identical across engines, so raw sims gate exactly."""
    from laygo_python_spark.operators.similarity import (
        as_double_array,
        cosine_hoisted,
        l2_norm,
    )

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        as_double_array("embedding").alias("qv"),
    ).select("query_id", "query_label", "qv", l2_norm(F.col("qv")).alias("nq"))
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        as_double_array("embedding").alias("cv"),
    ).select("neighbor_id", "neighbor_label", "cv", l2_norm(F.col("cv")).alias("nc"))
    scored = c.join(
        F.broadcast(q),
        (F.col("neighbor_id") != F.col("query_id"))
        & (F.col("neighbor_label") != F.col("query_label")),
    ).select(
        "query_id",
        "query_label",
        "neighbor_id",
        "neighbor_label",
        cosine_hoisted(F.col("qv"), F.col("cv"), F.col("nq"), F.col("nc")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 10)
    )


def _fps_oracle(k: int = 8) -> str:
    """Chained-CTE replay of greedy farthest-point sampling: step 0 is
    the min id; each later step cross-joins the 1-row previous center,
    refreshes the ROUNDED running min squared distance, and takes the
    (mind desc, id asc) argmax. The diff vector is materialized once per
    step so the squared distance is list_dot_product(dv, dv) — the same
    index-order fold Spark's zip_with/aggregate computes."""
    sq = (
        "list_transform(range(1, len({a}.v) + 1), i -> {a}.v[i] - {c}.v[i])"
    )
    parts = [
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        "c0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1)",
        f"dd0 AS (SELECT e.vec_id, e.v, {sq.format(a='e', c='c')} AS dv FROM e, c0 c)",
        "m0 AS (SELECT vec_id, v, round(list_dot_product(dv, dv), 6) AS mind FROM dd0)",
    ]
    for s in range(1, k):
        p = s - 1
        parts.append(
            f"c{s} AS (SELECT vec_id, v FROM m{p} ORDER BY mind DESC, vec_id LIMIT 1)"
        )
        if s < k - 1:
            parts.append(
                f"dd{s} AS (SELECT m.vec_id, m.v, m.mind, "
                f"{sq.format(a='m', c='c')} AS dv FROM m{p} m, c{s} c)"
            )
            parts.append(
                f"m{s} AS (SELECT vec_id, v, "
                "least(mind, round(list_dot_product(dv, dv), 6)) AS mind "
                f"FROM dd{s})"
            )
    centers = " UNION ALL ".join(f"SELECT vec_id, v FROM c{s}" for s in range(k))
    parts.append(f"cen AS ({centers})")
    parts.append(
        "adv AS (SELECT e.vec_id, cen.vec_id AS center_id, "
        + sq.format(a="e", c="cen")
        + " AS dv FROM e, cen)"
    )
    parts.append(
        "ad AS (SELECT vec_id, center_id, round(list_dot_product(dv, dv), 6) AS dist FROM adv)"
    )
    parts.append(
        "r AS (SELECT vec_id, center_id, dist, row_number() OVER "
        "(PARTITION BY vec_id ORDER BY dist, center_id) AS rn FROM ad)"
    )
    return (
        ",\n    ".join(parts)
        + "\n    SELECT vec_id, center_id, dist FROM r WHERE rn = 1"
    )


@query("diversity_coreset_assign", oracle=_fps_oracle(8))
def diversity_coreset_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Farthest-point diversity coreset (operators/coreset.py — Gonzalez
    greedy k-center, k=8, seed = min id) plus nearest-center assignment
    of every vector. Every (vec_id, center_id, dist) row is hash-gated,
    which pins the WHOLE greedy trajectory: a wrong pick at any step
    re-labels a big slice of the assignment. Distances are rounded
    BEFORE the running min / argmax (round-then-rank), so the greedy
    choices depend only on values both engines compute identically.
    Scale: k scans (one per round) + one map-local assignment pass;
    driver state is k (id, vector) pairs; no pairwise matrix."""
    from laygo_python_spark.operators.coreset import (
        assign_to_centers,
        farthest_point_sample,
    )

    emb = _t(spark, sf_dir, "embeddings")
    centers = farthest_point_sample(emb, k=8)
    return assign_to_centers(emb, centers)


_KNN_VOTE_ORACLE = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id % 25 = 0),
    c AS (SELECT * FROM e WHERE vec_id % 25 <> 0),
    s AS (SELECT q.vec_id AS query_id, q.label AS true_label,
                 c.vec_id AS nid, c.label AS nl,
                 list_cosine_similarity(q.v, c.v) AS sim
          FROM q, c),
    r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, nid) AS rnk
          FROM s),
    v AS (SELECT query_id, true_label, nl AS predicted_label,
                 count(*) AS votes
          FROM r WHERE rnk <= 5 GROUP BY query_id, true_label, nl),
    w AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY votes DESC, predicted_label) AS vr
          FROM v)
    SELECT query_id, true_label, predicted_label, CAST(votes AS BIGINT) AS votes
    FROM w WHERE vr = 1
"""


@query("knn_label_vote", oracle=_KNN_VOTE_ORACLE)
def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label propagation (k=5, cosine), EXACT form: predict a
    held-out slice's labels by majority vote of the nearest labeled
    vectors — the weak-supervision / auto-labeling primitive (and,
    against the true labels also emitted, an embedding-quality probe:
    high kNN agreement means the space separates the classes). Vote
    ties break (votes desc, label asc); neighbor ties break on id —
    both deterministic cross-engine.

    SCALE WARNING (r9 verdict): the held-out slice is every 25th id —
    a bounded FRACTION, not a bounded SIZE. Broadcasting it and
    crossJoining the rest is an O(|corpus|²/25) exact scan whose
    broadcast side grows with the corpus; at 100 TB this query is the
    exact ORACLE PROBE only, run at gate scale. The production path is
    ``ann_knn_label_vote`` below: SRP-LSH shortlist → exact rerank →
    vote, whose broadcast side is O(queries·tables), independent of
    corpus size."""
    from laygo_python_spark.operators.similarity import (
        as_double_array,
        cosine_hoisted,
        l2_norm,
    )

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        as_double_array("embedding").alias("qv"),
    ).select("query_id", "true_label", "qv", l2_norm(F.col("qv")).alias("nq"))
    c = emb.filter(F.col("vec_id") % 25 != 0).select(
        F.col("vec_id").alias("nid"),
        F.col("label").alias("nl"),
        as_double_array("embedding").alias("cv"),
    ).select("nid", "nl", "cv", l2_norm(F.col("cv")).alias("nc"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "true_label",
        "nid",
        "nl",
        cosine_hoisted(F.col("qv"), F.col("cv"), F.col("nq"), F.col("nc")).alias("sim"),
    )
    rw = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("nid"))
    top = scored.withColumn("rnk", F.row_number().over(rw)).filter(F.col("rnk") <= 5)
    votes = top.groupBy("query_id", "true_label", F.col("nl").alias("predicted_label")).agg(
        F.count(F.lit(1)).alias("votes")
    )
    vw = Window.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("predicted_label"))
    return (
        votes.withColumn("vr", F.row_number().over(vw))
        .filter(F.col("vr") == 1)
        .drop("vr")
    )


_SPARSE_COSINE_ORACLE = """
    WITH tok AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
                 FROM documents),
    tf AS (SELECT doc_id,
                  (('0x' || substring(md5(tok), 1, 8))::BIGINT % 1024) AS bucket,
                  count(*) AS tf
           FROM tok GROUP BY doc_id, bucket),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
    dfq AS (SELECT bucket, count(*) AS df FROM tf GROUP BY bucket),
    v AS (SELECT tf.doc_id, tf.bucket,
                 CAST(tf.tf AS DOUBLE) * (ln((n.n + 1) / (dfq.df + 1)) + 1.0) AS w
          FROM tf JOIN dfq USING (bucket), n),
    norms AS (SELECT doc_id, sqrt(sum(w * w)) AS norm FROM v GROUP BY doc_id),
    q AS (SELECT doc_id AS query_id, bucket, w AS qw FROM v WHERE doc_id < 5),
    dots AS (SELECT q.query_id, c.doc_id AS neighbor_id, sum(q.qw * c.w) AS dot
             FROM v c JOIN q ON c.bucket = q.bucket AND c.doc_id <> q.query_id
             GROUP BY q.query_id, c.doc_id),
    scored AS (SELECT d.query_id, d.neighbor_id,
                      round(d.dot / (qn.norm * cn.norm), 6) AS sim
               FROM dots d
               JOIN norms qn ON qn.doc_id = d.query_id
               JOIN norms cn ON cn.doc_id = d.neighbor_id),
    r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, neighbor_id) AS rank
          FROM scored)
    SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 10
"""


@query("sparse_tfidf_cosine_topk", oracle=_SPARSE_COSINE_ORACLE)
def sparse_tfidf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document similarity WITHOUT embeddings (operators/sparsesim.py):
    hashed TF-IDF sparse vectors (feature hashing, 1024 buckets,
    md5-prefix convention) scored through the classical inverted-index
    cosine — postings equi-join on the bucket, so work is
    sum_bucket(|q| x |c| postings), never a dense vector scan; norms
    and the probe set ride as broadcasts. The IR-native complement of
    embedding_cosine_topk (dense) and bm25_topk_docs (probabilistic
    lexical): this is the plan shape that still works when the vector
    space is the vocabulary itself. Sims round to 6 before ranking
    (round-then-rank, id tiebreak)."""
    from laygo_python_spark.operators.sparsesim import hashed_tfidf, sparse_cosine_topk

    docs = _t(spark, sf_dir, "documents")
    vecs = hashed_tfidf(docs, buckets=1024)
    probes = docs.select("doc_id").filter(F.col("doc_id") < 5)
    return sparse_cosine_topk(vecs, probes, k=10)


_ZIPF_ORACLE = """
    WITH tok AS (SELECT unnest(string_split(trim(text), ' ')) AS g FROM documents),
    f AS (SELECT g, count(*) AS c FROM tok GROUP BY g),
    top AS (SELECT g, c FROM f ORDER BY c DESC, g LIMIT 100),
    r AS (SELECT g, c, row_number() OVER (ORDER BY c DESC, g) AS rnk FROM top)
    SELECT CAST(count(*) AS BIGINT) AS n_types,
           round(regr_slope(ln(CAST(c AS DOUBLE)), ln(CAST(rnk AS DOUBLE))), 6) AS zipf_slope,
           round(regr_intercept(ln(CAST(c AS DOUBLE)), ln(CAST(rnk AS DOUBLE))), 6) AS zipf_intercept,
           round(regr_r2(ln(CAST(c AS DOUBLE)), ln(CAST(rnk AS DOUBLE))), 6) AS r2
    FROM r
"""


@query("zipf_law_fit", oracle=_ZIPF_ORACLE)
def zipf_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the top-100 word frequencies: slope /
    intercept / R² of log-frequency on log-rank — the classic corpus
    health check (natural text slopes near -1; synthetic, templated, or
    spam-heavy corpora bend the curve). The top slice is taken with
    orderBy+limit (TakeOrderedAndProject — no global sort at corpus
    vocab scale); only the 100 survivors enter the rank window and the
    one-row regression aggregate. Ranks tiebreak on the word so both
    engines number identical orderings."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("g"))
    f = tok.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    top = f.orderBy(F.desc("c"), F.asc("g")).limit(100)
    rnk = F.row_number().over(Window.orderBy(F.desc("c"), F.asc("g")))
    r = top.select(F.log(F.col("c").cast("double")).alias("lc"),
                   F.log(rnk.cast("double")).alias("lr"))
    return r.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.round(F.regr_slope("lc", "lr"), 6).alias("zipf_slope"),
        F.round(F.regr_intercept("lc", "lr"), 6).alias("zipf_intercept"),
        F.round(F.regr_r2("lc", "lr"), 6).alias("r2"),
    )


@query(
    "decontaminate_semantic",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    ev AS (SELECT vec_id AS eval_id, v FROM e WHERE vec_id % 25 = 0),
    co AS (SELECT vec_id, v FROM e WHERE vec_id % 25 <> 0),
    s AS (SELECT co.vec_id, ev.eval_id,
                 list_cosine_similarity(co.v, ev.v) AS sim
          FROM co JOIN ev ON TRUE),
    b AS (SELECT vec_id, eval_id, sim,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY sim DESC, eval_id) AS rn
          FROM s)
    SELECT vec_id, eval_id, sim FROM b
    WHERE rn = 1 AND sim >= 0.38
    ORDER BY vec_id
    """,
)
def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination
    (operators/semdedup.semantic_contamination): the eval slice is
    every 25th vector, and any other corpus vector whose cosine to an
    eval vector reaches 0.38 is flagged with its closest eval item —
    the semantic complement of decontaminate_ngram_overlap, which
    paraphrased leakage walks straight past. (The fixture embeddings
    are near-orthogonal, max pairwise sim ≈ 0.51, so the threshold
    sits where flags exist; production thresholds are ~0.9.)

    Scale: the eval side broadcasts (benchmarks are tiny next to a
    100 TB corpus), the corpus never shuffles, and the per-row argmax
    folds map-side into one partial max(struct) aggregation. The
    oracle replays scoring, the argmax tie-break, and the threshold;
    sims ride raw (bit-exact sequential-fold cosine, the
    embedding_cosine_topk precedent)."""
    from laygo_python_spark.operators.semdedup import semantic_contamination

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_contamination(
        emb.filter(F.col("vec_id") % 25 != 0),
        emb.filter(F.col("vec_id") % 25 == 0),
        threshold=0.38,
    ).orderBy("vec_id")


def _ann_knn_vote_oracle(k=5, n_planes=4, n_tables=8, dim=64, seed=42):
    """The ANN-routed vote replayed exactly: DuckDB rebuilds the SRP
    bucket tables from the same literal hyperplanes (deterministic
    Box-Muller-over-LCG, operators/similarity._srp_planes), shortlists
    bucket-colliding candidates, reranks by exact cosine, and votes."""
    from laygo_python_spark.queries.similarity_ops import _srp_bucket_union

    union = _srp_bucket_union(n_planes, n_tables, dim, seed)
    return f"""
    WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
                FROM embeddings),
    e AS (SELECT vec_id, v FROM e0),
    bk AS (
      {union}),
    q AS (SELECT * FROM bk WHERE vec_id % 25 = 0),
    c AS (SELECT * FROM bk WHERE vec_id % 25 <> 0),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM c JOIN q ON c.tbl = q.tbl AND c.bucket = q.bucket),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             list_cosine_similarity(x.v, y.v) AS sim
      FROM cand JOIN e x ON x.vec_id = cand.query_id
                JOIN e y ON y.vec_id = cand.neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rnk
      FROM scored),
    votes AS (
      SELECT r.query_id, tq.label AS true_label, tn.label AS predicted_label,
             count(*) AS votes
      FROM ranked r
      JOIN e0 tq ON tq.vec_id = r.query_id
      JOIN e0 tn ON tn.vec_id = r.neighbor_id
      WHERE r.rnk <= {k}
      GROUP BY r.query_id, tq.label, tn.label),
    w AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY votes DESC, predicted_label) AS vr
          FROM votes)
    SELECT query_id, true_label, predicted_label, CAST(votes AS BIGINT) AS votes
    FROM w WHERE vr = 1
    """


@query("ann_knn_label_vote", oracle=_ann_knn_vote_oracle())
def ann_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label propagation, ANN-ROUTED (the 100 TB path — r9 verdict
    ask #2): SRP-LSH bucket shortlist (operators/similarity.
    lsh_bucketed_topk — 8 tables × 4 planes, candidates only where a
    query and corpus vector share a bucket) → exact-cosine rerank of
    the shortlist → top-5 majority vote with the same deterministic
    tie-breaks as the exact ``knn_label_vote`` (votes desc / label asc;
    neighbors sim desc / id asc).

    Scale shape vs the exact twin: nothing is ever crossJoined and the
    only broadcasts are the QUERY-side frames inside lsh_bucketed_topk
    — that operator's contract is a bounded probe set, which a
    production caller supplies (this gate query probes the every-25th
    slice, a corpus FRACTION, purely so the oracle has a deterministic
    query set at gate scale; at production scale you'd pass the actual
    batch of unlabeled items). The candidate stream is bucket-local
    over 16-byte key rows; the label fetch and the vote are plain
    distributed id joins + one aggregation over O(queries · k) rows —
    ``top`` is referenced exactly once, so the shortlist pipeline runs
    once. tools/ann_vote_scale_smoke.py pins that no corpus-filtered
    branch sits under a BroadcastExchange. Recall < 1 by design (it's
    an ANN): the oracle replays the SAME shortlist, so the gate
    hash-checks the routed result, not agreement with the exact vote."""
    from laygo_python_spark.operators.similarity import lsh_bucketed_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 25 == 0)
    c = emb.filter(F.col("vec_id") % 25 != 0)
    top = lsh_bucketed_topk(c, q, k=5, n_planes=4, n_tables=8, dim=64)
    labels = emb.select("vec_id", "label")
    nl = labels.withColumnsRenamed({"vec_id": "neighbor_id", "label": "predicted_label"})
    ql = labels.withColumnsRenamed({"vec_id": "query_id", "label": "true_label"})
    votes = (
        top.join(nl, "neighbor_id")
        .join(ql, "query_id")
        .groupBy("query_id", "true_label", "predicted_label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    vw = Window.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("predicted_label"))
    return votes.withColumn("vr", F.row_number().over(vw)).filter(F.col("vr") == 1).drop("vr")


_TOKEN_BUDGET_ORACLE = """
    WITH tok AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
                 FROM documents),
    st AS (SELECT doc_id, count(*) AS n_tokens, count(DISTINCT w) AS n_distinct
           FROM tok GROUP BY doc_id),
    r AS (SELECT doc_id, n_tokens,
                 CAST(n_distinct AS DOUBLE) / n_tokens AS ratio FROM st),
    c AS (SELECT doc_id, n_tokens, ratio,
                 sum(n_tokens) OVER (ORDER BY ratio DESC, doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cum
          FROM r)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(ratio, 6) AS ratio, CAST(cum AS BIGINT) AS cum_tokens
    FROM c WHERE cum <= 30000
"""


@query("token_budget_select", oracle=_TOKEN_BUDGET_ORACLE)
def token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget curation (operators/budget.py): fill a
    30k-token training budget with the documents of highest lexical
    density (distinct-token ratio — an exact int/int double, so the
    greedy order is engine-identical), taking the prefix whose running
    token total fits. The running total is the SCALABLE form — range
    repartition + per-partition sums + broadcast offsets + one Arrow
    cumsum pass (assign_sequential_ids' skeleton), never a
    single-partition window; the DuckDB oracle replays it as the
    classic OVER (ORDER BY ...) prefix sum, certifying the distributed
    prefix-sum against the declarative one."""
    from laygo_python_spark.operators.budget import greedy_budget_select

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split(F.trim("text"), " ")).alias("w"))
    st = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("w").alias("n_distinct"),
    )
    r = st.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (F.col("n_distinct").cast("double") / F.col("n_tokens")).alias("ratio"),
    )
    out = greedy_budget_select(
        r,
        [F.col("ratio").desc(), F.col("doc_id").asc()],
        "n_tokens",
        budget=30000,
        out_col="cum_tokens",
    )
    return out.select(
        "doc_id", "n_tokens", F.round("ratio", 6).alias("ratio"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
    )
