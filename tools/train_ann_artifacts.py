"""Train and commit the ANN model artifacts the oracle-gated trained-ANN
queries read.

The IVF/PQ search paths are differential-testable only if BOTH engines
score against the SAME trained state — k-means is not SQL-expressible,
so instead of replaying training, the trained state becomes a stored
parquet artifact (the same engine-neutral-artifact discipline as the
bloom word table / HLL registers / MinHash index): the Spark queries
load it, and the DuckDB oracles ``read_parquet`` the very same file.
Artifacts are keyed by an exact-integer corpus signature —
``(count, sum(floor(embedding[0] * 2^20)))`` — so one committed file
serves every fixture SF (two SFs share n=500, so a row count alone is
ambiguous), and the oracle picks its slice by recomputing the same
signature in SQL. Every arithmetic step (float32→float64 widening,
scaling by a power of two, floor, integer-range sum) is exact in
float64, so numpy and DuckDB agree bit-for-bit.

Pure numpy + pyarrow (no Spark): training is the package's own seeded
Lloyd (`pq._kmeans_1sub`), bit-reproducible, run once here and committed
— queries never retrain when an artifact row matches, so search results
are stable across engines AND across sessions.

Usage: python tools/train_ann_artifacts.py  (rewrites artifacts/ann/)
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq_

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from laygo_python_spark.operators.pq import _kmeans_1sub, _normalize  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts", "ann")
IVF_KS = (8, 16)  # ann_ivfpq_topk trains 8 cells, ann_ivf_topk 16
PQ_MS, PQ_KSUB = (8, 16, 32), 64  # 32 = the search queries' geometry;
# 8/16 feed pq_m_distortion_curve (code-size vs distortion vs recall)


def _embeddings(sf_dir: str) -> np.ndarray:
    t = pq_.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    return np.array(t.column("embedding").to_pylist(), dtype=np.float64)


def corpus_sig(mat: np.ndarray) -> int:
    """Exact-integer fingerprint of an embedding corpus; see module doc."""
    return int(np.floor(mat[:, 0] * 1048576.0).sum())


PCA_K = 8  # embedding_pca_project's committed component count

# canonical PCA math lives with the operator — importing it here means
# training in-engine and the committed artifact can never drift. The eig
# is LAPACK (machine-deterministic, not spec-pinned): fine for the
# differential gate, which never re-derives axes — DuckDB REPLAYS the
# projection from this committed artifact, same contract as the IVF
# centroids.
from laygo_python_spark.operators.similarity import pca_components as _pca_components  # noqa: E402


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    ivf_rows: list[tuple] = []
    pq_rows: list[tuple] = []
    pca_rows: list[tuple] = []
    for sf_dir in sorted(glob.glob("/root/testdata/sf*")):
        if not os.path.exists(f"{sf_dir}/embeddings.parquet"):
            continue
        mat = _embeddings(sf_dir)
        n, sig = len(mat), corpus_sig(mat)
        # IVF: cells over RAW vectors (train_centroids semantics — no
        # normalization; assignment is plain L2 argmin).
        for k in IVF_KS:
            cent = _kmeans_1sub(mat, k, iters=20, seed=42)
            ivf_rows += [(n, sig, k, i, c.tolist()) for i, c in enumerate(cent)]
        # PQ: per-subspace codebooks over L2-NORMALIZED vectors
        # (train_codebooks semantics: iters=10, seed=42+s).
        norm = _normalize(mat)
        for pq_m in PQ_MS:
            dsub = norm.shape[1] // pq_m
            for s in range(pq_m):
                cb = _kmeans_1sub(norm[:, s * dsub : (s + 1) * dsub], PQ_KSUB, iters=10, seed=42 + s)
                pq_rows += [(n, sig, pq_m, PQ_KSUB, s, c, v.tolist()) for c, v in enumerate(cb)]
        mu, comps, eig = _pca_components(mat, PCA_K)
        pca_rows += [
            (n, sig, PCA_K, i, mu.tolist(), c.tolist(), float(e))
            for i, (c, e) in enumerate(zip(comps, eig))
        ]
        print(f"{sf_dir}: n={n} sig={sig} ivf k={IVF_KS} pq m={PQ_MS} ksub={PQ_KSUB} pca k={PCA_K}")

    pq_.write_table(
        pa.table(
            {
                "n_corpus": pa.array([r[0] for r in ivf_rows], pa.int64()),
                "sig": pa.array([r[1] for r in ivf_rows], pa.int64()),
                "k": pa.array([r[2] for r in ivf_rows], pa.int32()),
                "cell": pa.array([r[3] for r in ivf_rows], pa.int32()),
                "centroid": pa.array([r[4] for r in ivf_rows], pa.list_(pa.float64())),
            }
        ),
        f"{OUT}/ivf_centroids.parquet",
    )
    pq_.write_table(
        pa.table(
            {
                "n_corpus": pa.array([r[0] for r in pq_rows], pa.int64()),
                "sig": pa.array([r[1] for r in pq_rows], pa.int64()),
                "m": pa.array([r[2] for r in pq_rows], pa.int32()),
                "ksub": pa.array([r[3] for r in pq_rows], pa.int32()),
                "s": pa.array([r[4] for r in pq_rows], pa.int32()),
                "code": pa.array([r[5] for r in pq_rows], pa.int32()),
                "centroid": pa.array([r[6] for r in pq_rows], pa.list_(pa.float64())),
            }
        ),
        f"{OUT}/pq_codebooks.parquet",
    )
    pq_.write_table(
        pa.table(
            {
                "n_corpus": pa.array([r[0] for r in pca_rows], pa.int64()),
                "sig": pa.array([r[1] for r in pca_rows], pa.int64()),
                "k": pa.array([r[2] for r in pca_rows], pa.int32()),
                "comp": pa.array([r[3] for r in pca_rows], pa.int32()),
                "mean": pa.array([r[4] for r in pca_rows], pa.list_(pa.float64())),
                "component": pa.array([r[5] for r in pca_rows], pa.list_(pa.float64())),
                "eigval": pa.array([r[6] for r in pca_rows], pa.float64()),
            }
        ),
        f"{OUT}/pca_projection.parquet",
    )
    print(f"wrote {OUT}/ivf_centroids.parquet ({len(ivf_rows)} rows), "
          f"{OUT}/pq_codebooks.parquet ({len(pq_rows)} rows), "
          f"{OUT}/pca_projection.parquet ({len(pca_rows)} rows)")


if __name__ == "__main__":
    main()
