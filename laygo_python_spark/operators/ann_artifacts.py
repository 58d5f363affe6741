"""Committed trained-ANN artifacts — loader side.

``tools/train_ann_artifacts.py`` trains IVF centroids / PQ codebooks
once (seeded numpy Lloyd, bit-reproducible) and commits them under
``artifacts/ann/`` keyed by an exact-integer corpus signature. The
registered ANN queries load the matching slice here (driver-side
pyarrow read — no Spark job) and the DuckDB oracles ``read_parquet``
the very same files, which is what makes the trained search paths
differentially testable: both engines score against identical floats.
A corpus with no committed row falls back to live training (the
pre-artifact behavior), so the operators keep working on arbitrary
data — only the oracle gate needs the committed state.
"""

from __future__ import annotations

import os

import numpy as np

ARTIFACT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "artifacts",
    "ann",
)
IVF_PATH = f"{ARTIFACT_DIR}/ivf_centroids.parquet"
PQ_PATH = f"{ARTIFACT_DIR}/pq_codebooks.parquet"


_SIG_CACHE: dict[tuple[str, int, int], tuple[int, int] | None] = {}


def corpus_signature(sf_dir: str) -> tuple[int, int] | None:
    """(n, sig) for the embeddings fixture — the artifact key. One
    pyarrow column read; see tools/train_ann_artifacts.py for why every
    step is exact across engines. None when the table isn't a plain
    local parquet file (then callers fall back to live training).

    Memoized per (path, mtime, size): every artifact-gated query calls
    this up to twice (IVF + PQ loaders), and the pre-r7 shape
    re-materialized the FULL embedding matrix on the driver each time
    (``to_pylist`` — ~0.3 s at sf0.1, pure overhead). The signature only
    needs each row's first component, taken zero-copy from the arrow
    list buffer via its offsets; the floor/sum arithmetic is unchanged
    so committed artifact keys still match."""
    path = f"{sf_dir}/embeddings.parquet"
    if not os.path.isfile(path):
        return None
    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    if key in _SIG_CACHE:
        return _SIG_CACHE[key]
    import pyarrow.parquet as pq_

    col = pq_.read_table(path, columns=["embedding"]).column("embedding").combine_chunks()
    offsets = np.asarray(col.offsets)
    first = np.asarray(col.values)[offsets[:-1]].astype(np.float64)
    sig = (len(col), int(np.floor(first * 1048576.0).sum()))
    _SIG_CACHE[key] = sig
    return sig


def load_ivf_centroids(sf_dir: str, k: int) -> np.ndarray | None:
    """(k × dim) committed centroids for this corpus, or None."""
    key = corpus_signature(sf_dir)
    if key is None or not os.path.isfile(IVF_PATH):
        return None
    import pyarrow.parquet as pq_

    t = pq_.read_table(IVF_PATH).to_pylist()
    rows = [r for r in t if (r["n_corpus"], r["sig"]) == key and r["k"] == k]
    if not rows:
        return None
    rows.sort(key=lambda r: r["cell"])
    return np.array([r["centroid"] for r in rows], dtype=np.float64)


def load_pq_codebooks(sf_dir: str, m: int, ksub: int) -> np.ndarray | None:
    """(m × ksub × dsub) committed codebooks for this corpus, or None."""
    key = corpus_signature(sf_dir)
    if key is None or not os.path.isfile(PQ_PATH):
        return None
    import pyarrow.parquet as pq_

    t = pq_.read_table(PQ_PATH).to_pylist()
    rows = [
        r for r in t
        if (r["n_corpus"], r["sig"]) == key and r["m"] == m and r["ksub"] == ksub
    ]
    if not rows:
        return None
    rows.sort(key=lambda r: (r["s"], r["code"]))
    cbs = np.array([r["centroid"] for r in rows], dtype=np.float64)
    return cbs.reshape(m, ksub, -1)


PCA_PATH = f"{ARTIFACT_DIR}/pca_projection.parquet"


def load_pca_projection(sf_dir: str, k: int) -> tuple[np.ndarray, np.ndarray] | None:
    """(mean (d,), components (k × d)) committed principal axes for this
    corpus, or None (callers fall back to live distributed training)."""
    key = corpus_signature(sf_dir)
    if key is None or not os.path.isfile(PCA_PATH):
        return None
    import pyarrow.parquet as pq_

    rows = [
        r
        for r in pq_.read_table(PCA_PATH).to_pylist()
        if (r["n_corpus"], r["sig"]) == key and r["k"] == k
    ]
    if not rows:
        return None
    rows.sort(key=lambda r: r["comp"])
    mean = np.array(rows[0]["mean"], dtype=np.float64)
    comps = np.array([r["component"] for r in rows], dtype=np.float64)
    return mean, comps
