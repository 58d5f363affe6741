"""Compression-ratio quality signal — the classic corpus-curation
repetition proxy (used alongside Gopher-style rules in published web
pipelines): highly compressible text is boilerplate/template/repetition;
incompressible text at the other extreme is often encoded junk. Both
tails get filtered before LLM training.

Computed with stdlib ``zlib`` inside one Arrow-batched ``mapInPandas``
pass (zlib is C-speed; the pass is map-only — no shuffle, and at 100 TB
it composes with the same scan that computes the other quality columns
so the text is read once). DEFLATE at a fixed level is deterministic
for a given input, so the score is stable across runs, partitionings
and machines — but it is NOT SQL-reproducible, so the registered query
is rows-only; the operator's behavioral contract (bounds, monotonicity
on repetition, determinism) is pinned in pytest instead.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """(id, n_bytes, n_compressed, ratio) per document — ``ratio`` is
    compressed/raw over the utf-8 bytes (smaller = more repetitive;
    empty text scores 1.0 by convention). ``level`` is the DEFLATE
    level; fix it per corpus, since the score is only comparable at a
    constant level."""
    import zlib

    out_schema = f"{id_col} long, n_bytes long, n_compressed long, ratio double"

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, nc, ratio = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                raw = (text or "").encode("utf-8")
                comp = len(zlib.compress(raw, level)) if raw else 0
                ids.append(doc_id)
                nb.append(len(raw))
                nc.append(comp)
                ratio.append(comp / len(raw) if raw else 1.0)
            yield pd.DataFrame(
                {id_col: ids, "n_bytes": nb, "n_compressed": nc, "ratio": ratio}
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)
