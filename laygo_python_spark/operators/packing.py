"""Sequence packing — fill fixed token budgets (e.g. a 512-token context
window) with documents so training batches waste no padding.

Packing is partition-local by design: a global optimal bin packing would
serialize the corpus through one node; greedy first-fit within each
partition wastes a few percent of budget and costs one map-only pass.
For tighter packing, pre-sort by token count descending within
partitions (first-fit-decreasing) — one sortWithinPartitions, still no
shuffle.

Bin ids are globally unique: (partition_id << 32) | local_bin — the
same pattern as monotonically_increasing_id.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 512,
    decreasing: bool = True,
) -> DataFrame:
    """(bin_id, doc_ids array, total_tokens, n_docs) — greedy first-fit
    packing of documents into bins of at most ``budget`` tokens.
    Documents larger than the budget get a bin of their own (they would
    be truncated downstream, which is the trainer's decision, not ours).

    Invariants (tested): every input doc appears in exactly one bin;
    no multi-doc bin exceeds the budget.
    """
    if decreasing:
        df = df.sortWithinPartitions(F.desc(tokens_col))

    max_open = 64  # cap the first-fit scan: O(docs × max_open), not O(docs × bins)

    def pack(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        closed: list[list] = []  # [doc_ids, used]
        open_bins: list[list] = []
        for pdf in batches:
            for doc_id, n_tok in zip(pdf[id_col], pdf[tokens_col]):
                n_tok = int(n_tok)
                for b in open_bins:
                    if b[1] + n_tok <= budget:
                        b[0].append(doc_id)
                        b[1] += n_tok
                        break
                else:
                    open_bins.append([[doc_id], n_tok])
                    if len(open_bins) > max_open:
                        closed.append(open_bins.pop(0))
        closed.extend(open_bins)
        if closed:
            yield pd.DataFrame(
                {
                    "bin_id": [(pid << 32) | i for i in range(len(closed))],
                    "doc_ids": [b[0] for b in closed],
                    "total_tokens": [b[1] for b in closed],
                    "n_docs": [len(b[0]) for b in closed],
                }
            )

    return df.select(id_col, tokens_col).mapInPandas(
        pack, schema="bin_id long, doc_ids array<long>, total_tokens long, n_docs int"
    )
