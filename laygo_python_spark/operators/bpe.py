"""Byte-pair-encoding tokenizer induction over a corpus — the
vocabulary-training step of a pretraining pipeline (Sennrich et al.
2016, public), expressed Spark-first.

Two layers, mirroring the ANN family's train/score split:

* ``pair_counts`` — the distributed heavy lifting: corpus-wide adjacent
  symbol-pair frequencies from word counts. One token explode, one
  word-count aggregation, one map-only bigram explode over the DISTINCT
  word table (weighted by count), one final aggregation. The distinct
  vocabulary is orders of magnitude smaller than the corpus, so the
  per-merge-round work after the first scan touches |vocab| rows, not
  |corpus| — exactly why classical BPE trainers operate on a word-count
  table.
* ``bpe_train`` — the iterative merge loop. Each round's winning pair
  depends on the previous merge, so the loop is inherently sequential;
  it runs DRIVER-SIDE over the collected word-count table, guarded by a
  hard vocabulary cap (``max_vocab``, the pq._MAX_TRAIN posture): real
  tokenizer trainers (BPE/WordPiece) are single-node loops over exactly
  this aggregate — the cluster's job is producing the word counts from
  100 TB, which IS the distributed step above.

The merge rule is the classic greedy one: highest pair count wins, ties
broken by the pair's lexicographic order (deterministic across runs and
engines — unordered dict iteration never decides a merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_counts(
    docs: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """(word, n) — corpus word frequencies, the aggregate every
    tokenizer trainer consumes. One explode + one combiner-compressed
    aggregation; ``min_count`` prunes the long tail before it reaches
    the driver loop (standard trainer knob)."""
    wc = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_count > 1:
        wc = wc.filter(F.col("n") >= min_count)
    return wc


def pair_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(pair, n) — corpus-wide adjacent CHARACTER-pair frequencies (the
    round-1 BPE statistic): every length-2 substring of every word,
    weighted by the word's corpus count. JVM-only expressions; the
    bigram explode runs over the distinct word table."""
    # length-1 words have no pairs — and MUST be filtered before the
    # transform: Spark's sequence(1, 0) counts DOWN ([1, 0]) instead of
    # returning empty like DuckDB's range, which would fabricate
    # single-char "pairs" for every 1-char word.
    wc = word_counts(docs, text_col).filter(F.length("word") > 1)
    bigrams = wc.select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
        F.col("n"),
    )
    return bigrams.groupBy("pair").agg(F.sum("n").alias("n"))


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 1,
    max_vocab: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Greedy BPE merge list [(left, right), ...] of length <=
    ``n_merges`` (shorter iff the corpus runs out of repeated pairs).
    Symbols start as single characters; each round merges the
    highest-count adjacent symbol pair (ties: lexicographically
    smallest pair), exactly the published algorithm.

    The distributed step is the word-count aggregation; the merge loop
    collects that table (hard-capped at ``max_vocab`` distinct words —
    fail fast, never an unbounded driver fetch) and iterates locally.
    """
    wc = word_counts(docs, text_col, min_count)
    # Guard fused into the bounded fetch (limit caps the driver transfer
    # at max_vocab+1 rows): one job instead of count-then-toPandas two —
    # the word-count aggregation previously ran twice.
    pdf = wc.limit(max_vocab + 1).toPandas()
    if len(pdf) > max_vocab:
        raise ValueError(
            f"bpe_train collects the word-count table; got > {max_vocab} distinct "
            "words. Raise min_count (prune the tail) or max_vocab."
        )
    words: dict[tuple[str, ...], int] = {
        tuple(w): int(n) for w, n in zip(pdf["word"], pdf["n"])
    }
    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        repeated = {p: c for p, c in counts.items() if c > 1}
        if not repeated:
            break
        best = min(repeated, key=lambda p: (-repeated[p], p))
        merges.append(best)
        merged = "".join(best)
        nxt: dict[tuple[str, ...], int] = {}
        for syms, n in words.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + n
        words = nxt
    return merges


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens) — token counts after applying a trained merge
    list, the "how much does this vocabulary compress my corpus"
    measurement that guides n_merges. Words are rewritten as
    separator-joined symbol streams (a private \\x1f separator, so a
    merge can never bleed across word boundaries or match inside an
    already-fused symbol); each merge is one JVM string replace —
    left-to-right non-overlapping, exactly the greedy BPE application
    order — and the final token count is just the surviving separator
    count plus the word count. No Python anywhere; the whole thing is
    one codegen'd projection."""
    sep = "\x1f"
    cur = F.concat_ws(
        " ",
        F.transform(
            F.split(F.col(text_col), " "),
            lambda w: F.array_join(F.split(w, ""), sep),
        ),
    )
    for a, b in merges:
        cur = F.replace(cur, F.lit(a + sep + b), F.lit(a + b))
    n_words = F.size(F.split(F.col(text_col), " "))
    n_seps = F.length(cur) - F.length(F.replace(cur, F.lit(sep), F.lit("")))
    return docs.select(F.col(id_col), (n_seps + n_words).cast("int").alias("n_tokens"))
