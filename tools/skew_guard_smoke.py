"""Skew-guard stress smoke (VERDICT r2 item 8): plant a DEGENERATE
bucket — 10% of a 10^6-doc corpus sharing one boilerplate text — and
prove the `max_bucket` caps in both dedup discovery paths hold:

* `minhash_lsh_candidates(clique_mode="star")`: identical docs collapse
  to ONE signature group (signature dedup), and star expansion emits
  n-1 edges instead of ~(10^5)^2/2 = 5e9 clique pairs — same connected
  components, linear output. The `max_bucket` cap additionally guards
  band buckets of distinct-but-colliding signatures.
* `simhash_near_dups(clique_mode="star")`: identical docs collapse to
  ONE fingerprint (fingerprint dedup) — a hamming-0 group emitting n-1
  star edges; the per-chunk occupancy cap guards distinct-fingerprint
  diversity only.

Asserts (a) the degenerate population's candidate count is LINEAR
(star edges in both paths, instead of ~5e9 clique pairs),
(b) the unique-doc population still produces its (seeded, known)
near-dup pairs — the guards kill the pathological blowup, not recall
on the healthy corpus, and (c) bounded wall-clock, the proxy for "no
task sat in a size² expansion".

Usage: python tools/skew_guard_smoke.py [n_docs] [degenerate_frac]
Prints one JSON line. Referenced from operators/dedup.py docstrings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from laygo_python_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_candidates,
    simhash_near_dups,
)
from laygo_python_spark.session import get_spark  # noqa: E402

BOILERPLATE = "terms of service apply all rights reserved click here to unsubscribe now"


def build_corpus(spark, n_docs: int, degenerate_frac: float):
    """(doc_id, text): ids [0, n_deg) all share BOILERPLATE (the planted
    hot bucket); the rest get id-derived unique token streams, except
    every 1000th unique doc is a planted NEAR-DUP of its successor
    (same 12 tokens + 1 differing) so recall past the cap is checkable.
    All generation is Column algebra — no Python, no driver loop."""
    n_deg = int(n_docs * degenerate_frac)
    base = spark.range(n_docs).withColumn("is_deg", F.col("id") < n_deg)
    # 12 id-derived pseudo-words; near-dup pairs (i, i+1) share the
    # first 12 and differ in the 13th token.
    pair_seed = ((F.col("id") - n_deg) / 2).cast("long")  # same for i, i+1
    words = F.concat_ws(
        " ",
        *[F.concat(F.lit(f"w{k}_"), F.conv(F.hex(F.xxhash64(pair_seed, F.lit(k))), 16, 10)) for k in range(12)],
    )
    is_pair = ((F.col("id") - n_deg) % 1000) < 2  # docs 0,1 / 1000,1001 / ... of each block
    uniq_tail = F.concat(F.lit("u_"), F.col("id").cast("string"))
    text = (
        F.when(F.col("is_deg"), F.lit(BOILERPLATE))
        .when(is_pair, F.concat_ws(" ", words, uniq_tail))
        .otherwise(
            F.concat_ws(
                " ",
                *[F.concat(F.lit(f"x{k}_"), F.conv(F.hex(F.xxhash64("id", F.lit(k + 100))), 16, 10)) for k in range(13)],
            )
        )
    )
    docs = base.select(F.col("id").alias("doc_id"), text.alias("text")).repartition(
        spark.sparkContext.defaultParallelism
    )
    expected_pairs = sum(1 for i in range(n_docs - n_deg) if i % 1000 == 0 and i + 1 < n_docs - n_deg)
    return docs.localCheckpoint(eager=True), n_deg, expected_pairs


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    degenerate_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.10
    spark = get_spark("skew_guard_smoke")
    docs, n_deg, expected_pairs = build_corpus(spark, n_docs, degenerate_frac)

    out: dict = {"n_docs": n_docs, "n_degenerate": n_deg, "expected_planted_pairs": expected_pairs}

    t0 = time.perf_counter()
    cand = minhash_lsh_candidates(docs, max_bucket=1000, clique_mode="star").localCheckpoint(
        eager=True
    )
    n_cand = cand.count()
    deg_cand = cand.filter((F.col("doc_id_a") < n_deg) & (F.col("doc_id_b") < n_deg)).count()
    planted_found = cand.filter(
        (F.col("doc_id_a") >= n_deg) & (F.col("doc_id_b") == F.col("doc_id_a") + 1)
    ).count()
    t_lsh = time.perf_counter() - t0
    # (a) the identical-doc flood comes out LINEAR: one signature group,
    # star-expanded to exactly n_deg - 1 edges (not ~5e9 clique pairs) —
    # and the group is still DISCOVERED (the pre-sig-dedup cap dropped
    # it wholesale, silently losing every one of its documents).
    assert deg_cand == n_deg - 1, f"degenerate star expansion wrong: {deg_cand} vs {n_deg - 1}"
    # (b) recall on the healthy corpus (identical 12-token prefix =>
    # most bands agree; require >= 95%)
    assert planted_found >= 0.95 * expected_pairs, (planted_found, expected_pairs)
    # total candidates stay O(n_deg + planted + noise), not O(n_deg^2)
    assert n_cand < n_deg + 10 * expected_pairs + 1000, f"candidate blowup: {n_cand}"
    out.update(lsh={"candidates": n_cand, "degenerate_star_edges": deg_cand, "planted_found": planted_found, "sec": round(t_lsh, 1)})

    t0 = time.perf_counter()
    sh = simhash_near_dups(docs, max_bucket=2000, max_hamming=3, clique_mode="star")
    n_sh = sh.count()
    deg_sh = sh.filter((F.col("doc_id_a") < n_deg) & (F.col("doc_id_b") < n_deg)).count()
    t_sh = time.perf_counter() - t0
    # identical docs = ONE fingerprint group = exactly n_deg - 1 star
    # edges at hamming 0 (pre-dedup, the chunk cap dropped the whole
    # population; post-dedup it is discovered AND linear).
    assert deg_sh == n_deg - 1, f"degenerate simhash star wrong: {deg_sh} vs {n_deg - 1}"
    # near-dup 13-token docs differ in 1 of 13 tokens -> expected
    # hamming well under the threshold for most planted pairs; but the
    # hard assertion here is linear degenerate output + no blowup.
    assert n_sh < n_deg + 10 * expected_pairs + 1000, f"simhash pair blowup: {n_sh}"
    out.update(simhash={"pairs": n_sh, "degenerate_star_edges": deg_sh, "sec": round(t_sh, 1)})

    # (c) wall-clock bound: the uncapped degenerate expansion would be
    # ~5e9 struct pairs in one task (hours); capped, both passes are
    # linear scans + short-key shuffles.
    assert t_lsh + t_sh < 600, f"skew guard did not bound runtime: {t_lsh + t_sh:.0f}s"
    out["total_sec"] = round(t_lsh + t_sh, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
