"""Incremental-index scale smoke: build the stored LSH index over a
SEEN corpus (with a planted boilerplate flood, the adversarial shape from
tools/skew_guard_smoke.py), then match a NEW batch against it —
asserting:

* planted cross-snapshot near-dups are all found (each new doc i is a
  near-dup of seen doc i's text);
* the boilerplate flood in the NEW batch matches the index via ONE
  signature group (same-sig path — linear, immune to the band cap);
* only the new batch is shingled: wall time for the match is a fraction
  of the index build, and re-matching against the prebuilt index never
  re-reads seen text (the index tables are integer-only).

Usage: python tools/incremental_index_smoke.py [n_seen] [n_new]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from laygo_python_spark.operators.dedup import (  # noqa: E402
    minhash_index,
    minhash_match_incremental,
)
from laygo_python_spark.session import get_spark  # noqa: E402

BOILERPLATE = "terms of service apply all rights reserved click here to unsubscribe now"


def build_seen(spark, n_docs: int, degenerate_frac: float):
    """Seen corpus: ids [0, n_deg) all share BOILERPLATE; the rest get
    12 id-derived pseudo-words. Column algebra only."""
    n_deg = int(n_docs * degenerate_frac)
    base = spark.range(n_docs).withColumn("is_deg", F.col("id") < n_deg)
    words = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"w{k}_"), F.conv(F.hex(F.xxhash64("id", F.lit(k))), 16, 10))
            for k in range(12)
        ],
    )
    return base.select(
        F.col("id").alias("doc_id"),
        F.when(F.col("is_deg"), F.lit(BOILERPLATE)).otherwise(words).alias("text"),
    )


def build_new(spark, n_seen: int, n_new: int, degenerate_frac: float):
    """New batch: ids [n_seen, n_seen+n_new). The first n_new*frac are
    the same boilerplate (flood arriving again today); the rest are
    NEAR-DUPS of a NON-degenerate seen doc: same 12 words + 1 extra
    token, so each must match its seen twin through the band join. The
    twin offset skips the seen corpus's boilerplate range."""
    n_deg = int(n_new * degenerate_frac)
    n_deg_seen = int(n_seen * degenerate_frac)
    base = spark.range(n_seen, n_seen + n_new).withColumn(
        "is_deg", F.col("id") < n_seen + n_deg
    )
    twin = F.col("id") - n_seen + n_deg_seen  # non-degenerate seen twin
    words = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"w{k}_"), F.conv(F.hex(F.xxhash64(twin, F.lit(k))), 16, 10))
            for k in range(12)
        ],
        F.lit("extra_token"),
    )
    return base.select(
        F.col("id").alias("doc_id"),
        F.when(F.col("is_deg"), F.lit(BOILERPLATE)).otherwise(words).alias("text"),
    )


def main() -> None:
    n_seen = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_new = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    frac = 0.10
    spark = get_spark("incremental_index_smoke")

    seen = build_seen(spark, n_seen, frac).localCheckpoint(eager=True)
    new = build_new(spark, n_seen, n_new, frac).localCheckpoint(eager=True)

    t0 = time.time()
    idx = minhash_index(seen, shingle_n=3)
    idx = {k: (v.localCheckpoint(eager=True) if hasattr(v, "localCheckpoint") else v) for k, v in idx.items()}
    build_sec = time.time() - t0
    index_rows = {k: v.count() for k, v in idx.items() if hasattr(v, "count")}

    # mode="rep": each new doc emits ONE row per matched seen signature
    # — without it the boilerplate flood would expand n_deg_new ×
    # n_deg_seen ≈ 10^9 same-signature pairs.
    t0 = time.time()
    matches = minhash_match_incremental(new, idx, shingle_n=3, mode="rep").localCheckpoint(
        eager=True
    )
    match_sec = time.time() - t0

    n_matches = matches.count()
    n_deg_new = int(n_new * frac)
    n_deg_seen = int(n_seen * frac)
    # every non-degenerate new doc must match its seen twin (singleton
    # seen group → rep IS the twin)
    expected_twin = (
        matches.filter(
            (F.col("doc_id_new") >= n_seen + n_deg_new)
            & (F.col("doc_id_seen") == F.col("doc_id_new") - n_seen + n_deg_seen)
        )
        .select("doc_id_new")
        .distinct()
        .count()
    )
    # the new boilerplate flood routes to the seen flood's ONE rep at
    # full band agreement — exactly one row per new flood doc (linear)
    flood_rows = matches.filter(
        (F.col("doc_id_new") < n_seen + n_deg_new) & (F.col("n_bands") == 32)
    )
    flood_matched = flood_rows.select("doc_id_new").distinct().count()
    flood_row_count = flood_rows.count()
    out = {
        "n_seen": n_seen,
        "n_new": n_new,
        "index_rows": index_rows,
        "build_sec": round(build_sec, 1),
        "match_sec": round(match_sec, 1),
        "matches": n_matches,
        "planted_twins_found": expected_twin,
        "planted_twins_expected": n_new - n_deg_new,
        "flood_docs_matched": flood_matched,
        "flood_docs_expected": n_deg_new,
        "flood_rows": flood_row_count,
    }
    assert expected_twin == n_new - n_deg_new, out
    assert flood_matched == n_deg_new, out
    assert flood_row_count == n_deg_new, out  # LINEAR: one rep row per new flood doc
    print(json.dumps(out))


if __name__ == "__main__":
    main()
