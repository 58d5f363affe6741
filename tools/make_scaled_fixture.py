"""Build the 10× scale-robustness fixture ("sf1-equivalent") from the
largest driver fixture — the cross-SF oracle-stability harness the r5
verdict asked for (#10).

Only the two tables the heavy-hitter families stress are scaled:

* ``documents`` ×10 (50k docs): each copy shifts doc_id by 10^6·i and
  suffixes EVERY token with ``_i``, so copies share no shingles — the
  near-dup/cluster structure is exactly ten disjoint replicas of the
  original (outputs scale linearly; no cross-copy pair blow-up that
  would change the workload's character).
* ``lineitem`` ×10 (6M rows): supplier/part keys shift per copy, giving
  ten disjoint replicas of the supplier–part graph for
  pagerank/k-core/PPR.

Everything else symlinks to the source fixture so the oracle harness's
table views still resolve. Pure DuckDB (deterministic, engine-neutral).

Usage: python tools/make_scaled_fixture.py [src_sf_dir] [out_dir]
       python tools/verify_oracle.py <out_dir> pagerank_supplier_part ...
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1x"
COPIES = 10
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT doc_id + 1000000 * r.i AS doc_id,
                 array_to_string(
                   list_transform(string_split(text, ' '), t -> t || '_' || r.i),
                   ' ') AS text,
                 lang, source, n_chars
          FROM read_parquet('{SRC}/documents.parquet'), range({COPIES}) r(i)
        ) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          -- shifts stay inside the graph queries' node-space encoding:
          -- supplier node ids ARE l_suppkey and must stay < 100000
          -- (part nodes live at l_partkey + 100000, unbounded above)
          SELECT l.* REPLACE (l_suppkey + 1000 * r.i AS l_suppkey,
                              l_partkey + 20000 * r.i AS l_partkey,
                              l_orderkey + 100000000 * r.i AS l_orderkey)
          FROM read_parquet('{SRC}/lineitem.parquet') l, range({COPIES}) r(i)
        ) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)
    """)
    for t in TABLES:
        dst = f"{OUT}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    for t in TABLES:
        n = con.execute(f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n}")


if __name__ == "__main__":
    main()
