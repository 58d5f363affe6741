"""String-similarity self-join by edit distance — the PassJoin scheme
(segment pigeonhole + shift windows), DataFrame-native.

No reference counterpart (capability uplift): the reference has no join
of any kind (SURVEY.md §2.4); its users do string comparison in plain
Python lambdas one element at a time.

All-pairs levenshtein is O(n²·len²) — dead at any scale. The pigeonhole
argument: if edit(s, t) <= d, at least one of s's d+1 contiguous
segments survives untouched, and its copy in t starts within ±d of its
position in s (net indels before it shift it at most d). So:

- INDEX side: each string emits its d+1 segments keyed by
  (segment_idx, string_len, segment_text);
- PROBE side: each string emits the substrings that could equal segment
  i of a shorter-or-equal partner (lengths len..len-d, starts shifted
  ±d) — at most (d+1)²·(2d+1) probes per string, a constant;
- candidates = equi-join on the key (never a cartesian product), then
  ONE exact levenshtein per distinct candidate pair.

The ±d window is a superset of PassJoin's multi-match-aware windows —
slightly more candidates, same correctness, much simpler Column algebra.
Everything is codegen-able expressions; the only shuffle is the
candidate equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _seg_start(length: Column, i: int, parts: int) -> Column:
    """Start offset (0-based) of segment i when a `length`-char string is
    split into `parts` near-even contiguous segments."""
    base = (length / parts).cast("int")
    rem = length % parts
    return F.lit(i) * base + F.least(F.lit(i), rem)


def _seg_len(length: Column, i: int, parts: int) -> Column:
    base = (length / parts).cast("int")
    rem = length % parts
    return base + F.when(F.lit(i) < rem, 1).otherwise(0)


def _deletion_variants(col_name: str) -> Column:
    """The FastSS d=1 deletion neighborhood of a string column: the
    string itself plus every single-character deletion, deduped.
    edit(s, t) <= 1  ⇔  D1(s) ∩ D1(t) ≠ ∅ (delete the substituted
    position from both sides / the inserted character from the longer),
    so an equi-join on exploded variants is a complete candidate
    generator — robust to low-entropy shared prefixes, which degenerate
    the PassJoin segment keys (r2 bench: every c_name shares the 9-char
    'Customer#' segment → one hot key joining all 15k rows to itself)."""
    c = f"`{col_name}`"
    return F.expr(
        f"array_distinct(concat(array({c}), "
        f"if(length({c}) = 0, array(), "
        f"transform(sequence(1, length({c})), i -> concat(substr({c}, 1, i-1), substr({c}, i+1))))))"
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
    strategy: str = "auto",
) -> DataFrame:
    """All pairs with levenshtein(s, t) <= max_dist, as
    (id_a, id_b, dist) with the shorter (or lower-id on ties) string
    first. ``max_dist`` should stay small (candidates per string grow
    with (d+1)²(2d+1)).

    Two candidate generators, identical results (tests pin equivalence):

    * **fastss** (d=1 default; Bocek et al., FastSS, 2007): equi-join on
      exploded single-deletion neighborhoods — (L+1) short variants per
      string, immune to hot segment keys on shared-prefix corpora.
    * **passjoin** (d>=2 default; Li, Deng & Feng, PassJoin, VLDB'12):
      segment pigeonhole + shift windows (module docstring).

    Both verify candidates with a threshold-banded levenshtein (early
    exit above d)."""
    d = max_dist
    if strategy not in ("auto", "fastss", "passjoin"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "auto":
        strategy = "fastss" if d == 1 else "passjoin"
    if strategy == "fastss" and d != 1:
        raise ValueError("fastss strategy implements max_dist=1 only")
    parts = d + 1
    s = F.col(str_col)
    slen = F.length(s)

    if strategy == "fastss":
        va = df.select(
            F.col(id_col).alias("id_a"), s.alias("s_a"), F.explode(_deletion_variants(str_col)).alias("v")
        )
        vb = va.select(F.col("id_a").alias("id_b"), F.col("s_a").alias("s_b"), "v")
        order_ok = (F.length("s_a") < F.length("s_b")) | (
            (F.length("s_a") == F.length("s_b")) & (F.col("id_a") < F.col("id_b"))
        )
        dist = F.levenshtein("s_a", "s_b", d)  # banded: -1 above threshold
        return (
            va.join(vb, "v")
            .filter(order_ok)
            .select("id_a", "id_b", "s_a", "s_b")
            .distinct()
            .withColumn("dist", dist)
            .filter(F.col("dist") >= 0)
            .select("id_a", "id_b", "dist")
        )

    idx_entries = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                slen.alias("L"),
                F.substring(s, _seg_start(slen, i, parts) + 1, _seg_len(slen, i, parts)).alias("seg"),
            )
            for i in range(parts)
        ]
    )
    index = (
        df.filter(slen >= parts)
        .select(F.col(id_col).alias("id_a"), s.alias("s_a"), F.explode(idx_entries).alias("e"))
        .select("id_a", "s_a", "e.i", "e.L", "e.seg")
    )

    # Probe side: assume the partner has length L = len(t) - delta
    # (delta in 0..d — the partner is never longer by symmetry: the
    # shorter string is always the indexed one) and its segment i sits
    # at _seg_start(L, i) + shift for shift in -d..d.
    probe_structs = []
    tlen = F.length(s)
    for i in range(parts):
        for delta in range(d + 1):
            partner_len = tlen - delta
            seg_l = _seg_len(partner_len, i, parts)
            for shift in range(-d, d + 1):
                start = _seg_start(partner_len, i, parts) + shift
                valid = (
                    (partner_len >= parts)
                    & (start >= 0)
                    & (start + seg_l <= tlen)
                )
                probe_structs.append(
                    F.when(
                        valid,
                        F.struct(
                            F.lit(i).alias("i"),
                            partner_len.alias("L"),
                            F.substring(s, start + 1, seg_l).alias("seg"),
                        ),
                    )
                )
    probes = df.select(
        F.col(id_col).alias("id_b"), s.alias("s_b"), F.explode(F.array_compact(F.array(*probe_structs))).alias("e")
    ).select("id_b", "s_b", "e.i", "e.L", "e.seg")

    order_ok = (F.length("s_a") < F.length("s_b")) | (
        (F.length("s_a") == F.length("s_b")) & (F.col("id_a") < F.col("id_b"))
    )
    cand = index.join(probes, ["i", "L", "seg"]).filter(order_ok).select(
        "id_a", "id_b", "s_a", "s_b"
    )

    # Degenerate-length path: a string shorter than d+1 chars cannot be
    # partitioned into d+1 segments, so pairs whose SHORTER side has
    # len <= d are matched by an explicit broadcast CROSS join against
    # the (len <= 2d) partners — strings this short are a bounded
    # vocabulary in any real corpus, so the broadcast side stays tiny
    # and the cross product is the honest plan, not an accident.
    shorts = df.filter(F.length(s) <= d).select(
        F.col(id_col).alias("id_a"), s.alias("s_a")
    )
    near = df.filter(F.length(s) <= 2 * d).select(
        F.col(id_col).alias("id_b"), s.alias("s_b")
    )
    cand_short = near.crossJoin(F.broadcast(shorts)).filter(order_ok).select(
        "id_a", "id_b", "s_a", "s_b"
    )

    return (
        cand.unionByName(cand_short)
        .distinct()
        .withColumn("dist", F.levenshtein("s_a", "s_b", d))
        .filter(F.col("dist") >= 0)
        .select("id_a", "id_b", "dist")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    window: int = 5,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD'95) —
    the third candidate-generation strategy next to FastSS/PassJoin
    above and the LSH/band family in operators/dedup.py: sort all rows
    by a blocking key and emit every pair whose ranks are within
    ``window`` of each other. Classic for fuzzy entity resolution where
    the key puts look-alikes adjacent (names, addresses, normalized
    titles), and the candidate count is exactly n×(window−1) − O(w²):
    LINEAR, no hot buckets, regardless of key skew — the property the
    equi-join blockers cannot promise on boilerplate-heavy keys.

    Scale shape: the global rank comes from assign_sequential_ids
    (range shuffle + broadcast offsets — no single-partition window),
    and the rank-adjacency join is (window−1) exploded offset probes
    equi-joined on rank: rank+k = rank ships as a plain shuffle join
    key. Returns (id_a, id_b, key_a, key_b, rank_gap) with a before b
    in sort order; follow with an exact verifier (levenshtein,
    jaccard) exactly like the LSH candidates."""
    if window < 2:
        raise ValueError(f"sorted_neighborhood_pairs: window must be >= 2, got {window}")
    from laygo_python_spark.operators.ids import assign_sequential_ids

    ranked = assign_sequential_ids(
        df.select(F.col(id_col), F.col(key_col)), order_by=[key_col, id_col], id_col="__rank"
    )
    offsets = F.explode(F.array(*[F.lit(k) for k in range(1, window)]))
    probes = ranked.select(
        F.col(id_col).alias("id_a"),
        F.col(key_col).alias("key_a"),
        F.col("__rank").alias("__ra"),
        offsets.alias("__k"),
    ).withColumn("__rank", F.col("__ra") + F.col("__k"))
    right = ranked.select(
        F.col(id_col).alias("id_b"), F.col(key_col).alias("key_b"), "__rank"
    )
    return probes.join(right, "__rank").select(
        "id_a", "id_b", "key_a", "key_b", F.col("__k").cast("int").alias("rank_gap")
    )
