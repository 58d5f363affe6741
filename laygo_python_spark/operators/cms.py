"""Count-min sketch — a mergeable frequency sketch as a DataFrame.

The reference has no sketch surface at all (laygo/transformers/
transformer.py exposes only exact fold/reduce over chunks); this is
uplift for the incremental-aggregation story alongside the HLL entry
(queries/relational4.py sketch_merge_daily_users): store a tiny sketch
per partition/day, merge sketches instead of rescanning raw data, and
answer point frequency queries with a one-sided (over-estimate only)
error bound.

Representation: a sketch IS a DataFrame of ``(i, bucket, cnt)`` rows —
the d×w counter matrix in sparse COO form. That makes every sketch
operation relational and codegen-friendly:

- build   = explode d (row, bucket) probes per key → groupBy sum
            (partial aggregation does the map-side combine, so the
            shuffle carries at most d×w rows per partition, never the
            raw keys);
- merge   = union + groupBy sum (counters are linear);
- estimate= equi-join the d probes of each query key → min(cnt).

Error contract (standard CMS, Cormode & Muthukrishnan 2005): estimates
never under-count; over-count ≤ ε·N with probability 1−δ for
w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉, where N is the total stream weight. At 100 TB
the sketch stays ≤ d×w rows (e.g. 4×65536 ≈ 262k counters ≈ a few MB)
no matter how many distinct keys the data has — that fixed footprint is
the reason to prefer it over an exact groupBy count at the tail.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _probes(key: Column, d: int, w: int, hash_fn: str = "xxhash64") -> Column:
    """Array of d (i, bucket) structs for one key.

    ``hash_fn="xxhash64"`` (production default): xxhash64 seeded by the
    row index i — d independent hash functions, all JVM-side, fastest.
    ``hash_fn="md5"`` (oracle twin, d ≤ 4): ONE md5 per key, its 128
    bits sliced into d disjoint 32-bit fields — probe i is hex chars
    [8i+1, 8i+8] — reproducible in DuckDB SQL
    (``('0x'||substr(md5(key),8*i+1,8))::BIGINT % w``), which lets a
    SQL oracle recompute the ENTIRE counter matrix and every estimate.
    One hash call instead of d keeps the md5 variant within ~1.2× of
    xxhash64 (measured sf0.1)."""
    if hash_fn == "xxhash64":
        bucket = lambda i: F.pmod(F.xxhash64(key, F.lit(i)), F.lit(w))  # noqa: E731
        return F.array(
            *[F.struct(F.lit(i).alias("i"), bucket(i).alias("bucket")) for i in range(d)]
        )
    if hash_fn == "md5":
        if d > 4:
            raise ValueError(f"hash_fn='md5' slices one 128-bit md5 into d<=4 probes, got d={d}")
        h = F.md5(key.cast("string"))
        return F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    F.pmod(
                        F.conv(F.substring(h, 8 * i + 1, 8), 16, 10).cast("long"), F.lit(w)
                    ).alias("bucket"),
                )
                for i in range(d)
            ]
        )
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def cms_build(df: DataFrame, key: str, d: int = 4, w: int = 8192, weight: str | None = None, hash_fn: str = "xxhash64") -> DataFrame:
    """Sketch the frequency distribution of ``df[key]``.

    Returns the sparse counter table ``(i int, bucket bigint, cnt
    bigint, d int, w int)`` — at most d×w rows however large df is. The
    (d, w) geometry rides along as constant columns (free under parquet
    RLE) so merge/estimate can verify they operate on compatible
    sketches instead of silently undercounting. ``weight`` optionally
    counts each row with a column's weight instead of 1 (e.g.
    pre-aggregated (key, n) pairs).

    NULL keys are filtered (mirroring bloom_build / hll_build):
    ``xxhash64(NULL, i)`` is a seed-derived value, not NULL, so an
    unfiltered NULL would increment d real counters and over-count any
    colliding key; frequency-of-NULL is not a question a key sketch
    answers."""
    wcol = F.col(weight) if weight else F.lit(1)
    return (
        df.filter(F.col(key).isNotNull())
        .select(F.explode(_probes(F.col(key), d, w, hash_fn)).alias("p"), wcol.alias("wt"))
        .groupBy(F.col("p.i").alias("i"), F.col("p.bucket").alias("bucket"))
        .agg(F.sum("wt").alias("cnt"))
        .withColumns({"d": F.lit(d), "w": F.lit(w), "hash_fn": F.lit(hash_fn)})
    )


def cms_build_sharded(df: DataFrame, key: str, shard, d: int = 4, w: int = 8192, weight: str | None = None, hash_fn: str = "xxhash64") -> DataFrame:
    """Per-shard sketches in ONE pass: ``(shard, i, bucket, cnt, d, w)``.

    The backfill shape — when the shards are partitions of one table
    (date-partitioned parquet, say), building each day's sketch with a
    separate filtered scan reads the table N times; keying the build by
    the shard column reads it once. Feeding the result straight to
    ``cms_merge`` collapses the shard axis (counter linearity again);
    store it as-is to keep per-shard rollups queryable. ``shard`` is a
    column name or Column expression (e.g. ``F.to_date("ts")``)."""
    shard_col = F.col(shard) if isinstance(shard, str) else shard
    wcol = F.col(weight) if weight else F.lit(1)
    return (
        df.filter(F.col(key).isNotNull())
        .select(
            shard_col.alias("shard"),
            F.explode(_probes(F.col(key), d, w, hash_fn)).alias("p"),
            wcol.alias("wt"),
        )
        .groupBy("shard", F.col("p.i").alias("i"), F.col("p.bucket").alias("bucket"))
        .agg(F.sum("wt").alias("cnt"))
        .withColumns({"d": F.lit(d), "w": F.lit(w), "hash_fn": F.lit(hash_fn)})
    )


def _geometry(sketch: DataFrame, what: str) -> tuple[int, int, str]:
    """Read the (d, w, hash_fn) constants a sketch carries; one tiny
    driver action (the sketch is ≤ d×w rows). Loud failure beats a
    silent undercount: mixing geometries OR hash families is the misuse
    that breaks the CMS never-undercount guarantee without any visible
    error — probing an md5-built sketch with xxhash64 probes finds no
    matching counters and estimates near-zero. Sketches persisted
    before hash_fn rode along are read as the then-default xxhash64."""
    has_hf = "hash_fn" in sketch.columns
    cols = [F.col("d"), F.col("w")] + (
        # NULL hash_fn = a pre-hash_fn sketch row that arrived through
        # unionByName(allowMissingColumns=True) — the documented
        # backcompat reading is the then-default xxhash64, so coalesce
        # BEFORE the distinct check (a literal NULL here rejected every
        # legacy-merge despite the promise).
        [F.coalesce(F.col("hash_fn"), F.lit("xxhash64")).alias("hash_fn")] if has_hf else []
    )
    rows = sketch.select(*cols).distinct().collect()
    if len(rows) != 1:
        raise ValueError(
            f"{what}: mixed sketch geometries "
            f"{sorted((tuple(r) for r in rows), key=lambda t: tuple(map(str, t)))}"
        )
    return rows[0]["d"], rows[0]["w"], (rows[0]["hash_fn"] if has_hf else "xxhash64")


def _pin_sketch(sketch: DataFrame) -> DataFrame:
    """Eagerly materialize a sketch frame (≤ d×w rows — KB-scale) so the
    ``_geometry`` guard's collect and the consuming join/aggregate read
    the same blocks instead of each re-executing the sketch's LINEAGE —
    which for a freshly built sketch is a full fact-table pass per
    consumer (measured: cms_join_size_estimate executed each of its two
    builds twice — once for the geometry read, once for the product).

    Idempotent (r13, r12 ADVICE): a frame that is already a pinned RDD
    scan — a prior ``localCheckpoint`` output, e.g. repeated
    ``cms_estimate`` calls probing the same stored sketch — returns
    as-is instead of accumulating a new checkpoint block set per call.
    Trade-off note (guide §5): localCheckpoint blocks are
    NON-REPLAYABLE — on executor loss the consuming job fails rather
    than recomputes; acceptable for KB-scale frames, and why this
    helper is never applied to corpus-sized inputs."""
    if sketch._jdf.queryExecution().analyzed().getClass().getSimpleName() == "LogicalRDD":
        return sketch
    return sketch.localCheckpoint(eager=True)


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union counter tables built with the SAME (d, w, hash_fn) —
    linearity of counters makes merge a sum, which is what lets
    per-day/per-shard sketches roll up without touching raw data.
    Raises on geometry or hash-family mismatch rather than summing
    misaligned counters."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s, allowMissingColumns=True)
    if "hash_fn" in out.columns:
        # Pre-hash_fn rows union in as NULL — materialize the documented
        # xxhash64 backcompat default so the groupBy below actually
        # merges them with same-family counters instead of keeping a
        # parallel NULL-keyed counter set.
        out = out.withColumn("hash_fn", F.coalesce(F.col("hash_fn"), F.lit("xxhash64")))
    out = _pin_sketch(out)  # read twice: geometry guard + the merge agg
    _geometry(out, "cms_merge")
    keys = ["i", "bucket", "d", "w"] + (["hash_fn"] if "hash_fn" in out.columns else [])
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt")).select(
        "i", "bucket", "cnt", *keys[2:]
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame, key: str, d: int | None = None, w: int | None = None, hash_fn: str | None = None) -> DataFrame:
    """Point-frequency estimates for each distinct key in ``keys[key]``.

    min over the d probed counters; a probe absent from the sparse table
    is 0 (only possible for keys never inserted). The probe geometry AND
    hash family are read from the sketch itself (pass d/w/hash_fn only
    to assert expectations — a mismatch raises instead of silently
    estimating near-zero from never-colliding probes, the same
    stored-params-win contract as dedup._resolve_index_params). The
    sketch side is ≤ d×w rows, so it broadcasts — estimation is a
    map-side join however many query keys stream through."""
    sketch = _pin_sketch(sketch)  # read twice: geometry guard + broadcast
    sd, sw, shf = _geometry(sketch, "cms_estimate")
    if (d is not None and d != sd) or (w is not None and w != sw):
        raise ValueError(f"cms_estimate: sketch was built with (d={sd}, w={sw}), caller expected (d={d}, w={w})")
    if hash_fn is not None and hash_fn != shf:
        raise ValueError(
            f"cms_estimate: sketch was built with hash_fn={shf!r}, caller probed with "
            f"{hash_fn!r} — probes would never hit the stored counters; drop the "
            "override or rebuild the sketch"
        )
    probes = keys.select(
        F.col(key), F.explode(_probes(F.col(key), sd, sw, shf)).alias("p")
    ).select(key, F.col("p.i").alias("i"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch.select("i", "bucket", "cnt")), ["i", "bucket"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy(key)
        .agg(F.min("cnt").alias("est"))
    )


def cms_inner_product(a: DataFrame, b: DataFrame) -> DataFrame:
    """Join-size / inner-product estimate from two stored CMS sketches
    (AMS-style: |A ⋈ B on k| = Σ_k fA(k)·fB(k); the CMS estimate is
    min over rows i of Σ_bucket cntA(i,b)·cntB(i,b) — a one-sided
    OVERCOUNT with error ≤ (e/w)·N_A·N_B, Cormode & Muthukrishnan
    2005). This is the query-planning primitive: "how big would this
    join be?" answered from two ≤ d×w-row artifacts without touching
    either table — at 100 TB the sketches are maintained incrementally
    (cms_build_sharded + cms_merge) and the estimate costs a
    KB-scale join.

    Geometries must match (d, w, hash_fn ride on the sketches and are
    verified, same contract as cms_merge). Returns one row
    ``(est bigint)``. Buckets present in only one sketch contribute 0
    (inner join drops them — their product is 0)."""
    a, b = _pin_sketch(a), _pin_sketch(b)  # each read twice: guard + product
    da, wa, ha = _geometry(a, "cms_inner_product(a)")
    db, wb, hb = _geometry(b, "cms_inner_product(b)")
    if (da, wa, ha) != (db, wb, hb):
        raise ValueError(
            f"cms_inner_product: incompatible sketch geometries "
            f"({da},{wa},{ha}) vs ({db},{wb},{hb})"
        )
    # Accumulate in DECIMAL(38,0), not BIGINT (r9 advice): the inner
    # product is bounded by N_A·N_B — two 1e12-count sketches already
    # exceed int64, and Spark's non-ANSI bigint sum would wrap silently
    # into a meaningless (possibly negative) estimate. decimal(19,0) ×
    # decimal(19,0) → decimal(38,0) covers any pair of int64-total
    # sketches; the final cast back to the bigint output contract is
    # ANSI-checked (an estimate beyond int64 errors loudly instead of
    # wrapping).
    prod = (
        a.select("i", "bucket", F.col("cnt").cast("decimal(19,0)").alias("ca"))
        .join(
            b.select("i", "bucket", F.col("cnt").cast("decimal(19,0)").alias("cb")),
            ["i", "bucket"],
        )
        .groupBy("i")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("s"))
    )
    # A hash row with NO shared buckets has inner-product sum 0 — the
    # inner join drops it, and min over the surviving (collision-only)
    # rows would OVERESTIMATE a disjoint-key pair. Re-attach all d rows
    # with coalesce(0) so absent rows vote 0 (hypothesis-caught:
    # tests/test_properties.py).
    spark = a.sparkSession
    rows_i = spark.range(da).select(F.col("id").cast("int").alias("i"))
    full = rows_i.join(prod, "i", "left").select(F.coalesce(F.col("s"), F.lit(0)).alias("s"))
    return full.agg(F.min("s").cast("long").alias("est"))
