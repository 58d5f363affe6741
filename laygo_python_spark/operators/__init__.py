"""Operator library: relational uplift + training-data-pipeline operators.

Modules register standalone ``DataFrame -> DataFrame`` functions usable
directly or spliced into a fluent program via ``Transformer.pipe``.
"""

from laygo_python_spark.operators.asof import asof_join
from laygo_python_spark.operators.dedup import (
    connected_components,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_dups,
    verify_candidates_jaccard,
)
from laygo_python_spark.operators.interval import interval_join
from laygo_python_spark.operators.ivf import ivf_topk, train_centroids
from laygo_python_spark.operators.multimodal import (
    attach_binary_payload,
    decode_features,
    frame_sample_plan,
    image_dimensions,
    sniff_media_type,
)
from laygo_python_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    embedding_near_dups,
    lsh_bucketed_topk,
)
from laygo_python_spark.operators.skew import salted_agg, salted_broadcast_join
from laygo_python_spark.operators.cogroup import cogroup_apply, cogroup_apply_arrow
from laygo_python_spark.operators.bloom import (
    bloom_build,
    bloom_contains_col,
    bloom_geometry,
    bloom_merge,
    bloom_might_contain,
)
from laygo_python_spark.operators.cms import cms_build, cms_build_sharded, cms_estimate, cms_merge
from laygo_python_spark.operators.graph import bfs_hops, kcore, triangle_count
from laygo_python_spark.operators.heavyhitters import mg_heavy_hitters, mg_merge, mg_summarize
from laygo_python_spark.operators.hll import hll_build, hll_build_sharded, hll_estimate, hll_estimate_by, hll_merge
from laygo_python_spark.operators.pagerank import pagerank
from laygo_python_spark.operators.pq import ivfpq_topk, pq_encode, pq_topk, train_codebooks
from laygo_python_spark.operators.qsketch import qsketch_build, qsketch_merge, qsketch_quantiles
from laygo_python_spark.operators.ids import assign_sequential_ids
from laygo_python_spark.operators.quality import flatten_schema, validate
from laygo_python_spark.operators.warehouse import (
    compact_parquet,
    gapfill,
    merge_upsert,
    scd2_collapse,
    snapshot_diff,
)
from laygo_python_spark.operators.zorder import morton_key, zorder_layout

__all__ = [
    "asof_join",
    "bfs_hops",
    "triangle_count",
    "attach_binary_payload",
    "brute_force_topk",
    "cosine",
    "decode_features",
    "embedding_near_dups",
    "frame_sample_plan",
    "interval_join",
    "ivf_topk",
    "kcore",
    "lsh_bucketed_topk",
    "assign_sequential_ids",
    "bloom_build",
    "bloom_contains_col",
    "bloom_geometry",
    "bloom_merge",
    "bloom_might_contain",
    "cms_build",
    "cms_build_sharded",
    "cms_estimate",
    "cms_merge",
    "compact_parquet",
    "cogroup_apply",
    "cogroup_apply_arrow",
    "flatten_schema",
    "gapfill",
    "hll_build",
    "hll_build_sharded",
    "hll_estimate_by",
    "hll_estimate",
    "hll_merge",
    "merge_upsert",
    "mg_heavy_hitters",
    "mg_merge",
    "mg_summarize",
    "morton_key",
    "pagerank",
    "ivfpq_topk",
    "pq_encode",
    "pq_topk",
    "train_codebooks",
    "qsketch_build",
    "qsketch_merge",
    "qsketch_quantiles",
    "scd2_collapse",
    "snapshot_diff",
    "validate",
    "zorder_layout",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "salted_agg",
    "salted_broadcast_join",
    "simhash_fingerprints",
    "simhash_near_dups",
    "verify_candidates_jaccard",
    "connected_components",
    "image_dimensions",
    "sniff_media_type",
    "train_centroids",
]
