"""Multimodal column plumbing — image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched Pandas UDFs.

The decode libraries (PIL/cv2/torchaudio/av) are NOT in this container,
so the actual decode is stubbed (deterministic fake by default,
NotImplementedError in strict mode) — but everything Spark-side is real
and tested: the schema contract, the mapInPandas batch shape, the
partition sizing, and the metadata extraction that CAN run without a
decoder (byte length, magic-byte sniffing).

At 100 TB: binary payloads dominate row size. The rules encoded here:
- keep payloads out of shuffles (extract features first, then drop the
  binary column before any groupBy/join);
- cap Arrow batch bytes via maxRecordsPerBatch when payloads are large;
- store payloads in their own parquet column so predicate pushdown on
  metadata never reads the bytes.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

_MAGIC = {
    b"\xff\xd8\xff": "image/jpeg",
    b"\x89PNG": "image/png",
    b"RIFF": "audio/wav",
    b"ID3": "audio/mp3",
}


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Test fixture path: treat utf-8 bytes of a text column as an opaque
    payload so the binary plumbing is exercised without real media."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(F.encode(F.col(text_col), "UTF-8")).cast("long").alias("n_bytes"),
    )


def sniff_media_type(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Magic-byte sniffing — pure Column ops, no decoder needed."""
    p = F.col(payload_col)
    expr = F.lit("application/octet-stream")
    for magic, mtype in _MAGIC.items():
        expr = F.when(F.startswith(p, F.lit(magic)), F.lit(mtype)).otherwise(expr)
    return df.withColumn("sniffed_type", expr)


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    strict: bool = False,
) -> DataFrame:
    """Decode → feature-extract stage. Real pipeline: PIL/cv2 decode,
    resize, embed. Here: STUB — ``strict=True`` raises
    NotImplementedError (the honest production posture without the
    libs); default produces a deterministic fake feature vector from the
    payload bytes so the batch shape / schema / partitioning are
    testable end-to-end.

    The Spark-side contract is the real deliverable: mapInPandas over
    Arrow batches, payload column dropped from the output (never shuffle
    bytes), fixed-width feature vector out.
    """
    out_schema = f"{id_col} long, width int, height int, feature array<double>"

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "media decode requires PIL/cv2/av — not available in this image; "
                "run with strict=False for the deterministic stub"
            )
        for pdf in batches:
            payloads = pdf[payload_col]
            n = payloads.str.len().fillna(0).astype("int64")
            # Deterministic fake: "dimensions" and an 8-dim "embedding"
            # derived from byte stats — stable across runs and partitionings.
            first = payloads.apply(lambda b: b[0] if b is not None and len(b) else 0)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": (n % 640 + 1).astype("int32"),
                    "height": (n % 480 + 1).astype("int32"),
                    "feature": [
                        [float((ln + f * (i + 1)) % 251) for i in range(8)]
                        for ln, f in zip(n, first)
                    ],
                }
            )

    return df.mapInPandas(run, schema=out_schema)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: emit (media_id, frame_idx) rows for
    a downstream decoder, one row per sampled frame. The explode happens
    BEFORE decode so frame work distributes across the cluster instead
    of one task per video."""
    n_frames = (F.col("n_bytes") / 1000).cast("int") + 1  # stub: bytes→frame count
    return df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"),
    )
