"""Multimodal column plumbing — image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched Pandas UDFs.

The decode libraries (PIL/cv2/torchaudio/av) are NOT in this container,
so PIXEL decode is stubbed — but header metadata is parsed for REAL
with zero dependencies: PNG IHDR and JPEG SOF width/height via struct
unpacking (``png_dimensions`` / ``jpeg_dimensions``), plus magic-byte
sniffing and byte length. Everything Spark-side is real and tested:
the schema contract, the mapInPandas batch shape, the partition
sizing. ``strict=True`` raises only for payloads whose dimensions
can't be header-parsed.

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


def png_dimensions(b: bytes) -> tuple[int, int] | None:
    """(width, height) from a PNG IHDR — zero-dependency struct parse.
    Layout (PNG spec §5.2/§11.2.2): 8-byte signature, then the IHDR
    chunk: 4-byte length, b"IHDR", width (u32 BE), height (u32 BE)."""
    if len(b) < 24 or not b.startswith(b"\x89PNG\r\n\x1a\n") or b[12:16] != b"IHDR":
        return None
    import struct

    w, h = struct.unpack(">II", b[16:24])
    return (w, h) if w > 0 and h > 0 else None


def jpeg_dimensions(b: bytes) -> tuple[int, int] | None:
    """(width, height) from the first JPEG SOF marker — walks the
    segment chain (marker u8=0xFF, code u8, length u16 BE incl. itself).
    SOFn payload: precision u8, height u16 BE, width u16 BE. Codes
    0xC0-0xCF are SOF except 0xC4 (DHT), 0xC8 (JPG ext), 0xCC (DAC)."""
    if len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    import struct

    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:  # desynced — not a marker
            return None
        code = b[i + 1]
        if code == 0xD8 or 0xD0 <= code <= 0xD7 or code == 0x01:  # standalone
            i += 2
            continue
        if code == 0xD9:  # EOI before any SOF
            return None
        (seg_len,) = struct.unpack(">H", b[i + 2 : i + 4])
        if seg_len < 2:
            return None
        if 0xC0 <= code <= 0xCF and code not in (0xC4, 0xC8, 0xCC):
            if i + 9 > len(b):
                return None
            h, w = struct.unpack(">HH", b[i + 5 : i + 9])
            return (w, h) if w > 0 and h > 0 else None
        i += 2 + seg_len
    return None


def image_dimensions(b: bytes | None) -> tuple[int, int] | None:
    if b is None:
        return None
    return png_dimensions(bytes(b)) or jpeg_dimensions(bytes(b))


def wav_audio_meta(b: bytes | None) -> tuple[int, int, int] | None:
    """(sample_rate, channels, bits_per_sample) from a RIFF/WAVE ``fmt ``
    chunk — the audio twin of the PNG/JPEG header parses, zero deps.
    Layout (RIFF spec): 'RIFF' <size:4> 'WAVE', then chunks of
    <id:4><size:4><data>; the 'fmt ' data holds format(2) channels(2)
    sample_rate(4) byte_rate(4) block_align(2) bits(2), little-endian.
    Walks the chunk list (a canonical file may put 'LIST'/'JUNK' before
    'fmt ') and returns None on anything malformed."""
    if b is None:
        return None
    b = bytes(b)
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = int.from_bytes(b[pos + 4 : pos + 8], "little")
        if cid == b"fmt " and pos + 8 + 16 <= len(b):
            d = b[pos + 8 : pos + 24]
            channels = int.from_bytes(d[2:4], "little")
            rate = int.from_bytes(d[4:8], "little")
            bits = int.from_bytes(d[14:16], "little")
            if channels == 0 or rate == 0:
                return None
            return (rate, channels, bits)
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    return None


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    strict: bool = False,
) -> DataFrame:
    """Decode → feature-extract stage.

    REAL with zero dependencies: PNG/JPEG payloads get their true
    width/height via header struct parsing (``png_dimensions`` /
    ``jpeg_dimensions`` — IHDR chunk / SOF marker walk). The pixel-level
    feature vector still needs a decoder (PIL/cv2, not in this image),
    so features are a deterministic byte-stat embedding; ``strict=True``
    raises NotImplementedError for payloads whose dimensions can't be
    parsed from headers (the honest production posture) instead of
    inventing fake ones.

    The Spark-side contract is the real deliverable either way:
    mapInPandas over Arrow batches, payload column dropped from the
    output (never shuffle bytes), fixed-width feature vector out.
    """
    out_schema = f"{id_col} long, width int, height int, feature array<double>"

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            n = payloads.str.len().fillna(0).astype("int64")
            dims = payloads.apply(image_dimensions)
            if strict and dims.isna().any():
                bad = int(pdf[id_col][dims.isna()].iloc[0])
                raise NotImplementedError(
                    f"payload for {id_col}={bad} is not PNG/JPEG — pixel decode "
                    "requires PIL/cv2/av (not in this image); strict=False falls "
                    "back to deterministic byte-stat dimensions"
                )
            # Non-image payloads (strict=False): deterministic fake dims
            # derived from byte stats — stable across runs/partitionings.
            first = payloads.apply(lambda b: b[0] if b is not None and len(b) else 0)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": [
                        d[0] if d else int(ln % 640 + 1) for d, ln in zip(dims, n)
                    ],
                    "height": [
                        d[1] if d else int(ln % 480 + 1) for d, ln in zip(dims, n)
                    ],
                    "feature": [
                        [float((ln + f * (i + 1)) % 251) for i in range(8)]
                        for ln, f in zip(n, first)
                    ],
                }
            )

    return df.mapInPandas(run, schema=out_schema)


def audio_meta(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Audio metadata extraction — the WAV counterpart of
    ``decode_features``: real RIFF header parsing (``wav_audio_meta``)
    on executors, payload bytes never shuffled. Non-WAV payloads yield
    NULL metadata (filter on ``sample_rate IS NOT NULL`` downstream);
    sample decode (PCM frames → features) needs an audio lib and stays
    out of scope, same posture as pixel decode."""
    out_schema = f"{id_col} long, n_bytes long, sample_rate int, channels int, bits int"

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            metas = payloads.apply(wav_audio_meta)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": payloads.str.len().fillna(0).astype("int64"),
                    "sample_rate": [m[0] if m else None for m in metas],
                    "channels": [m[1] if m else None for m in metas],
                    "bits": [m[2] if m else None for m in metas],
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
