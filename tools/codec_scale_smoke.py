"""Codec decode-throughput smoke (r6 verdict ask #7): MB/s per codec
through the REAL mapInPandas decode path, so the multimodal family has
a scale number next to its correctness gates.

Per codec: deterministically synthesize ~TARGET_MB of payload blobs in
executors (encode side, untimed), land them as a parquet table of
(media_id, payload), then time one full decode pass — parquet scan →
Arrow-batched mapInPandas calling the same decode function the
registered queries use → noop sink. Reported MB/s = payload bytes /
decode wall on local[32]; per-core = that / cores. The decode pass is
what a 1000-executor cluster replicates per-core, so the per-core
number is the scale-relevant one (the path is map-only: no shuffle, no
driver collection, nothing that stops scaling linearly).

Usage: python tools/codec_scale_smoke.py [--mb 100] [--sf-dir ignored]
Emits one JSON line per codec plus a final summary line; paste the
table into COVERAGE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from laygo_python_spark.operators import multimodal  # noqa: E402
from laygo_python_spark.operators import jpeg as J  # noqa: E402
from laygo_python_spark.session import get_spark  # noqa: E402


def _img(seed: int, h: int, w: int, ch: int) -> np.ndarray:
    """Deterministic pseudo-photo: smooth gradients + seeded texture —
    compresses like real content (pure noise would overstate entropy-
    decode cost; flat fills would understate it)."""
    y = np.arange(h)[:, None, None]
    x = np.arange(w)[None, :, None]
    c = np.arange(ch)[None, None, :]
    base = (seed * 31 + 3 * y + 5 * x + 29 * c) % 197
    rng = np.random.default_rng(seed)
    tex = rng.integers(0, 32, size=(h, w, ch))
    return ((base + tex) % 256).astype(np.uint8)


def _pcm(seed: int, n: int, ch: int = 2) -> np.ndarray:
    i = np.arange(n)[:, None]
    c = np.arange(ch)[None, :]
    return (((seed * 7919 + 31 * i + 17 * c) % 65536) - 32768).astype(np.int16)


# (encode_one(seed) -> bytes, decode_one(bytes) -> consume) per codec.
def _enc_jpeg(seed: int) -> bytes:
    return J.jpeg_encode(_img(seed, 160, 160, 3), subsample=True)


def _enc_jpeg_prog(seed: int) -> bytes:
    # test-authored progressive encoder (no real encoder in this image);
    # the DECODE side is the production path under measurement
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_jpeg import _encode_jpeg_progressive

    return _encode_jpeg_progressive(_img(seed, 96, 96, 3))


def _enc_png8(seed: int) -> bytes:
    return multimodal.png_encode(_img(seed, 256, 256, 3))


def _enc_png_gray(seed: int) -> bytes:
    return multimodal.png_encode(_img(seed, 256, 256, 1)[:, :, 0])


def _enc_wav_pcm(seed: int) -> bytes:
    return multimodal.wav_encode(_pcm(seed, 48000))


def _enc_wav_g711(seed: int) -> bytes:
    return multimodal.wav_encode_g711(_pcm(seed, 48000), law="mulaw")


def _enc_wav_adpcm(seed: int) -> bytes:
    return multimodal.wav_encode_adpcm(_pcm(seed, 48000))


def _enc_avi_dib(seed: int) -> bytes:
    return multimodal.avi_encode(np.stack([_img(seed + f, 120, 160, 3) for f in range(4)]))


def _enc_avi_mjpg(seed: int) -> bytes:
    frames = [J.jpeg_encode(_img(seed + f, 96, 96, 3), subsample=True) for f in range(4)]
    return multimodal.avi_encode_mjpg(frames, 96, 96)


def _dec_image(b: bytes) -> None:
    px = multimodal.image_decode_pixels(b)
    assert px is not None


def _dec_wav(b: bytes) -> None:
    x = multimodal.wav_decode_samples(b)
    assert x is not None


def _dec_avi(b: bytes) -> None:
    fr = multimodal.avi_decode_frames(b)
    assert fr is not None


def _dec_avi_mjpg(b: bytes) -> None:
    meta = multimodal.avi_meta(b)
    assert meta is not None
    # decode every embedded JPEG frame — the mjpg_stats query's path
    n = 0
    data = bytes(b)
    movi = data.find(b"movi")
    for cid, start, size in multimodal._riff_chunks(data, movi + 4, len(data)):
        if cid == b"00dc":
            assert J.jpeg_decode_pixels(data[start : start + size]) is not None
            n += 1
    assert n > 0


CODECS = {
    # name: (enc, dec, default per-blob est bytes, mb_cap)
    "jpeg_baseline": (_enc_jpeg, _dec_image, None),
    "jpeg_progressive": (_enc_jpeg_prog, _dec_image, 16),  # pure-python ENCODE is the bottleneck, cap gen cost
    "png_rgb8": (_enc_png8, _dec_image, None),
    "png_gray8": (_enc_png_gray, _dec_image, None),
    "wav_pcm16": (_enc_wav_pcm, _dec_wav, None),
    "wav_g711_mulaw": (_enc_wav_g711, _dec_wav, None),
    "wav_ima_adpcm": (_enc_wav_adpcm, _dec_wav, None),
    "avi_dib": (_enc_avi_dib, _dec_avi, None),
    "avi_mjpeg": (_enc_avi_mjpg, _dec_avi_mjpg, 32),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=int(os.environ.get("SPARK_GRAFT_SMOKE_MB", "100")))
    ap.add_argument("--only", type=str, default=None, help="comma-separated codec subset")
    args = ap.parse_args()

    spark = get_spark("codec_scale_smoke")
    sc = spark.sparkContext
    cores = sc.defaultParallelism
    # warm the Python worker pool so the first codec isn't billed spin-up
    spark.range(0, 1000, 1, cores).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    names = list(CODECS) if not args.only else args.only.split(",")
    rows = []
    for name in names:
        enc, dec, cap = CODECS[name]
        target_mb = min(args.mb, cap) if cap else args.mb
        blob = enc(1)  # driver-side probe for sizing only
        n = max(cores, int(target_mb * (1 << 20) / max(1, len(blob))))
        scratch = tempfile.mkdtemp(prefix=f"codec_smoke_{name}_")
        try:
            import pandas as pd

            def gen(batches, _enc=enc):
                for pdf in batches:
                    yield pd.DataFrame(
                        {
                            "media_id": pdf["id"],
                            "payload": [_enc(int(i)) for i in pdf["id"]],
                        }
                    )

            # many small partitions: bounds per-task blob memory during
            # generation AND gives the decode scan even parallelism
            parts = max(cores, n // 64)
            spark.range(0, n, 1, parts).mapInPandas(
                gen, schema="media_id long, payload binary"
            ).write.mode("overwrite").parquet(scratch)

            total = (
                spark.read.parquet(scratch)
                .selectExpr("sum(length(payload)) AS b")
                .collect()[0]["b"]
            )

            def run(batches, _dec=dec):
                import pandas as pd

                for pdf in batches:
                    for b in pdf["payload"]:
                        _dec(b)
                    yield pd.DataFrame({"n": [len(pdf)]})

            best = float("inf")
            for _ in range(2):  # min-of-2: JIT/page-cache settle
                t0 = time.perf_counter()
                spark.read.parquet(scratch).mapInPandas(run, schema="n long").write.format(
                    "noop"
                ).mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            mb = total / (1 << 20)
            row = {
                "codec": name,
                "payload_mb": round(mb, 1),
                "n_blobs": n,
                "decode_sec": round(best, 2),
                "mb_per_sec": round(mb / best, 1),
                "mb_per_sec_per_core": round(mb / best / cores, 2),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps({"metric": "codec_decode_throughput", "cores": cores, "rows": rows}))


if __name__ == "__main__":
    main()
