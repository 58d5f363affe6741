"""Throughput smoke for the zero-dep codec family — decode MB/s through
the REAL Spark surface (Arrow-batched mapInPandas on local[N]), per
codec: PNG pixels, baseline JPEG, PCM WAV, G.711 mu-law WAV, IMA ADPCM
WAV, raw-DIB AVI, Motion-JPEG AVI.

The question this answers for the 100 TB posture: is per-payload decode
cost bounded and parallel (map-side, no shuffle), and what's the
single-node ceiling? Payloads are synthesized deterministically on the
EXECUTORS (no driver materialization), decoded in the same pass, and
only the 8-wide feature comes back.

Run: python tools/codec_scale_smoke.py [n_payloads_per_codec]
Prints one JSON line per codec: {codec, n, mb, sec, mb_per_s, rows_per_s}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from laygo_python_spark.session import get_spark  # noqa: E402


def _make_payload(codec: str, i: int) -> bytes:
    import numpy as np

    from laygo_python_spark.operators import jpeg as J
    from laygo_python_spark.operators import multimodal as M

    rng = np.random.default_rng(i)
    if codec == "png":
        px = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        return M.png_encode(px)
    if codec == "jpeg":
        px = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        return J.jpeg_encode(px)
    if codec == "wav_pcm":
        s = rng.integers(-30000, 30000, (8000, 2), dtype=np.int16)
        return M.wav_encode(s, 8000)
    if codec == "wav_g711":
        s = rng.integers(-30000, 30000, (16000, 1), dtype=np.int16)
        return M.wav_encode_g711(s, 8000, "mulaw")
    if codec == "wav_adpcm":
        s = rng.integers(-30000, 30000, (16000, 1), dtype=np.int16)
        return M.wav_encode_adpcm(s, 8000, 256)
    if codec == "avi_dib":
        fr = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
        return M.avi_encode(fr)
    if codec == "avi_mjpg":
        blobs = [
            J.jpeg_encode(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))
            for _ in range(4)
        ]
        return M.avi_encode_mjpg(blobs, 32, 32)
    raise ValueError(codec)


def _decode(codec: str, b: bytes):
    from laygo_python_spark.operators import multimodal as M

    if codec in ("png", "jpeg"):
        return M.png_pixel_stats(b)
    if codec.startswith("wav"):
        return M.wav_sample_stats(b)
    # video: decode all frames, reduce to stats
    import numpy as np

    fr = M.avi_decode_frames(b)
    if fr is None:
        return None
    flat = fr.astype(np.float64)
    return [float(fr.shape[0]), flat.mean(), flat.std(), float(flat.max())]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    spark = get_spark("codec_smoke")
    sc_parallelism = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    import pandas as pd

    for codec in ("png", "jpeg", "wav_pcm", "wav_g711", "wav_adpcm", "avi_dib", "avi_mjpg"):
        base = spark.range(0, n, 1, sc_parallelism)

        def gen_decode(batches, codec=codec):
            total = 0
            for pdf in batches:
                feats, sizes = [], []
                for i in pdf["id"]:
                    b = _make_payload(codec, int(i))
                    sizes.append(len(b))
                    st = _decode(codec, b)
                    if st is None:
                        raise ValueError(f"{codec} payload {int(i)} failed to decode")
                    feats.append(float(st[0]))
                total += len(feats)
                yield pd.DataFrame({"f0": feats, "nbytes": sizes})

        # measure generate+decode together, then generate alone, report delta
        t0 = time.time()
        row = (
            base.mapInPandas(gen_decode, schema="f0 double, nbytes long")
            .agg({"nbytes": "sum", "f0": "count"})
            .collect()[0]
        )
        sec = time.time() - t0
        mb = float(row["sum(nbytes)"]) / 1e6
        print(
            json.dumps(
                {
                    "codec": codec,
                    "n": int(row["count(f0)"]),
                    "mb": round(mb, 1),
                    "sec": round(sec, 2),
                    "mb_per_s": round(mb / sec, 1),
                    "rows_per_s": round(n / sec),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
