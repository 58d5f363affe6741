"""Similarity-search validation: brute force against a NumPy oracle,
LSH recall against brute force, multimodal plumbing shape checks.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from laygo_python_spark.operators import multimodal, similarity
from laygo_python_spark.session import read_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings")


def test_brute_force_matches_numpy(emb):
    rows = emb.orderBy("vec_id").collect()
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    norms = np.linalg.norm(mat, axis=1)

    out = similarity.brute_force_topk(emb, emb.filter("vec_id = 0"), k=5).collect()
    sims = mat @ mat[0] / (norms * norms[0])
    order = sorted(
        [(s, int(i)) for s, i in zip(sims, ids) if i != 0], key=lambda t: (-t[0], t[1])
    )[:5]
    expected = [i for _, i in order]
    got = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)]
    assert got == expected
    for r in out:
        np.testing.assert_allclose(r.sim, sims[ids == r.neighbor_id][0], rtol=1e-12)


def test_lsh_recall_vs_brute_force(emb):
    """Bucketed ANN must recover a reasonable fraction of true top-10 —
    with few planes the buckets are coarse, recall should be high."""
    queries = emb.filter("vec_id < 20")
    bf = similarity.brute_force_topk(emb, queries, k=10).collect()
    lsh = similarity.lsh_bucketed_topk(emb, queries, k=10, n_planes=3, n_tables=12).collect()
    bf_pairs = {(r.query_id, r.neighbor_id) for r in bf}
    lsh_pairs = {(r.query_id, r.neighbor_id) for r in lsh}
    recall = len(bf_pairs & lsh_pairs) / len(bf_pairs)
    # fixture embeddings are near-orthogonal (top-10 sims ~0.3-0.5) —
    # theory: p = 1-arccos(s)/π ≈ 0.6, recall = 1-(1-p^3)^12 ≈ 0.94
    assert recall >= 0.5, f"recall {recall:.2f} below multi-table expectation"
    # approximate results must still be a subset of correctly-scored pairs:
    bf_sims = {(r.query_id, r.neighbor_id): r.sim for r in bf}
    for r in lsh:
        if (r.query_id, r.neighbor_id) in bf_sims:
            assert r.sim == pytest.approx(bf_sims[(r.query_id, r.neighbor_id)], rel=1e-12)


def test_embedding_near_dups_symmetric_determinism(emb):
    a = sorted(map(tuple, similarity.embedding_near_dups(emb, threshold=0.35).collect()))
    b = sorted(map(tuple, similarity.embedding_near_dups(emb.repartition(5), threshold=0.35).collect()))
    assert a == b


def test_srp_planes_deterministic():
    p1 = similarity._srp_planes(16, 4, seed=42)
    p2 = similarity._srp_planes(16, 4, seed=42)
    assert p1 == p2
    assert similarity._srp_planes(16, 4, seed=7) != p1


# -- multimodal plumbing -------------------------------------------------------
def test_multimodal_payload_roundtrip(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="hello world")])
    mm = multimodal.attach_binary_payload(df)
    row = mm.collect()[0]
    assert bytes(row.payload) == b"hello world"
    assert row.n_bytes == 11


def test_multimodal_decode_stub_shape(spark):
    df = spark.createDataFrame([Row(doc_id=i, text="x" * (i + 1)) for i in range(10)])
    feats = multimodal.decode_features(multimodal.attach_binary_payload(df))
    rows = feats.collect()
    assert len(rows) == 10
    for r in rows:
        assert len(r.feature) == 8
        assert r.width >= 1 and r.height >= 1


def test_multimodal_decode_strict_raises(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="x")])
    mm = multimodal.attach_binary_payload(df)
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        multimodal.decode_features(mm, strict=True).collect()


def _png_bytes(w: int, h: int) -> bytes:
    import struct
    import zlib as _z

    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + struct.pack(">I", _z.crc32(b"IHDR" + ihdr))
    )


def _jpeg_bytes(w: int, h: int) -> bytes:
    import struct

    # SOI, APP0 (JFIF), DQT filler, then SOF0 carrying the dimensions.
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_image_header_parsers_pure():
    assert multimodal.png_dimensions(_png_bytes(640, 480)) == (640, 480)
    assert multimodal.jpeg_dimensions(_jpeg_bytes(1920, 1080)) == (1920, 1080)
    assert multimodal.png_dimensions(b"\x89PNG\r\n\x1a\nshort") is None
    assert multimodal.jpeg_dimensions(b"\xff\xd8\xff\xd9") is None
    assert multimodal.image_dimensions(b"not an image") is None
    assert multimodal.image_dimensions(None) is None


def test_multimodal_decode_real_image_headers(spark):
    """PNG IHDR / JPEG SOF0 dimensions are parsed for real (no decoder
    libs needed) — strict mode SUCCEEDS on pure-image input."""
    df = spark.createDataFrame(
        [
            Row(media_id=1, payload=bytearray(_png_bytes(800, 600)), media_type=None, n_bytes=0),
            Row(media_id=2, payload=bytearray(_jpeg_bytes(320, 240)), media_type=None, n_bytes=0),
        ],
        schema="media_id long, payload binary, media_type string, n_bytes long",
    )
    got = {r.media_id: (r.width, r.height) for r in multimodal.decode_features(df, strict=True).collect()}
    assert got == {1: (800, 600), 2: (320, 240)}


def test_multimodal_decode_mixed_strict_vs_fallback(spark):
    df = spark.createDataFrame(
        [
            Row(media_id=1, payload=bytearray(_png_bytes(10, 20)), media_type=None, n_bytes=0),
            Row(media_id=2, payload=bytearray(b"not an image"), media_type=None, n_bytes=0),
        ],
        schema="media_id long, payload binary, media_type string, n_bytes long",
    )
    # strict: the non-image payload fails loudly
    with pytest.raises(Exception, match="NotImplementedError|pixel decode"):
        multimodal.decode_features(df, strict=True).collect()
    # default: real dims for the image, deterministic fallback for the rest
    got = {r.media_id: (r.width, r.height) for r in multimodal.decode_features(df).collect()}
    assert got[1] == (10, 20)
    assert got[2] == (12 % 640 + 1, 12 % 480 + 1)


def test_multimodal_magic_sniffing(spark):
    df = spark.createDataFrame(
        [
            Row(media_id=1, payload=bytearray(b"\xff\xd8\xff\xe0rest"), media_type=None, n_bytes=7),
            Row(media_id=2, payload=bytearray(b"\x89PNG\r\n"), media_type=None, n_bytes=6),
            Row(media_id=3, payload=bytearray(b"plain"), media_type=None, n_bytes=5),
        ],
        schema="media_id long, payload binary, media_type string, n_bytes long",
    )
    got = {r.media_id: r.sniffed_type for r in multimodal.sniff_media_type(df).collect()}
    assert got == {1: "image/jpeg", 2: "image/png", 3: "application/octet-stream"}

    import numpy as np

    riff = spark.createDataFrame(
        [
            Row(media_id=1, payload=bytearray(_wav_bytes(8000, 1, 16)), media_type=None, n_bytes=0),
            Row(
                media_id=2,
                payload=bytearray(
                    multimodal.avi_encode(np.zeros((1, 2, 2, 3), dtype="uint8"))
                ),
                media_type=None,
                n_bytes=0,
            ),
            Row(media_id=3, payload=bytearray(b"RIFF1234JUNKxxxx"), media_type=None, n_bytes=0),
        ],
        schema=multimodal.MEDIA_SCHEMA,
    )
    got = {
        r["media_id"]: r["sniffed_type"] for r in multimodal.sniff_media_type(riff).collect()
    }
    assert got == {1: "audio/wav", 2: "video/avi", 3: "application/octet-stream"}


def test_frame_sample_distributes_before_decode(spark):
    df = spark.createDataFrame(
        [Row(media_id=1, payload=None, media_type="video/mp4", n_bytes=5000)],
        schema="media_id long, payload binary, media_type string, n_bytes long",
    )
    frames = multimodal.frame_sample_plan(df, every_n=2).collect()
    assert [r.frame_idx for r in frames] == [0, 2, 4]


def test_vectorized_brute_force_matches_fold_path(emb):
    q = emb.filter("vec_id < 5")
    fold = {(r.query_id, r.rank): (r.neighbor_id, r.sim) for r in similarity.brute_force_topk(emb, q, k=10).collect()}
    fast = {(r.query_id, r.rank): (r.neighbor_id, r.sim) for r in similarity.brute_force_topk(emb, q, k=10, vectorized=True).collect()}
    assert set(fold) == set(fast)
    for key in fold:
        assert fold[key][0] == fast[key][0]  # identical neighbor ranking
        assert fast[key][1] == pytest.approx(fold[key][1], rel=1e-12)


def test_brute_force_guards_large_query_side(spark):
    """The numpy path collects the query set to the driver — a large
    query set must fail fast with the scalable alternative named, not
    OOM the driver (VERDICT r1 item 7)."""
    import pytest
    from pyspark.sql import functions as F

    from laygo_python_spark.operators import similarity

    big = spark.range(200_000).select(
        F.col("id").alias("vec_id"), F.array(F.lit(1.0), F.lit(0.0)).alias("embedding")
    )
    small = big.limit(10)
    with pytest.raises(ValueError, match="lsh_bucketed_topk"):
        similarity.brute_force_topk(small, big, k=2, vectorized=True)


def _wav_bytes(rate: int, channels: int, bits: int, junk_first: bool = False) -> bytes:
    import struct

    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * bits // 8, channels * bits // 8, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    if junk_first:
        chunks = b"JUNK" + struct.pack("<I", 3) + b"\x00" * 3 + b"\x00" + chunks  # odd size → pad
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_header_parser_pure():
    assert multimodal.wav_audio_meta(_wav_bytes(44100, 2, 16)) == (44100, 2, 16)
    # chunk walk: JUNK (odd size, word-aligned) before fmt must be skipped
    assert multimodal.wav_audio_meta(_wav_bytes(16000, 1, 24, junk_first=True)) == (16000, 1, 24)
    assert multimodal.wav_audio_meta(b"RIFFxxxx") is None
    assert multimodal.wav_audio_meta(b"RIFF\x00\x00\x00\x00WAVE") is None
    assert multimodal.wav_audio_meta(None) is None
    assert multimodal.wav_audio_meta(b"not audio at all") is None


def test_audio_meta_operator(spark):
    df = spark.createDataFrame(
        [
            Row(media_id=1, payload=bytearray(_wav_bytes(48000, 2, 16))),
            Row(media_id=2, payload=bytearray(b"not audio")),
        ],
        schema="media_id long, payload binary",
    )
    got = {r.media_id: (r.sample_rate, r.channels, r.bits) for r in multimodal.audio_meta(df).collect()}
    assert got[1] == (48000, 2, 16)
    assert got[2] == (None, None, None)


def _full_png(pixels, color_type=2, filters=None):
    """Minimal zero-dep PNG ENCODER for the decode tests: non-interlaced
    8-bit, one explicit filter byte per row (default all-0/None), so the
    decoder's unfilter paths can be exercised one by one."""
    import struct
    import zlib as _z

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = px.shape
    bpp = ch

    def _chunk(cid, data):
        return struct.pack(">I", len(data)) + cid + data + struct.pack(">I", _z.crc32(cid + data))

    ihdr = struct.pack(">II", w, h) + bytes([8, color_type, 0, 0, 0])
    raw = bytearray()
    filters = filters or [0] * h
    prior = np.zeros(w * ch, dtype=np.int16)
    for r in range(h):
        cur = px[r].reshape(-1).astype(np.int16)
        f = filters[r]
        if f == 0:
            enc = cur
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, dtype=np.int16), cur[:-bpp]])
            enc = (cur - left) & 0xFF
        elif f == 2:  # Up
            enc = (cur - prior) & 0xFF
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(bpp, dtype=np.int16), cur[:-bpp]])
            enc = (cur - ((left + prior) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            left = np.concatenate([np.zeros(bpp, dtype=np.int16), cur[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, dtype=np.int16), prior[:-bpp]])
            p = left + prior - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, upleft))
            enc = (cur - pred) & 0xFF
        raw.append(f)
        raw += enc.astype(np.uint8).tobytes()
        prior = cur
    idat = _z.compress(bytes(raw))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def test_png_pixel_decode_roundtrip_all_filters():
    """png_decode_pixels must invert every PNG scanline filter exactly:
    encode a deterministic gradient with each of the five filters and
    demand byte-identical recovery, for RGB, RGBA, gray and gray+alpha."""
    import numpy as np

    rng = np.random.RandomState(7)
    for color_type, ch in [(0, 1), (4, 2), (2, 3), (6, 4)]:
        px = rng.randint(0, 256, size=(13, 17, ch)).astype("uint8")
        for f in range(5):
            blob = _full_png(px, color_type=color_type, filters=[f] * 13)
            got = multimodal.png_decode_pixels(blob)
            assert got is not None, (color_type, f)
            assert got.shape == (13, 17, ch)
            assert (got == px).all(), f"filter {f} color_type {color_type}"
        # mixed filters per row, the realistic encoder output
        blob = _full_png(px, color_type=color_type, filters=[r % 5 for r in range(13)])
        assert (multimodal.png_decode_pixels(blob) == px).all()


def test_png_pixel_decode_rejects_unsupported():
    import struct
    import zlib as _z

    # interlaced flag set → None (not an exception)
    ihdr = struct.pack(">II", 4, 4) + bytes([8, 2, 0, 0, 1])
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + struct.pack(">I", _z.crc32(b"IHDR" + ihdr))
    )
    assert multimodal.png_decode_pixels(blob) is None
    assert multimodal.png_decode_pixels(b"garbage") is None
    assert multimodal.png_decode_pixels(None) is None
    # truncated IDAT → None
    import numpy as np
    good = _full_png(np.zeros((4, 4, 3), dtype="uint8"))
    assert multimodal.png_decode_pixels(good[:-20]) is None


def test_decode_features_real_pixel_stats(spark):
    """The registered decode path emits REAL pixel statistics for
    decodable PNGs: a solid-gray 100x50 RGB image must yield mean=128
    std=0 exactly, while a non-image payload keeps the byte-stat
    fallback embedding."""
    import numpy as np

    solid = np.full((50, 100, 3), 128, dtype="uint8")
    df = spark.createDataFrame(
        [
            Row(media_id=1, payload=bytearray(_full_png(solid)), media_type=None, n_bytes=0),
            Row(media_id=2, payload=bytearray(b"not an image"), media_type=None, n_bytes=0),
        ],
        schema="media_id long, payload binary, media_type string, n_bytes long",
    )
    rows = {r.media_id: r for r in multimodal.decode_features(df).collect()}
    assert (rows[1].width, rows[1].height) == (100, 50)
    ch, mean, std, mn, mx = rows[1].feature[:5]
    assert (ch, mean, std, mn, mx) == (3.0, 128.0, 0.0, 128.0, 128.0)
    assert rows[2].feature is not None and len(rows[2].feature) == 8


def test_png_decode_rejects_decompression_bomb():
    """A payload declaring tiny dimensions whose IDAT inflates far past
    the header's raw size must be rejected WITHOUT materializing the
    expansion (decompressobj max_length, not plain zlib.decompress)."""
    import struct
    import zlib as _z

    ihdr = struct.pack(">II", 4, 4) + bytes([8, 2, 0, 0, 0])

    def _chunk(cid, data):
        return struct.pack(">I", len(data)) + cid + data + struct.pack(">I", _z.crc32(cid + data))

    bomb_idat = _z.compress(b"\x00" * (10 << 20))  # 10 MB of zeros, ~10 KB compressed
    blob = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", bomb_idat) + _chunk(b"IEND", b"")
    )
    assert multimodal.png_decode_pixels(blob) is None


def test_srp_indexed_search_matches_direct_and_prunes(spark, sf_dir, tmp_path):
    """Stored SRP index: identical results to lsh_bucketed_topk with the
    same params, and the scan prunes to the queries' bucket directories."""
    from laygo_python_spark.operators.similarity import (
        lsh_bucketed_topk,
        srp_index_write,
        srp_search_indexed,
    )
    from laygo_python_spark.plans import formatted_plan

    emb = read_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "srp_index")
    srp_index_write(emb, path, n_planes=4, n_tables=8)
    queries = emb.filter("vec_id < 10")
    indexed = srp_search_indexed(spark, path, queries, k=10)
    direct = lsh_bucketed_topk(emb, queries, k=10, n_planes=4, n_tables=8)
    got = sorted((r.query_id, r.neighbor_id, r.rank) for r in indexed.collect())
    want = sorted((r.query_id, r.neighbor_id, r.rank) for r in direct.collect())
    assert got == want and got
    plan = formatted_plan(indexed)
    assert "PartitionFilters" in plan and "bkey" in plan.split("PartitionFilters", 1)[1][:300]


def _palette_png(idx, palette, trns=None, filters=None):
    """Palette-PNG encoder twin of _full_png: indices as the single
    filtered lane, PLTE (+ optional tRNS) chunks before IDAT."""
    import struct
    import zlib as _z

    import numpy as np

    idx = np.asarray(idx, dtype=np.uint8)
    h, w = idx.shape

    def _chunk(cid, data):
        return struct.pack(">I", len(data)) + cid + data + struct.pack(">I", _z.crc32(cid + data))

    ihdr = struct.pack(">II", w, h) + bytes([8, 3, 0, 0, 0])
    raw = bytearray()
    filters = filters or [0] * h
    prior = np.zeros(w, dtype=np.int16)
    for r in range(h):
        cur = idx[r].astype(np.int16)
        f = filters[r]
        if f == 0:
            enc = cur
        elif f == 1:
            enc = (cur - np.concatenate([[0], cur[:-1]])) & 0xFF
        elif f == 2:
            enc = (cur - prior) & 0xFF
        else:
            raise ValueError("test encoder: palette rows use filters 0-2")
        raw.append(f)
        raw += enc.astype(np.uint8).tobytes()
        prior = cur
    blob = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", bytes(palette))
    if trns is not None:
        blob += _chunk(b"tRNS", bytes(trns))
    return blob + _chunk(b"IDAT", _z.compress(bytes(raw))) + _chunk(b"IEND", b"")


def test_png_palette_decode_roundtrip():
    """Palette PNGs decode for real: indices unfilter as one lane, then
    PLTE lookup yields RGB (or RGBA with tRNS alpha, absent entries
    opaque per spec). Spec violations (no PLTE, index past palette)
    return None, not garbage pixels."""
    import numpy as np

    rng = np.random.RandomState(11)
    pal = bytes(rng.randint(0, 256, size=16 * 3, dtype=np.uint8))
    idx = rng.randint(0, 16, size=(9, 14)).astype("uint8")
    expected_rgb = np.frombuffer(pal, dtype=np.uint8).reshape(16, 3)[idx]
    for filters in ([0] * 9, [1] * 9, [2] * 9, [r % 3 for r in range(9)]):
        got = multimodal.png_decode_pixels(_palette_png(idx, pal, filters=filters))
        assert got is not None and got.shape == (9, 14, 3)
        assert (got == expected_rgb).all()
    # tRNS: first 4 entries get explicit alpha, the rest default 255
    trns = bytes([0, 64, 128, 192])
    got = multimodal.png_decode_pixels(_palette_png(idx, pal, trns=trns))
    assert got.shape == (9, 14, 4)
    alpha = np.full(16, 255, dtype=np.uint8)
    alpha[:4] = np.frombuffer(trns, dtype=np.uint8)
    assert (got[:, :, 3] == alpha[idx]).all()
    assert (got[:, :, :3] == expected_rgb).all()
    # index past the palette -> None (spec violation, never garbage)
    bad_idx = idx.copy()
    bad_idx[0, 0] = 99
    assert multimodal.png_decode_pixels(_palette_png(bad_idx, pal)) is None
    # palette image without PLTE -> None
    import re as _re
    blob = _palette_png(idx, pal)
    no_plte = blob.replace(b"PLTE", b"plTe")  # unknown chunk id, skipped
    assert multimodal.png_decode_pixels(no_plte) is None
    # pixel stats flow through the feature path (channels==3)
    stats = multimodal.png_pixel_stats(_palette_png(idx, pal))
    assert stats is not None and stats[0] == 3.0


def _pcm_wav(rate, samples, bits=16, fmt_tag=1):
    """Encode an (n, ch) float array in [-1,1] as a PCM/float WAV."""
    import struct

    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    ch = x.shape[1]
    if fmt_tag == 3:
        data = x.astype("<f4").tobytes() if bits == 32 else x.astype("<f8").tobytes()
    elif bits == 8:
        data = (np.round(x * 128.0) + 128).clip(0, 255).astype(np.uint8).tobytes()
    elif bits == 16:
        data = np.round(x * 32768.0).clip(-32768, 32767).astype("<i2").tobytes()
    elif bits == 24:
        v = np.round(x * float(1 << 23)).clip(-(1 << 23), (1 << 23) - 1).astype(np.int64)
        v = np.where(v < 0, v + (1 << 24), v).reshape(-1)
        data = bytes(
            bytearray(
                b
                for val in v
                for b in (int(val) & 0xFF, (int(val) >> 8) & 0xFF, (int(val) >> 16) & 0xFF)
            )
        )
    elif bits == 32:
        v = np.round(x * float(1 << 31)).clip(-(1 << 31), (1 << 31) - 1)
        data = v.astype("<i4").tobytes()
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, ch, rate, rate * ch * bits // 8, ch * bits // 8, bits
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_pcm_sample_decode_roundtrip():
    import numpy as np

    rng = np.random.RandomState(17)
    x = (rng.rand(100, 2) * 1.6 - 0.8).round(3)
    for bits, tol in [(8, 1 / 120.0), (16, 1e-4), (24, 1e-6), (32, 1e-9)]:
        got = multimodal.wav_decode_samples(_pcm_wav(8000, x, bits=bits))
        assert got is not None and got.shape == (100, 2), bits
        assert np.abs(got - x).max() <= tol, bits
    for bits in (32, 64):
        got = multimodal.wav_decode_samples(_pcm_wav(8000, x, bits=bits, fmt_tag=3))
        assert np.abs(got - x).max() <= (1e-7 if bits == 32 else 1e-12)
    # compressed/unknown format tags return None, never garbage
    assert multimodal.wav_decode_samples(_pcm_wav(8000, x, bits=16, fmt_tag=85)) is None
    assert multimodal.wav_decode_samples(b"not audio") is None
    assert multimodal.wav_decode_samples(None) is None


def test_wav_sample_stats_contract():
    import numpy as np

    t = np.arange(8000) / 8000.0
    # phase offset keeps samples off exact zero (sign(0) would double-
    # count a crossing; 8000/440 is rational so zeros repeat)
    mono = 0.9 * np.sin(2 * np.pi * 440 * t + 0.1)[:, None]
    stats = multimodal.wav_sample_stats(_pcm_wav(8000, mono, bits=16))
    assert stats is not None and len(stats) == 8
    ch, dur, rms, peak, mean, zc, ch0, clip = stats
    assert ch == 1.0 and abs(dur - 1.0) < 1e-9
    assert abs(rms - 0.9 / np.sqrt(2)) < 1e-2  # sine RMS at 0.9 amplitude
    # crest falls between samples at 18.2 samples/cycle
    assert 0.88 <= peak <= 0.9 and abs(mean) < 1e-3
    assert abs(zc - 2 * 440 / 8000) < 1e-3  # two crossings per cycle
    assert clip == 0.0  # 0.9 amplitude never reaches full scale


def _png_raw(ihdr_tail, raw_rows, plte=None, trns=None):
    """Assemble a PNG from pre-filtered raw scanline bytes."""
    import struct
    import zlib as _z

    def _chunk(cid, data):
        return struct.pack(">I", len(data)) + cid + data + struct.pack(">I", _z.crc32(cid + data))

    blob = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr_tail)
    if plte is not None:
        blob += _chunk(b"PLTE", plte)
    if trns is not None:
        blob += _chunk(b"tRNS", trns)
    return blob + _chunk(b"IDAT", _z.compress(bytes(raw_rows))) + _chunk(b"IEND", b"")


def test_png_sub8bit_gray_and_palette_decode():
    import struct

    import numpy as np

    rng = np.random.RandomState(23)
    for depth in (1, 2, 4):
        w, h = 11, 5
        vals = rng.randint(0, 1 << depth, size=(h, w))
        raw = bytearray()
        for r in range(h):
            raw.append(2 if r % 2 else 0)  # alternate None/Up filters
            bits = "".join(format(v, f"0{depth}b") for v in vals[r])
            bits = bits.ljust(-(-len(bits) // 8) * 8, "0")
            row = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
            if r % 2:  # Up filter: delta against prior raw row
                prior_bits = "".join(format(v, f"0{depth}b") for v in vals[r - 1])
                prior_bits = prior_bits.ljust(len(bits), "0")
                prior = bytes(int(prior_bits[i : i + 8], 2) for i in range(0, len(prior_bits), 8))
                row = bytes((a - b) & 0xFF for a, b in zip(row, prior))
            raw += row
        ihdr = struct.pack(">II", w, h) + bytes([depth, 0, 0, 0, 0])
        got = multimodal.png_decode_pixels(_png_raw(ihdr, raw))
        scale = 255 // ((1 << depth) - 1)
        assert got is not None and got.shape == (h, w, 1), depth
        assert (got[:, :, 0] == vals * scale).all(), depth

    # 4-bit palette: indices pack two per byte, PLTE lookup expands RGB
    w, h, depth = 7, 4, 4
    pal = bytes(rng.randint(0, 256, size=16 * 3, dtype=np.uint8))
    idx = rng.randint(0, 16, size=(h, w))
    raw = bytearray()
    for r in range(h):
        raw.append(0)
        bits = "".join(format(v, "04b") for v in idx[r]).ljust(-(-w * 4 // 8) * 8, "0")
        raw += bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    ihdr = struct.pack(">II", w, h) + bytes([depth, 3, 0, 0, 0])
    got = multimodal.png_decode_pixels(_png_raw(ihdr, raw, plte=pal))
    want = np.frombuffer(pal, dtype=np.uint8).reshape(16, 3)[idx]
    assert got.shape == (h, w, 3) and (got == want).all()


def test_png_16bit_decode_high_byte():
    import struct

    import numpy as np

    rng = np.random.RandomState(29)
    for color_type, ch in [(0, 1), (2, 3)]:
        w, h = 6, 4
        vals = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint16)
        raw = bytearray()
        for r in range(h):
            raw.append(0)
            raw += (vals[r].reshape(-1) * 257).astype(">u2").tobytes()  # v*257: high byte == v
        ihdr = struct.pack(">II", w, h) + bytes([16, color_type, 0, 0, 0])
        got = multimodal.png_decode_pixels(_png_raw(ihdr, raw))
        assert got is not None and got.shape == (h, w, ch), color_type
        assert (got == vals.astype(np.uint8)).all(), color_type


def test_png_adam7_interlaced_decode():
    import struct

    import numpy as np

    from laygo_python_spark.operators.multimodal import _ADAM7

    rng = np.random.RandomState(31)
    for h, w, ch, color_type in [(13, 11, 3, 2), (9, 16, 1, 0)]:
        px = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            prior = np.zeros(sub.shape[1] * ch, dtype=np.int16)
            for r in range(sub.shape[0]):
                cur = sub[r].reshape(-1).astype(np.int16)
                if r % 2:  # Up filter within the pass (pass-local prior)
                    raw.append(2)
                    raw += ((cur - prior) & 0xFF).astype(np.uint8).tobytes()
                else:
                    raw.append(0)
                    raw += cur.astype(np.uint8).tobytes()
                prior = cur
        ihdr = struct.pack(">II", w, h) + bytes([8, color_type, 0, 0, 1])
        got = multimodal.png_decode_pixels(_png_raw(ihdr, raw))
        assert got is not None and got.shape == (h, w, ch), (h, w, ch)
        assert (got == px).all(), (h, w, ch)


def test_resize_pixels_nearest_and_bilinear():
    import numpy as np

    from laygo_python_spark.operators.multimodal import png_encode, resize_pixels

    rng = np.random.RandomState(37)
    px = rng.randint(0, 256, size=(9, 7, 3)).astype(np.uint8)
    # nearest: exact integer source-index mapping (the oracle contract)
    rz = resize_pixels(px, 4, 4)
    yi = (np.arange(4) * 9) // 4
    xi = (np.arange(4) * 7) // 4
    assert (rz == px[yi][:, xi]).all() and rz.shape == (4, 4, 3)
    # upscale keeps every source pixel reachable; identity at same size
    assert resize_pixels(px, 9, 7).shape == (9, 7, 3)
    assert (resize_pixels(px, 9, 7) == px).all()
    # bilinear: constant image stays constant, output bounded by input
    const = np.full((8, 8, 1), 77, dtype=np.uint8)
    assert (resize_pixels(const, 3, 5, method="bilinear") == 77).all()
    bl = resize_pixels(px, 5, 5, method="bilinear")
    assert bl.min() >= px.min() and bl.max() <= px.max()
    with pytest.raises(ValueError, match="unknown resize method"):
        resize_pixels(px, 2, 2, method="cubic")
    # png_encode round-trips through the real decoder for every ch count
    for ch in (1, 2, 3, 4):
        img = rng.randint(0, 256, size=(6, 5, ch)).astype(np.uint8)
        got = multimodal.png_decode_pixels(png_encode(img))
        assert got is not None and (got == img).all(), ch


def test_wav_encode_roundtrip_exact():
    import numpy as np

    from laygo_python_spark.operators.multimodal import wav_decode_samples, wav_encode

    rng = np.random.RandomState(47)
    s16 = rng.randint(-32768, 32768, size=(33, 2)).astype(np.int16)
    x = wav_decode_samples(wav_encode(s16, rate=16000))
    assert x is not None and x.shape == (33, 2)
    assert (np.round(x * 32768.0).astype(np.int16) == s16).all()
    assert multimodal.wav_audio_meta(wav_encode(s16, rate=16000)) == (16000, 2, 16)


def test_avi_roundtrip_and_meta():
    import numpy as np

    from laygo_python_spark.operators.multimodal import (
        avi_decode_frames,
        avi_encode,
        avi_meta,
    )

    rng = np.random.RandomState(53)
    # odd width exercises the 4-byte DIB stride padding
    fr = rng.randint(0, 256, size=(5, 6, 7, 3)).astype(np.uint8)
    blob = avi_encode(fr, fps=24)
    assert avi_meta(blob) == (5, 7, 6, 24)
    got = avi_decode_frames(blob)
    assert got is not None and (got == fr).all()
    assert avi_meta(b"RIFFxxxxWAVE") is None
    assert avi_meta(b"garbage") is None and avi_meta(None) is None
    assert avi_decode_frames(blob[:40]) is None
    # compressed stream (bit_count != 24) -> None, never garbage
    i = blob.find(b"strf")
    hacked = bytearray(blob)
    hacked[i + 8 + 14] = 12  # BITMAPINFOHEADER biBitCount
    assert avi_decode_frames(bytes(hacked)) is None


def test_frame_sample_plan_uses_real_avi_frame_counts(spark):
    import numpy as np
    from pyspark.sql import Row

    from laygo_python_spark.operators.multimodal import avi_encode

    fr = np.zeros((7, 4, 4, 3), dtype=np.uint8)
    blob = avi_encode(fr)
    df = spark.createDataFrame(
        [
            Row(media_id=1, payload=bytearray(blob), media_type=None, n_bytes=len(blob)),
            Row(media_id=2, payload=bytearray(b"not a video"), media_type=None, n_bytes=2500),
        ],
        schema=multimodal.MEDIA_SCHEMA,
    )
    rows = sorted(
        (r["media_id"], r["frame_idx"])
        for r in multimodal.frame_sample_plan(df, every_n=3, payload_col="payload").collect()
    )
    # media 1: REAL count 7 -> frames 0,3,6; media 2: byte stub 2500//1000+1=3 -> 0
    assert rows == [(1, 0), (1, 3), (1, 6), (2, 0)]


def test_mjpg_avi_roundtrip_matches_per_blob_jpeg_decode():
    import numpy as np

    from laygo_python_spark.operators import jpeg as J
    from laygo_python_spark.operators.multimodal import (
        avi_decode_frames,
        avi_encode_mjpg,
        avi_meta,
    )

    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (24, 32, 3), dtype=np.uint8) for _ in range(3)]
    blobs = [J.jpeg_encode(f) for f in frames]
    blob = avi_encode_mjpg(blobs, 32, 24, fps=12)
    assert avi_meta(blob) == (3, 32, 24, 12)
    got = avi_decode_frames(blob)
    assert got is not None and got.shape == (3, 24, 32, 3)
    # container decode IS the per-chunk JPEG decode, bit for bit
    for i, b in enumerate(blobs):
        assert (got[i] == J.jpeg_decode_pixels(b)).all()


def test_mjpg_uniform_frames_exact_identity():
    import numpy as np

    from laygo_python_spark.operators import jpeg as J
    from laygo_python_spark.operators.multimodal import avi_decode_frames, avi_encode_mjpg

    # all-ones quant + DC-only blocks: uniform frames survive the lossy
    # codec exactly — the precondition the multimodal_mjpg_stats oracle
    # gate relies on (checked here for every uniform value used there)
    vals = [0, 5, 128, 200, 255]
    blobs = [J.jpeg_encode(np.full((13, 11, 1), v, dtype=np.uint8)) for v in vals]
    got = avi_decode_frames(avi_encode_mjpg(blobs, 11, 13))
    assert got is not None and got.shape == (len(vals), 13, 11, 3)
    for i, v in enumerate(vals):
        assert (got[i] == v).all()


def test_mjpg_malformed_guards():
    import numpy as np

    from laygo_python_spark.operators import jpeg as J
    from laygo_python_spark.operators.multimodal import avi_decode_frames, avi_encode_mjpg

    good = J.jpeg_encode(np.full((8, 8, 1), 9, dtype=np.uint8))
    # a chunk that is not a decodable JPEG → None, no raise
    blob = avi_encode_mjpg([good, b"\xff\xd8garbage"], 8, 8)
    assert avi_decode_frames(blob) is None
    # frame dims disagreeing with the header → None
    other = J.jpeg_encode(np.full((16, 16, 1), 9, dtype=np.uint8))
    assert avi_decode_frames(avi_encode_mjpg([other], 8, 8)) is None


def test_pca_project_matches_numpy_model(spark):
    import numpy as np

    from laygo_python_spark.operators.similarity import (
        pca_components,
        pca_project,
        train_pca,
    )

    rng = np.random.default_rng(11)
    # anisotropic cloud: variance concentrated on two known axes
    base = rng.normal(size=(200, 6)) * np.array([5.0, 3.0, 0.5, 0.2, 0.1, 0.05])
    rows = [(i, [float(x) for x in base[i]]) for i in range(len(base))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mu, comps, eig = pca_components(base, 3)
    assert eig[0] >= eig[1] >= eig[2]  # descending variance
    want = (base - mu) @ comps.T
    got = {r.vec_id: r.proj for r in pca_project(df, mu, comps).collect()}
    for i in range(len(base)):
        assert np.allclose(got[i], want[i], atol=1e-9), i
    # distributed-moments training must agree with the in-memory eig
    mu2, comps2 = train_pca(df, 3)
    assert np.allclose(mu2, mu, atol=1e-12)
    assert np.allclose(np.abs(comps2 @ comps.T), np.eye(3), atol=1e-6)


def test_binary_quantize_matches_numpy_packing(spark):
    import numpy as np

    from laygo_python_spark.operators.similarity import binary_quantize

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((20, 64)).astype("float32")
    vecs[0, :5] = 0.0  # exact zeros pack as 0-bits (x > 0 rule)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["vec_id"], r["word"]): r["code"]
        for r in binary_quantize(df, dim=64).collect()
    }
    for i in range(20):
        for w in range(2):
            expect = 0
            for j in range(32):
                if vecs[i, w * 32 + j] > 0:
                    expect |= 1 << j
            assert got[(i, w)] == expect, (i, w)


def test_binary_hamming_topk_exact_and_recalls(spark):
    import numpy as np

    from laygo_python_spark.operators.similarity import binary_hamming_topk

    rng = np.random.default_rng(13)
    vecs = rng.standard_normal((60, 64)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = binary_hamming_topk(df, df.filter("vec_id < 3"), dim=64, k=5, shortlist=30).collect()
    # hamming column is the exact sign-disagreement count
    signs = vecs > 0
    for r in out:
        expect = int((signs[r["query_id"]] != signs[r["neighbor_id"]]).sum())
        assert r["hamming"] == expect
    # per query: 5 ranked rows, ranks 1..5, sims descending
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == [1, 2, 3, 4, 5]
        sims = [r["sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)


def test_binary_hamming_topk_recovers_planted_near_dups(spark):
    # The claim a sign sketch actually makes: HIGH-similarity neighbors
    # have LOW hamming, so a planted near-duplicate (query + small
    # noise, cosine ~0.99) survives the shortlist and wins the rerank.
    # (Unstructured gaussian corpora have no such guarantee — max
    # cosine ~0.4 — which is exactly why the production pattern is
    # shortlist-then-rerank, not hamming-rank-only.)
    import numpy as np

    from laygo_python_spark.operators.similarity import binary_hamming_topk

    rng = np.random.default_rng(17)
    base = rng.standard_normal((40, 64)).astype("float32")
    planted = base[:3] + 0.05 * rng.standard_normal((3, 64)).astype("float32")
    vecs = np.vstack([base, planted])  # ids 40..42 are near-dups of 0..2
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = binary_hamming_topk(df, df.filter("vec_id < 3"), dim=64, k=1, shortlist=10).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in out}
    assert top1 == {0: 40, 1: 41, 2: 42}


def test_cosine_zero_vector_yields_neginf_not_crash(spark):
    # ANSI mode turns /0 into an exception; a zero (padding) embedding
    # must rank last via the -inf sentinel, not kill the scan — and the
    # sentinel must be the SAME VALUE in both code paths (r9 advice:
    # NULL-vs--inf divergence between Column and numpy paths).
    from laygo_python_spark.operators.similarity import brute_force_topk

    rows = [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [1.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got_by_path = {}
    for vectorized in (False, True):
        out = brute_force_topk(df, df.filter("vec_id = 0"), k=2, vectorized=vectorized).collect()
        got = {r["neighbor_id"]: r["sim"] for r in out}
        assert got[1] == float("-inf")  # zero vector: -inf, ranked last
        assert got[2] == pytest.approx(2 ** -0.5)
        got_by_path[vectorized] = got
    assert got_by_path[False] == pytest.approx(got_by_path[True])  # value-identical paths


def test_zero_vector_ranks_last_in_both_topk_paths(spark):
    # r8 review: the numpy path returned NaN (which Spark's desc window
    # ranks FIRST) while the Column path returns NULL (ranked last) —
    # both paths must rank a zero vector last and pick the same top-1.
    rows = [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [1.0, 1.0]), (3, [0.9, 0.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id = 0")
    col_path = similarity.brute_force_topk(df, q, k=2).collect()
    np_path = similarity.brute_force_topk(df, q, k=2, vectorized=True).collect()
    top_col = [r["neighbor_id"] for r in sorted(col_path, key=lambda r: r["rank"])]
    top_np = [r["neighbor_id"] for r in sorted(np_path, key=lambda r: r["rank"])]
    assert top_col == top_np == [3, 2]  # the zero vector (id 1) never wins


def test_binary_hamming_topk_pre_prune_is_result_identical(spark):
    # r9 advice: the two-level salted shortlist (which bounds the
    # per-query window task at scale) must return EXACTLY the single-
    # window result — the salt only splits the first-level groups, and
    # (hamming asc, neighbor_id asc) is a total order.
    from laygo_python_spark.operators.similarity import binary_hamming_topk

    rng = np.random.default_rng(23)
    vecs = rng.standard_normal((60, 64)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id < 4")
    kw = dict(dim=64, k=3, shortlist=8)
    pruned = sorted(map(tuple, binary_hamming_topk(df, q, prune_salts=5, **kw).collect()))
    single = sorted(map(tuple, binary_hamming_topk(df, q, prune_salts=0, **kw).collect()))
    assert pruned == single and len(single) == 12


def test_cosine_hoisted_is_bit_identical_to_cosine(spark):
    # The r12 norm hoist must be VALUE-identical to the per-pair form —
    # same dot fold, same two sqrt results multiplied in the same order
    # — including the zero-vector -inf sentinel. Bit equality (not
    # approx): the DuckDB oracle ranks/thresholds on raw sims.
    from pyspark.sql import functions as F

    from laygo_python_spark.operators.similarity import (
        cosine,
        cosine_hoisted,
        l2_norm,
    )

    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.standard_normal(64)]) for i in range(40)
    ] + [(40, [0.0] * 64)]  # zero vector: both forms must emit -inf
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    a = df.selectExpr("vec_id AS ia", "v AS va")
    b = df.selectExpr("vec_id AS ib", "v AS vb")
    pairs = a.join(b, F.col("ia") < F.col("ib"))
    both = pairs.select(
        cosine(F.col("va"), F.col("vb")).alias("plain"),
        cosine_hoisted(
            F.col("va"), F.col("vb"), l2_norm(F.col("va")), l2_norm(F.col("vb"))
        ).alias("hoisted"),
    ).collect()
    assert len(both) == 41 * 40 // 2
    assert all(r["plain"] == r["hoisted"] for r in both)  # bit-equal, -inf included
