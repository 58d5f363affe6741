"""Baseline JPEG decode (operators/jpeg.py) — round-trip against a
minimal zero-dep ENCODER (DCT → quantize → zigzag → Huffman → stuffed
bitstream), mirroring the PNG decode-vs-reference-encoder gate. The
encoder uses flat-length canonical Huffman tables (the decoder must
honor whatever DHT ships in the file, not assume Annex K) and all-ones
quantization, so the only loss is DCT-coefficient rounding — tightly
boundable, which makes the round-trip assertable."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from laygo_python_spark.operators import jpeg as J


# The baseline encoder now lives in the package (operators/jpeg.py:
# jpeg_encode, promoted for MJPG video frames); these tests keep gating
# the decode round trip against it.
_flat_huff = J._flat_huff
_BitW = J._BitW
_DC_SYMS = J._DC_SYMS
_AC_SYMS = J._AC_SYMS
_encode_jpeg = J.jpeg_encode


def test_gray_uniform_exact():
    px = np.full((16, 24, 1), 128, dtype=np.uint8)
    got = J.jpeg_decode_pixels(_encode_jpeg(px))
    assert got is not None and got.shape == (16, 24, 1)
    assert (got == px).all()


def test_gray_roundtrip_tight():
    rng = np.random.RandomState(3)
    # smooth image: low-frequency content keeps rounding error tiny
    base = rng.randint(40, 216, size=(3, 4)).astype(np.float64)
    px = np.kron(base, np.ones((8, 8)))[:24, :32][:, :, None].astype(np.uint8)
    got = J.jpeg_decode_pixels(_encode_jpeg(px))
    assert got.shape == px.shape
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 2


def test_rgb_444_roundtrip():
    rng = np.random.RandomState(5)
    base = rng.randint(30, 226, size=(3, 3, 3)).astype(np.float64)
    px = np.kron(base.transpose(2, 0, 1), np.ones((8, 8))).transpose(1, 2, 0)
    px = px[:20, :22].astype(np.uint8)
    got = J.jpeg_decode_pixels(_encode_jpeg(px))
    assert got.shape == px.shape
    # color transform + DCT rounding both ways
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 6


def test_rgb_420_subsampled_roundtrip():
    rng = np.random.RandomState(9)
    base = rng.randint(30, 226, size=(2, 2, 3)).astype(np.float64)
    px = np.kron(base.transpose(2, 0, 1), np.ones((16, 16))).transpose(1, 2, 0)
    px = px[:30, :28].astype(np.uint8)
    got = J.jpeg_decode_pixels(_encode_jpeg(px, subsample=True))
    assert got.shape == px.shape
    # blocks are 16x16-constant so chroma decimation loses nothing inside
    # a block; edges between blocks tolerate the box/nearest mismatch
    assert np.abs(got.astype(int) - px.astype(int)).mean() <= 4


def test_restart_markers():
    rng = np.random.RandomState(13)
    base = rng.randint(40, 216, size=(2, 6)).astype(np.float64)
    px = np.kron(base, np.ones((8, 8)))[:, :, None].astype(np.uint8)
    blob = _encode_jpeg(px, restart=2)
    assert b"\xff\xd0" in blob  # a restart marker actually got emitted
    got = J.jpeg_decode_pixels(blob)
    assert got.shape == px.shape
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 2


def test_rejects_non_baseline_and_malformed():
    px = np.full((8, 8, 1), 99, dtype=np.uint8)
    blob = _encode_jpeg(px)
    assert J.jpeg_decode_pixels(blob[: len(blob) // 2]) is None  # truncated
    assert J.jpeg_decode_pixels(b"\xff\xd8\xff\xd9") is None  # no frame
    assert J.jpeg_decode_pixels(None) is None
    assert J.jpeg_decode_pixels(b"garbage") is None
    # a SEQUENTIAL scan mislabeled as progressive (SOF2 with the
    # baseline Ss=0..Se=63 SOS) is malformed -> None; real progressive
    # streams decode (see the _encode_jpeg_progressive round-trips)
    prog = blob.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert J.jpeg_decode_pixels(prog) is None


def test_dimensions_consistency_with_header_parse():
    from laygo_python_spark.operators import multimodal

    px = np.full((17, 31, 1), 60, dtype=np.uint8)
    blob = _encode_jpeg(px)
    assert multimodal.jpeg_dimensions(blob) == (31, 17)
    assert J.jpeg_decode_pixels(blob).shape == (17, 31, 1)


def test_jpeg_feeds_decode_features_pipeline(spark):
    # A baseline JPEG payload flows through the Spark-side feature path
    # with REAL pixel stats (channels==3) — the path that previously
    # fell back to byte-stat embeddings for every JPEG.
    from pyspark.sql import Row

    from laygo_python_spark.operators import multimodal

    rng = np.random.RandomState(21)
    base = rng.randint(30, 226, size=(2, 2, 3)).astype(np.float64)
    px = np.kron(base.transpose(2, 0, 1), np.ones((8, 8))).transpose(1, 2, 0).astype(np.uint8)
    blob = _encode_jpeg(px)
    df = spark.createDataFrame(
        [Row(media_id=1, payload=bytearray(blob), media_type=None, n_bytes=len(blob))],
        schema=multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.decode_features(df).collect()[0]
    assert (row["width"], row["height"]) == (16, 16)
    assert row["feature"][0] == 3.0  # real pixel decode, not byte-stat fallback
    want = multimodal.png_pixel_stats(blob)
    assert row["feature"] == want


class _PBits(_BitW):
    def emit(self, enc, sym):
        ln, code = enc[sym]
        self.put(code, ln)


def _encode_jpeg_progressive(px: np.ndarray) -> bytes:
    """Progressive (SOF2) encoder: interleaved DC first/refine scans at
    Al=1/0, then per-component AC first+refine scans over two spectral
    bands — exercising EOB runs, ZRL-in-refinement and correction-bit
    interleaving. 4:4:4 only; all-ones quant (loss = coef rounding)."""
    h, w, nc = px.shape
    dc_counts, dc_syms, dc_enc = _flat_huff(_DC_SYMS, 8)
    ac_counts, ac_syms, ac_enc = _flat_huff(_AC_SYMS, 9)

    if nc == 3:
        rgb = px.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = 128.0 + (rgb[:, :, 2] - y) / 1.772
        cr = 128.0 + (rgb[:, :, 0] - y) / 1.402
        chans = [y, cb, cr]
    else:
        chans = [px[:, :, 0].astype(np.float64)]

    A = J._A
    bw, bh = -(-w // 8), -(-h // 8)
    # per-component zigzag coefficient grid
    zz = np.zeros((nc, bh, bw, 64), dtype=np.int64)
    for ci, ch in enumerate(chans):
        p = np.zeros((bh * 8, bw * 8))
        p[:h, :w] = ch
        p[h:, :] = p[max(h - 1, 0), :][None, :]
        p[:, w:] = p[:, max(w - 1, 0)][:, None]
        for by in range(bh):
            for bx in range(bw):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                zz[ci, by, bx] = np.round((A @ blk @ A.T).reshape(-1)[J._ZIGZAG])

    def seg(code, payload):
        return bytes([0xFF, code]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes([1] * 64))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    out += seg(0xC2, sof)  # SOF2: progressive
    out += seg(0xC4, bytes([0x00]) + dc_counts + dc_syms)
    out += seg(0xC4, bytes([0x10]) + ac_counts + ac_syms)

    def _cat(v):
        return 0 if v == 0 else int(v).bit_length()

    def sos_header(comp_ids, ss, se, ah, al):
        p = bytes([len(comp_ids)])
        for cid in comp_ids:
            p += bytes([cid + 1, 0x00])
        return seg(0xDA, p + bytes([ss, se, (ah << 4) | al]))

    # --- DC first (interleaved, Al=1): diffs of v >> 1 (arithmetic) ---
    out += sos_header(list(range(nc)), 0, 0, 0, 1)
    bwr = _PBits()
    pred = [0] * nc
    for u in range(bw * bh):
        by, bx = divmod(u, bw)
        for ci in range(nc):
            v = int(zz[ci, by, bx, 0]) >> 1
            diff = v - pred[ci]
            pred[ci] = v
            t = _cat(abs(diff))
            bwr.emit(dc_enc, t)
            if t:
                bwr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    bwr.pad()
    out += bwr.out

    # --- DC refine (interleaved, Al=0): low bit of v ---
    out += sos_header(list(range(nc)), 0, 0, 1, 0)
    bwr = _PBits()
    for u in range(bw * bh):
        by, bx = divmod(u, bw)
        for ci in range(nc):
            bwr.put(int(zz[ci, by, bx, 0]) & 1, 1)
    bwr.pad()
    out += bwr.out

    bands = [(1, 8), (9, 63)]

    # --- AC first scans (Al=1): magnitude >> 1, toward zero ---
    for ci in range(nc):
        for ss, se in bands:
            out += sos_header([ci], ss, se, 0, 1)
            bwr = _PBits()
            eobrun = 0

            def flush_eob():
                nonlocal eobrun
                if eobrun:
                    r = eobrun.bit_length() - 1
                    bwr.emit(ac_enc, r << 4)
                    if r:
                        bwr.put(eobrun - (1 << r), r)
                    eobrun = 0

            for u in range(bw * bh):
                by, bx = divmod(u, bw)
                vals = [
                    (1 if v > 0 else -1) * (abs(int(v)) >> 1)
                    for v in zz[ci, by, bx, ss : se + 1]
                ]
                if not any(vals):
                    eobrun += 1
                    if eobrun == 0x3FF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                last_nz = max(i for i, v in enumerate(vals) if v)
                for i, v in enumerate(vals):
                    if i > last_nz:
                        eobrun += 1
                        break
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        bwr.emit(ac_enc, 0xF0)
                        run -= 16
                    s = _cat(abs(v))
                    bwr.emit(ac_enc, (run << 4) | s)
                    bwr.put(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
            flush_eob()
            bwr.pad()
            out += bwr.out

    # --- AC refine scans (Al=0): ±1 newcomers + correction bits ---
    for ci in range(nc):
        for ss, se in bands:
            out += sos_header([ci], ss, se, 1, 0)
            bwr = _PBits()
            eobrun = 0
            pending: list[int] = []

            def flush_eob_r():
                nonlocal eobrun, pending
                if eobrun:
                    r = eobrun.bit_length() - 1
                    bwr.emit(ac_enc, r << 4)
                    if r:
                        bwr.put(eobrun - (1 << r), r)
                    for bit in pending:
                        bwr.put(bit, 1)
                    eobrun = 0
                    pending = []

            for u in range(bw * bh):
                by, bx = divmod(u, bw)
                band = [int(v) for v in zz[ci, by, bx, ss : se + 1]]
                hist = [(1 if v > 0 else -1) * (abs(v) >> 1) for v in band]
                new_pos = [i for i, (t, v) in enumerate(zip(hist, band)) if t == 0 and v != 0]
                if not new_pos:
                    eobrun += 1
                    pending += [abs(v) & 1 for t, v in zip(hist, band) if t != 0]
                    if eobrun == 0x3FF:
                        flush_eob_r()
                    continue
                flush_eob_r()
                run, buf = 0, []
                last_new = new_pos[-1]
                for i, (t, v) in enumerate(zip(hist, band)):
                    if i > last_new:
                        eobrun += 1
                        pending += [
                            abs(vv) & 1
                            for tt, vv in zip(hist[i:], band[i:])
                            if tt != 0
                        ]
                        break
                    if t != 0:
                        buf.append(abs(v) & 1)
                        continue
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        bwr.emit(ac_enc, 0xF0)
                        for bit in buf:
                            bwr.put(bit, 1)
                        buf = []
                        run -= 16
                    bwr.emit(ac_enc, (run << 4) | 1)
                    bwr.put(1 if v > 0 else 0, 1)
                    for bit in buf:
                        bwr.put(bit, 1)
                    buf = []
                    run = 0
                else:
                    # band ended exactly at a newly-nonzero: nothing trails
                    pass
            flush_eob_r()
            bwr.pad()
            out += bwr.out

    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_gray_roundtrip_matches_baseline():
    """Progressive decode must reconstruct the SAME coefficients the
    baseline scan carries: encode one image both ways (identical DCT +
    quant) and demand pixel-identical decodes."""
    rng = np.random.RandomState(41)
    base = rng.randint(30, 226, size=(3, 4)).astype(np.float64)
    px = np.kron(base, np.ones((8, 8)))[:22, :27][:, :, None].astype(np.uint8)
    prog = J.jpeg_decode_pixels(_encode_jpeg_progressive(px))
    seq = J.jpeg_decode_pixels(_encode_jpeg(px))
    assert prog is not None and prog.shape == px.shape
    assert (prog == seq).all()
    assert np.abs(prog.astype(int) - px.astype(int)).max() <= 2


def test_progressive_rgb_roundtrip_matches_baseline():
    rng = np.random.RandomState(43)
    px = rng.randint(0, 256, size=(21, 18, 3)).astype(np.uint8)  # full-noise: every band busy
    prog = J.jpeg_decode_pixels(_encode_jpeg_progressive(px))
    seq = J.jpeg_decode_pixels(_encode_jpeg(px))
    assert prog is not None and prog.shape == px.shape
    assert (prog == seq).all()


def test_progressive_sparse_bands_exercise_eob_runs():
    # near-flat image: AC bands mostly empty -> long EOB runs in both
    # first and refinement scans
    px = np.full((40, 40, 1), 100, dtype=np.uint8)
    px[3, 5] = 140  # one busy block
    prog = J.jpeg_decode_pixels(_encode_jpeg_progressive(px))
    seq = J.jpeg_decode_pixels(_encode_jpeg(px))
    assert prog is not None and (prog == seq).all()


def test_progressive_real_encoder_fixture():
    """Cross-implementation gate (r6 advice): the progressive tests
    above validate against _encode_jpeg_progressive — a test-authored
    encoder in this repo — so a MUTUAL bug in the spectral-selection /
    successive-approximation conventions could pass both sides. When a
    real encoder (PIL/libjpeg) is present, encode progressive streams
    with IT and demand our decoder reconstructs the pixels it encodes.
    This container ships no image libs (skip); any environment with
    Pillow runs the real cross-check."""
    PIL_Image = pytest.importorskip("PIL.Image", reason="no real JPEG encoder in this image")
    import io

    rng = np.random.RandomState(47)
    for shape, mode in (((24, 33), "L"), ((21, 18, 3), "RGB")):
        base = rng.randint(0, 256, size=shape).astype(np.uint8)
        im = PIL_Image.fromarray(base, mode=mode)
        buf = io.BytesIO()
        im.save(buf, format="JPEG", progressive=True, quality=90, subsampling=0)
        blob = buf.getvalue()
        got = J.jpeg_decode_pixels(blob)
        assert got is not None and got.shape[:2] == shape[:2]
        # libjpeg's decoder is the ground truth for its own stream
        ref = np.asarray(PIL_Image.open(io.BytesIO(blob)).convert(mode))
        if ref.ndim == 2:
            ref = ref[:, :, None]
        assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def _scan_scripts(b: bytes) -> tuple[int, list[tuple[int, int, int, int]]]:
    """(sof_marker, [(Ss, Se, Ah, Al) per SOS]) — independent mini-parse
    so the test proves what the committed stream exercises without
    trusting the decoder under test."""
    i, sof, scans = 2, None, []
    while i < len(b) - 1:
        if b[i] != 0xFF:
            i += 1
            continue
        m = b[i + 1]
        if m in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB) and sof is None:
            sof = m
        if m == 0xDA:
            length = (b[i + 2] << 8) + b[i + 3]
            ns = b[i + 4]
            base = i + 5 + 2 * ns
            scans.append((b[base], b[base + 1], b[base + 2] >> 4, b[base + 2] & 15))
            i += 2 + length
            while i < len(b) - 1 and not (
                b[i] == 0xFF and b[i + 1] != 0 and not (0xD0 <= b[i + 1] <= 0xD7)
            ):
                i += 1
            continue
        if m == 0xD8:
            i += 2
            continue
        if i + 3 < len(b):
            i += 2 + (b[i + 2] << 8) + b[i + 3]
        else:
            break
    return sof, scans


def test_real_encoder_progressive_fixtures_decode():
    """The committed real-encoder cross-check (r7 verdict ask #4,
    replacing the PIL gate that never runs in this container): two
    independently-produced SOF2 streams (tests/fixtures_real_jpeg.py)
    must decode here. Content assertions are ±1-IDCT-robust statistics
    (exact pixel equality across JPEG decoders is NOT guaranteed by the
    standard); the sha pins are drift detectors for THIS decoder's
    output, re-pin deliberately if the IDCT ever changes."""
    import hashlib

    from tests.fixtures_real_jpeg import (
        PROGRESSIVE_FULL_STRIPE,
        PROGRESSIVE_THIN_STRIPE,
    )

    for blob, shape, frac_white, pin in (
        (PROGRESSIVE_THIN_STRIPE, (58, 493, 3), 0.80, "73ce8c019a427028"),
        (PROGRESSIVE_FULL_STRIPE, (312, 493, 3), 0.95, "330fe1cd3ed781f8"),
    ):
        sof, scans = _scan_scripts(blob)
        assert sof == 0xC2 and len(scans) >= 5  # genuinely multi-scan progressive
        px = J.jpeg_decode_pixels(blob)
        assert px is not None and px.shape == shape
        white = (px >= 250).all(axis=2).mean()
        assert white >= frac_white  # the stripes are white
        assert 80 <= px[:4].mean() <= 100  # dark header band
        assert hashlib.sha256(px.tobytes()).hexdigest()[:16] == pin
    # the FULL stream uses successive approximation: Al>0 first scans
    # plus Ah>0 refinement scans — the _ac_refine / EOB-run hard path
    _, full_scans = _scan_scripts(PROGRESSIVE_FULL_STRIPE)
    assert any(al > 0 and ah == 0 for _, _, ah, al in full_scans)
    assert any(ah > 0 for _, _, ah, al in full_scans)


def test_real_encoder_baseline_fixture_decodes():
    import hashlib

    from tests.fixtures_real_jpeg import BASELINE_PYTHON_LOGO

    sof, scans = _scan_scripts(BASELINE_PYTHON_LOGO)
    assert sof == 0xC0 and len(scans) == 1
    px = J.jpeg_decode_pixels(BASELINE_PYTHON_LOGO)
    assert px is not None and px.shape == (16, 16, 3)
    assert 80 <= px.mean() <= 105
    assert hashlib.sha256(px.tobytes()).hexdigest()[:16] == "2a250932a73d8418"
